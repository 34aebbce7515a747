package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Binning

/** Scale-up invariance: duplicate the sf0.01 lineitem 10× (600k rows,
  * repartitioned wider) and check that the core grouped operators produce
  * EXACTLY the linearly-scaled results — i.e. partials/merges, bucket
  * math, and integer-exact cumulative weights are invariant to both data
  * volume and partitioning. This is the empirical face of the 100 TB
  * design claims in SURVEY §9. */
class ScaleSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val d1 = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
  private lazy val d10 = (1 to 10).map(_ => d1).reduce(_ unionAll _)
    .repartition(64)

  test("bin counts scale exactly 10x with identical boundaries") {
    val bounds = QueryUtil.quantityBounds(d1, 10)
    val bounds10 = QueryUtil.quantityBounds(d10, 10)
    assert(bounds === bounds10) // min/max unchanged → identical edges
    val c1 = Binning.binCounts(d1, "l_quantity", bounds, QueryUtil.isPos)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val c10 = Binning.binCounts(d10, "l_quantity", bounds, QueryUtil.isPos)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(c10 === c1.map { case (b, p, n) => (b, p * 10, n * 10) })
  }

  test("weighted-equal boundaries are volume-invariant") {
    val b1 = Binning.weightedEqualBounds(d1, "l_extendedprice",
      col("l_quantity"), 10)
    val b10 = Binning.weightedEqualBounds(d10, "l_extendedprice",
      col("l_quantity"), 10)
    assert(b1 === b10) // cw·k ≥ j·tot scales linearly on both sides
  }

  test("confusion sweep buckets scale exactly 10x") {
    val sweep = (d: org.apache.spark.sql.DataFrame) =>
      graft.eval.Eval.confusionSweep(d, QueryUtil.scoreCol, QueryUtil.isPos,
        Seq(col("l_orderkey"), col("l_linenumber")))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1)
    val s1 = sweep(d1)
    val s10 = sweep(d10)
    assert(s10 === s1.map { case (b, tp, fp, fn, tn) =>
      (b, tp * 10, fp * 10, fn * 10, tn * 10) })
  }
}
