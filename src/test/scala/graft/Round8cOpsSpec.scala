package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 third batch: mergeable HLL distinct sketch (the incremental
  * catalog's last non-additive stat), z-order layout, OOF target
  * encoding. */
class Round8cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL: estimate within 3 sigma at small/medium cardinality and " +
    "exact in the linear-counting regime") {
    import spark.implicits._
    // linear-counting regime: 100 distinct among 16384 registers
    val small = (1L to 1000L).map(i => i % 100).toDF("v")
    val sSmall = graft.agg.Hll.sketch(small, "v")
    val eSmall = graft.agg.Hll.estimate(sSmall)
    assert(math.abs(eSmall - 100.0) <= 2.0, s"small est $eSmall")
    // raw-estimate regime: 200k distinct, std err 0.81% at p=14
    val big = (1L to 200000L).toDF("v")
    val eBig = graft.agg.Hll.estimate(graft.agg.Hll.sketch(big, "v"))
    assert(math.abs(eBig / 200000.0 - 1.0) <= 0.03, s"big est $eBig")
  }

  test("HLL: merge of disjoint-split sketches is BIT-IDENTICAL to the " +
    "whole-corpus sketch, and serde round-trips") {
    import spark.implicits._
    val d = (1L to 50000L).map(i => s"tok_${i % 7919}").toDF("v")
    val whole = graft.agg.Hll.sketch(d, "v", p = 12)
    val a = graft.agg.Hll.sketch(d.filter(crc32(col("v")) % 2 === 0), "v", p = 12)
    val b = graft.agg.Hll.sketch(d.filter(crc32(col("v")) % 2 =!= 0), "v", p = 12)
    val merged = graft.agg.Hll.merge(a, b)
    assert(java.util.Arrays.equals(merged, whole),
      "merge(sketch(A), sketch(B)) must equal sketch(A union B) bit-exact")
    val rt = graft.agg.Hll.deserialize(graft.agg.Hll.serialize(merged))
    assert(java.util.Arrays.equals(rt, merged), "serde round-trip")
    assert(graft.agg.Hll.estimate(merged) > 0)
  }

  test("HLL: mergeWithSketches recovers distinctCount where StatsMerge " +
    "alone surrenders it") {
    import spark.implicits._
    val rows = (1L to 4000L).map { i =>
      (i, (i % 997).toDouble, i % 5 == 0)
    }.toDF("id", "v", "y")
    val half1 = rows.filter(col("id") % 2 === 0)
    val half2 = rows.filter(col("id") % 2 =!= 0)
    val bounds: Map[String, Seq[Double]] =
      Map("v" -> Seq(Double.NegativeInfinity, 250.0, 500.0, 750.0))
    def prof(df: org.apache.spark.sql.DataFrame) =
      graft.ops.StatsPipeline.profileNumeric(
        df, Seq("v"), col("y"), full = true,
        boundsOverride = Some(bounds))("v")
    val (p1, p2) = (prof(half1), prof(half2))
    val s1 = graft.agg.Hll.sketch(half1, "v")
    val s2 = graft.agg.Hll.sketch(half2, "v")
    val plain = graft.ops.StatsMerge.merge(p1, p2)
    assert(plain.stats.distinctCount.isEmpty,
      "plain merge cannot carry distinctCount")
    val (withD, regs) = graft.agg.Hll.mergeWithSketches(p1, p2, s1, s2)
    val est = withD.stats.distinctCount.get
    assert(math.abs(est - 997L) <= 30, s"recovered distinct $est vs 997")
    // chain stays incremental: merged regs == whole-table sketch
    assert(java.util.Arrays.equals(regs, graft.agg.Hll.sketch(rows, "v")))
  }
}
