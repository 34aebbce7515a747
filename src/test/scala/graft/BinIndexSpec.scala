package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Codegen binary-search bin index: equality with the when-chain,
  * edge semantics, and whole-stage-codegen participation. */
class BinIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("BinIndex equals the when-chain on every boundary edge " +
    "(below, exact-on, between, above, ±Inf)") {
    val bounds = Seq(0.0, 1.5, 3.0, 10.0)
    val vals = Seq(-1e300, -0.001, 0.0, 0.1, 1.5, 2.999, 3.0, 9.999,
      10.0, 1e300, Double.NegativeInfinity, Double.PositiveInfinity)
    val df = vals.toDF("v")
    val chain = {
      var c = when(lit(false), 0)
      bounds.zipWithIndex.reverse.foreach { case (b, i) =>
        c = c.when(col("v") >= lit(b), i + 1)
      }
      c.otherwise(0)
    }
    val rows = df.select(col("v"),
        graft.expr.BinIndex.of(col("v"), bounds).as("bs"),
        chain.as("chain"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"mismatch at v=${r.getDouble(0)}")
    }
  }

  test("BinIndex: null in, null out") {
    val df = Seq[Option[Double]](Some(1.0), None).toDF("v")
    val got = df.select(graft.expr.BinIndex.of(col("v"), Seq(0.0, 2.0)))
      .collect()
    assert(got(0).getInt(0) === 1)
    assert(got(1).isNullAt(0))
  }

  test("BinIndex participates in whole-stage codegen") {
    val df = spark.range(100).select(col("id").cast("double").as("v"))
    val q = df.select(graft.expr.BinIndex.of(col("v"),
      (1 until 64).map(_.toDouble)).as("b"))
      .groupBy("b").count()
    val got = q.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // assert on the FINAL adaptive plan (materialized by the collect)
    // the `*(n)` star prefix is the WholeStageCodegen marker in the
    // compact plan string; the binindex Project must carry one
    val plan = q.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator
      .find(_.contains("binindex")).getOrElse("")
    assert(projLine.contains("*("),
      s"bin-search Project should stay inside whole-stage codegen:\n$plan")
    assert(got(0) === 1L)  // v=0 (below first bound)
    assert(got(63) === 37L) // v in [63, 99] → 37 values at top bin
  }

  test("BinIndex on 2048 bounds matches a linear scan") {
    val bounds = (1 until 2048).map(i => i * 0.5)
    val vals = Seq(0.0, 0.49, 0.5, 512.25, 1023.5, 1023.74, 2000.0)
    val df = vals.toDF("v")
    val got = df.select(col("v"),
      graft.expr.BinIndex.of(col("v"), bounds)).collect()
    got.foreach { r =>
      val v = r.getDouble(0)
      val want = bounds.count(_ <= v)
      assert(r.getInt(1) === want, s"v=$v")
    }
  }
}
