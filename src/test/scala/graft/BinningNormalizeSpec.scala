package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Binning, Normalize}

class BinningNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    Seq[(Int, Option[Double])](
      (0, Some(-5.0)), (1, Some(0.0)), (2, Some(3.4)), (3, Some(3.5)),
      (4, Some(4.0)), (5, Some(99.0)), (6, None))
      .toDF("id", "v")
  }

  // boundaries like the labor-neg fixture: -Inf head, left edges
  private val bounds = Seq(Double.NegativeInfinity, 3.5, 3.7, 4.3, 5.0, 6.0)

  test("binIndex: below-first, at-boundary, top, and missing-last-bin") {
    import org.apache.spark.sql.functions.col
    val got = df.select(col("id"),
      Binning.binIndex(col("v"), bounds).as("b"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got(0) === 0) // -5 below first edge
    assert(got(2) === 0) // 3.4 < 3.5
    assert(got(3) === 1) // 3.5 left-inclusive
    assert(got(4) === 2) // 4.0 in [3.7, 4.3)
    assert(got(5) === 5) // 99 top bin
    assert(got(6) === 6) // null -> missing bin = #boundaries after -Inf + 1
  }

  test("equalInterval boundaries") {
    val b = Binning.equalInterval(0.0, 100.0, 4)
    assert(b === Seq(Double.NegativeInfinity, 25.0, 50.0, 75.0))
  }

  test("zscore clamps at cutoff and maps missing to mean (z=0)") {
    import org.apache.spark.sql.functions.col
    val z = df.select(Normalize.zscore(col("v"), 10.0, 2.0, 6.0).as("z"))
      .collect().map(_.getDouble(0))
    assert(z.contains(-6.0))         // -5 -> z=-7.5 clamped
    assert(z.contains(0.0))          // null -> mean -> 0
    assert(z.forall(v => v >= -6.0 && v <= 6.0))
  }

  test("woeNumeric maps bins to woe and missing to last") {
    import org.apache.spark.sql.functions.col
    val woes = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, -9.9) // 6 bins + missing
    val got = df.select(col("id"),
      Normalize.woeNumeric(col("v"), bounds, woes).as("w"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got(0) === 0.1)
    assert(got(3) === 0.2)
    assert(got(6) === -9.9)
  }

  test("oneHot emits k+1 indicators with missing last") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val d = Seq(Some("a"), Some("b"), Some("zzz"), None).toDF("c")
    val cols = Normalize.oneHot(col("c"), Seq("a", "b"))
      .zipWithIndex.map { case (c, i) => c.as(s"h_$i") }
    val rows = d.select(cols: _*).collect()
    assert(rows(0).toSeq === Seq(1, 0, 0))
    assert(rows(1).toSeq === Seq(0, 1, 0))
    assert(rows(2).toSeq === Seq(0, 0, 1)) // unseen -> missing
    assert(rows(3).toSeq === Seq(0, 0, 1)) // null -> missing
  }

  test("categoryIndex: ordinal with missing/unseen -> k") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val d = Seq(Some("b"), Some("a"), None, Some("x")).toDF("c")
    val got = d.select(Normalize.categoryIndex(col("c"), Seq("a", "b")).as("i"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 0, 2, 2))
  }
}
