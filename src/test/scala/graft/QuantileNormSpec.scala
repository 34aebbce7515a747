package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Quantile normalization: shifted group distributions must land on
  * identical normalized values rank-for-rank. */
class QuantileNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a constant-shifted group maps onto the same global values " +
    "rank-for-rank (batch effect removed)") {
    // group B is group A shifted by +1000 — utterly different scales,
    // identical shapes
    val a = (1L to 50L).map(v => ("a", v))
    val b = (1L to 50L).map(v => ("b", v + 1000L))
    val df = (a ++ b).toDF("g", "v")
    val out = graft.ops.QuantileNorm.normalize(df, "g", "v", k = 10)
      .select("g", "v", "src_bin", "qnorm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byA = out.filter(_._1 == "a").sortBy(_._2).map(x => (x._3, x._4))
    val byB = out.filter(_._1 == "b").sortBy(_._2).map(x => (x._3, x._4))
    // rank-for-rank: i-th smallest of A and i-th smallest of B get the
    // SAME bin and the SAME normalized value
    assert(byA.toSeq === byB.toSeq)
    // bins cover the full range 0..k-1 and are monotone in v
    assert(byA.map(_._1).distinct.length === 10)
    assert(byA.map(_._1).toSeq === byA.map(_._1).sorted.toSeq)
    // normalized values come from the GLOBAL edge set
    val edges = out.map(_._4).distinct.sorted
    assert(edges.length === 10)
  }

  test("int-typed value column widens to long; double fails fast with a " +
    "clear message (used to be a deep ClassCastException)") {
    val ints = (1 to 40).map(v => ("g", v)).toDF("g", "v")
    // int column: must work, same math as long
    val ok = graft.ops.QuantileNorm.normalize(ints, "g", "v", k = 4)
    assert(ok.count() === 40L)
    val dbl = Seq(("g", 1.5), ("g", 2.5)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.QuantileNorm.normalize(dbl, "g", "v")
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("identity: normalizing a single group returns its own quantile " +
    "edges") {
    val df = (1L to 100L).map(v => ("only", v)).toDF("g", "v")
    val out = graft.ops.QuantileNorm.normalize(df, "g", "v", k = 4)
      .select("v", "qnorm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // k=4 → edges at global min and the p25/p50/p75 picks (1, 25, 50, 75)
    assert(out(1L) === 1L)
    assert(out(26L) === 25L)
    assert(out(51L) === 50L)
    assert(out(76L) === 75L)
    assert(out(100L) === 75L) // top bin's lower edge
  }
}
