package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Validation suite, count-min sketch, and salted-join specs on planted
  * fixtures. */
class ValidateCountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Validate.run flags planted nulls, dup keys, out-of-range and " +
    "orphan FKs with exact ppm metrics") {
    import graft.ops.Validate._
    val df = Seq(
      (1L, Some("a"), 10.0, "X"), (2L, Some("b"), 20.0, "X"),
      (2L, Some("c"), 999.0, "Y"), (4L, None, 30.0, "Z"))
      .toDF("id", "name", "amt", "code")
    val dim = Seq(1L, 2L).toDF("id")
    val got = graft.ops.Validate.run(df, Seq(
        NotNull("name", minRate = 0.9),
        InRange("amt", 0.0, 100.0, minRate = 0.5),
        InSet("code", Seq("X", "Y")),
        Unique(Seq("id")),
        ForeignKey("id", dim, "id")))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got(("not_null", "name")) === (750000L, 0L)) // 3/4 < 0.9
    assert(got(("in_range", "amt")) === (750000L, 1L))  // 3/4 >= 0.5
    assert(got(("in_set", "code")) === (750000L, 0L))   // Z fails, rate=1 req
    assert(got(("unique", "id")) === (750000L, 0L))     // 3 distinct of 4
    assert(got(("foreign_key", "id")) === (250000L, 0L)) // id=4 orphan
  }

  test("Validate.Unique is null-aware: unique keys WITH a null row pass " +
    "(countDistinct's null-drop read them as a violation), while two " +
    "null-keyed rows are a genuine collision") {
    import graft.ops.Validate._
    import spark.implicits._
    val ok = Seq(Some(1L), Some(2L), None).toDF("k")
    val gotOk = graft.ops.Validate.run(ok, Seq(Unique(Seq("k"))))
      .collect().head
    assert(gotOk.getLong(3) === 1L,
      s"unique data with one null key must pass: $gotOk")
    val dup = Seq(Some(1L), None, None).toDF("k")
    val gotDup = graft.ops.Validate.run(dup, Seq(Unique(Seq("k"))))
      .collect().head
    assert(gotDup.getLong(3) === 0L,
      s"two null-keyed rows collide downstream and must flag: $gotDup")
  }

  test("CountMin: estimates never undercount, stay within the eps bound, " +
    "and split sketches merge bit-identically") {
    val d = 4; val w = 256
    val keys = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i"))
    val df = keys.toDF("t").repartition(8)
    val agg = graft.agg.CountMin.sketchAgg(d, w)
    val whole = df.agg(agg(col("t"))).head().getAs[Seq[Long]](0).toArray
    val n = keys.size
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val margin = 3.0 * math.E / w * n
    exact.foreach { case (k, c) =>
      val est = graft.agg.CountMin.estimate(whole, d, w, k)
      assert(est >= c, s"undercount for $k: $est < $c")
      assert(est <= c + margin, s"overshoot for $k: $est > $c + $margin")
    }
    val a = df.filter(crc32(col("t")) % 2 === 0)
      .agg(agg(col("t"))).head().getAs[Seq[Long]](0).toArray
    val b = df.filter(crc32(col("t")) % 2 === 1)
      .agg(agg(col("t"))).head().getAs[Seq[Long]](0).toArray
    assert(java.util.Arrays.equals(graft.agg.CountMin.merge(a, b), whole))
    // total mass conservation: every row of the sketch sums to n
    (0 until d).foreach { i =>
      assert(whole.slice(i * w, (i + 1) * w).sum === n.toLong)
    }
  }

  test("saltedJoin equals the plain join on a pathologically hot key " +
    "and plans its exchange on (key, salt)") {
    val fact = ((1 to 5000).map(_ => (1L, 1.0)) ++ // hot key: 5000 rows
      (1 to 100).map(i => (i.toLong % 7 + 2, 2.0))).toDF("k", "v")
    val dim = (1L to 10L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = graft.ops.SkewJoin.saltedJoin(fact, dim, "k", salt = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(salted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet === plain)
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("__salt"),
      "salted join plan should key its exchange on the salt column")
  }
}
