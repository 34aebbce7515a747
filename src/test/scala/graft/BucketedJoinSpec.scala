package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing for co-located joins (SURVEY §4 / "Partitioning & shuffle"):
  * two tables bucketed on the join key join WITHOUT any shuffle exchange —
  * the pre-partitioning IS the join plan. At 100 TB this is the difference
  * between an all-to-all exchange of the fact table and a zero-movement
  * merge; here verified at plan level. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join with no shuffle exchange") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val a = (1 to 10000).map(i => (i.toLong, i * 2.0)).toDF("k", "x")
    val b = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    val ta = s"graft_bucket_a_${System.nanoTime()}"
    val tb = s"graft_bucket_b_${System.nanoTime()}"
    a.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/$ta").saveAsTable(ta)
    b.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/$tb").saveAsTable(tb)
    try {
      val joined = spark.table(ta).join(spark.table(tb), "k")
        .groupBy().agg(sum("x").as("sx"), count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the JOIN itself must not exchange: bucket layout satisfies the
      // required distribution on both sides
      val joinPart = plan.split("HashAggregate").last
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"join introduced a shuffle:\n$plan")
      val r = joined.head()
      assert(r.getLong(1) === 10000L)
      assert(r.getDouble(0) === (1 to 10000).map(_ * 2.0).sum)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
    }
  }
}
