package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness for perf work:
  * `SPARK_GRAFT_SF_DIR=... scripts/run.sh graft.TimeQ q_name [reps]`
  * runs the query `reps` times (default 3) after a session warm-up and
  * prints each run's seconds — separates steady-state query cost from JVM
  * warm-up, which the all-queries Bench can't do per query. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.tools.Harness.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    // SPARK_GRAFT_EXPLAIN=1 dumps the formatted physical plan once before
    // timing — the audit loop for "is this the plan I'd want at 100 TB"
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
