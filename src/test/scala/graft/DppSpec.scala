package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: a selective dim-side filter must prune
  * fact PARTITIONS at runtime — the scan-level dual of the engine's
  * row-group skipping (LayoutSpec). At 100 TB a date/tenant-partitioned
  * fact table joined to a filtered dimension is the single most common
  * plan; DPP is what keeps it from scanning every partition. */
class DppSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recordsRead(body: => Unit): Long = {
    val rows = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null)
          rows.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(1000) } // listener bus is async
    finally spark.sparkContext.removeSparkListener(l)
    rows.get()
  }

  test("join against a filtered dim prunes fact partitions at runtime " +
    "(dynamicpruning in plan, measured records drop)") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    // fact: 40k rows over 8 partitions on `part_key`
    (0 until 40000).map(i => (i.toLong, i % 8))
      .toDF("id", "part_key")
      .write.partitionBy("part_key").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim: FILE-backed with a selective filter that leaves ONE key of 8
    // (a local in-memory dim would constant-fold the filter away and DPP
    // sees no selective predicate to derive the pruning subquery from)
    val dimDir = java.nio.file.Files.createTempDirectory("dppdim").toString
    (0 until 8).map(i => (i, s"name$i")).toDF("part_key", "name")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("name") === "name3")
    val joined = fact.join(dim, Seq("part_key"))
    val n = recordsRead { assert(joined.count() === 5000L) }
    // the fact side must read ~1/8 of its rows (plus the 8 dim rows),
    // not the full 40k — generous 2x headroom on the pruned size
    assert(n <= 2 * 5000 + 16,
      s"DPP should prune to one partition; read $n records")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"plan should carry a dynamicpruning partition filter:\n$plan")
  }
}
