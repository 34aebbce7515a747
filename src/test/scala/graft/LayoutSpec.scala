package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout operations: small-file compaction and sorted layout
  * for parquet row-group skipping. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def partFiles(dir: String): Int =
    new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))

  test("compact: many tiny part files rewrite into few, values intact") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_cmp_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_o").toString
    (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(50) // 50 tiny files, the streaming-ingest pathology
      .write.mode("overwrite").parquet(in)
    assert(partFiles(in) === 50)
    val parts = graft.sources.Layout.compact(spark, in, out,
      targetBytes = 512L << 10)
    assert(parts < 50, s"expected consolidation, got $parts parts")
    assert(partFiles(out) === parts)
    val a = spark.read.parquet(in).orderBy("id").collect()
    val b = spark.read.parquet(out).orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("sorted layout: pushed filter skips row groups (measured by " +
    "recordsRead, not claimed)") {
    import spark.implicits._
    val base = (1 to 200000).map(i =>
      ((i * 2654435761L) % 1000000, i.toLong)) // scattered key order
    val unsorted = java.nio.file.Files
      .createTempDirectory("graft_lay_u").toString
    val sorted = java.nio.file.Files
      .createTempDirectory("graft_lay_s").toString
    val df = base.toDF("k", "payload")
    df.repartition(4).write.mode("overwrite").parquet(unsorted)
    graft.sources.Layout.sortedWrite(df, sorted, "k", nParts = 4)
    def recordsReadOf(dir: String): Long = {
      val rows = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (t.taskMetrics != null)
            rows.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
          ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        spark.read.parquet(dir).filter(col("k") < 1000).count()
        Thread.sleep(1000) // listener bus is async
        rows.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val u = recordsReadOf(unsorted)
    val s = recordsReadOf(sorted)
    // every row group of the unsorted layout spans ~the full key range →
    // nothing skips; the sorted layout confines k<1000 to the first
    // range partition's first row group(s)
    assert(u >= 200000L, s"unsorted scan should read everything, read $u")
    assert(s < u / 2,
      s"sorted layout should skip most row groups: sorted=$s unsorted=$u")
    // same answer either way
    assert(spark.read.parquet(sorted).filter(col("k") < 1000).count() ===
      spark.read.parquet(unsorted).filter(col("k") < 1000).count())
  }

  test("z-order layout: pushed filters on EITHER dimension skip row " +
    "groups (measured by recordsRead); linear sort only prunes its " +
    "leading key") {
    import spark.implicits._
    // two independent scattered keys
    val base = (1 to 200000).map { i =>
      ((i * 2654435761L) % 1000000, (i * 40503L) % 999983, i.toLong)
    }
    val df = base.toDF("a", "b", "payload")
    val zdir = java.nio.file.Files.createTempDirectory("graft_lay_z").toString
    val ldir = java.nio.file.Files.createTempDirectory("graft_lay_l").toString
    graft.sources.Layout.zorderWrite(df, zdir, "a", "b", nParts = 16)
    graft.sources.Layout.sortedWrite(df, ldir, "a", nParts = 16)
    def recordsReadOf(dir: String,
                      pred: org.apache.spark.sql.Column): Long = {
      val rows = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (t.taskMetrics != null)
            rows.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
          ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        spark.read.parquet(dir).filter(pred).count()
        Thread.sleep(1000) // listener bus is async
        rows.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val total = 200000L
    val zReadA = recordsReadOf(zdir, col("a") < 1000)
    val zReadB = recordsReadOf(zdir, col("b") < 1000)
    val lReadB = recordsReadOf(ldir, col("b") < 1000)
    assert(zReadA < total / 2,
      s"z-order must prune on a: read $zReadA of $total")
    assert(zReadB < total / 2,
      s"z-order must prune on b: read $zReadB of $total")
    assert(lReadB >= total,
      s"linear sort on a cannot prune b (read $lReadB) — the gap z-order closes")
    // same answers as the unclustered truth
    assert(spark.read.parquet(zdir).filter(col("b") < 1000).count() ===
      df.filter(col("b") < 1000).count())
  }
}
