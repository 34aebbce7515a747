package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Watermark semantics with genuinely LATE data (SURVEY §2.11), across a
  * checkpointed restart — the canonical production shape: run 1 processes
  * on-time events and persists its watermark in the checkpoint; run 2
  * starts BEHIND that watermark, so its late event for an already-
  * finalized window is discarded, and the append-mode file sink holds only
  * the on-time aggregate. */
class WatermarkLateDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("v", LongType)))

  test("late events behind the checkpointed watermark are dropped") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_late").toString
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    def write(name: String, rows: Seq[(String, Long)]): Unit =
      rows.toDF("s", "v")
        .select(to_timestamp(col("s")).as("ts"), col("v"))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/$name")
    def runOnce(): Unit = {
      val agg = spark.readStream.schema(schema).parquet(s"$in/*")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(sum("v").as("total"))
        .select(date_format(col("window.start"), "HH:mm").as("h"),
          col("total"))
      val q = agg.writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    // run 1: on-time events in hours 10 and 13 → checkpointed watermark
    // = 13:30 − 1h = 12:30; the 10:00 window is already evictable
    write("f1", Seq(("2026-01-01 10:05:00", 1L), ("2026-01-01 10:20:00", 1L),
      ("2026-01-01 13:30:00", 1L)))
    runOnce()
    // run 2: a LATE event for the finalized 10:00 window + one for 14:00
    write("f2", Seq(("2026-01-01 10:40:00", 100L), ("2026-01-01 14:10:00", 1L)))
    runOnce()
    val rows = spark.read.schema("h STRING, total BIGINT").parquet(out)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the 10:00 window was emitted once, with ONLY the on-time rows; the
    // late v=100 event appears nowhere
    assert(rows.count(_._1 == "10:00") === 1, s"got ${rows.toSeq}")
    assert(rows.find(_._1 == "10:00").map(_._2) === Some(2L), s"got ${rows.toSeq}")
    assert(!rows.exists(_._2 >= 100L), s"late event leaked: ${rows.toSeq}")
  }
}
