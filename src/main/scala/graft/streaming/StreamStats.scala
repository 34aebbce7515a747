package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.ColumnProfile
import graft.ops.{StatsMerge, StatsPipeline}

/** Streaming incremental catalog maintenance — the streaming face of the
  * batch incremental path (`ops.StatsMerge` + `profileNumeric
  * (boundsOverride)`): each micro-batch is profiled against the FROZEN
  * catalog boundaries and merged into the running catalog, so a
  * continuously-ingesting 100 TB corpus keeps live column stats without
  * ever re-profiling history.
  *
  * Scale shape: per batch, the work is the same two-scan profile the
  * batch `stats` step runs — moments as one wide aggregate, bin duals as
  * one stacked groupBy with map-side combine — over ONLY the new rows;
  * the merge is driver math over the bounded per-column count vectors.
  * Counts/bin duals add exactly, KS/IV/WoE recompute from merged counts
  * (bit-equal to profiling the union, proven by Round8bOpsSpec and the
  * q_stream_stats contracts). State is the bounded catalog itself —
  * nothing accumulates in stream state stores.
  */
object StreamStats {

  /** Start a foreachBatch maintenance query over `stream`. Returns the
    * running query and a reader for the current merged catalog (safe to
    * call after `processAllAvailable()` / `awaitTermination`). Batches
    * are profiled with the frozen `bounds`; empty micro-batches are
    * skipped (profiling an empty frame would make degenerate min/max). */
  def maintainNumeric(stream: DataFrame, cols: Seq[String], isPos: Column,
                      bounds: Map[String, Seq[Double]])
      : (StreamingQuery, () => Map[String, ColumnProfile]) = {
    val (q, get, _) = maintainNumericCounted(stream, cols, isPos, bounds)
    (q, get)
  }

  /** Streaming heavy-hitters maintenance: per micro-batch, one bounded
    * Misra-Gries aggregation (≤ k counters per task) collects a ≤ k-entry
    * sketch to the driver, which folds it into the running sketch with
    * the PODS'12 merge — so "top domains / tokens of the ingest, live"
    * costs O(k) driver state and never a distinct-value shuffle. The MG
    * bound survives arbitrary batching because the sketch is mergeable:
    * est ∈ [true − n/(k+1), true] over everything streamed so far. */
  def maintainTopK(stream: DataFrame, item: Column, k: Int)
      : (StreamingQuery, () => Seq[(String, Long)]) = {
    val mg = new graft.agg.MisraGries(k)
    val acc = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, Long])
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sk = batch.filter(item.isNotNull)
          .agg(graft.agg.MisraGries.sketch(k)(item).as("hh"))
          .select(org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.col("hh")).as("e"))
          .select("e._1", "e._2")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        acc.updateAndGet(m => mg.merge(m, sk))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    (q, () => mg.finish(acc.get()))
  }

  /** Streaming distinct-count maintenance: per micro-batch, one bounded
    * HLL aggregation collects the 2^p register bytes to the driver,
    * which folds them into the running registers with register-wise max
    * — "how many distinct users/tokens/urls has the ingest seen, live"
    * costs O(2^p) driver state (16 KiB at p=14) and never a
    * distinct-value shuffle. Register max is order- and batching-
    * independent, so the running estimate equals a one-shot sketch over
    * everything streamed so far BIT-EXACTLY. */
  def maintainDistinct(stream: DataFrame, value: Column,
                       p: Int = graft.agg.Hll.DefaultP)
      : (StreamingQuery, () => Array[Byte], () => Double) = {
    val acc = new java.util.concurrent.atomic.AtomicReference(
      new Array[Byte](1 << p))
    val agg = graft.agg.Hll.sketchAgg(p)
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val r = batch.agg(agg(value)).head()
        if (!r.isNullAt(0)) {
          val sk = r.getAs[Array[Byte]](0)
          acc.updateAndGet(m => graft.agg.Hll.merge(m, sk))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    (q, () => acc.get(), () => graft.agg.Hll.estimate(acc.get()))
  }

  /** As [[maintainNumeric]], additionally exposing the count of non-empty
    * micro-batches folded in — for the multi-batch contract check. */
  def maintainNumericCounted(stream: DataFrame, cols: Seq[String],
                             isPos: Column,
                             bounds: Map[String, Seq[Double]])
      : (StreamingQuery, () => Map[String, ColumnProfile], () => Int) = {
    val acc = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, ColumnProfile])
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // count replaces the isEmpty probe (same one cheap action) and
        // derives the bin-count shuffle width — AQE is off inside
        // foreachBatch, so the groupBy otherwise keeps the full
        // configured width however small the micro-batch is
        val n = batch.count()
        if (n > 0) {
          val p = graft.ops.Spread.withBatchWidth(batch.sparkSession, n) {
            StatsPipeline.profileNumeric(
              batch, cols, isPos, boundsOverride = Some(bounds))
          }
          batches.incrementAndGet()
          acc.updateAndGet { m =>
            if (m.isEmpty) p
            else p.map { case (c, prof) => c -> StatsMerge.merge(m(c), prof) }
          }
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    (q, () => acc.get(), () => batches.get())
  }
}
