package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance operators: changelog→current-state upsert and
  * SCD type-2 (validity-interval) dimension builds.
  *
  * The reference engine regenerates whole datasets per step (HDFS text in,
  * HDFS text out — e.g. `core/processor/NormalizeModelProcessor.java`); a
  * 100 TB corpus can't be rewritten per ingest batch, so the engine needs
  * the two standard incremental-maintenance shapes:
  *
  *  - [[upsert]]: new-batch rows replace same-key rows of the prior
  *    snapshot (MERGE semantics, insert-or-replace subset). ONE full-outer
  *    shuffle join, co-partitioned on the key — at scale both sides hash
  *    to the same partitioning, and writing the result bucketed by the key
  *    (`sources.Bucketed`) makes every later upsert's join exchange-free
  *    on the snapshot side.
  *  - [[scd2]]: an append-only change log becomes validity intervals
  *    `[valid_from, valid_to)` via ONE key-partitioned `lead` window — no
  *    self-join, no global sort; each key's history sorts inside its own
  *    partition.
  */
object Snapshot {

  /** Upsert `delta` into `base` on `key`: delta rows win, unmatched rows
    * from both sides survive. Both inputs must share the non-key column
    * set `cols`. Emits `__src` = "delta" | "base" marking which side won
    * (auditable, mirrors MERGE's matched/not-matched actions). */
  def upsert(base: DataFrame, delta: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    val b = base.select(col(key) +: cols.map(c => col(c).as(s"__b_$c")): _*)
    // explicit presence marker, NOT per-column coalesce: a delta row with a
    // NULL attribute must still win whole-row (MERGE semantics), and a
    // delta row whose attrs are all NULL is still a delta row — per-column
    // coalesce would leak base values through NULLs on nullable changelogs
    val d = delta.select(col(key) +:
      (cols.map(c => col(c).as(s"__d_$c")) :+
        lit(true).as("__d_present")): _*)
    // full-outer on the key: one hash exchange per side, same partitioning
    val j = b.join(d, Seq(key), "full_outer")
    val dWon = col("__d_present").isNotNull
    val picked = cols.map(c =>
      when(dWon, col(s"__d_$c")).otherwise(col(s"__b_$c")).as(c))
    j.select(col(key) +: picked :+
      when(dWon, lit("delta")).otherwise(lit("base")).as("__src"): _*)
  }

  /** SCD2 build: each change-log row becomes a validity interval.
    * `orderCols` must totally order rows within a key (ties broken by the
    * caller's tiebreaker column) — `valid_to` is the NEXT row's
    * `validFrom` (exclusive), open intervals get `openEnd`. */
  def scd2(log: DataFrame, key: String, validFrom: Column,
      orderCols: Seq[Column], attrs: Seq[String],
      openEnd: Long = 253402300800000L): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    log.select(
      (col(key) +: attrs.map(col)) ++ Seq(
        validFrom.as("valid_from"),
        coalesce(lead(validFrom, 1).over(w), lit(openEnd)).as("valid_to"),
        when(lead(validFrom, 1).over(w).isNull, lit(1L)).otherwise(lit(0L))
          .as("is_current")): _*)
  }
}
