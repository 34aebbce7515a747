package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Temporal joins Spark's DataFrame API lacks as built-ins: point-in-time
  * (as-of) join and interval (range) join — both re-expressed as single-
  * shuffle declarative plans rather than the naive formulations that fall
  * over at 100 TB (per-event subquery probes, cartesian interval scans).
  */
object TemporalJoin {

  /** Point-in-time-correct as-of join: for every `left` row, attach the
    * `rightVals` columns of the LATEST `right` row with the same `key` and
    * `rightTs <= leftTs` (null columns when no prior right row exists —
    * the leakage-safe "state of the world at event time" join that feature
    * stores hand-roll).
    *
    * Plan: tag both sides, align schemas, UNION, then one window over
    * (key) ordered by (ts, side, tie) taking `last(value, ignoreNulls)`
    * up to the current row. That is ONE hash exchange on `key` — the same
    * shuffle any per-key op pays — instead of the per-left-row index probe
    * of the textbook formulation. No broadcast, no global sort, no
    * re-scan: at 100 TB the cost is the key-partitioned sort Spark would
    * run for any sessionization, and AQE handles a hot key's partition the
    * way it does every other skewed exchange. Per-key history is
    * inherently ordered state — a key's timeline cannot be split without
    * changing the semantics, which is the same contract sessionize has.
    *
    * Ties: a right row at exactly `leftTs` IS visible (`<=`); among right
    * rows sharing one timestamp the one with the greatest `rightTie`
    * wins, deterministically.
    *
    * `tolerance`: maximum staleness — a match further than `tolerance`
    * ticks from the event is nulled out (pandas `merge_asof` tolerance).
    * Applied AFTER selection, row-locally: the nearest match either is
    * within tolerance or there is no valid match at all.
    * `direction`: "backward" (default — latest right row at-or-before)
    * or "forward" (earliest right row at-or-after, e.g. next quote);
    * forward is the same single-shuffle window read in reverse order.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String,
               rightVals: Seq[String], rightTie: String,
               tolerance: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(rightVals.nonEmpty, "asOfJoin needs at least one value column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(tolerance.forall(_ >= 0), s"tolerance must be >= 0: $tolerance")
    val leftPayload = StructType(left.schema.fields)
    val rSchema = right.schema
    def rType(c: String) = rSchema(rSchema.fieldIndex(c)).dataType

    val backward = direction == "backward"
    // ALL carried values (the matched right row's own ts included, so
    // the tolerance cut can be applied row-locally after the fill)
    // travel as ONE struct: filling each column independently with
    // last(_, ignoreNulls) would backfill a NULL field of the latest
    // matching right row from an OLDER right row — a composite row
    // that never existed, violating the point-in-time contract. The
    // struct is null for left rows (skipped by ignoreNulls) and
    // non-null for every right row, even one whose fields are all null.
    val valsType = StructType(
      StructField("__mts", org.apache.spark.sql.types.LongType) +:
        rightVals.map(c => StructField(c, rType(c))))
    def asofField(c: String) = col("__asof").getField(c) // dot-safe names
    val l = left.select(
      key.map(col) ++ Seq(
        col(leftTs).cast("long").as("__ts"), lit(1).as("__side"),
        lit(null).cast(rType(rightTie)).as("__tie"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__row"),
        lit(null).cast(valsType).as("__vals")): _*)
    val r = right.select(
      key.map(col) ++ Seq(
        col(rightTs).cast("long").as("__ts"), lit(0).as("__side"),
        col(rightTie).as("__tie"),
        lit(null).cast(leftPayload).as("__row"),
        struct(col(rightTs).cast("long").as("__mts") +:
          rightVals.map(c => col(c).as(c)): _*).as("__vals")): _*)

    // backward: right (side 0) sorts before left at equal ts → `<=` holds,
    // and last() over the preceding frame picks the max-tie right row of a
    // tied group. forward is the mirror: left first at equal ts (side
    // desc), following frame, first() → earliest right at-or-after with
    // the MIN tie at a tied boundary instant.
    val w0 = Window.partitionBy(key.map(col): _*)
    val w =
      if (backward)
        w0.orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        w0.orderBy(col("__ts").asc, col("__side").desc, col("__tie").asc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val picked =
      if (backward) last(col("__vals"), ignoreNulls = true).over(w)
      else first(col("__vals"), ignoreNulls = true).over(w)
    val filled = l.unionByName(r).select(
      col("__side"), col("__ts"), col("__row"), picked.as("__asof"))
    val dist =
      if (backward) col("__ts") - asofField("__mts")
      else asofField("__mts") - col("__ts")
    def cut(c: Column): Column = tolerance match {
      case None      => c
      case Some(tol) => when(dist <= tol, c) // null dist → null (no match)
    }
    filled.filter(col("__side") === 1)
      .select(col("__row.*") +:
        rightVals.map(c => cut(asofField(c)).as(s"asof_$c")): _*)
  }

  /** Interval (range) join: every `points` row against every `intervals`
    * row whose `[lo, hi]` contains the point — IP-range lookups, incident
    * windows, validity intervals. Spark's own planner turns a bare
    * `p BETWEEN lo AND hi` join into BroadcastNestedLoop (fine only when
    * one side is tiny) or a cartesian product.
    *
    * The same rewrite is also available transparently for plain
    * `df.join(iv, p >= lo && p <= hi)` via the Catalyst rule
    * [[graft.plans.RangeJoinRewrite]] (register with
    * `spark.sql.extensions=graft.plans.GraftExtensions`); this explicit
    * form is for when the caller wants to pick the bucket width per join.
    *
    * Plan: quantize time into `bucket`-width cells. Each interval is
    * exploded to the cells it covers (`sequence(lo div b, hi div b)`), a
    * point lives in exactly ONE cell, and the join becomes an equi-join on
    * the cell id plus a residual `BETWEEN` filter — one hash shuffle keyed
    * by cell, executed as a plain SortMergeJoin. A point matches an
    * interval in exactly one cell (its own), so no post-join dedup is
    * needed. Cost knob: interval-side blowup is `width/bucket + 1` copies,
    * point side is never copied — pick `bucket` near the median interval
    * width. A hot cell (rush-hour pileup) is a plain skewed equi-join key,
    * which AQE's skew-join split already handles; nothing here serializes
    * through one task.
    */
  def rangeJoin(points: DataFrame, ptCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    // `div`, not `/`: Column./ is DOUBLE division, and ns-since-epoch
    // exceeds 2^53 — the cell id must come from exact integer arithmetic
    val iv = intervals.withColumn("__cell",
      explode(expr(s"sequence(`$loCol` div ${bucket}L, " +
        s"`$hiCol` div ${bucket}L)")))
    val pt = points.withColumn("__cell", expr(s"`$ptCol` div ${bucket}L"))
    pt.join(iv, pt("__cell") === iv("__cell") &&
        col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__cell")
  }

  /** Deterministic weighted sample without replacement: the top-`k` rows
    * per `group` under the A-ES key `u^(1/w)` (Efraimidis–Spirakis), with
    * `u ∈ (0,1)` derived from md5 of the id — reproducible across runs
    * AND re-computable by any engine with md5, so the draw is auditable.
    * P(doc in sample) ∝ weight for k=1 and approaches weighted inclusion
    * probabilities for larger k — the standard streaming weighted draw.
    *
    * Scale: `row_number().over(partitionBy(group))` would pull a hot
    * group's ENTIRE slice through one task; this uses the bounded
    * [[graft.agg.TopKAgg]] partial aggregate instead (map-side top-k, the
    * exchange moves `groups × k` rows — same shape as
    * [[graft.text.TextOps.domainTopK]]).
    */
  def weightedSample(df: DataFrame, group: Column, id: Column,
                     weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // (hex→long + 0.5) / 2^32 ∈ (0,1): exact integer arithmetic, so the
    // oracle reproduces u bit-for-bit from the same md5 prefix
    val u = (conv(substring(md5(id.cast("string").cast("binary")), 1, 8),
      16, 10).cast("double") + 0.5) / 4294967296.0
    // A-ES assumes w > 0; a non-positive or missing weight gets key 0
    // — never outranks a real item, never a division-by-zero crash
    // (fuzz gate: n_chars = 0), never the w<0 inversion that would
    // outrank everything (u^(1/w) = 1/u^(1/|w|) > 1)
    val w = weight.cast("double")
    val key = when(w > 0, pow(u, lit(1.0) / w)).otherwise(lit(0.0))
    df.select(group.as("grp"), key.as("aes_key"), id.as("id"))
      .groupBy("grp")
      .agg(graft.agg.TopKAgg.topK(k)(col("aes_key"), col("id")).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("grp"), (col("p") + 1).cast("int").as("rank"),
        col("t._2").as("id"), round(col("t._1"), 6).as("aes_key"))
  }
}
