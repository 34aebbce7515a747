package graft

import org.apache.spark.sql.functions._

import graft.agg.HistogramAgg
import graft.ops.DynamicBinning
import graft.sources.Delimited
import graft.streaming.StreamOps
import graft.train.Train

/** Ingestion, equal-population binning, dynamic rebin, training, and
  * streaming queries (SURVEY §2.1, §2.4, §2.11, §7.8). */
object QueriesExtra {
  import QueryUtil._

  // ---- §2.1 delimited text round trip with missing sentinels ---------------

  private val csvRoundtrip: Q = Q(
    fn = (s, dir) => {
      // write a '|'-delimited, schema-less, gzip'd extract with '?' as the
      // missing sentinel (reference RawSourceData defaults), read it back
      // all-string through the delimited scanner, and aggregate leniently
      val key = concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))
      val masked = li(s, dir).select(
        col("l_orderkey").cast("string").as("l_orderkey"),
        col("l_linenumber").cast("string").as("l_linenumber"),
        when(substring(md5(key.cast("binary")), 1, 1).isin("0", "1"),
          lit("?")).otherwise(col("l_quantity").cast("string"))
          .as("l_quantity"),
        col("l_returnflag"))
      val tmp = s"/tmp/graft_csv_${java.util.UUID.randomUUID()}"
      // spread before writing: gzip is unsplittable, so file count is both
      // the compression parallelism AND the read-back parallelism
      Delimited.write(masked.repartition(16), tmp, "|", gzip = true)
      val back = Delimited.read(s, tmp,
        "|", Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
      back.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("n_missing"),
        round(sum(expr("try_cast(l_quantity AS double)")), 4).as("sum_qty"),
        count_distinct(col("l_returnflag")).as("n_flags"))
    },
    oracle = Some(
      """WITH m AS (
        |  SELECT CASE WHEN substr(md5(cast(l_orderkey AS VARCHAR) || '|'
        |      || cast(l_linenumber AS VARCHAR)), 1, 1) IN ('0','1')
        |    THEN NULL ELSE l_quantity END AS qm, l_returnflag
        |  FROM lineitem)
        |SELECT count(*) AS n_rows,
        |  sum(CASE WHEN qm IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_missing,
        |  round(sum(qm), 4) AS sum_qty,
        |  count(DISTINCT l_returnflag) AS n_flags
        |FROM m
        |""".stripMargin))

  // ---- JSONL source round trip (training-data staple format) ---------------

  /** JSON-lines, the de-facto LLM-corpus interchange format (beyond the
    * reference's delimited-text/parquet surface): write the documents table
    * as JSONL, read it back through Spark's json source with an explicit
    * schema, and aggregate — losslessness (incl. text escaping) is checked
    * against the ORIGINAL table by the oracle. */
  private val jsonlRoundtrip: Q = Q(
    fn = (s, dir) => {
      val d = QueryUtil.docs(s, dir)
        .select("doc_id", "text", "lang", "source", "n_chars")
      val tmp = s"/tmp/graft_jsonl_${java.util.UUID.randomUUID()}"
      d.repartition(8).write.mode("overwrite").json(tmp)
      val back = s.read.schema(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .json(tmp)
      back.groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("sum_chars"),
          count_distinct(col("text")).as("n_texts"))
    },
    oracle = Some(
      """SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
        |  count(DISTINCT text) AS n_texts
        |FROM documents GROUP BY lang
        |""".stripMargin))

  // ---- §2.2 malformed-row guard + observe() counters -----------------------

  /** ~12.5% of rows get an extra trailing field in a text extract; the
    * guarded reader must drop exactly those (reference
    * `AddColumnNumAndFilterUDF.java:104-117`) while surfacing the count as
    * an `observe()` metric — no second scan. Oracle = aggregate over the
    * uncorrupted complement. */
  private val malformedGuard: Q = Q(
    fn = (s, dir) => {
      val key = md5(concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string")).cast("binary"))
      val corrupt = substring(key, 1, 1).isin("0", "1")
      val line = concat(
        concat_ws("|", col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"),
          col("l_quantity").cast("string"), col("l_returnflag")),
        when(corrupt, lit("|EXTRA")).otherwise(lit("")))
      val tmp = s"/tmp/graft_guard_${java.util.UUID.randomUUID()}"
      li(s, dir).select(line.as("value")).repartition(16)
        .write.mode("overwrite").text(tmp)
      // no Observation here: the query result is consumed lazily by the
      // driver, and an un-awaited Observation stays registered on the
      // shared session — its ObservationManager then poisons later task
      // closures ("Task not serializable" in MLlib fits). The observe()
      // counter path is exercised by Round2OpsSpec, which awaits obs.get.
      val back = graft.sources.Delimited.readGuarded(s, tmp, "|",
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
        None)
      back.agg(
        count(lit(1)).as("n_rows"),
        round(sum(expr("try_cast(l_quantity AS double)")), 4).as("sum_qty"),
        count_distinct(col("l_returnflag")).as("n_flags"))
    },
    oracle = Some(
      """SELECT count(*) AS n_rows, round(sum(l_quantity), 4) AS sum_qty,
        |  count(DISTINCT l_returnflag) AS n_flags
        |FROM lineitem
        |WHERE substr(md5(cast(l_orderkey AS VARCHAR) || '|'
        |  || cast(l_linenumber AS VARCHAR)), 1, 1) NOT IN ('0','1')
        |""".stripMargin))

  // ---- §2.4 equal-population (Native) binning via exact percentiles --------

  private val equalPopBins: Q = Q(
    fn = (s, dir) => {
      val qs = (1 until 10).map(_ / 10.0)
      li(s, dir)
        .select(percentile_approx(col("l_extendedprice"),
          array(qs.map(lit): _*), lit(Int.MaxValue)).as("bounds"))
        .select(posexplode(col("bounds")).as(Seq("q_idx", "b")))
        .select((col("q_idx") + 1).as("q_idx"), round(col("b"), 6).as("bound"))
    },
    oracle = Some {
      (1 until 10).map(i =>
        s"SELECT $i AS q_idx, round(quantile_disc(l_extendedprice, ${i / 10.0}), 6)" +
          s" AS bound FROM lineitem").mkString("\nUNION ALL ") + "\n"
    })

  // ---- §2.4 Munro-Paterson quantile-sketch binning (rows-only) -------------

  private val munroPatBins: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val agg = new graft.agg.MunroPatAgg(10)
      val bounds = li(s, dir)
        .select(col("l_extendedprice"))
        .as[Double]
        .select(agg.toColumn.name("bounds"))
        .head()
      bounds.zipWithIndex.map { case (b, i) => (i, b) }.toSeq
        .toDF("bin_idx", "bound")
    },
    oracle = None) // sketch is approximate by design; rows-only

  // ---- §2.4 SPDT streaming-histogram binning (scale path, rows-only) -------

  private val spdtBins: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val agg = new HistogramAgg(10, 100)
      val bounds = li(s, dir)
        .select(col("l_extendedprice"), lit(1.0))
        .as[(Double, Double)]
        .select(agg.toColumn.name("bounds"))
        .head()
      bounds.zipWithIndex.map { case (b, i) => (i, b) }.toSeq
        .toDF("bin_idx", "bound")
    },
    oracle = None) // approximate by design; driver records rows-only

  // ---- §2.4 dynamic rebin (two-phase small-bin merge, rows-only) -----------

  private val dynamicRebin: Q = Q(
    fn = (s, dir) => {
      val bins = DynamicBinning.rebin(li(s, dir), "l_quantity", isPos,
        fineK = 100, maxBins = 10)
      import s.implicits._
      bins.zipWithIndex.map { case (b, i) => (i, b.lo, b.pos, b.neg) }
        .toDF("bin_id", "lo", "cnt_pos", "cnt_neg")
    },
    oracle = None) // sequential greedy merge isn't SQL-expressible

  // ---- §7.8 MLlib training (capability parity, rows-only) ------------------

  private val trainLr: Q = Q(
    fn = (s, dir) => {
      val t = Train.logistic(li(s, dir),
        Seq("l_quantity", "l_discount", "l_tax"), isPos, maxIter = 10)
      import s.implicits._
      Seq(("logistic", math.rint(t.auc * 1000) / 1000,
        t.model.stages.length)).toDF("algo", "auc", "n_stages")
    },
    oracle = None) // iterative optimizer state isn't SQL-expressible

  // ---- §2.11 Structured Streaming windowed aggregation ---------------------

  private val streamWindow: Q = Q(
    fn = (s, dir) => StreamOps.tumblingCounts(s, dir),
    // the streaming result must equal the BATCH oracle — same SQL as
    // q_events_window
    oracle = Some(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2
        |""".stripMargin))

  // ---- §2.11 stateful streaming sessionization (mapGroupsWithState) --------

  private val streamSessionize: Q = Q(
    fn = (s, dir) => StreamOps.sessionizeStream(s, dir),
    // must equal the BATCH lag-window sessionize oracle
    oracle = Some(
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS prev_ms
        |  FROM events)
        |SELECT user_id,
        |  sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |      THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
        |  count(*) AS n_events
        |FROM t GROUP BY user_id
        |""".stripMargin))

  // ---- §2.11 streaming PSI drift monitor (train-frozen bins) ---------------

  private val streamPsi: Q = Q(
    fn = (s, dir) => StreamOps.psiWindows(s, dir),
    // streaming per-hour PSI must equal the batch formulation over the
    // same frozen equal-interval bins
    oracle = Some {
      val k = 10
      val arms = (1 until k).reverse
        .map(i => s"WHEN value >= mn + (mx - mn) * $i / $k THEN $i")
        .mkString("\n      ")
      s"""WITH mm AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
         |b AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M')
         |        AS hour_start,
         |      CASE WHEN value IS NULL THEN $k
         |      $arms
         |      ELSE 0 END AS bin_id
         |      FROM events, mm),
         |counts AS (SELECT hour_start, bin_id, count(*) AS c FROM b
         |           GROUP BY 1, 2),
         |wa AS (SELECT hour_start, bin_id,
         |         c::DOUBLE / sum(c) OVER (PARTITION BY hour_start) AS a
         |       FROM counts),
         |g AS (SELECT bin_id, count(*) AS gc FROM b GROUP BY bin_id),
         |e AS (SELECT bin_id, gc::DOUBLE / sum(gc) OVER () AS e FROM g)
         |SELECT hour_start, round(sum(
         |  CASE WHEN a > 0 AND e > 0 THEN (a - e) * ln(a / e) ELSE 0.0 END
         |  ), 6) AS psi
         |FROM wa JOIN e USING (bin_id) GROUP BY hour_start
         |""".stripMargin
    })

  // ---- §2.11 streaming exact dedup (dropDuplicates state) ------------------

  private val streamDedup: Q = Q(
    fn = (s, dir) => StreamOps.dedupCounts(s, dir),
    // streaming dedup must match the batch distinct-count oracle
    oracle = Some(
      """SELECT source, count(DISTINCT text) AS n_distinct_texts
        |FROM documents GROUP BY source
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_stream_dedup"      -> streamDedup,
    "q_stream_sessionize" -> streamSessionize,
    "q_stream_psi"        -> streamPsi,
    "q_munropat_bins"  -> munroPatBins,
    "q_csv_roundtrip"  -> csvRoundtrip,
    "q_jsonl_roundtrip" -> jsonlRoundtrip,
    "q_malformed"      -> malformedGuard,
    "q_equal_pop_bins" -> equalPopBins,
    "q_spdt_bins"      -> spdtBins,
    "q_dynamic_rebin"  -> dynamicRebin,
    "q_train_lr"       -> trainLr,
    "q_stream_window"  -> streamWindow,
  )
}
