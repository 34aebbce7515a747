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
        |  count(DISTINCT CASE WHEN l_returnflag IN ('', '?') THEN NULL
        |    ELSE l_returnflag END) AS n_flags
        |FROM m
        |""".stripMargin))

  // ---- §2.1 bzip2 text round trip ------------------------------------------

  /** Reference `RawSourceData` inputs may be .bz2 (Hadoop TextInputFormat
    * sniffs the codec); here: write the documents table as bzip2'd
    * delimited text, read it back through the same all-string scanner, and
    * aggregate. bzip2 is the SPLITTABLE codec — at 100 TB a .bz2 extract
    * still parallelizes by block, unlike gzip. */
  private val bz2Roundtrip: Q = Q(
    fn = (s, dir) => {
      val d = QueryUtil.docs(s, dir).select(
        col("doc_id").cast("string").as("doc_id"),
        col("lang"), col("source"),
        col("n_chars").cast("string").as("n_chars"))
      val tmp = s"/tmp/graft_bz2_${java.util.UUID.randomUUID()}"
      Delimited.write(d.repartition(8), tmp, "|", codec = Some("bzip2"))
      val back = Delimited.read(s, tmp, "|",
        Seq("doc_id", "lang", "source", "n_chars"))
      back.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(expr("try_cast(n_chars AS bigint)")).as("sum_chars"),
        count_distinct(col("source")).as("n_sources"))
    },
    oracle = Some(
      """SELECT CASE WHEN lang IN ('', '?') THEN NULL ELSE lang END
        |    AS lang,
        |  count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
        |  count(DISTINCT CASE WHEN source IN ('', '?') THEN NULL
        |    ELSE source END) AS n_sources
        |FROM documents GROUP BY 1
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
          // coalesce: concat_ws SKIPS nulls, which would shrink the
          // field count and mis-flag the row as malformed — a null
          // field writes as '' and round-trips back to null (sentinel)
          coalesce(col("l_quantity").cast("string"), lit("")),
          coalesce(col("l_returnflag"), lit(""))),
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
        |  count(DISTINCT CASE WHEN l_returnflag IN ('', '?') THEN NULL
        |    ELSE l_returnflag END) AS n_flags
        |FROM lineitem
        |WHERE substr(md5(cast(l_orderkey AS VARCHAR) || '|'
        |  || cast(l_linenumber AS VARCHAR)), 1, 1) NOT IN ('0','1')
        |""".stripMargin))

  // ---- §2.4 equal-population (Native) binning via exact percentiles --------

  private val equalPopBins: Q = Q(
    fn = (s, dir) => {
      // EXACT ranks, required for quantile_disc oracle parity — via the
      // DISTRIBUTED exact-quantile path (ops.ExactQuantiles: distinct-
      // value prefix sums; same values as percentile_approx(MaxInt)
      // bit-for-bit, without its O(distinct) single aggregation buffer)
      val qs = (1 until 10).map(_ / 10.0)
      val bounds = graft.ops.ExactQuantiles
        .quantilesAuto(li(s, dir), Seq("l_extendedprice"), qs)("l_extendedprice")
      import s.implicits._
      bounds.zipWithIndex
        .map { case (b, i) => (i + 1, math.rint(b * 1e6) / 1e6) }
        .toDF("q_idx", "bound")
    },
    oracle = Some {
      (1 until 10).map(i =>
        s"SELECT $i AS q_idx, round(quantile_disc(l_extendedprice, ${i / 10.0}), 6)" +
          s" AS bound FROM lineitem").mkString("\nUNION ALL ") + "\n"
    })

  // ---- §2.4 Munro-Paterson quantile-sketch binning (rows-only) -------------

  /** Sketch-boundary INVARIANT check: boundary VALUES are approximate by
    * design (no cross-engine parity possible), but their invariants aren't.
    * Emits the expected boundary count, strict monotonicity, the corpus
    * count re-derived by actually binning every row with the sketch bounds
    * (cross-checked by the oracle against `count(*)`), and a bin-balance
    * bound — so the sketch's whole contract is oracle-verified even though
    * its outputs can't be. */
  private def sketchInvariants(s: org.apache.spark.sql.SparkSession,
                               dir: String, bounds: Array[Double],
                               maxShare: Double) = {
    import s.implicits._
    val inc = bounds.toSeq.sliding(2).forall(p => p.length < 2 || p(0) < p(1))
    val counts = li(s, dir)
      .groupBy(graft.ops.Binning.binIndex(col("l_extendedprice"),
        bounds.toIndexedSeq).as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val total = counts.sum
    val shareOk = counts.max.toDouble / total <= maxShare
    Seq((bounds.length, if (inc) 1 else 0, total, if (shareOk) 1 else 0))
      .toDF("n_bounds", "increasing", "total_binned", "share_ok")
  }

  private def sketchOracle(nBounds: Int) = Some(
    s"""SELECT $nBounds AS n_bounds, 1 AS increasing,
       |  count(*) AS total_binned, 1 AS share_ok
       |FROM lineitem
       |""".stripMargin)

  private val munroPatBins: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val agg = new graft.agg.MunroPatAgg(10)
      val bounds = li(s, dir)
        .select(col("l_extendedprice"))
        .filter(col("l_extendedprice").isNotNull)
        .as[Double]
        .select(agg.toColumn.name("bounds"))
        .head()
      sketchInvariants(s, dir, bounds, maxShare = 0.35)
    },
    oracle = sketchOracle(10))

  // ---- §2.4 SPDT streaming-histogram binning (scale path) ------------------

  private val spdtBins: Q = Q(
    fn = (s, dir) => {
      val spark = s
      import spark.implicits._
      val agg = new HistogramAgg(10, 100)
      // the sketch sees VALUES; missing rows live in the missing bin
      // downstream (typed Double input NOT_NULL-asserts on null rows —
      // fuzz gate, nulls mode)
      val bounds = li(s, dir)
        .select(col("l_extendedprice"), lit(1.0))
        .filter(col("l_extendedprice").isNotNull)
        .as[(Double, Double)]
        .select(agg.toColumn.name("bounds"))
        .head()
      sketchInvariants(s, dir, bounds, maxShare = 0.35)
    },
    oracle = sketchOracle(10))

  // ---- §2.4 dynamic rebin (two-phase small-bin merge) ----------------------

  /** The greedy sequential merge isn't SQL-expressible, but its mass
    * conservation is: every pos/neg row lands in exactly one merged bin, so
    * the bin totals must equal the corpus totals (oracle-computed), the
    * merged bin count must respect maxBins, and the lows must be strictly
    * increasing. */
  private val dynamicRebin: Q = Q(
    fn = (s, dir) => {
      val bins = DynamicBinning.rebin(li(s, dir), "l_quantity", isPos,
        fineK = 100, maxBins = 10)
      import s.implicits._
      val inc = bins.map(_.lo).sliding(2)
        .forall(p => p.length < 2 || p(0) < p(1))
      Seq((if (bins.length <= 10) 1 else 0, if (inc) 1 else 0,
        bins.map(_.pos).sum, bins.map(_.neg).sum))
        .toDF("n_bins_ok", "lo_increasing", "total_pos", "total_neg")
    },
    oracle = Some(
      s"""SELECT 1 AS n_bins_ok, 1 AS lo_increasing,
         |  sum(CASE WHEN $posCond THEN 1 ELSE 0 END)::BIGINT AS total_pos,
         |  (count(*) - sum(CASE WHEN $posCond THEN 1 ELSE 0 END))::BIGINT
         |    AS total_neg
         |FROM lineitem WHERE l_quantity IS NOT NULL
         |""".stripMargin))

  // ---- §7.8 MLlib training (capability parity + invariants) ----------------

  /** Iterative optimizer state isn't SQL-expressible; the oracle-checkable
    * part is the training CONTRACT: the pipeline has its two stages, the
    * fit consumed every row (count cross-checked against the oracle's
    * identically-filtered count(*)), and the evaluator produced a proper
    * AUC in (0,1). Predictive power on separable fixtures is spec-asserted
    * (TrainDotSpec). One shared shape for all four algorithm families. */
  private val trainFeats = Seq("l_quantity", "l_discount", "l_tax")

  private def trainContract(algo: String, sampled: Boolean,
      fit: org.apache.spark.sql.DataFrame => Train.Trained): Q = Q(
    fn = (s, dir) => {
      val d = if (sampled) trainSample(li(s, dir)) else li(s, dir)
      val t = fit(d)
      import s.implicits._
      val cnts = d.agg(count(lit(1)),
        sum(when(isPos, 1L).otherwise(0L))).head()
      val n = cnts.getLong(0)
      val nPos = Option(cnts.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      // the STRICT 0 < auc < 1 claim ("the fit actually learned, and
      // not degenerately") needs both classes populated; a tiny or
      // one-class corpus (fuzz gate, tiny mode) can legitimately score
      // exactly 0/1 or NaN — there the contract relaxes to "bounded or
      // undefined", which is the honest statement about such input
      val strict = nPos >= 10 && (n - nPos) >= 10
      val ok =
        if (strict) t.auc > 0.0 && t.auc < 1.0
        else t.auc.isNaN || (t.auc >= 0.0 && t.auc <= 1.0)
      Seq((algo, if (ok) 1 else 0, t.model.stages.length, n))
        .toDF("algo", "auc_in_unit", "n_stages", "n_train")
    },
    oracle = Some(
      s"""SELECT '$algo' AS algo, 1 AS auc_in_unit, 2 AS n_stages,
         |  count(*) AS n_train
         |FROM lineitem${if (sampled) s" WHERE $trainSampleSql" else ""}
         |""".stripMargin))

  private val trainLr = trainContract("logistic", sampled = false,
    Train.logistic(_, trainFeats, isPos, maxIter = 10))

  /** Deterministic hash sample (md5 first hex digit ∈ `digits`) — the
    * reference trains on bagged subsamples, not the whole corpus, and the
    * oracle can mirror the filter exactly (q_hash_sample pattern). The
    * training CONTRACT queries use 2 digits (12.5%): iterative fits
    * dominate the bench and need rows only for a non-degenerate AUC. */
  private val trainDigits = Seq("0", "1")

  private def trainSample(d: org.apache.spark.sql.DataFrame) =
    d.filter(substring(md5(concat(col("l_orderkey").cast("string"), lit("|"),
      col("l_linenumber").cast("string")).cast("binary")), 1, 1)
      .isin(trainDigits: _*))

  // single-line ON PURPOSE: a leading "||" after interpolation into a
  // stripMargin oracle would lose a pipe to the margin stripper
  private val trainSampleSql =
    "substr(md5(cast(l_orderkey AS VARCHAR) || '|' || " +
      "cast(l_linenumber AS VARCHAR)), 1, 1) IN (" +
      trainDigits.map(d => s"'$d'").mkString(",") + ")"

  /** NN / SVM / DT training contracts (NN = the reference flagship
    * `ALGORITHM NN` → MultilayerPerceptronClassifier) — completing the
    * reference ALGORITHM enum's distributed members (NN, LR, SVM, DT, RF,
    * GBT; WDL → the [[Train.wideAndDeep]] composite below; TENSORFLOW is
    * an external-runtime shell-out in the reference — descoped, see
    * SURVEY §2.9). Predictive power is spec-asserted on separable
    * fixtures (TrainDotSpec). */
  private val trainNn = trainContract("mlp", sampled = true,
    Train.nn(_, trainFeats, isPos, hidden = Seq(5), maxIter = 15))

  // tree-ensemble trainers (ALGORITHM.RF / ALGORITHM.GBT) — the last two
  // distributed enum members without their own oracle-ledger queries
  private val trainRf = trainContract("rf", sampled = true,
    Train.randomForest(_, trainFeats, isPos, numTrees = 10, maxDepth = 4))
  private val trainGbt = trainContract("gbt", sampled = true,
    Train.gbt(_, trainFeats, isPos, maxIter = 5, maxDepth = 3))

  private val trainSvm = trainContract("svm", sampled = true,
    Train.svm(_, trainFeats, isPos, maxIter = 3))

  /** Wide-and-deep composite contract (reference `ALGORITHM.WDL`,
    * `core/dtrain/wdl/`): wide = hashed crosses of l_linestatus × a
    * bucketized quantity (the wdl bucket-cross recipe), deep = MLP over
    * the dense features, output = logistic over [wide ++ deep logit].
    * 5 total stages: deep (assembler+mlp) + wide (hasher+assembler+lr). */
  private val trainWdl: Q = Q(
    fn = (s, dir) => {
      val d = trainSample(li(s, dir))
        .withColumn("qb", floor(col("l_quantity") / 10).cast("string"))
      val t = Train.wideAndDeep(d, Seq("l_linestatus", "qb"), trainFeats,
        isPos, hidden = Seq(5), hashDim = 64, maxIter = 10)
      import s.implicits._
      // auc <= 1.0 INCLUSIVE: the memorization-friendly crossed features
      // can legitimately separate the training sample perfectly at small
      // SF — an exact 1.0 is a healthy model, not a contract failure
      Seq(("wdl", if (t.auc > 0.0 && t.auc <= 1.0) 1 else 0,
        t.deep.model.stages.length + t.wideModel.stages.length,
        d.count()))
        .toDF("algo", "auc_in_unit", "n_stages", "n_train")
    },
    oracle = Some(
      s"""SELECT 'wdl' AS algo, 1 AS auc_in_unit, 5 AS n_stages,
         |  count(*) AS n_train
         |FROM lineitem WHERE $trainSampleSql
         |""".stripMargin))

  private val trainDt = trainContract("dt", sampled = true,
    Train.decisionTree(_, trainFeats, isPos, maxDepth = 5))

  /** One-vs-rest multi-class (reference `MultipleClassification.ONEVSREST`,
    * `ModelTrainConf.java:54-58`): 3 quantity bands separated by wide gaps
    * make the per-class decision FULLY determined — trained on (q, q²) the
    * middle band is linearly separable (interval ⇔ parabola) with margin ≥5
    * units, so the fitted OvR model classifies every row correctly and the
    * confusion diagonal is oracle-computable as plain band counts. */
  private val multiclassOvr: Q = Q(
    fn = (s, dir) => {
      val d = trainSample(li(s, dir))
        .filter(col("l_quantity") <= 14 ||
          (col("l_quantity") >= 19 && col("l_quantity") <= 31) ||
          col("l_quantity") >= 36)
        .withColumn("band",
          when(col("l_quantity") <= 14, 0.0)
            .when(col("l_quantity") <= 31, 1.0).otherwise(2.0))
        // FEATURES are clamped to the modeled band range — the labels
        // above stay raw, and every clamped extreme keeps its band
        // (anything > 31 clamps to 100, still "≥ 36"-side separable).
        // Unclamped 1e300 features destroy LR convergence (fuzz gate);
        // clamping mirrors what a normalization stage does upstream.
        .withColumn("qc",
          least(greatest(col("l_quantity"), lit(-100.0)), lit(100.0)))
        .withColumn("q2", col("qc") * col("qc"))
      val pred = Train.oneVsRest(d, Seq("qc", "q2"), col("band"),
        maxIter = 15)
      pred.groupBy(col("label").cast("int").as("band"),
          col("prediction").cast("int").as("pred_band"))
        .agg(count(lit(1)).as("n"))
    },
    oracle = Some(
      s"""WITH b AS (
         |  SELECT CASE WHEN l_quantity <= 14 THEN 0
         |              WHEN l_quantity <= 31 THEN 1 ELSE 2 END AS band
         |  FROM lineitem
         |  WHERE (l_quantity <= 14 OR (l_quantity BETWEEN 19 AND 31)
         |     OR l_quantity >= 36)
         |    AND substr(md5(cast(l_orderkey AS VARCHAR) || '|' ||
         |      cast(l_linenumber AS VARCHAR)), 1, 1) IN ('0','1'))
         |SELECT band, band AS pred_band, count(*) AS n
         |FROM b GROUP BY band
         |""".stripMargin))

  // ---- §2.11 Structured Streaming windowed aggregation ---------------------

  private val streamWindow: Q = Q(
    fn = (s, dir) => StreamOps.tumblingCounts(s, dir),
    // the streaming result must equal the BATCH oracle — same SQL as
    // q_events_window
    oracle = Some(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
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
        |  FROM events WHERE ts IS NOT NULL)
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
      s"""WITH ok AS (SELECT * FROM events WHERE ts IS NOT NULL),
         |mm AS (SELECT min(value) AS mn, max(value) AS mx FROM ok),
         |b AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M')
         |        AS hour_start,
         |      CASE WHEN value IS NULL THEN $k
         |      $arms
         |      ELSE 0 END AS bin_id
         |      FROM ok, mm),
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
      // + the null-text slot: Spark's dropDuplicates keeps ONE row for
      // the null value (null == null in dedup state), while SQL's
      // count(DISTINCT) skips it
      """SELECT source, (count(DISTINCT text) +
        |    max(CASE WHEN text IS NULL THEN 1 ELSE 0 END))::BIGINT
        |    AS n_distinct_texts
        |FROM documents GROUP BY source
        |""".stripMargin))

  // ---- §2.11 streaming corpus quality gate ---------------------------------

  /** Stateless streaming filter decisions must equal the batch
    * corpusFilter rollup. */
  private val streamCorpusFilter: Q = Q(
    fn = (s, dir) => StreamOps.corpusFilterStream(s, dir),
    oracle = Some {
      val stopList = graft.text.TextOps.enStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH q AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    length(regexp_replace(text, ' ', '', 'g'))::DOUBLE
         |      / len(string_split(text, ' ')) AS mean_tok_len,
         |    round(len(list_filter(string_split(text, ' '),
         |        t -> t IN ($stopList)))::DOUBLE
         |      / len(string_split(text, ' ')), 6) AS stopword_ratio
         |  FROM documents),
         |r AS (
         |  SELECT doc_id,
         |    CASE WHEN n_tokens < 30 THEN 'too_short'
         |         WHEN mean_tok_len > 5.0 THEN 'long_tokens'
         |         WHEN stopword_ratio < 0.03 THEN 'low_stopwords'
         |         ELSE 'ok' END AS reason
         |  FROM q)
         |SELECT reason, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END)::BIGINT AS n_keep
         |FROM r GROUP BY reason
         |""".stripMargin
    })

  // ---- §2.11 streaming model scoring (frozen-model serving) ----------------

  private val streamScore: Q = Q(
    fn = (s, dir) => StreamOps.scoreStream(s, dir),
    // the streaming result must equal the BATCH formulation of the same
    // frozen model — row-local sigmoid is bit-exact IEEE in both engines
    oracle = Some(
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(floor(1.0 / (1.0 + exp(0.0 - (l_quantity * 0.08 +
        |      l_discount * -12.0 + -1.0))) * 10) AS INTEGER) AS band
        |  FROM lineitem)
        |SELECT l_returnflag, band, count(*) AS n
        |FROM s GROUP BY l_returnflag, band
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_stream_score"      -> streamScore,
    "q_stream_dedup"      -> streamDedup,
    "q_stream_corpus_filter" -> streamCorpusFilter,
    "q_stream_sessionize" -> streamSessionize,
    "q_stream_psi"        -> streamPsi,
    "q_munropat_bins"  -> munroPatBins,
    "q_csv_roundtrip"  -> csvRoundtrip,
    "q_bz2_roundtrip"  -> bz2Roundtrip,
    "q_jsonl_roundtrip" -> jsonlRoundtrip,
    "q_malformed"      -> malformedGuard,
    "q_equal_pop_bins" -> equalPopBins,
    "q_spdt_bins"      -> spdtBins,
    "q_dynamic_rebin"  -> dynamicRebin,
    "q_train_lr"       -> trainLr,
    "q_train_nn"       -> trainNn,
    "q_train_svm"      -> trainSvm,
    "q_train_dt"       -> trainDt,
    "q_train_rf"       -> trainRf,
    "q_train_gbt"      -> trainGbt,
    "q_train_wdl"      -> trainWdl,
    "q_multiclass_ovr" -> multiclassOvr,
    "q_stream_window"  -> streamWindow,
  )
}
