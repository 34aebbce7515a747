package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.Jexl
import graft.ops.{Binning, StatsMath}

/** Query registry: every implemented operator from SURVEY §2 (plus the
  * training-data-pipeline operators) gets one entry here, with a DuckDB
  * oracle where SQL-expressible.
  *
  * Determinism rules for oracle parity (driver hash-compares values):
  *  - integer outputs preferred (counts, ids, bin indices);
  *  - doubles only as (a) row-local arithmetic — bit-identical IEEE ops in
  *    both engines — or (b) small aggregates rounded to 6 decimals;
  *  - boundary arithmetic written with the SAME operation order in the
  *    Scala driver code and the oracle SQL text.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared helpers for query definitions. */
object QueryUtil {
  def li(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
  def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Positive tag for the synthetic "model": returned lines are the rare
    * class — mirrors Shifu's posTags/negTags target semantics
    * (`RawSourceData.java:91-96`). */
  val posCond = "l_returnflag = 'R'"
  def isPos: Column = col("l_returnflag") === "R"

  /** Row-local deterministic "model score" used by eval queries — pure IEEE
    * arithmetic on the row, bit-identical in Spark and DuckDB. */
  val scoreSql = "l_extendedprice * (1 - l_discount)"
  def scoreCol: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  val binK = 10

  /** Shared CASE-chain SQL for equal-interval bin index over l_quantity —
    * written with identical IEEE operation order as
    * `Binning.equalInterval` (mn + (mx-mn)*i/k). */
  def binCaseSql(k: Int): String = {
    val arms = (1 until k).reverse
      .map(i => s"WHEN l_quantity >= mn + (mx - mn) * $i / $k THEN $i")
      .mkString("\n      ")
    s"""CASE WHEN l_quantity IS NULL THEN $k
       |      $arms
       |      ELSE 0 END""".stripMargin
  }

  /** DuckDB mirror of [[graft.ops.Binning.longWeight]]: floor of the
    * clamped double, THEN the integer cast — identical op order, and
    * floor() sidesteps the truncate-vs-round cast divergence between
    * the engines. */
  def longWeightSql(c: String,
      bound: Double = 4.611686018427387904e18): String =
    s"""CAST(floor(CASE WHEN $c > $bound THEN $bound
       |  WHEN $c < -$bound THEN -$bound ELSE $c END) AS BIGINT)""".stripMargin

  /** 2^40 — mirror of [[graft.ops.Binning.MilsClamp]]. */
  val milsClamp: Double = 1099511627776.0

  /** Milli-unit measure of an event `value`, overflow-clamped the same
    * way in both engines (see Binning.longWeight). */
  def milsSql(c: String): String = longWeightSql(s"$c * 1000", milsClamp)

  /** Exact revenue measure: the row score in round-half-up 1e-4 units
    * (score is a product of two 2-decimal columns, so *10000 is
    * integer-valued up to one ulp), overflow-clamped at ±2^40 like
    * [[graft.ops.Binning.longWeight]]. Row-local identical IEEE op
    * order in both engines → identical longs → the SUM is exact
    * integer math with NO summation-order sensitivity. A plain
    * `round(sum(double), 2)` can flip its last digit when the true sum
    * sits within accumulated ulp of a .005 boundary (r16 fuzz,
    * skew x nulls: one hot-group revenue landed on 3082571.305). */
  def scoreTenthMilsCol: Column = {
    val x = scoreCol * lit(10000.0)
    val b = lit(milsClamp)
    floor(when(x > b, b).when(x < -b, -b).otherwise(x) + lit(0.5))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))
  }
  def scoreTenthMilsSql: String =
    s"""CAST(floor((CASE WHEN ($scoreSql) * 10000.0 > $milsClamp
       |  THEN $milsClamp
       |  WHEN ($scoreSql) * 10000.0 < -$milsClamp THEN -$milsClamp
       |  ELSE ($scoreSql) * 10000.0 END) + 0.5) AS BIGINT)""".stripMargin

  /** round(sum/1e4, 2) of [[scoreTenthMilsCol]] — the exact-revenue
    * rollup (sum as decimal(38,0) ↔ DuckDB HUGEINT, then one division
    * and round on the same double in both engines). */
  def revenueExact(c: Column): Column =
    round(sum(c).cast("double") / lit(10000.0), 2)
  def revenueExactSql: String =
    s"round(CAST(sum($scoreTenthMilsSql) AS DOUBLE) / 10000.0, 2)"

  /** Render a driver-collected double as a Spark-SQL DOUBLE literal.
    * The usual `s"${v}D"` form (D-suffixed so `0.1` doesn't parse as
    * DECIMAL) has no spelling for non-finite values — "InfinityD" /
    * "NaND" parse as column references and fail resolution (NaN gate).
    * Those render as string casts instead; downstream bin arithmetic
    * then degrades to NaN comparisons → ELSE arms, never a crash. */
  def dlit(v: Double): String =
    if (v.isNaN) "CAST('NaN' AS DOUBLE)"
    else if (v == Double.PositiveInfinity) "CAST('Infinity' AS DOUBLE)"
    else if (v == Double.NegativeInfinity) "CAST('-Infinity' AS DOUBLE)"
    else s"${v}D"

  /** DuckDB `ln` mirroring Scala/Java `math.log` (the engine's WoE/IV
    * driver math): DuckDB ERRORS on non-positive input where math.log
    * returns -Infinity (0) or NaN (negative). Weighted bin masses can
    * go negative under hostile weights (r16 fuzz, tiny+edge: negative
    * l_quantity), so every weighted-mass oracle ln goes through this.
    * A NULL argument also lands on the NaN arm — the driver math has
    * no null ratios, only 0/0 = NaN. */
  def lnSql(x: String): String =
    s"(CASE WHEN ($x) > 0 THEN ln($x) " +
      s"WHEN ($x) = 0 THEN '-Infinity'::DOUBLE " +
      s"ELSE 'NaN'::DOUBLE END)"

  /** Driver-side l_quantity equal-interval boundaries (matches binCaseSql). */
  def quantityBounds(d: DataFrame, k: Int): Seq[Double] = {
    val Array(mn, mx) = d
      .agg(min("l_quantity"), max("l_quantity")).head()
      .toSeq.map(_.asInstanceOf[Double]).toArray
    graft.ops.Binning.equalInterval(mn, mx, k)
  }
}

object Queries {
  import QueryUtil._

  // ---- §2.2 JEXL row filter -------------------------------------------------

  private val jexlFilter: Q = Q(
    fn = (s, dir) =>
      li(s, dir)
        .filter(Jexl.filter(
          "l_quantity > 45 and (l_returnflag == 'R' or l_discount >= 0.05)"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
    oracle = Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND (l_returnflag = 'R' OR l_discount >= 0.05)
        |""".stripMargin))

  // ---- §2.2 filter dry-run (`shifu test -filter`) ---------------------------

  /** Per-expression match counts over the whole table — the distributed
    * form of `ShifuTestProcessor.doFilterTest` (reference
    * `core/processor/ShifuTestProcessor.java:120-146` counts matches of
    * each JEXL filter over the first N records; the engine counts them all
    * in ONE aggregation pass with no row limit — same diagnostic, cluster
    * scale). The CLI verb (`graft.Cli test`) applies the reference's
    * first-N cap for interactive parity. */
  private val dryRunExprs = Seq(
    "l_quantity > 25",
    "l_returnflag == 'R' or l_discount >= 0.05",
    "l_tax < 0.03 and l_quantity <= 10")

  private val filterDryRun: Q = Q(
    fn = (s, dir) => {
      val aggs = count(lit(1)).as("n_records") +:
        dryRunExprs.zipWithIndex.map { case (e, i) =>
          coalesce(sum(Jexl.filter(e).cast("long")), lit(0L)).as(s"m_$i") }
      li(s, dir).agg(aggs.head, aggs.tail: _*)
    },
    oracle = Some(
      """SELECT count(*) AS n_records,
        |  coalesce(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END), 0)::BIGINT AS m_0,
        |  coalesce(sum(CASE WHEN l_returnflag = 'R' OR l_discount >= 0.05
        |                    THEN 1 ELSE 0 END), 0)::BIGINT AS m_1,
        |  coalesce(sum(CASE WHEN l_tax < 0.03 AND l_quantity <= 10
        |                    THEN 1 ELSE 0 END), 0)::BIGINT AS m_2
        |FROM lineitem
        |""".stripMargin))

  // ---- §2.4 moment sums / basic column stats -------------------------------

  private val statsCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private val statsMoments: Q = {
    val stackExpr = "stack(" + statsCols.length + ", " +
      statsCols.map(c => s"'$c', $c").mkString(", ") + ") as (col_name, v)"
    Q(
      fn = (s, dir) =>
        li(s, dir)
          .select(expr(stackExpr))
          .groupBy("col_name")
          .agg(
            count(col("v")).as("cnt"),
            round(sum(col("v")), 4).as("sum_v"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"),
            round(sum(col("v")) / count(col("v")), 6).as("mean_v"),
            round(sqrt((sum(col("v") * col("v")) -
              sum(col("v")) * sum(col("v")) / count(col("v"))) /
              (count(col("v")) - 1)), 6).as("std_v")),
      oracle = Some {
        val union = statsCols
          .map(c => s"SELECT '$c' AS col_name, $c AS v FROM lineitem")
          .mkString("\nUNION ALL ")
        s"""WITH u AS ($union)
           |SELECT col_name, count(v) AS cnt, round(sum(v), 4) AS sum_v,
           |  min(v) AS min_v, max(v) AS max_v,
           |  round(sum(v)/count(v), 6) AS mean_v,
           |  round(sqrt((sum(v*v) - sum(v)*sum(v)/count(v))/(count(v)-1)), 6) AS std_v
           |FROM u GROUP BY col_name
           |""".stripMargin
      })
  }

  // ---- §2.4 equal-interval binning + per-bin pos/neg counts ----------------

  private val equalIntervalBins: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val Array(mn, mx) = d
        .agg(min("l_quantity"), max("l_quantity")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val bounds = Binning.equalInterval(mn, mx, binK)
      Binning.binCounts(d, "l_quantity", bounds, isPos)
        .select(col("bin_id"), col("cnt_pos"), col("cnt_neg"))
    },
    oracle = Some(
      s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem),
         |b AS (
         |  SELECT ${binCaseSql(binK)} AS bin_id,
         |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
         |  FROM lineitem, mm)
         |SELECT bin_id, sum(pos)::BIGINT AS cnt_pos,
         |  (count(*) - sum(pos))::BIGINT AS cnt_neg
         |FROM b GROUP BY bin_id
         |""".stripMargin))

  // ---- §2.4 KS / IV / WoE (ColumnStatsCalculator port) ---------------------

  private val woeIvKs: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val Array(mn, mx) = d
        .agg(min("l_quantity"), max("l_quantity")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val bounds = Binning.equalInterval(mn, mx, binK)
      val counts = Binning.binCounts(d, "l_quantity", bounds, isPos)
        .select("bin_id", "cnt_pos", "cnt_neg")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      // dense bin vector 0..k (missing-last convention)
      val pos = Array.fill(binK + 1)(0.0)
      val neg = Array.fill(binK + 1)(0.0)
      counts.foreach { case (b, p, n) => pos(b) = p.toDouble; neg(b) = n.toDouble }
      val m = StatsMath.columnMetrics(neg.toSeq, pos.toSeq).get
      import s.implicits._
      Seq((math.rint(m.ks * 1e6) / 1e6, math.rint(m.iv * 1e6) / 1e6,
        math.rint(m.woe * 1e6) / 1e6))
        .toDF("ks", "iv", "woe")
    },
    oracle = Some(
      s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem),
         |b AS (
         |  SELECT ${binCaseSql(binK)} AS bin_id,
         |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
         |  FROM lineitem, mm),
         |bins AS (
         |  SELECT bin_id, sum(pos)::DOUBLE AS cp, (count(*) - sum(pos))::DOUBLE AS cn
         |  FROM b GROUP BY bin_id),
         |tot AS (SELECT sum(cp) AS sp, sum(cn) AS sn FROM bins),
         |r AS (
         |  SELECT bin_id, cp / sp AS p, cn / sn AS n,
         |    sum(cp / sp) OVER (ORDER BY bin_id) AS cump,
         |    sum(cn / sn) OVER (ORDER BY bin_id) AS cumn
         |  FROM bins, tot)
         |SELECT
         |  round(100 * max(abs(cump - cumn)), 6) AS ks,
         |  round(sum((p - n) * ln((p + 1e-10) / (n + 1e-10))), 6) AS iv,
         |  round((SELECT ln((sp + 1e-10) / (sn + 1e-10)) FROM tot), 6) AS woe
         |FROM r
         |""".stripMargin))

  // ---- §2.8 z-score normalize (aggregate histogram check) ------------------

  private val zscoreHist: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val agg = d.agg(
        count(col("l_extendedprice")).as("cnt"),
        sum(col("l_extendedprice")).as("s1"),
        sum(col("l_extendedprice") * col("l_extendedprice")).as("s2"))
      val z = d.crossJoin(agg)
        .withColumn("mean", col("s1") / col("cnt"))
        .withColumn("std", sqrt((col("s2") - col("s1") * col("s1") / col("cnt"))
          / (col("cnt") - 1)))
        .withColumn("z", least(greatest(
          (col("l_extendedprice") - col("mean")) / col("std"), lit(-6.0)), lit(6.0)))
      z.groupBy(round(col("z"), 1).as("z_bucket"))
        .agg(count(lit(1)).as("cnt"))
    },
    oracle = Some(
      s"""WITH a AS (
         |  SELECT count(l_extendedprice) AS cnt, sum(l_extendedprice) AS s1,
         |         sum(l_extendedprice * l_extendedprice) AS s2
         |  FROM lineitem),
         |z AS (
         |  SELECT least(greatest(
         |    (l_extendedprice - s1 / cnt) /
         |      sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), -6.0), 6.0) AS zv
         |  FROM lineitem, a)
         |SELECT round(zv, 1) + 0 AS z_bucket, count(*) AS cnt
         |FROM z GROUP BY 1
         |""".stripMargin))

  // ---- dedup: exact (hash-groupBy) -----------------------------------------

  private val dedupExact: Q = Q(
    fn = (s, dir) =>
      docs(s, dir)
        .groupBy("text")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select("doc_id", "dup_cnt"),
    oracle = Some(
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt
        |FROM documents GROUP BY text
        |""".stripMargin))

  // ---- text analysis: token counting ---------------------------------------

  private val tokenCount: Q = Q(
    fn = (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        // BPE-ish pre-tokenizer count (GPT2-style regex, ASCII approx) —
        // the token-budget estimate an LLM-corpus pipeline actually needs
        size(regexp_extract_all(col("text"),
          lit(graft.text.TextOps.bpeTokenRegex), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_m")),
    oracle = Some(
      s"""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         |  len(regexp_extract_all(text,
         |    '${graft.text.TextOps.bpeTokenRegex.replace("'", "''")}'))
         |    AS n_bpe_tokens,
         |  length(text) AS n_chars_m
         |FROM documents
         |""".stripMargin))

  // ---- registry ------------------------------------------------------------

  val all: Map[String, Q] = Map(
    "q_jexl_filter"    -> jexlFilter,
    "q_filter_dryrun"  -> filterDryRun,
    "q_stats_moments"  -> statsMoments,
    "q_bin_counts"     -> equalIntervalBins,
    "q_woe_iv_ks"      -> woeIvKs,
    "q_zscore_hist"    -> zscoreHist,
    "q_dedup_exact"    -> dedupExact,
    "q_token_count"    -> tokenCount,
  ) ++ QueriesEval.all ++ QueriesText.all ++ QueriesSim.all ++
    QueriesEvents.all ++ QueriesScore.all ++ QueriesNorm.all ++
    QueriesMisc.all ++ QueriesExtra.all ++ QueriesEval2.all ++
    QueriesWeighted.all ++ QueriesHybrid.all ++ QueriesBinning2.all ++
    QueriesPipeline.all ++ QueriesCatalog.all ++ QueriesTemporal.all ++
    QueriesR8.all ++ QueriesR8b.all ++ QueriesR8c.all ++ QueriesOlap.all ++
    QueriesRank.all ++ QueriesValidate.all ++ QueriesSeries.all ++
    QueriesCluster.all ++ QueriesTpch.all ++ QueriesGovern.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.view.mapValues(_.fn).toMap

  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
