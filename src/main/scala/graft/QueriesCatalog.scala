package graft

import org.apache.spark.sql.functions._

import graft.ops.StatsPipeline

/** The `shifu stats` catalog itself as an oracle-verified result set: one
  * row per candidate column with the ColumnStats fields the reference
  * persists to ColumnConfig.json (`container/obj/ColumnStats.java:37-142`)
  * — moments, quartiles, skewness/kurtosis, missing counts, and the
  * KS/IV metrics (count AND weighted duals) from the per-bin vectors.
  * Exercises `StatsPipeline.profileNumeric` end to end (both scans +
  * driver `StatsMath`), catalog-out. Weight column = l_quantity
  * (integer-valued, so the weighted sums stay bit-exact vs the oracle). */
object QueriesCatalog {
  import QueryUtil._

  private val cols = Seq("l_quantity", "l_discount", "l_tax")

  private val catalogStats: Q = Q(
    fn = (s, dir) => {
      val profiles = StatsPipeline.profileNumeric(li(s, dir), cols, isPos,
        weight = col("l_quantity"), pctAccuracy = Int.MaxValue, full = true)
      import s.implicits._
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      // undefined metrics surface as NaN, never a crash: extreme values
      // (1e300) overflow the moment sums to Inf, making stdDev — and so
      // skew/kurt — undefined (None); the oracle's raw-sum formulas
      // propagate the same NaN. The reference stores null in
      // ColumnStats for exactly these. (Fuzz gate: edge-mode None.get.)
      def g(o: Option[Double]) = r6(o.getOrElse(Double.NaN))
      cols.map { c =>
        val p = profiles(c)
        val st = p.stats
        (p.columnName, st.totalCount, st.missingCount,
          st.min.getOrElse(Double.NaN), st.max.getOrElse(Double.NaN),
          g(st.mean), g(st.stdDev),
          g(st.p25), g(st.median), g(st.p75),
          r6(st.missingPercentage),
          g(st.skewness), g(st.kurtosis),
          g(st.ks), g(st.iv),
          g(st.weightedKs), g(st.weightedIv),
          p.binning.binBoundary.length.toLong)
      }.toDF("column_name", "total_cnt", "missing_cnt", "min_v", "max_v",
        "mean_v", "std_v", "p25_v", "median_v", "p75_v", "miss_pct",
        "skew_v", "kurt_v", "ks", "iv", "w_ks", "w_iv", "n_bins")
    },
    oracle = Some {
      val k = binK
      val per = cols.map { c =>
        val arms = (1 until k).reverse
          .map(i => s"WHEN $c >= mn + (mx - mn) * $i / $k THEN $i")
          .mkString(" ")
        s"""SELECT '$c' AS column_name, total_cnt, missing_cnt, min_v, max_v,
           |  mean_v, std_v, p25_v, median_v, p75_v, miss_pct, skew_v,
           |  kurt_v, ks, iv, w_ks, w_iv, n_bins FROM (
           |WITH a AS (
           |  SELECT count($c) AS cnt,
           |    sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS miss,
           |    sum($c) AS s1, sum($c * $c) AS s2,
           |    sum($c * $c * $c) AS s3, sum($c * $c * $c * $c) AS s4,
           |    min($c) AS mn, max($c) AS mx,
           |    quantile_disc($c, 0.25) AS q1, quantile_disc($c, 0.5) AS q2,
           |    quantile_disc($c, 0.75) AS q3
           |  FROM lineitem),
           |b AS (
           |  SELECT CASE WHEN $c IS NULL THEN $k $arms ELSE 0 END AS bin_id,
           |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos,
           |    l_quantity AS w
           |  FROM lineitem, a),
           |bins AS (
           |  SELECT bin_id, sum(pos)::DOUBLE AS cp,
           |    (count(*) - sum(pos))::DOUBLE AS cn,
           |    sum(CASE WHEN pos = 1 THEN w ELSE 0.0 END) AS wp,
           |    sum(CASE WHEN pos = 1 THEN 0.0 ELSE w END) AS wn
           |  FROM b GROUP BY bin_id),
           |tot AS (SELECT sum(cp) AS sp, sum(cn) AS sn,
           |               sum(wp) AS swp, sum(wn) AS swn FROM bins),
           |r AS (
           |  SELECT bin_id, cp / sp AS p, cn / sn AS n,
           |    sum(cp / sp) OVER (ORDER BY bin_id) AS cump,
           |    sum(cn / sn) OVER (ORDER BY bin_id) AS cumn,
           |    wp / swp AS pw, wn / swn AS nw,
           |    sum(wp / swp) OVER (ORDER BY bin_id) AS cumpw,
           |    sum(wn / swn) OVER (ORDER BY bin_id) AS cumnw
           |  FROM bins, tot),
           |m AS (
           |  SELECT round(100 * max(abs(cump - cumn)), 6) AS ks,
           |    round(sum((p - n) * ln((p + 1e-10) / (n + 1e-10))), 6) AS iv,
           |    round(100 * max(abs(cumpw - cumnw)), 6) AS w_ks,
           |    round(sum((pw - nw) *
           |      ${lnSql("(pw + 1e-10) / (nw + 1e-10)")}), 6)
           |      AS w_iv
           |  FROM r),
           |d AS (
           |  SELECT s1 / cnt AS mr,
           |    sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)) AS sd FROM a)
           |SELECT cnt + miss AS total_cnt, miss AS missing_cnt,
           |  mn AS min_v, mx AS max_v,
           |  round(s1 / cnt, 6) AS mean_v,
           |  round(sd, 6) AS std_v,
           |  round(q1, 6) AS p25_v, round(q2, 6) AS median_v,
           |  round(q3, 6) AS p75_v,
           |  round(miss::DOUBLE / (cnt + miss), 6) AS miss_pct,
           |  round((s3 - 3 * s2 * mr + 3 * mr * mr * s1 - cnt * mr * mr * mr)
           |    / (cnt * sd * sd * sd), 6) AS skew_v,
           |  round((s4 - 4 * s3 * mr + 6 * s2 * mr * mr
           |      - 4 * s1 * mr * mr * mr + cnt * mr * mr * mr * mr)
           |    / (cnt * sd * sd * sd * sd), 6) AS kurt_v,
           |  ks, iv, w_ks, w_iv, ${k}::BIGINT AS n_bins
           |FROM a, m, d)""".stripMargin
      }.mkString("\nUNION ALL\n")
      per + "\n"
    })

  /** Categorical weighted duals (`profileCategorical` weight path): per
    * category the (count, weight) masses and the weighted WoE — the
    * reference carries both sets for categorical columns through
    * `UpdateBinningInfoReducer` exactly as for numeric. Integer
    * l_quantity weights keep the sums bit-exact; the missing bin (last)
    * is present-but-zero on this null-free column in BOTH engines. */
  private val weightedWoeCat: Q = Q(
    fn = (s, dir) => {
      val p = StatsPipeline.profileCategorical(li(s, dir),
        Seq("l_linestatus"), isPos, weight = col("l_quantity"))("l_linestatus")
      import s.implicits._
      val cats = p.binning.binCategory :+ "__missing__"
      cats.zipWithIndex.map { case (c, i) =>
        (c, p.binning.binCountPos(i), p.binning.binCountNeg(i),
          math.rint(p.binning.binWeightedPos(i) * 1e4) / 1e4,
          math.rint(p.binning.binWeightedNeg(i) * 1e4) / 1e4,
          math.rint(p.binning.binWeightedWoe(i) * 1e6) / 1e6)
      }.toDF("category", "cnt_pos", "cnt_neg", "w_pos", "w_neg", "w_woe")
    },
    oracle = Some(
      s"""WITH b AS (
         |  SELECT coalesce(l_linestatus, '__missing__') AS category,
         |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos,
         |    coalesce(l_quantity, 0.0) AS w
         |  FROM lineitem),
         |bins0 AS (
         |  SELECT category, sum(pos)::BIGINT AS cp,
         |    (count(*) - sum(pos))::BIGINT AS cn,
         |    sum(CASE WHEN pos = 1 THEN w ELSE 0.0 END) AS wp,
         |    sum(CASE WHEN pos = 1 THEN 0.0 ELSE w END) AS wn
         |  FROM b GROUP BY category
         |  UNION ALL SELECT '__missing__', 0, 0, 0.0, 0.0),
         |bins AS (
         |  SELECT category, sum(cp)::BIGINT AS cp, sum(cn)::BIGINT AS cn,
         |    sum(wp) AS wp, sum(wn) AS wn
         |  FROM bins0 GROUP BY category),
         |tot AS (SELECT sum(wp) AS swp, sum(wn) AS swn FROM bins)
         |SELECT category, cp AS cnt_pos, cn AS cnt_neg,
         |  round(wp, 4) AS w_pos, round(wn, 4) AS w_neg,
         |  round(${lnSql("(wp / swp + 1e-10) / (wn / swn + 1e-10)")}, 6)
         |    AS w_woe
         |FROM bins, tot
         |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_catalog_stats" -> catalogStats,
    "q_weighted_woe_cat" -> weightedWoeCat)
}
