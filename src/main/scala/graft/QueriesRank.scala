package graft

import org.apache.spark.sql.functions._

/** Rank and association statistics: Spearman correlation (distributed
  * exact average ranks), chi-square / Cramér's V, mutual-information
  * feature ranking, and the built-in session_window streaming query.
  * These extend the reference's Pearson/KS/IV stats family
  * (`core/ColumnStatsCalculator.java`, `core/correlation/`) with the
  * standard rank/information-theoretic measures. */
object QueriesRank {
  import QueryUtil.li

  // ---- Spearman rank correlation -------------------------------------------

  /** Spearman rho of l_quantity vs l_extendedprice. The rank step never
    * sorts the corpus in one partition: [[graft.ops.Rank.avgRanks]] ranks
    * the DISTINCT-value table via range-repartitioned prefix sums (driver
    * offsets, the confusion-sweep pattern), then re-attaches through
    * size-gated broadcasts. Ranks are exact multiples of 0.5 in both
    * engines, so the only float divergence is the final moment sums —
    * absorbed by the 6-decimal round like q_correlation. */
  private val spearman: Q = Q(
    fn = (s, dir) =>
      graft.ops.Rank.spearman(li(s, dir), "l_quantity", "l_extendedprice"),
    oracle = Some(
      """WITH d AS (SELECT l_quantity::DOUBLE AS xv,
        |    l_extendedprice::DOUBLE AS yv FROM lineitem
        |    WHERE l_quantity IS NOT NULL
        |      AND l_extendedprice IS NOT NULL),
        |rn AS (SELECT xv, yv,
        |    row_number() OVER (ORDER BY xv) AS rnx,
        |    row_number() OVER (ORDER BY yv) AS rny FROM d),
        |r AS (SELECT avg(rnx) OVER (PARTITION BY xv) AS rx,
        |    avg(rny) OVER (PARTITION BY yv) AS ry FROM rn)
        |SELECT round((count(*) * sum(rx * ry) - sum(rx) * sum(ry))
        |    / sqrt((count(*) * sum(rx * rx) - sum(rx) * sum(rx))
        |         * (count(*) * sum(ry * ry) - sum(ry) * sum(ry))), 6) AS rho
        |FROM r
        |""".stripMargin))

  // ---- chi-square / Cramér's V ---------------------------------------------

  /** Chi-square independence + Cramér's V for c_mktsegment × c_nationkey.
    * One corpus-scan groupBy → bounded cell table; the expected grid
    * (margin cross join) materializes zero-observed cells so their
    * expected mass counts. Identical per-cell expression text in both
    * engines; 6-decimal round absorbs cell-order float drift. */
  private val chi2: Q = Q(
    fn = (s, dir) => graft.ops.Assoc.chiSquare(
      Tables.load(s, dir, "customer"), "c_mktsegment", "c_nationkey"),
    oracle = Some(
      """WITH o AS (SELECT c_mktsegment AS a, c_nationkey AS b,
        |    count(*)::DOUBLE AS n FROM customer
        |    WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
        |    GROUP BY 1, 2),
        |ma AS (SELECT a, sum(n) AS na FROM o GROUP BY a),
        |mb AS (SELECT b, sum(n) AS nb FROM o GROUP BY b),
        |t AS (SELECT sum(n) AS nt, count(DISTINCT a)::DOUBLE AS r,
        |      count(DISTINCT b)::DOUBLE AS c FROM o),
        |grid AS (SELECT ma.na, mb.nb, coalesce(o.n, 0.0) AS n,
        |      t.nt, t.r, t.c
        |    FROM ma CROSS JOIN mb CROSS JOIN t
        |    LEFT JOIN o ON o.a = ma.a AND o.b = mb.b)
        |SELECT
        |  round(sum((n - na * nb / nt) * (n - na * nb / nt)
        |    / (na * nb / nt)), 6) AS chi2,
        |  round(sqrt(sum((n - na * nb / nt) * (n - na * nb / nt)
        |      / (na * nb / nt))
        |    / (any_value(nt) * (least(any_value(r), any_value(c)) - 1.0))),
        |    6) AS cramers_v,
        |  CAST((any_value(r) - 1) * (any_value(c) - 1) AS BIGINT) AS dof
        |FROM grid
        |""".stripMargin))

  // ---- mutual-information feature ranking ----------------------------------

  private val miFeatures = Seq("l_quantity", "l_discount", "l_tax")
  private val miK = 10

  /** Equal-interval bin CASE with EXPLICIT (mn, mx) literals — identical
    * IEEE op order `mn + (mx - mn) * i / k` on both engines. */
  private def binArmSqls(v: String, mn: String, mx: String): String =
    (1 until miK).reverse
      .map(i => s"WHEN $v >= $mn + ($mx - $mn) * $i / $miK THEN $i")
      .mkString(" ")

  /** MI(binned feature; target) in nats for three numeric features — the
    * information-gain analog of the reference's IV ranking. ONE stacked
    * corpus scan feeds a (feature, bin, pos) cell groupBy; the MI windows
    * run over the bounded cell table only. Bin bounds come from one tiny
    * min/max agg, folded into the stacked CASE as literals. */
  private val mutualInfo: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val boundCols = miFeatures.flatMap(f =>
        Seq(min(col(f)).as(s"mn_$f"), max(col(f)).as(s"mx_$f")))
      val bounds = d.agg(boundCols.head, boundCols.tail: _*).head()
      def bnd(pfx: String, f: String): Double =
        bounds.getAs[Double](s"${pfx}_$f")
      val stackArgs = miFeatures
        .map(f => s"'$f', $f").mkString(", ")
      val stacked = d
        .withColumn("pos", when(QueryUtil.isPos, 1L).otherwise(0L))
        .selectExpr("pos",
          s"stack(${miFeatures.size}, $stackArgs) AS (feature, v)")
      val binCase = miFeatures.map { f =>
        // dlit: D-suffixed literals (a bare `0.1` parses as DECIMAL in
        // Spark SQL and the decimal boundary arithmetic diverges from
        // the oracle's IEEE-double math), non-finite bounds as casts
        val (mn, mx) =
          (QueryUtil.dlit(bnd("mn", f)), QueryUtil.dlit(bnd("mx", f)))
        s"WHEN feature = '$f' THEN (CASE ${binArmSqls("v", mn, mx)} ELSE 0 END)"
      }.mkString(" ")
      val cells = stacked
        .withColumn("bin", expr(s"CASE $binCase END"))
        .groupBy("feature", "bin", "pos")
        .agg(count(lit(1)).cast("double").as("n"))
      graft.ops.Assoc.mutualInfo(cells, "feature", "bin", "pos", "n")
    },
    oracle = Some {
      val boundsSel = miFeatures.flatMap(f => Seq(
        s"min($f)::DOUBLE AS mn_$f", s"max($f)::DOUBLE AS mx_$f"))
        .mkString(", ")
      val branches = miFeatures.map { f =>
        s"""SELECT '$f' AS feature,
           |  (CASE ${binArmSqls(f, s"mn_$f", s"mx_$f")} ELSE 0 END) AS bin,
           |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
           |FROM lineitem CROSS JOIN s""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s AS (SELECT $boundsSel FROM lineitem),
         |binned AS (
         |$branches),
         |cells AS (SELECT feature, bin, pos, count(*)::DOUBLE AS n
         |          FROM binned GROUP BY 1, 2, 3),
         |wins AS (SELECT feature, n,
         |    sum(n) OVER (PARTITION BY feature) AS nt,
         |    sum(n) OVER (PARTITION BY feature, bin) AS nx,
         |    sum(n) OVER (PARTITION BY feature, pos) AS ny
         |  FROM cells)
         |SELECT feature,
         |  round(sum((n / nt) * ln(n * nt / (nx * ny))), 6) AS mi_nats
         |FROM wins GROUP BY feature
         |""".stripMargin
    })

  // ---- built-in session_window streaming -----------------------------------

  /** `session_window` sessionization (events merge while gaps < 30 min);
    * oracle = the batch gap-island derivation with the SAME strict-<
    * merge rule (new session iff gap >= 30 min). */
  private val streamSessionWindow: Q = Q(
    fn = (s, dir) =>
      graft.streaming.StreamOps.sessionWindowCounts(s, dir),
    oracle = Some(
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS prev_ms
        |  FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT user_id, ms,
        |    sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms >= 1800000
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t)
        |SELECT user_id, min(ms) AS session_start_ms,
        |  count(*)::BIGINT AS n_events
        |FROM s GROUP BY user_id, sid
        |""".stripMargin))

  // ---- distributed percent rank --------------------------------------------

  /** PERCENT_RANK over the whole table WITHOUT the single-partition
    * `Window.orderBy` a naive spelling plans: [[graft.ops.Rank.rankCounts]]
    * ranks the distinct-value table (range-repartitioned prefix sums),
    * then re-attaches by value. Integer ppm output, identical op order
    * to the oracle's explicit (rank−1) arithmetic. */
  private val percentRank: Q = Q(
    fn = (s, dir) => {
      // percent-rank of a missing value is undefined: excluded, and
      // the (n-1) denominator counts only ranked rows (fuzz gate)
      val d = li(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("v"))
        .filter(col("v").isNotNull)
      val rc = graft.ops.Rank.rankCounts(d, "v")
      val n = d.count()
      d.join(graft.ops.PlanHints.gatedBroadcast(rc.select("v", "n_below")),
          Seq("v"))
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(lit(1e6) * col("n_below") / lit((n - 1).toDouble))
            .as("pr_ppm"))
    },
    oracle = Some(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(1e6 * (rank() OVER (ORDER BY l_extendedprice) - 1)
        |    / (count(*) OVER () - 1)) AS BIGINT) AS pr_ppm
        |FROM lineitem WHERE l_extendedprice IS NOT NULL
        |""".stripMargin))

  // ---- pairwise MI redundancy matrix (mRMR's second ingredient) ------------

  /** Pairwise mutual information between the binned features — the
    * REDUNDANCY matrix mRMR subtracts from q_mutual_info's relevance
    * vector ([[graft.ops.Assoc.mrmrOrder]] does the bounded greedy).
    * One stacked scan emits all pairs; MI windows over bounded cells. */
  private val miMatrix: Q = Q(
    fn = (s, dir) => {
      val k = 5
      val d = li(s, dir)
      val boundCols = miFeatures.flatMap(f =>
        Seq(min(col(f)).as(s"mn_$f"), max(col(f)).as(s"mx_$f")))
      val bounds = d.agg(boundCols.head, boundCols.tail: _*).head()
      def binExpr(f: String): String = {
        val mn = QueryUtil.dlit(bounds.getAs[Double](s"mn_$f"))
        val mx = QueryUtil.dlit(bounds.getAs[Double](s"mx_$f"))
        val arms = (1 until k).reverse
          .map(i => s"WHEN $f >= $mn + ($mx - $mn) * $i / $k THEN $i")
          .mkString(" ")
        s"(CASE $arms ELSE 0 END)"
      }
      val pairs = for {
        i <- miFeatures.indices; j <- (i + 1) until miFeatures.size
      } yield (miFeatures(i), miFeatures(j))
      val stackArgs = pairs.map { case (a, b) =>
        s"'$a|$b', ${binExpr(a)}, ${binExpr(b)}"
      }.mkString(", ")
      val cells = d
        .selectExpr(s"stack(${pairs.size}, $stackArgs) AS (pair, x, y)")
        .groupBy("pair", "x", "y")
        .agg(count(lit(1)).cast("double").as("n"))
      graft.ops.Assoc.mutualInfo(cells, "pair", "x", "y", "n")
    },
    oracle = Some {
      val k = 5
      val boundsSel = miFeatures.flatMap(f => Seq(
        s"min($f)::DOUBLE AS mn_$f", s"max($f)::DOUBLE AS mx_$f"))
        .mkString(", ")
      def binSql(f: String): String = {
        val arms = (1 until k).reverse
          .map(i => s"WHEN $f >= mn_$f + (mx_$f - mn_$f) * $i / $k THEN $i")
          .mkString(" ")
        s"(CASE $arms ELSE 0 END)"
      }
      val pairs = for {
        i <- miFeatures.indices; j <- (i + 1) until miFeatures.size
      } yield (miFeatures(i), miFeatures(j))
      val branches = pairs.map { case (a, b) =>
        s"""SELECT '$a|$b' AS pair, ${binSql(a)} AS x, ${binSql(b)} AS y
           |FROM lineitem CROSS JOIN s""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s AS (SELECT $boundsSel FROM lineitem),
         |binned AS (
         |$branches),
         |cells AS (SELECT pair, x, y, count(*)::DOUBLE AS n
         |          FROM binned GROUP BY 1, 2, 3),
         |wins AS (SELECT pair, n,
         |    sum(n) OVER (PARTITION BY pair) AS nt,
         |    sum(n) OVER (PARTITION BY pair, x) AS nx,
         |    sum(n) OVER (PARTITION BY pair, y) AS ny
         |  FROM cells)
         |SELECT pair,
         |  round(sum((n / nt) * ln(n * nt / (nx * ny))), 6) AS mi_nats
         |FROM wins GROUP BY pair
         |""".stripMargin
    })

  val all: Map[String, Q] = Map(
    "q_spearman"       -> spearman,
    "q_chi2"           -> chi2,
    "q_mutual_info"    -> mutualInfo,
    "q_stream_session_window" -> streamSessionWindow,
    "q_percent_rank"   -> percentRank,
    "q_mi_matrix"      -> miMatrix,
  )
}
