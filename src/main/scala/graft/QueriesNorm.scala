package graft

import org.apache.spark.sql.functions._

import graft.ops.{Binning, Normalize, StatsPipeline}

/** Normalize-family queries (SURVEY §2.8) driven by the stats-built catalog
  * — the `stats → ColumnConfig → norm` lifecycle end to end. */
object QueriesNorm {
  import QueryUtil._

  /** Oracle CTE producing per-bin WoE for l_quantity (matches
    * StatsPipeline.profileNumeric + StatsMath.columnMetrics). */
  private val qtyWoeCte =
    s"""mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
       |       FROM lineitem),
       |b AS (SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
       |        ${binCaseSql(binK)} AS bin_id,
       |        CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
       |      FROM lineitem, mm),
       |tot AS (SELECT sum(pos)::DOUBLE AS sp,
       |               (count(*) - sum(pos))::DOUBLE AS sn FROM b),
       |qw AS (SELECT bin_id,
       |         ln((sum(pos) / sp + 1e-10)
       |            / ((count(*) - sum(pos)) / sn + 1e-10)) AS woe
       |       FROM b, tot GROUP BY bin_id, sp, sn)""".stripMargin

  // ---- WOE normalize (numeric + categorical) -------------------------------

  private val normWoe: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val num = StatsPipeline.profileNumeric(d, Seq("l_quantity"), isPos)
      val cat = StatsPipeline.profileCategorical(d, Seq("l_returnflag"), isPos)
      val q = num("l_quantity"); val r = cat("l_returnflag")
      d.select(col("l_orderkey"), col("l_linenumber"),
        round(Normalize.woeNumeric(col("l_quantity"),
          q.binning.binBoundary, q.binning.binCountWoe), 6).as("woe_qty"),
        round(Normalize.woeCategorical(col("l_returnflag"),
          r.binning.binCategory, r.binning.binCountWoe), 6).as("woe_rf"))
    },
    oracle = Some(
      s"""WITH $qtyWoeCte,
         |cw AS (SELECT l_returnflag,
         |         ln((sum(pos) / sp + 1e-10)
         |            / ((count(*) - sum(pos)) / sn + 1e-10)) AS woe
         |       FROM b, tot GROUP BY l_returnflag, sp, sn)
         |SELECT b.l_orderkey, b.l_linenumber,
         |  round(qw.woe, 6) AS woe_qty, round(cw.woe, 6) AS woe_rf
         |FROM b JOIN qw USING (bin_id)
         |JOIN cw ON b.l_returnflag IS NOT DISTINCT FROM cw.l_returnflag
         |""".stripMargin))

  // ---- ZSCALE_ONEHOT: numeric z-score + categorical one-hot ----------------

  private val normOnehot: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      // FROZEN category list (production normalize runs against the
      // training-time catalog): the one-hot schema is fixed at k+1
      // columns and any unseen/hostile category folds into the missing
      // slot — a data-dependent column set would be a moving schema
      val cat = StatsPipeline.profileCategorical(d, Seq("l_returnflag"),
        isPos, categoriesOverride =
          Some(Map("l_returnflag" -> Seq("A", "N", "R"))))
      val cats = cat("l_returnflag").binning.binCategory
      val oh = Normalize.oneHot(col("l_returnflag"), cats)
        .zipWithIndex.map { case (c, i) => c.as(s"rf_$i") }
      val st = StatsPipeline.numericStats(d, Seq("l_extendedprice"))("l_extendedprice")
      val z = round(Normalize.zscore(col("l_extendedprice"), st.mean,
        st.stdDev), 3).as("z_price")
      d.select(Seq(col("l_orderkey"), col("l_linenumber"), z) ++ oh: _*)
    },
    oracle = Some {
      // categories are A,N,R lexicographically (profileCategorical sorts)
      val cats = Seq("A", "N", "R")
      val oh = cats.zipWithIndex.map { case (c, i) =>
        s"CASE WHEN l_returnflag = '$c' THEN 1 ELSE 0 END AS rf_$i"
      }.mkString(",\n  ")
      val missing = s"CASE WHEN l_returnflag IS NULL OR NOT l_returnflag IN " +
        s"(${cats.map(c => s"'$c'").mkString(",")}) THEN 1 ELSE 0 END AS rf_3"
      s"""WITH a AS (SELECT count(l_extendedprice) AS cnt,
         |    sum(l_extendedprice) AS s1,
         |    sum(l_extendedprice * l_extendedprice) AS s2 FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         |  round(CASE WHEN l_extendedprice IS NULL THEN 0.0
         |    WHEN isnan(sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)))
         |      OR isinf(sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)))
         |      OR sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)) = 0
         |      OR isinf(s1 / cnt) THEN 0.0
         |    ELSE least(greatest(
         |    (l_extendedprice - s1 / cnt)
         |      / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), -6.0), 6.0) END, 3)
         |    + 0 AS z_price,
         |  $oh,
         |  $missing
         |FROM lineitem, a
         |""".stripMargin
    })

  // ---- WOE_ZSCORE: z-scale the woe-mapped values ---------------------------

  /** WOE then z-score of the woe distribution (reference
    * `Normalizer.java:250-253` woeZScoreNormalize): woe per bin from the
    * counts, woe-mean/std from the bin vector (Σcnt·woe / n — tiny exact
    * loops both sides, bin order fixed), per-row z clamped and rounded. */
  private val normWoeZ: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val prof = StatsPipeline.profileNumeric(d, Seq("l_quantity"), isPos)("l_quantity")
      val woes = prof.binning.binCountWoe.map(w => math.rint(w * 1e6) / 1e6)
      val cnts = prof.binning.binCountPos.zip(prof.binning.binCountNeg)
        .map { case (p, n) => p + n }
      val n = cnts.sum.toDouble
      val mean = woes.zip(cnts).map { case (w, c) => w * c }.sum / n
      val s2 = woes.zip(cnts).map { case (w, c) => w * w * c }.sum
      val std = math.sqrt((s2 - mean * mean * n) / (n - 1))
      val woeCol = Normalize.woeNumeric(col("l_quantity"),
        prof.binning.binBoundary, woes)
      d.select(col("l_orderkey"), col("l_linenumber"),
        round(least(greatest((woeCol - lit(mean)) / lit(std), lit(-6.0)),
          lit(6.0)), 3).as("woe_z"))
    },
    oracle = Some(
      s"""WITH $qtyWoeCte,
         |qw6 AS (SELECT bin_id, round(woe, 6) AS woe,
         |          (SELECT count(*) FROM b bb WHERE bb.bin_id = qw.bin_id)
         |            AS cnt
         |        FROM qw),
         |ms AS (SELECT sum(woe * cnt) / sum(cnt) AS mean,
         |         sqrt((sum(woe * woe * cnt)
         |           - (sum(woe * cnt) / sum(cnt)) * (sum(woe * cnt) / sum(cnt))
         |             * sum(cnt)) / (sum(cnt) - 1)) AS std
         |       FROM qw6)
         |SELECT b.l_orderkey, b.l_linenumber,
         |  round(least(greatest((round(qw.woe, 6) - mean) / std, -6.0), 6.0), 3)
         |    AS woe_z
         |FROM b JOIN qw USING (bin_id) CROSS JOIN ms
         |""".stripMargin))

  // ---- HYBRID + ASIS_WOE: per-kind dispatch in one select ------------------

  /** HYBRID (cat→woe, num→zscore, `Normalizer.java:245-247`) and ASIS_WOE's
    * numeric branch (passthrough with missing→mean) — the per-column-kind
    * dispatch of `Normalize.forProfile` exercised against SQL. The masked
    * quantity column exercises missing→mean on exact integer sums. */
  private val normHybrid: Q = Q(
    fn = (s, dir) => {
      val d0 = li(s, dir)
      val key = concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))
      val masked = when(substring(md5(key.cast("binary")), 1, 1) === "0",
        lit(null)).otherwise(col("l_quantity"))
      val d = d0.withColumn("qm", masked)
      val cat = StatsPipeline.profileCategorical(d, Seq("l_returnflag"), isPos)
      val st = StatsPipeline.numericStats(d, Seq("qm"))("qm")
      val p = cat("l_returnflag")
      d.select(col("l_orderkey"), col("l_linenumber"),
        round(Normalize.woeCategorical(col("l_returnflag"),
          p.binning.binCategory, p.binning.binCountWoe), 6).as("h_cat"),
        round(Normalize.zscore(col("qm"), st.mean, st.stdDev), 6).as("h_num"),
        round(Normalize.asIs(col("qm"), st.mean), 6).as("asis_num"))
    },
    oracle = Some(
      s"""WITH mk AS (
         |  SELECT l_orderkey, l_linenumber, l_returnflag,
         |    CASE WHEN substr(md5(cast(l_orderkey AS VARCHAR) || '|'
         |      || cast(l_linenumber AS VARCHAR)), 1, 1) = '0'
         |    THEN NULL ELSE l_quantity END AS qm,
         |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
         |  FROM lineitem),
         |tot AS (SELECT sum(pos)::DOUBLE AS sp,
         |          (count(*) - sum(pos))::DOUBLE AS sn FROM mk),
         |cw AS (SELECT l_returnflag,
         |         ln((sum(pos) / sp + 1e-10)
         |            / ((count(*) - sum(pos)) / sn + 1e-10)) AS woe
         |       FROM mk, tot GROUP BY l_returnflag, sp, sn),
         |a AS (SELECT count(qm) AS cnt, sum(qm) AS s1,
         |        sum(qm * qm) AS s2 FROM mk),
         |d AS (SELECT cnt, s1 / cnt AS mu,
         |        sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)) AS sd FROM a)
         |SELECT l_orderkey, l_linenumber,
         |  round(cw.woe, 6) AS h_cat,
         |  round(CASE WHEN isnan(sd) OR isinf(sd) OR sd = 0
         |      OR isnan(mu) OR isinf(mu) THEN 0.0
         |    WHEN qm IS NULL THEN 0.0 ELSE
         |    least(greatest((qm - mu) / sd, -6.0), 6.0) END, 6)
         |    AS h_num,
         |  round(coalesce(qm, mu), 6) AS asis_num
         |FROM mk
         |JOIN cw ON mk.l_returnflag IS NOT DISTINCT FROM cw.l_returnflag
         |CROSS JOIN d
         |""".stripMargin))

  // ---- category → ordinal index (ZSCALE_INDEX family) ----------------------

  private val normIndex: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val cat = StatsPipeline.profileCategorical(
        d, Seq("l_returnflag", "l_linestatus"), isPos)
      d.select(col("l_orderkey"), col("l_linenumber"),
        Normalize.categoryIndex(col("l_returnflag"),
          cat("l_returnflag").binning.binCategory).as("idx_rf"),
        Normalize.categoryIndex(col("l_linestatus"),
          cat("l_linestatus").binning.binCategory).as("idx_ls"))
    },
    oracle = Some(
      // the oracle DISCOVERS the category sets exactly like
      // profileCategorical: most-frequent 10000 (count desc, value asc),
      // then lexicographic index order; unseen/missing -> k
      """WITH rf AS (SELECT l_returnflag AS v, count(*) AS c FROM lineitem
        |  WHERE l_returnflag IS NOT NULL GROUP BY 1
        |  ORDER BY c DESC, v ASC LIMIT 10000),
        |rfi AS (SELECT v, (row_number() OVER (ORDER BY v ASC) - 1)::INT
        |          AS idx FROM rf),
        |rfk AS (SELECT count(*)::INT AS k FROM rfi),
        |ls AS (SELECT l_linestatus AS v, count(*) AS c FROM lineitem
        |  WHERE l_linestatus IS NOT NULL GROUP BY 1
        |  ORDER BY c DESC, v ASC LIMIT 10000),
        |lsi AS (SELECT v, (row_number() OVER (ORDER BY v ASC) - 1)::INT
        |          AS idx FROM ls),
        |lsk AS (SELECT count(*)::INT AS k FROM lsi)
        |SELECT l.l_orderkey, l.l_linenumber,
        |  coalesce(rfi.idx, rfk.k) AS idx_rf,
        |  coalesce(lsi.idx, lsk.k) AS idx_ls
        |FROM lineitem l
        |LEFT JOIN rfi ON l.l_returnflag = rfi.v
        |LEFT JOIN lsi ON l.l_linestatus = lsi.v
        |CROSS JOIN rfk CROSS JOIN lsk
        |""".stripMargin))

  // ---- missing-value semantics: masked nulls → missing-last bin ------------

  /** ~25% of quantities masked to NULL by a deterministic md5 predicate;
    * verifies the missing-last-bin convention and missing-bin WoE. */
  private val missingBin: Q = Q(
    fn = (s, dir) => {
      val d0 = li(s, dir)
      val key = concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))
      val masked = when(
        substring(md5(key.cast("binary")), 1, 1).isin("0", "1", "2", "3"),
        lit(null)).otherwise(col("l_quantity"))
      val d = d0.withColumn("qm", masked)
      // bounds from the UNMASKED column (train-time boundaries)
      val bounds = quantityBounds(d0, binK)
      val counts = Binning.binCounts(d, "qm", bounds, isPos)
        .select("bin_id", "cnt_pos", "cnt_neg").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val pos = Array.fill(binK + 1)(0.0)
      val neg = Array.fill(binK + 1)(0.0)
      counts.foreach { case (b, p, n) => pos(b) = p.toDouble; neg(b) = n.toDouble }
      val m = graft.ops.StatsMath
        .columnMetrics(neg.toIndexedSeq, pos.toIndexedSeq).get
      import s.implicits._
      counts.map { case (b, p, n) =>
        (b, p, n, math.rint(m.binWoe(b) * 1e6) / 1e6) }
        .toSeq.toDF("bin_id", "cnt_pos", "cnt_neg", "woe")
    },
    oracle = Some {
      val arms = (1 until binK).reverse
        .map(i => s"WHEN qm >= mn + (mx - mn) * $i / $binK THEN $i")
        .mkString(" ")
      s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
         |            FROM lineitem),
         |mk AS (SELECT CASE WHEN substr(md5(cast(l_orderkey AS VARCHAR)
         |          || '|' || cast(l_linenumber AS VARCHAR)), 1, 1)
         |          IN ('0','1','2','3') THEN NULL ELSE l_quantity END AS qm,
         |        CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
         |       FROM lineitem),
         |b AS (SELECT CASE WHEN qm IS NULL THEN $binK $arms ELSE 0 END
         |        AS bin_id, pos FROM mk, mm),
         |bins AS (SELECT bin_id, sum(pos)::BIGINT AS cnt_pos,
         |           (count(*) - sum(pos))::BIGINT AS cnt_neg
         |         FROM b GROUP BY bin_id),
         |tot AS (SELECT sum(cnt_pos)::DOUBLE AS sp,
         |               sum(cnt_neg)::DOUBLE AS sn FROM bins)
         |SELECT bin_id, cnt_pos, cnt_neg,
         |  round(ln((cnt_pos / sp + 1e-10) / (cnt_neg / sn + 1e-10)), 6)
         |    AS woe
         |FROM bins, tot
         |""".stripMargin
    })

  val all: Map[String, Q] = Map(
    "q_norm_woe"     -> normWoe,
    "q_norm_woe_z"   -> normWoeZ,
    "q_norm_hybrid"  -> normHybrid,
    "q_norm_onehot"  -> normOnehot,
    "q_norm_index"   -> normIndex,
    "q_missing_bin"  -> missingBin,
  )
}
