package graft

import org.apache.spark.sql.functions._

import graft.ops.Binning

/** Weighted metric duals + NormPearson + classic OLAP rollup
  * (SURVEY §2.4 weighted variants, §2.8 Correlation enum, hard-part (d)). */
object QueriesWeighted {
  import QueryUtil._

  // ---- §2.4 weighted per-bin counts + weighted WoE/IV/KS -------------------

  /** Weight column = l_quantity (the reference's weightColumnName path);
    * weighted pos/neg per bin and the weighted WoE — the (count, weight)
    * dual carried through one aggregation. */
  private val weightedWoe: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val Array(mn, mx) = d.agg(min("l_discount"), max("l_discount")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val db = Binning.equalInterval(mn, mx, binK)
      Binning.binCounts(d, "l_discount", db, isPos, col("l_quantity"))
        .select(col("bin_id"),
          round(col("w_pos"), 4).as("w_pos"),
          round(col("w_neg"), 4).as("w_neg"))
    },
    oracle = Some {
      val arms = (1 until binK).reverse
        .map(i => s"WHEN l_discount >= mn + (mx - mn) * $i / $binK THEN $i")
        .mkString(" ")
      s"""WITH mm AS (SELECT min(l_discount) AS mn, max(l_discount) AS mx
         |            FROM lineitem),
         |b AS (SELECT CASE WHEN l_discount IS NULL THEN $binK $arms
         |        ELSE 0 END AS bin_id,
         |        CASE WHEN $posCond THEN 1 ELSE 0 END AS pos, l_quantity
         |      FROM lineitem, mm)
         |SELECT bin_id,
         |  round(sum(CASE WHEN pos = 1 THEN l_quantity ELSE 0.0 END), 4)
         |    AS w_pos,
         |  round(sum(CASE WHEN pos = 1 THEN 0.0 ELSE l_quantity END), 4)
         |    AS w_neg
         |FROM b GROUP BY bin_id
         |""".stripMargin
    })

  // ---- §2.4 weighted KS / IV (ColumnStats.weightedKs/weightedIv) -----------

  /** The weighted duals of KS/IV: bin mass = Σweight instead of counts
    * (reference carries both sets through `UpdateBinningInfoReducer`).
    * Integer-valued l_quantity weights keep all sums exact. */
  private val weightedIvKs: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val bounds = quantityBounds(d, binK)
      val counts = Binning.binCounts(d, "l_quantity", bounds, isPos,
        col("l_quantity"))
        .select("bin_id", "w_pos", "w_neg").collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      val pos = Array.fill(binK + 1)(0.0)
      val neg = Array.fill(binK + 1)(0.0)
      counts.foreach { case (b, p, n) => pos(b) = p; neg(b) = n }
      val m = graft.ops.StatsMath
        .columnMetrics(neg.toIndexedSeq, pos.toIndexedSeq).get
      import s.implicits._
      Seq((math.rint(m.ks * 1e6) / 1e6, math.rint(m.iv * 1e6) / 1e6))
        .toDF("w_ks", "w_iv")
    },
    oracle = Some {
      val arms = (1 until binK).reverse
        .map(i => s"WHEN l_quantity >= mn + (mx - mn) * $i / $binK THEN $i")
        .mkString(" ")
      s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
         |            FROM lineitem),
         |b AS (
         |  SELECT CASE WHEN l_quantity IS NULL THEN $binK $arms ELSE 0 END
         |      AS bin_id,
         |    CASE WHEN $posCond THEN l_quantity ELSE 0.0 END AS wp,
         |    CASE WHEN $posCond THEN 0.0 ELSE l_quantity END AS wn
         |  FROM lineitem, mm),
         |bins AS (SELECT bin_id, sum(wp) AS cp, sum(wn) AS cn
         |         FROM b GROUP BY bin_id),
         |tot AS (SELECT sum(cp) AS sp, sum(cn) AS sn FROM bins),
         |r AS (
         |  SELECT bin_id, cp / sp AS p, cn / sn AS n,
         |    sum(cp / sp) OVER (ORDER BY bin_id) AS cump,
         |    sum(cn / sn) OVER (ORDER BY bin_id) AS cumn
         |  FROM bins, tot)
         |SELECT round(100 * max(abs(cump - cumn)), 6) AS w_ks,
         |  round(sum((p - n) * ${QueryUtil.lnSql("(p + 1e-10) / (n + 1e-10)")}), 6) AS w_iv
         |FROM r
         |""".stripMargin
    })

  // ---- §2.4 varsel missing-rate filter (missingRateThreshold) --------------

  /** Per-column missing rate over deterministically masked variants; the
    * reference drops candidates above `missingRateThreshold=0.98`
    * (`ModelVarSelectConf.java:97`) — here the column with ~every value
    * masked is flagged out, the lightly-masked one kept. */
  private val varselMissing: Q = Q(
    fn = (s, dir) => {
      val key = md5(concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string")).cast("binary"))
      // heavy: masked unless first hex digit is '0' (~94% missing at 1/16);
      // light: masked on '0' only (~6% missing)
      val heavy = when(substring(key, 1, 1) =!= "0", lit(null))
        .otherwise(col("l_quantity"))
      val light = when(substring(key, 1, 1) === "0", lit(null))
        .otherwise(col("l_quantity"))
      val d = li(s, dir).select(heavy.as("c_heavy"), light.as("c_light"))
      val stacked = d.select(expr(
        "stack(2, 'c_heavy', c_heavy, 'c_light', c_light) as (col_name, v)"))
      stacked.groupBy("col_name")
        .agg(round(sum(when(col("v").isNull, 1.0).otherwise(0.0)) /
          count(lit(1)), 6).as("missing_rate"))
        .withColumn("kept", (col("missing_rate") <= 0.9).cast("int"))
    },
    oracle = Some(
      s"""WITH k AS (
         |  SELECT substr(md5(cast(l_orderkey AS VARCHAR) || '|'
         |    || cast(l_linenumber AS VARCHAR)), 1, 1) AS h,
         |    l_quantity AS q FROM lineitem),
         |u AS (
         |  SELECT 'c_heavy' AS col_name,
         |    CASE WHEN h <> '0' OR q IS NULL THEN 1.0 ELSE 0.0 END
         |      AS miss FROM k
         |  UNION ALL
         |  SELECT 'c_light',
         |    CASE WHEN h = '0' OR q IS NULL THEN 1.0 ELSE 0.0 END FROM k)
         |SELECT col_name, round(sum(miss) / count(*), 6) AS missing_rate,
         |  CASE WHEN round(sum(miss) / count(*), 6) <= 0.9 THEN 1 ELSE 0 END
         |    AS kept
         |FROM u GROUP BY col_name
         |""".stripMargin))

  // ---- §2.4 NormPearson: correlation over z-scored, mean-imputed values ----

  private val normPearson: Q = Q(
    fn = (s, dir) => {
      // z-scoring is affine so r is unchanged on complete data; the
      // NormPearson variant matters because missing→mean imputation (z=0)
      // changes the estimate. Mask ~12.5% of x deterministically, impute
      // with the unmasked mean, then correlate.
      val d = li(s, dir)
      val key = concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))
      val masked = d.withColumn("x",
        when(substring(md5(key.cast("binary")), 1, 1).isin("0", "1"),
          lit(null)).otherwise(col("l_quantity")))
      val m = masked.agg(sum("x"), count(col("x"))).head()
      val meanX = m.getDouble(0) / m.getLong(1)
      masked.withColumn("xi", coalesce(col("x"), lit(meanX)))
        .agg(round(
          (count(lit(1)) * sum(col("xi") * col("l_extendedprice")) -
            sum("xi") * sum("l_extendedprice")) /
            sqrt((count(lit(1)) * sum(col("xi") * col("xi")) -
              sum("xi") * sum("xi")) *
              (count(lit(1)) * sum(col("l_extendedprice") * col("l_extendedprice")) -
                sum("l_extendedprice") * sum("l_extendedprice"))), 6)
          .as("norm_corr"))
    },
    oracle = Some(
      """WITH mk AS (
        |  SELECT CASE WHEN substr(md5(cast(l_orderkey AS VARCHAR) || '|'
        |      || cast(l_linenumber AS VARCHAR)), 1, 1) IN ('0','1')
        |    THEN NULL ELSE l_quantity END AS x, l_extendedprice AS y
        |  FROM lineitem),
        |m AS (SELECT sum(x) / count(x) AS mx FROM mk),
        |im AS (SELECT coalesce(x, mx) AS xi, y FROM mk, m)
        |SELECT round((count(*) * sum(xi * y) - sum(xi) * sum(y))
        |  / sqrt((count(*) * sum(xi * xi) - sum(xi) * sum(xi))
        |       * (count(*) * sum(y * y) - sum(y) * sum(y))), 6) AS norm_corr
        |FROM im
        |""".stripMargin))

  // ---- classic OLAP rollup (TPC-H Q1 shape) --------------------------------

  private val tpchQ1: Q = Q(
    fn = (s, dir) => li(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(sum("l_quantity") / count(lit(1)), 6).as("avg_qty"),
        count(lit(1)).as("count_order")),
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        |    AS sum_charge,
        |  round(sum(l_quantity) / count(*), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_weighted_woe" -> weightedWoe,
    "q_weighted_iv_ks" -> weightedIvKs,
    "q_varsel_missing" -> varselMissing,
    "q_norm_pearson" -> normPearson,
    "q_tpch_q1"      -> tpchQ1,
  )
}
