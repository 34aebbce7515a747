package graft

import org.apache.spark.sql.functions._

/** Hybrid (H) column type + PSI unit stats (SURVEY §1.2 ColumnType.H,
  * §2.4 PSI unitStats). */
object QueriesHybrid {
  import QueryUtil._

  /** A hybrid column: mostly-numeric string with categorized special
    * values — the reference's H type (`container/obj/ColumnType.java:19-21`,
    * threshold at `ColumnConfig.java:79`). Built deterministically from
    * l_quantity: ~12.5% of rows carry the special token "SPECIAL_LOW" or
    * "SPECIAL_HIGH"; ~6% are missing. */
  private val hybridCol =
    "CASE WHEN substr(md5(cast(l_orderkey AS VARCHAR) || '|' || " +
      "cast(l_linenumber AS VARCHAR)), 1, 1) = '0' THEN " +
      "CASE WHEN l_quantity < 25 THEN 'SPECIAL_LOW' ELSE 'SPECIAL_HIGH' END " +
      "WHEN substr(md5(cast(l_orderkey AS VARCHAR) || '|' || " +
      "cast(l_linenumber AS VARCHAR)), 1, 1) = '1' THEN NULL " +
      "ELSE cast(l_quantity AS VARCHAR) END"

  /** Spark-side identical expression (same md5/same CASE order). */
  private def hybridSparkCol = expr(
    hybridCol
      .replace("cast(l_orderkey AS VARCHAR)", "cast(l_orderkey AS string)")
      .replace("cast(l_linenumber AS VARCHAR)", "cast(l_linenumber AS string)")
      .replace("cast(l_quantity AS VARCHAR)", "cast(l_quantity AS string)"))

  /** Hybrid stats: numeric values → equal-interval bins (bin_kind 'N'),
    * special categories → their own bins ('C'), missing → 'M'; pos/neg
    * counts per bin — the missing-last + special-category semantics that
    * SURVEY flags as hard-part (b), exercised end to end. */
  private val hybridStats: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir).withColumn("h", hybridSparkCol)
        .withColumn("hv", expr("try_cast(h AS double)"))
      val Array(mn, mx) = d.agg(min("hv"), max("hv")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val arms = (1 until binK).reverse
      var binId: org.apache.spark.sql.Column =
        when(col("h").isNull, concat(lit("M|"), lit(binK + 2)))
          .when(col("hv").isNull, concat(lit("C|"), col("h")))
      arms.foreach { i =>
        binId = binId.when(col("hv") >= lit(mn + (mx - mn) * i / binK),
          concat(lit("N|"), lit(i)))
      }
      d.groupBy(binId.otherwise(lit("N|0")).as("bin_key"))
        .agg(sum(when(isPos, 1L).otherwise(0L)).as("cnt_pos"),
          sum(when(isPos, 0L).otherwise(1L)).as("cnt_neg"))
    },
    oracle = Some {
      val arms = (1 until binK).reverse
        .map(i => s"WHEN hv >= mn + (mx - mn) * $i / $binK THEN 'N|' || $i")
        .mkString("\n      ")
      s"""WITH h AS (
         |  SELECT $hybridCol AS h,
         |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
         |  FROM lineitem),
         |hv AS (SELECT h, TRY_CAST(h AS DOUBLE) AS hv, pos FROM h),
         |mm AS (SELECT min(hv) AS mn, max(hv) AS mx FROM hv)
         |SELECT CASE
         |    WHEN h IS NULL THEN 'M|' || ${binK + 2}
         |    WHEN hv IS NULL THEN 'C|' || h
         |      $arms
         |    ELSE 'N|0' END AS bin_key,
         |  sum(pos)::BIGINT AS cnt_pos,
         |  (count(*) - sum(pos))::BIGINT AS cnt_neg
         |FROM hv, mm GROUP BY 1
         |""".stripMargin
    })

  /** PSI unit stats (reference `PSICalculatorUDF.java:60-66` per-unit
    * mean / missing-rate strings): per month, mean of quantity and the
    * missing rate of a masked variant. */
  private val psiUnitStats: Q = Q(
    fn = (s, dir) => {
      val key = concat(col("l_orderkey").cast("string"), lit("|"),
        col("l_linenumber").cast("string"))
      li(s, dir)
        .withColumn("qm",
          when(substring(md5(key.cast("binary")), 1, 1) === "0", lit(null))
            .otherwise(col("l_quantity")))
        .groupBy(month(col("l_shipdate")).as("unit"))
        .agg(
          round(sum("l_quantity") / count(col("l_quantity")), 6)
            .as("unit_mean"),
          round(sum(when(col("qm").isNull, 1.0).otherwise(0.0)) /
            count(lit(1)), 6).as("missing_rate"),
          count(lit(1)).as("n"))
    },
    oracle = Some(
      """SELECT month(l_shipdate) AS unit,
        |  round(sum(l_quantity) / count(l_quantity), 6) AS unit_mean,
        |  round(sum(CASE WHEN l_quantity IS NULL
        |      OR substr(md5(cast(l_orderkey AS VARCHAR) || '|'
        |      || cast(l_linenumber AS VARCHAR)), 1, 1) = '0'
        |    THEN 1.0 ELSE 0.0 END) / count(*), 6) AS missing_rate,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1
        |""".stripMargin))

  /** Posttrain feature importance (reference
    * `core/posttrain/FeatureImportanceMapper.java:150-220`): rank features
    * by |Pearson corr(feature, model score)| — one agg over raw sums. */
  private val featureImportance: Q = Q(
    fn = (s, dir) => {
      val feats = Seq("l_quantity", "l_discount", "l_tax")
      val stackExpr = "stack(" + feats.length + ", " +
        feats.map(c => s"'$c', $c").mkString(", ") + ") as (feature, x)"
      val d = li(s, dir)
        .withColumn("sc", scoreCol)
        .select(col("sc"), expr(stackExpr))
      // bounded feature-count table; explicit constant partition key
      // (see ops/Psi.scala) keeps the WindowExec warning count at zero
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
        .orderBy(col("imp").desc, col("feature").asc)
      d.groupBy("feature")
        .agg(round(abs(
          (count(lit(1)) * sum(col("x") * col("sc")) - sum("x") * sum("sc")) /
            sqrt((count(lit(1)) * sum(col("x") * col("x")) - sum("x") * sum("x")) *
              (count(lit(1)) * sum(col("sc") * col("sc")) - sum("sc") * sum("sc")))),
          6).as("imp"))
        .withColumn("rank", row_number().over(w))
    },
    oracle = Some {
      val per = Seq("l_quantity", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS feature, round(abs(
           |  (count(*) * sum($c * ($scoreSql)) - sum($c) * sum($scoreSql))
           |  / sqrt((count(*) * sum($c * $c) - sum($c) * sum($c))
           |       * (count(*) * sum(($scoreSql) * ($scoreSql))
           |          - sum($scoreSql) * sum($scoreSql)))), 6) AS imp
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH f AS (
         |$per)
         |SELECT feature, imp,
         |  row_number() OVER (ORDER BY imp DESC, feature) AS rank
         |FROM f
         |""".stripMargin
    })

  /** EXACT posttrain feature importance (reference
    * `core/posttrain/FeatureImportanceMapper.java:150-220`, replacing the
    * corr proxy of q_feature_importance): per row, every final-select
    * variable is scored by its BIN AVERAGE SCORE (`config.getBinAvgScore`),
    * variables sort by that score descending — STABLE, ties keep column
    * order — and the top-3 earn 3/2/1 points; importance = total points
    * per variable.
    *
    * Spark-first shape: bin average scores are integer longs
    * (`floor-div(Σ intScore, n)` per bin, one stacked groupBy pass), the
    * per-row "stable sort rank" folds into closed-form comparison sums
    * (rank_v = 1 + #{w : s_w > s_v ∨ (s_w = s_v ∧ ord_w < ord_v)}) — a
    * fully codegen'd narrow projection + one final agg; no per-row arrays,
    * no shuffle beyond the two aggs. All comparisons are exact long
    * arithmetic, so the oracle matches bit-for-bit. */
  private val featureImportanceRef: Q = Q(
    fn = (s, dir) => {
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val d = li(s, dir)
      // clamped score units (fuzz: floor saturates to Long.Max on
      // 1e300 and the bin sums ANSI-overflow; 2^40 leaves ~8e6 rows of
      // long-sum headroom per bin, mirrored in the oracle)
      val srow = graft.ops.Binning.longWeight(scoreCol + lit(0.5),
        graft.ops.Binning.MilsClamp)
      val mmCols = feats.flatMap(c =>
        Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
      val mm = d.agg(mmCols.head, mmCols.tail: _*).head()
      val bounds = feats.zipWithIndex.map { case (c, i) =>
        c -> graft.ops.Binning.equalInterval(
          mm.getDouble(2 * i), mm.getDouble(2 * i + 1), binK)
      }.toMap
      val binCols = feats.map(c =>
        graft.ops.Binning.binIndex(col(c), bounds(c)).as(s"b_$c"))
      val withBins = d.select(binCols :+ srow.as("s"): _*)
      val stackExpr = "stack(" + feats.length + ", " +
        feats.map(c => s"'$c', b_$c").mkString(", ") + ") as (feature, bin)"
      // integer division on the driver: DuckDB's `//` truncates toward
      // zero exactly like Java's `/` (verified: -7//2 = -3), so the
      // mean-score bucket matches even for clamped negative scores
      val bas = withBins.select(expr(stackExpr), col("s"))
        .groupBy("feature", "bin")
        .agg(coalesce(sum("s"), lit(0L)).as("ss"),
          count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) ->
          r.getLong(2) / r.getLong(3)).toMap
      // literal per-bin score lookup: bin ids 0..binK+1 (missing-last)
      val scoreOf = feats.map { c =>
        val arr = (0 to binK + 1).map(b => bas.getOrElse((c, b), 0L))
        c -> element_at(
          array(arr.map(lit): _*), col(s"b_$c").cast("int") + 1)
      }.toMap
      val scored = withBins.select(feats.map(c =>
        scoreOf(c).as(s"s_$c")): _*)
      val rankOf = feats.zipWithIndex.map { case (v, ov) =>
        v -> feats.zipWithIndex.filter(_._1 != v).map { case (w, ow) =>
          val beats = if (ow < ov) col(s"s_$w") >= col(s"s_$v")
            else col(s"s_$w") > col(s"s_$v")
          when(beats, 1).otherwise(0)
        }.reduce(_ + _)
      }.toMap // rank_v - 1
      val ptsCols = feats.map { v =>
        val rm1 = rankOf(v)
        sum(when(rm1 <= 2, lit(3) - rm1).otherwise(0)).cast("long")
          .as(s"p_$v")
      }
      val ptsRow = scored.agg(ptsCols.head, ptsCols.tail: _*).head()
      import s.implicits._
      feats.zipWithIndex.map { case (c, i) => (c, ptsRow.getLong(i)) }
        .sortBy { case (c, p) => (-p, c) }.zipWithIndex
        .map { case ((c, p), i) => (c, p, i + 1) }
        .toDF("feature", "importance", "rank")
    },
    oracle = Some {
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val mmSel = feats
        .map(c => s"min($c) AS mn_$c, max($c) AS mx_$c").mkString(", ")
      def armsOf(c: String) = (1 until binK).reverse
        .map(i => s"WHEN $c >= mn_$c + (mx_$c - mn_$c) * $i / $binK THEN $i")
        .mkString(" ")
      val binSel = feats.map(c =>
        s"CASE WHEN $c IS NULL THEN $binK ${armsOf(c)} ELSE 0 END AS b_$c")
        .mkString(",\n        ")
      val unions = feats.map(c =>
        s"SELECT '$c' AS feature, b_$c AS bin, s FROM b")
        .mkString("\n  UNION ALL ")
      val joins = feats.map(c =>
        s"LEFT JOIN bas j_$c ON j_$c.feature = '$c' AND j_$c.bin = b.b_$c")
        .mkString("\n  ")
      val sSel = feats
        .map(c => s"coalesce(j_$c.bscore, 0) AS s_$c").mkString(", ")
      def rankM1(v: String, ov: Int) = feats.zipWithIndex
        .filter(_._1 != v).map { case (w, ow) =>
          val cmp = if (ow < ov) ">=" else ">"
          s"(CASE WHEN s_$w $cmp s_$v THEN 1 ELSE 0 END)"
        }.mkString(" + ")
      val ptsSel = feats.zipWithIndex.map { case (v, ov) =>
        s"""sum(CASE WHEN ${rankM1(v, ov)} <= 2
           |    THEN 3 - (${rankM1(v, ov)}) ELSE 0 END)::BIGINT AS p_$v"""
          .stripMargin
      }.mkString(",\n    ")
      val outUnions = feats.map(c =>
        s"SELECT '$c' AS feature, p_$c AS importance FROM pts")
        .mkString("\n  UNION ALL ")
      s"""WITH mm AS (SELECT $mmSel FROM lineitem),
         |b AS (SELECT
         |        $binSel,
         |        ${QueryUtil.longWeightSql(s"(($scoreSql) + 0.5)",
                    QueryUtil.milsClamp)} AS s
         |      FROM lineitem, mm),
         |u AS (
         |  $unions),
         |bas AS (SELECT feature, bin, sum(s)::BIGINT // count(*)::BIGINT AS bscore
         |        FROM u GROUP BY feature, bin),
         |r AS (SELECT $sSel
         |      FROM b
         |  $joins),
         |pts AS (SELECT
         |    $ptsSel
         |  FROM r),
         |f AS (
         |  $outUnions)
         |SELECT feature, importance,
         |  row_number() OVER (ORDER BY importance DESC, feature) AS rank
         |FROM f
         |""".stripMargin
    })

  /** TPC-H Q3 shape: filtered 3-way join + agg + global top-10. */
  private val tpchQ3: Q = Q(
    fn = (s, dir) => {
      val l = li(s, dir)
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING" &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(scoreCol), 2).as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },
    oracle = Some(
      s"""SELECT l_orderkey, round(sum($scoreSql), 2) AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY l_orderkey
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10
         |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_hybrid_stats"       -> hybridStats,
    "q_psi_unit_stats"     -> psiUnitStats,
    "q_feature_importance" -> featureImportance,
    "q_feature_importance_ref" -> featureImportanceRef,
    "q_tpch_q3"            -> tpchQ3,
  )
}
