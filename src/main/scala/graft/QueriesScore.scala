package graft

import org.apache.spark.sql.functions._

import graft.ops.{Binning, StatsPipeline}
import graft.score.Score
import graft.score.Score.{Leaf, LinearModel, Split}

/** Scoring / variable-selection / posttrain queries (SURVEY §2.4, §2.7). */
object QueriesScore {
  import QueryUtil._

  /** The bagged "ensemble": 4 literal logistic models over lineitem
    * features — stands in for the reference's N loaded model specs
    * (`core/ModelRunner.java`); weights fold into the plan as literals. */
  private val models = Seq(
    LinearModel(Seq("l_quantity" -> 0.08, "l_discount" -> -12.0), -1.0),
    LinearModel(Seq("l_extendedprice" -> 0.00003), -1.2),
    LinearModel(Seq("l_quantity" -> 0.05, "l_extendedprice" -> 0.00002), -2.0),
    LinearModel(Seq("l_quantity" -> -0.06, "l_discount" -> 15.0), 0.5))

  private def zSql(m: LinearModel): String =
    m.weights.map { case (c, w) => s"$c * $w" }.mkString(" + ") + s" + ${m.bias}"
  private def scoreSqlOf(m: LinearModel): String =
    s"1.0 / (1.0 + exp(0.0 - (${zSql(m)})))"

  // ---- §2.7 bagged ensemble scoring ---------------------------------------

  private val scoreEnsemble: Q = Q(
    fn = (s, dir) => li(s, dir).select(
      (Seq(col("l_orderkey"), col("l_linenumber")) ++
        Score.ensemble(models)): _*),
    oracle = Some {
      val ss = models.map(scoreSqlOf)
      val meanExpr = ss.foldLeft("0.0")((acc, x) => s"($acc + $x)") +
        s" / ${models.length} * 1000.0"
      s"""WITH sc AS (
         |  SELECT l_orderkey, l_linenumber,
         |    list_sort([${ss.mkString(",\n      ")}]) AS srt,
         |    ${ss.zipWithIndex.map { case (e, i) => s"$e AS s_$i" }
             .mkString(",\n    ")}
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         |  round(((((0.0 + s_0) + s_1) + s_2) + s_3) / 4 * 1000.0, 3)
         |    AS score_mean,
         |  round(list_max(srt) * 1000.0, 3) AS score_max,
         |  round(list_min(srt) * 1000.0, 3) AS score_min,
         |  round((srt[2] + srt[3]) / 2 * 1000.0, 3) AS score_median
         |FROM sc
         |""".stripMargin
    })

  // ---- §2.7 tree-path encoding --------------------------------------------

  private val tree1: Score.TreeNode = Split("l_quantity", 25.0,
    Split("l_discount", 0.05, Leaf(0), Leaf(1)),
    Split("l_extendedprice", 30000.0, Leaf(2), Leaf(3)))
  private val tree2: Score.TreeNode = Split("l_extendedprice", 20000.0,
    Split("l_quantity", 10.0, Leaf(0), Leaf(1)),
    Split("l_discount", 0.03, Leaf(2),
      Split("l_quantity", 40.0, Leaf(3), Leaf(4))))

  private val treeEncode: Q = Q(
    fn = (s, dir) => li(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      Score.encodePath(tree1).as("t1_path"),
      Score.encodeLeaf(tree1).as("t1_leaf"),
      Score.encodePath(tree2).as("t2_path"),
      Score.encodeLeaf(tree2).as("t2_leaf")),
    oracle = Some(
      s"""SELECT l_orderkey, l_linenumber,
         |  ${Score.pathSql(tree1)} AS t1_path,
         |  ${Score.leafSql(tree1)} AS t1_leaf,
         |  ${Score.pathSql(tree2)} AS t2_path,
         |  ${Score.leafSql(tree2)} AS t2_leaf
         |FROM lineitem
         |""".stripMargin))

  // ---- §2.4 sensitivity-based variable selection ---------------------------

  private val sensModel = models(2) // l_quantity + l_extendedprice
  private val sensitivity: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val feats = sensModel.weights.map(_._1)
      val meansRow = d.agg(
        feats.map(f => (sum(col(f)) / count(col(f))).as(f)).head,
        feats.tail.map(f => (sum(col(f)) / count(col(f))).as(f)): _*).head()
      val means = feats.zipWithIndex
        .map { case (f, i) => f -> meansRow.getDouble(i) }.toMap
      val deltaCols = feats.map { f =>
        abs(sensModel.score - sensModel.scoreMasked(f, means(f))).as(s"d_$f")
      }
      val aggRow = d.select(deltaCols: _*)
        .agg(feats.map(f => (sum(col(s"d_$f")) / count(col(s"d_$f")))
          .as(s"d_$f")).head,
          feats.tail.map(f => (sum(col(s"d_$f")) / count(col(s"d_$f")))
            .as(s"d_$f")): _*)
        .head()
      import s.implicits._
      feats.zipWithIndex
        .map { case (f, i) =>
          (f, math.rint(aggRow.getDouble(i) * 1e6) / 1e6) }
        .toDF("feature", "mean_delta")
    },
    oracle = Some {
      val feats = sensModel.weights.map(_._1)
      val meansSel = feats
        .map(f => s"sum($f) / count($f) AS m_$f").mkString(", ")
      val deltas = feats.map { f =>
        val maskedZ = sensModel.weights.map { case (c, w) =>
          (if (c == f) s"m_$c" else c) + s" * $w"
        }.mkString(" + ") + s" + ${sensModel.bias}"
        s"abs(${scoreSqlOf(sensModel)} - 1.0 / (1.0 + exp(0.0 - ($maskedZ)))) AS d_$f"
      }.mkString(",\n    ")
      val unions = feats.map(f =>
        s"SELECT '$f' AS feature, round(sum(d_$f) / count(d_$f), 6)" +
          s" AS mean_delta FROM d").mkString("\nUNION ALL ")
      s"""WITH m AS (SELECT $meansSel FROM lineitem),
         |d AS (SELECT
         |    $deltas
         |  FROM lineitem, m)
         |$unions
         |""".stripMargin
    })

  // ---- §2.4 KS-ranked variable selection ----------------------------------

  private val ksCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private val varselKs: Q = Q(
    fn = (s, dir) => {
      val profiles = StatsPipeline.profileNumeric(li(s, dir), ksCols, isPos)
      import s.implicits._
      ksCols.map(c => (c, profiles(c).stats.ks.getOrElse(0.0)))
        .sortBy { case (c, ks) => (-ks, c) }
        .zipWithIndex
        .map { case ((c, ks), i) =>
          (i + 1, c, math.rint(ks * 1e6) / 1e6) }
        .toDF("rank", "col_name", "ks")
    },
    oracle = Some {
      val perCol = ksCols.map { c =>
        val arms = (1 until binK).reverse
          .map(i => s"WHEN $c >= mn_$c + (mx_$c - mn_$c) * $i / $binK THEN $i")
          .mkString(" ")
        s"""k_$c AS (
           |  SELECT '$c' AS col_name, 100 * max(abs(cump - cumn)) AS ks FROM (
           |    SELECT sum(cp / sp) OVER (ORDER BY bin_id) AS cump,
           |           sum(cn / sn) OVER (ORDER BY bin_id) AS cumn
           |    FROM (
           |      SELECT bin_id, sum(pos)::DOUBLE AS cp,
           |             (count(*) - sum(pos))::DOUBLE AS cn
           |      FROM (
           |        SELECT CASE WHEN $c IS NULL THEN $binK $arms ELSE 0 END
           |          AS bin_id,
           |          CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
           |        FROM lineitem,
           |          (SELECT min($c) AS mn_$c, max($c) AS mx_$c FROM lineitem))
           |      GROUP BY bin_id),
           |      (SELECT sum(CASE WHEN $posCond THEN 1.0 ELSE 0.0 END) AS sp,
           |              sum(CASE WHEN $posCond THEN 0.0 ELSE 1.0 END) AS sn
           |       FROM lineitem)))""".stripMargin
      }.mkString(",\n")
      val unions = ksCols.map(c => s"SELECT * FROM k_$c").mkString(" UNION ALL ")
      s"""WITH $perCol
         |SELECT row_number() OVER (ORDER BY ks DESC, col_name) AS rank,
         |  col_name, round(ks, 6) AS ks
         |FROM ($unions)
         |""".stripMargin
    })

  // ---- §2.4 IV-ranked variable selection (filterBy=IV) ---------------------

  /** The reference's second ranking mode (`ModelVarSelectConf.java:74`
    * `filterBy` ∈ {KS, IV, SE, …}): identical pipeline to q_varsel_ks but
    * ranked by information value. Same single stats pass computes both
    * metrics — selecting by either costs no extra scan. */
  private val varselIv: Q = Q(
    fn = (s, dir) => {
      val profiles = StatsPipeline.profileNumeric(li(s, dir), ksCols, isPos)
      import s.implicits._
      ksCols.map(c => (c, profiles(c).stats.iv.getOrElse(0.0)))
        .sortBy { case (c, iv) => (-iv, c) }
        .zipWithIndex
        .map { case ((c, iv), i) =>
          (i + 1, c, math.rint(iv * 1e6) / 1e6) }
        .toDF("rank", "col_name", "iv")
    },
    oracle = Some {
      val perCol = ksCols.map { c =>
        val arms = (1 until binK).reverse
          .map(i => s"WHEN $c >= mn_$c + (mx_$c - mn_$c) * $i / $binK THEN $i")
          .mkString(" ")
        s"""i_$c AS (
           |  SELECT '$c' AS col_name,
           |    sum((p - n) * ln((p + 1e-10) / (n + 1e-10))) AS iv FROM (
           |    SELECT cp / sp AS p, cn / sn AS n
           |    FROM (
           |      SELECT bin_id, sum(pos)::DOUBLE AS cp,
           |             (count(*) - sum(pos))::DOUBLE AS cn
           |      FROM (
           |        SELECT CASE WHEN $c IS NULL THEN $binK $arms ELSE 0 END
           |          AS bin_id,
           |          CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
           |        FROM lineitem,
           |          (SELECT min($c) AS mn_$c, max($c) AS mx_$c FROM lineitem))
           |      GROUP BY bin_id),
           |      (SELECT sum(CASE WHEN $posCond THEN 1.0 ELSE 0.0 END) AS sp,
           |              sum(CASE WHEN $posCond THEN 0.0 ELSE 1.0 END) AS sn
           |       FROM lineitem)))""".stripMargin
      }.mkString(",\n")
      val unions = ksCols.map(c => s"SELECT * FROM i_$c").mkString(" UNION ALL ")
      s"""WITH $perCol
         |SELECT row_number() OVER (ORDER BY iv DESC, col_name) AS rank,
         |  col_name, round(iv, 6) AS iv
         |FROM ($unions)
         |""".stripMargin
    })

  // ---- §2.4 posttrain: bin average score ----------------------------------

  private val binAvgScore: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val bounds = quantityBounds(d, binK)
      d.groupBy(Binning.binIndex(col("l_quantity"), bounds).as("bin_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(scoreCol) / count(lit(1)), 6).as("avg_score"))
    },
    oracle = Some(
      s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
         |            FROM lineitem)
         |SELECT ${binCaseSql(binK)} AS bin_id, count(*) AS n,
         |  round(sum($scoreSql) / count(*), 6) AS avg_score
         |FROM lineitem, mm GROUP BY 1
         |""".stripMargin))

  // ---- §2.7 reason codes ---------------------------------------------------

  private val reasonCodes: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val num = StatsPipeline.profileNumeric(d, Seq("l_quantity"), isPos)
      val cat = StatsPipeline.profileCategorical(d, Seq("l_returnflag"), isPos)
      val q = num("l_quantity")
      val r = cat("l_returnflag")
      val woeQ = graft.ops.Normalize.woeNumeric(col("l_quantity"),
        q.binning.binBoundary, q.binning.binCountWoe)
      val woeR = graft.ops.Normalize.woeCategorical(col("l_returnflag"),
        r.binning.binCategory, r.binning.binCountWoe)
      d.select(col("l_orderkey"), col("l_linenumber"),
        when(woeQ <= woeR, lit("l_quantity")).otherwise(lit("l_returnflag"))
          .as("reason"))
    },
    oracle = Some(
      s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
         |            FROM lineitem),
         |b AS (SELECT l_orderkey, l_linenumber, l_returnflag,
         |        ${binCaseSql(binK)} AS bin_id,
         |        CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
         |      FROM lineitem, mm),
         |tot AS (SELECT sum(pos)::DOUBLE AS sp,
         |               (count(*) - sum(pos))::DOUBLE AS sn FROM b),
         |qw AS (SELECT bin_id,
         |         ln((sum(pos) / sp + 1e-10)
         |            / ((count(*) - sum(pos)) / sn + 1e-10)) AS woe
         |       FROM b, tot GROUP BY bin_id, sp, sn),
         |cw AS (SELECT l_returnflag,
         |         ln((sum(pos) / sp + 1e-10)
         |            / ((count(*) - sum(pos)) / sn + 1e-10)) AS woe
         |       FROM b, tot GROUP BY l_returnflag, sp, sn)
         |SELECT b.l_orderkey, b.l_linenumber,
         |  CASE WHEN qw.woe <= cw.woe THEN 'l_quantity'
         |       ELSE 'l_returnflag' END AS reason
         |FROM b JOIN qw USING (bin_id)
         |JOIN cw ON b.l_returnflag IS NOT DISTINCT FROM cw.l_returnflag
         |""".stripMargin))

  // ---- §2.7 full reason codes: top-N adverse bins per row ------------------

  /** Reasoner semantics (reference `core/Reasoner.java` +
    * `udf/CalculateReasonCodeUDF.java:60-110`): each scored row gets the
    * top-N most ADVERSE variables — lowest per-row WoE ranks first (low WoE
    * bin = low odds of good) — mapped through the configured reasonCodeMap.
    * Per-row WoE lookups fold into the plan as literal CASE chains (one
    * narrow codegen'd projection, no join), the top-3 selection is a
    * 4-element in-row array sort; ties break on the reason code string. */
  private val reasonMap = Seq(
    "l_quantity" -> "RC_QTY", "l_discount" -> "RC_DISC",
    "l_tax" -> "RC_TAX", "l_returnflag" -> "RC_FLAG")

  private val reasonCodesTopN: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val numCols = Seq("l_quantity", "l_discount", "l_tax")
      val num = StatsPipeline.profileNumeric(d, numCols, isPos)
      val cat = StatsPipeline.profileCategorical(d, Seq("l_returnflag"), isPos)
      val rp = cat("l_returnflag")
      val entries = reasonMap.map { case (c, rc) =>
        val woe =
          if (c == "l_returnflag")
            graft.ops.Normalize.woeCategorical(col(c),
              rp.binning.binCategory, rp.binning.binCountWoe)
          else {
            val p = num(c)
            graft.ops.Normalize.woeNumeric(col(c),
              p.binning.binBoundary, p.binning.binCountWoe)
          }
        struct(woe.as("woe"), lit(rc).as("rc"))
      }
      val srt = sort_array(array(entries: _*))
      d.select(col("l_orderkey"), col("l_linenumber"),
        element_at(srt, 1).getField("rc").as("reason_1"),
        element_at(srt, 2).getField("rc").as("reason_2"),
        element_at(srt, 3).getField("rc").as("reason_3"))
    },
    oracle = Some {
      val numCols = Seq("l_quantity", "l_discount", "l_tax")
      val mmSel = numCols
        .map(c => s"min($c) AS mn_$c, max($c) AS mx_$c").mkString(", ")
      def arms(c: String) = (1 until binK).reverse
        .map(i => s"WHEN $c >= mn_$c + (mx_$c - mn_$c) * $i / $binK THEN $i")
        .mkString(" ")
      val binSel = numCols
        .map(c => s"CASE WHEN $c IS NULL THEN $binK ${arms(c)} ELSE 0 END AS b_$c")
        .mkString(",\n        ")
      val woeCtes = numCols.map { c =>
        s"""w_$c AS (SELECT b_$c,
           |    ln((sum(pos) / sp + 1e-10)
           |       / ((count(*) - sum(pos)) / sn + 1e-10)) AS woe_$c
           |  FROM b, tot GROUP BY b_$c, sp, sn)""".stripMargin
      }.mkString(",\n")
      val structs = (numCols.map(c =>
        s"{'woe': w_$c.woe_$c, 'rc': '${reasonMap.toMap.apply(c)}'}") :+
        s"{'woe': w_flag.woe_f, 'rc': 'RC_FLAG'}").mkString(",\n      ")
      val joins = numCols.map(c => s"JOIN w_$c USING (b_$c)")
        .mkString(" ") +
        " JOIN w_flag ON b.l_returnflag" +
        " IS NOT DISTINCT FROM w_flag.l_returnflag"
      s"""WITH mm AS (SELECT $mmSel FROM lineitem),
         |b AS (SELECT l_orderkey, l_linenumber, l_returnflag,
         |        $binSel,
         |        CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
         |      FROM lineitem, mm),
         |tot AS (SELECT sum(pos)::DOUBLE AS sp,
         |               (count(*) - sum(pos))::DOUBLE AS sn FROM b),
         |$woeCtes,
         |w_flag AS (SELECT l_returnflag,
         |    ln((sum(pos) / sp + 1e-10)
         |       / ((count(*) - sum(pos)) / sn + 1e-10)) AS woe_f
         |  FROM b, tot GROUP BY l_returnflag, sp, sn),
         |j AS (SELECT b.l_orderkey, b.l_linenumber, list_sort([
         |      $structs]) AS srt
         |  FROM b $joins)
         |SELECT l_orderkey, l_linenumber,
         |  srt[1].rc AS reason_1, srt[2].rc AS reason_2, srt[3].rc AS reason_3
         |FROM j
         |""".stripMargin
    })

  // ---- §2.7 external-score eval path ---------------------------------------

  /** External (meta-column) score evaluation (reference
    * `udf/ColumnProjector.java:113-160` + `EvalScoreMetaSort.pig`): the
    * score is NOT produced by the engine — the (target, weight, metaScore)
    * triple is projected straight off the eval set and fed to the same
    * distributed weighted sweep as internal scores. Integer-valued weight
    * keeps the cumulative sums exact across engines. */
  private val evalExternal: Q = Q(
    fn = (s, dir) => graft.eval.Eval.weightedSweep(li(s, dir),
      col("l_tax") * 1000, isPos, col("l_quantity"),
      Seq(col("l_orderkey"), col("l_linenumber"))),
    oracle = Some(
      s"""WITH s AS (
         |  SELECT CASE WHEN $posCond THEN 1 ELSE 0 END AS pos,
         |    l_quantity AS w,
         |    ntile(10) OVER (ORDER BY l_tax * 1000 DESC, l_orderkey,
         |                    l_linenumber) AS bucket
         |  FROM lineitem),
         |pb AS (SELECT bucket, sum(pos) AS b_pos, count(*) AS b_n,
         |         sum(CASE WHEN pos = 1 THEN w ELSE 0.0 END) AS b_wpos,
         |         sum(w) AS b_w
         |       FROM s GROUP BY bucket),
         |c AS (SELECT bucket,
         |  sum(b_pos) OVER (ORDER BY bucket) AS tp,
         |  sum(b_n) OVER (ORDER BY bucket) - sum(b_pos) OVER (ORDER BY bucket) AS fp,
         |  sum(b_pos) OVER () - sum(b_pos) OVER (ORDER BY bucket) AS fn,
         |  (sum(b_n) OVER () - sum(b_pos) OVER ())
         |    - (sum(b_n) OVER (ORDER BY bucket)
         |       - sum(b_pos) OVER (ORDER BY bucket)) AS tn,
         |  sum(b_wpos) OVER (ORDER BY bucket) AS wtp,
         |  sum(b_w) OVER (ORDER BY bucket) - sum(b_wpos) OVER (ORDER BY bucket) AS wfp,
         |  sum(b_wpos) OVER () - sum(b_wpos) OVER (ORDER BY bucket) AS wfn,
         |  (sum(b_w) OVER () - sum(b_wpos) OVER ())
         |    - (sum(b_w) OVER (ORDER BY bucket)
         |       - sum(b_wpos) OVER (ORDER BY bucket)) AS wtn
         |FROM pb)
         |SELECT bucket, tp::BIGINT AS tp, fp::BIGINT AS fp, fn::BIGINT AS fn,
         |  tn::BIGINT AS tn, round(wtp, 4) AS wtp, round(wfp, 4) AS wfp,
         |  round(wfn, 4) AS wfn, round(wtn, 4) AS wtn
         |FROM c
         |""".stripMargin))

  // ---- §2.7 tree-ensemble scoring (MiningModel/Segmentation semantics) ----

  /** A literal 3-tree "random forest" scored through
    * [[graft.score.Pmml.Ensemble.score]] — the whole forest folds into one
    * codegen'd CASE chain per tree, averaged row-locally (the PMML
    * MiningModel "average" combination). Thresholds/leaves are exact
    * binary fractions, the SQL mirrors the identical IEEE op order, so the
    * per-row doubles are bit-exact against the oracle. */
  private val treeEnsemble: Q = {
    import graft.score.Pmml.{Ensemble, RLeaf, RSplit}
    val trees = Vector(
      RSplit("l_quantity", 25.0,
        RSplit("l_discount", 0.05, RLeaf(0.125), RLeaf(0.375)),
        RLeaf(0.75)),
      RSplit("l_extendedprice", 30000.0,
        RLeaf(0.25),
        RSplit("l_quantity", 40.0, RLeaf(0.5), RLeaf(0.875))),
      RSplit("l_tax", 0.04, RLeaf(0.0625), RLeaf(0.5625)))
    val e = Ensemble(Seq("l_quantity", "l_discount", "l_extendedprice",
      "l_tax"), trees, Vector.fill(3)(1.0), "average")
    def sql(n: graft.score.Pmml.RNode): String = n match {
      case RLeaf(v) => v.toString
      case RSplit(f, t, l, r) =>
        s"(CASE WHEN $f <= $t THEN ${sql(l)} ELSE ${sql(r)} END)"
    }
    Q(
      fn = (s, dir) => li(s, dir).select(col("l_orderkey"),
        col("l_linenumber"), e.score.as("rf_score")),
      oracle = Some {
        val Seq(t1, t2, t3) = trees.map(sql)
        // same reduce order as Ensemble.score: ((t1 + t2) + t3) / 3.0
        s"""SELECT l_orderkey, l_linenumber,
           |  (($t1 + $t2) + $t3) / 3.0 AS rf_score
           |FROM lineitem
           |""".stripMargin
      })
  }

  val all: Map[String, Q] = Map(
    "q_score_ensemble" -> scoreEnsemble,
    "q_score_tree_ensemble" -> treeEnsemble,
    "q_reason_codes_topn" -> reasonCodesTopN,
    "q_eval_external"  -> evalExternal,
    "q_tree_encode"    -> treeEncode,
    "q_sensitivity"    -> sensitivity,
    "q_varsel_ks"      -> varselKs,
    "q_varsel_iv"      -> varselIv,
    "q_bin_avg_score"  -> binAvgScore,
    "q_reason_codes"   -> reasonCodes,
  )
}
