package graft

import org.apache.spark.sql.functions._

import graft.eval.Eval

/** The full `stats → varsel → norm → score → eval` lifecycle (SURVEY §3) as
  * ONE oracle-checked query: per-feature moments feed a correlation-ranked
  * variable selection, the selected features z-score normalize with the
  * train stats, a fixed-weight linear model scores every row, and the
  * distributed confusion sweep yields the ROC AUC — the whole Shifu
  * pipeline shape, engine-native, end to end. */
object QueriesPipeline {
  import QueryUtil._

  private val feats = Seq("l_quantity", "l_discount", "l_tax")

  private val pipelineE2e: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      // stats: one aggregate pass over all candidate features (+ label corr)
      val aggs = feats.flatMap { c =>
        Seq(sum(col(c)).as(s"s1_$c"), sum(col(c) * col(c)).as(s"s2_$c"),
          sum(when(isPos, col(c)).otherwise(0.0)).as(s"sp_$c"))
      } ++ Seq(count(lit(1)).as("cnt"),
        sum(when(isPos, 1.0).otherwise(0.0)).as("np"))
      val st = d.agg(aggs.head, aggs.tail: _*).head()
      val cnt = st.getAs[Long]("cnt").toDouble
      val np = st.getAs[Double]("np")
      // varsel: |pointwise corr(feature, pos)| =
      //   |n·Σxy − Σx·Σy| / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)), y∈{0,1}
      val ranked = feats.map { c =>
        val s1 = st.getAs[Double](s"s1_$c")
        val s2 = st.getAs[Double](s"s2_$c")
        val sp = st.getAs[Double](s"sp_$c")
        val num = math.abs(cnt * sp - s1 * np)
        val den = math.sqrt((cnt * s2 - s1 * s1) * (cnt * np - np * np))
        // a feature whose moments overflowed (or with zero variance)
        // has an UNDEFINED corr — it ranks at 0, never wins selection;
        // without this the engines break the NaN tie differently
        val r0 = num / den
        (c, if (java.lang.Double.isFinite(r0)) r0 else 0.0)
      }.sortBy { case (c, r) => (-r, c) }
      val selected = ranked.take(2).map(_._1)
      // norm: z-score of the selected features with the train stats
      val zCols = selected.map { c =>
        val s1 = st.getAs[Double](s"s1_$c")
        val s2 = st.getAs[Double](s"s2_$c")
        val mean = s1 / cnt
        val std = math.sqrt((s2 - s1 * s1 / cnt) / (cnt - 1))
        least(greatest((col(c) - lit(mean)) / lit(std), lit(-6.0)), lit(6.0))
      }
      // score: fixed-weight linear ensemble member over normalized features
      val score = round(zCols.head * lit(0.7) + zCols(1) * lit(0.3), 6)
      // eval: distributed sweep → ROC AUC
      val auc = Eval.rocAuc(Eval.confusionSweep(d, score, isPos,
        Seq(col("l_orderkey"), col("l_linenumber"))))
        .head().getDouble(0)
      import s.implicits._
      Seq((selected.head, selected(1), auc))
        .toDF("feat_1", "feat_2", "auc")
    },
    oracle = Some {
      val statsCte = feats.map { c =>
        s"sum($c) AS s1_$c, sum($c * $c) AS s2_$c, " +
          s"sum(CASE WHEN $posCond THEN $c ELSE 0.0 END) AS sp_$c"
      }.mkString(",\n    ")
      val rankRows = feats.map { c =>
        s"SELECT '$c' AS f, CASE WHEN isnan(abs(cnt * sp_$c - s1_$c * np) " +
          s"/ sqrt((cnt * s2_$c - s1_$c * s1_$c) * (cnt * np - np * np))) " +
          s"OR isinf(abs(cnt * sp_$c - s1_$c * np) " +
          s"/ sqrt((cnt * s2_$c - s1_$c * s1_$c) * (cnt * np - np * np))) " +
          s"THEN 0.0 ELSE abs(cnt * sp_$c - s1_$c * np) " +
          s"/ sqrt((cnt * s2_$c - s1_$c * s1_$c) * (cnt * np - np * np)) END " +
          s"AS r, s1_$c AS s1, s2_$c AS s2 FROM st"
      }.mkString("\nUNION ALL\n")
      s"""WITH st AS (
         |  SELECT $statsCte,
         |    count(*)::DOUBLE AS cnt,
         |    sum(CASE WHEN $posCond THEN 1.0 ELSE 0.0 END) AS np
         |  FROM lineitem),
         |ranked AS (
         |  SELECT f, r, s1, s2, row_number() OVER (ORDER BY r DESC, f) AS rk
         |  FROM ($rankRows)),
         |sel AS (
         |  SELECT
         |    max(CASE WHEN rk = 1 THEN f END) AS f1,
         |    max(CASE WHEN rk = 2 THEN f END) AS f2,
         |    max(CASE WHEN rk = 1 THEN s1 END) AS f1_s1,
         |    max(CASE WHEN rk = 1 THEN s2 END) AS f1_s2,
         |    max(CASE WHEN rk = 2 THEN s1 END) AS f2_s1,
         |    max(CASE WHEN rk = 2 THEN s2 END) AS f2_s2
         |  FROM ranked),
         |z AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos,
         |    round(
         |      least(greatest((CASE f1 ${feats.map(c => s"WHEN '$c' THEN $c").mkString(" ")} END
         |          - f1_s1 / cnt) / sqrt((f1_s2 - f1_s1 * f1_s1 / cnt) / (cnt - 1)),
         |        -6.0), 6.0) * 0.7
         |      + least(greatest((CASE f2 ${feats.map(c => s"WHEN '$c' THEN $c").mkString(" ")} END
         |          - f2_s1 / cnt) / sqrt((f2_s2 - f2_s1 * f2_s1 / cnt) / (cnt - 1)),
         |        -6.0), 6.0) * 0.3, 6) AS score
         |  FROM lineitem, sel, st),
         |s AS (
         |  SELECT pos, ntile(10) OVER (ORDER BY score DESC, l_orderkey,
         |    l_linenumber) AS bucket FROM z),
         |pb AS (SELECT bucket, sum(pos) AS b_pos, count(*) AS b_n
         |       FROM s GROUP BY bucket),
         |c AS (SELECT bucket,
         |  sum(b_pos) OVER (ORDER BY bucket) AS tp,
         |  sum(b_n) OVER (ORDER BY bucket) - sum(b_pos) OVER (ORDER BY bucket) AS fp,
         |  sum(b_pos) OVER () - sum(b_pos) OVER (ORDER BY bucket) AS fn,
         |  (sum(b_n) OVER () - sum(b_pos) OVER ())
         |    - (sum(b_n) OVER (ORDER BY bucket)
         |       - sum(b_pos) OVER (ORDER BY bucket)) AS tn
         |FROM pb),
         |r AS (SELECT bucket, fp::DOUBLE / (fp + tn) AS fpr,
         |             tp::DOUBLE / (tp + fn) AS tpr FROM c),
         |l AS (SELECT fpr, tpr,
         |        lag(fpr, 1, 0.0) OVER (ORDER BY bucket) AS fpr0,
         |        lag(tpr, 1, 0.0) OVER (ORDER BY bucket) AS tpr0
         |      FROM r)
         |SELECT (SELECT f1 FROM sel) AS feat_1, (SELECT f2 FROM sel) AS feat_2,
         |  round(sum((fpr - fpr0) * (tpr + tpr0) / 2), 6) AS auc
         |FROM l
         |""".stripMargin
    })

  val all: Map[String, Q] = Map("q_pipeline_e2e" -> pipelineE2e)
}
