package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical association statistics: chi-square independence,
  * Cramér's V, and mutual information — the information-theoretic
  * complements to the reference's KS/IV variable-ranking family
  * (`core/ColumnStatsCalculator.java:31-180`,
  * `core/VariableSelector.java:180-260`). IV already measures a
  * binary-target association; chi²/V/MI extend ranking to
  * categorical×categorical pairs and multi-valued targets.
  *
  * Scale shape: ONE corpus-scan groupBy produces the contingency cells;
  * everything after runs on the bounded cell table (levels², not rows) —
  * margins, the expected-count grid (cross join of two margin tables,
  * r×c rows), and the final one-row aggregate. Zero-observed cells are
  * materialized by the margin cross join so their expected mass still
  * counts, exactly as the textbook statistic requires.
  */
object Assoc {

  /** One-row (chi2, cramers_v, dof) for the `a` × `b` contingency table.
    * Both columns must be bounded-cardinality categoricals (levels fit
    * in memory as a cell table — 10⁴ cells is nothing; the corpus scan
    * is the only O(n) step). */
  def chiSquare(df: DataFrame, a: String, b: String,
      scale: Int = 6): DataFrame = {
    // NULL levels are excluded up front: they count toward margins and
    // level ranks but can never match the equi-join re-attach below, so
    // keeping them silently zeroes their observed cells while retaining
    // their expected mass — the textbook statistic drops incomplete pairs
    val o = df.filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a).as("a"), col(b).as("b"))
      .agg(count(lit(1)).cast("double").as("n"))
    o.cache()
    try {
      val ma = o.groupBy("a").agg(sum("n").as("na"))
      val mb = o.groupBy("b").agg(sum("n").as("nb"))
      val Array(nt, r, c) = o.agg(sum("n"),
          countDistinct("a").cast("double"),
          countDistinct("b").cast("double"))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      val e = col("na") * col("nb") / lit(nt)
      val grid = ma.crossJoin(mb) // bounded: levels(a) × levels(b)
        .join(o, Seq("a", "b"), "left")
        .withColumn("n", coalesce(col("n"), lit(0.0)))
      val dof = ((r - 1) * (c - 1)).toLong
      // min(r,c)=1 means V is undefined (zero denominator) — emit NULL,
      // not NaN, so downstream aggregates don't silently poison
      val vDenom = math.min(r, c) - 1.0
      val vExpr =
        if (vDenom <= 0.0) lit(null).cast("double")
        else round(sqrt(col("chi2_raw") / (lit(nt) * lit(vDenom))), scale)
      grid.agg(
          sum((col("n") - e) * (col("n") - e) / e).as("chi2_raw"))
        .select(round(col("chi2_raw"), scale).as("chi2"),
          vExpr.as("cramers_v"),
          lit(dof).as("dof"))
    } finally o.unpersist(false)
  }

  /** mRMR greedy feature ordering (Peng et al. 2005): pick the feature
    * maximizing relevance − mean redundancy to the already-selected
    * set. Pure driver math over the bounded relevance vector and
    * redundancy matrix (both computed distributed — q_mutual_info /
    * q_mi_matrix shapes); ties break lexicographically for
    * determinism. */
  def mrmrOrder(relevance: Map[String, Double],
      redundancy: Map[(String, String), Double]): Seq[String] = {
    def red(a: String, b: String): Double =
      redundancy.getOrElse((a, b), redundancy.getOrElse((b, a), 0.0))
    val order = collection.mutable.ArrayBuffer[String]()
    val remaining = collection.mutable.TreeSet(relevance.keys.toSeq: _*)
    while (remaining.nonEmpty) {
      val pick = remaining.maxBy(f => {
        val penalty =
          if (order.isEmpty) 0.0
          else order.map(s => red(f, s)).sum / order.size
        (relevance(f) - penalty, f) // tuple: score, then lex tiebreak
      })(Ordering.Tuple2(Ordering.Double.TotalOrdering,
        Ordering.String.reverse))
      order += pick
      remaining -= pick
    }
    order.toSeq
  }

  /** Mutual information (nats) between a discrete column and a binary
    * condition, from a precomputed (cell, isPos, count) contingency
    * DataFrame keyed by `feature`. Input must already be bounded (bins ×
    * 2 rows per feature); pure cell-table math, mirrored in oracle SQL:
    * MI = Σ (nxy/nt) · ln( (nxy·nt) / (nx·ny) ). */
  def mutualInfo(cells: DataFrame, feature: String, x: String,
      y: String, n: String, scale: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(feature)
    val wx = org.apache.spark.sql.expressions.Window.partitionBy(feature, x)
    val wy = org.apache.spark.sql.expressions.Window.partitionBy(feature, y)
    // windows over the bounded cell table — never over the corpus
    cells
      .withColumn("nt", sum(n).over(w))
      .withColumn("nx", sum(n).over(wx))
      .withColumn("ny", sum(n).over(wy))
      .groupBy(feature)
      .agg(round(sum(
        (col(n) / col("nt")) *
          log(col(n) * col("nt") / (col("nx") * col("ny")))), scale)
        .as("mi_nats"))
  }
}
