package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for the ANN/retrieval family: MRR@k and
  * NDCG@k of an approximate ranked result list against a relevance set
  * (binary relevance — e.g. membership in the exact cosine top-k).
  * Recall says WHETHER the truth was found; these say WHERE it landed —
  * the contract numbers a retrieval-augmented pipeline actually tunes.
  *
  * Scale: both inputs are (query, neighbor) id pairs (never vectors);
  * the join is a co-partitioned left-semi on the pair key, per-query
  * reduction is a bounded agg (each query contributes ≤ k hit rows),
  * and only the final 1-row mean crosses to the driver. */
object RetrievalEval {

  /** `ranked`: (vec_id, rank, nb_id) with rank 1-based ≤ k per query;
    * `truth`: (vec_id, nb_id) relevant pairs, ≥ k per query (exact
    * top-k ground truth has exactly k — IDCG@k is then the constant
    * Σ_{i=1..k} 1/log2(i+1)). Queries with zero hits contribute 0 to
    * both means. Output: one row (method, n_queries, mrr_r, ndcg_r). */
  def mrrNdcg(ranked: DataFrame, truth: DataFrame, k: Int,
              method: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val idcg = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    val hits = ranked.filter(col("rank") <= k)
      .join(truth, Seq("vec_id", "nb_id"), "left_semi")
      .groupBy("vec_id")
      .agg((lit(1.0) / min("rank")).as("rr"),
        (sum(lit(1.0) / log(2.0, col("rank") + 1)) / idcg).as("ndcg"))
    truth.select("vec_id").distinct()
      .join(hits, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        round(avg(coalesce(col("rr"), lit(0.0))), 6).as("mrr_r"),
        round(avg(coalesce(col("ndcg"), lit(0.0))), 6).as("ndcg_r"))
      .select(lit(method).as("method"), col("n_queries"), col("mrr_r"),
        col("ndcg_r"))
  }
}
