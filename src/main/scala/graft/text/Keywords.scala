package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — the classic per-document salient-term
  * primitive (corpus tagging, topic routing, index building).
  *
  * Scale design: term frequencies are ONE (doc, term)-keyed map-combined
  * groupBy over the token stream; document frequencies reduce that table
  * again to vocabulary-bounded rows and re-attach through a size-gated
  * broadcast (vocab tables are MBs even at web scale; the gate falls
  * back to a hash join past the threshold — `ops/PlanHints.scala`). The
  * per-doc top-k runs through the bounded [[graft.agg.TopKStrAgg]]
  * partial aggregate, so the final exchange moves docs × k rows — never
  * a per-doc window sort over the full (doc, term) table. */
object Keywords {

  /** Top-k terms per document by tf·ln(N/df), deterministic
    * (score DESC, term ASC) order. Output:
    * (doc_id, rank, term, tf, df, score_r). */
  def tfidfKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val n = docs.count().toDouble
    val tf = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(graft.ops.PlanHints.gatedBroadcast(df), Seq("t"))
      .select(col("doc_id"), col("t"), col("tf"), col("df"),
        (col("tf").cast("double") * log(lit(n) / col("df"))).as("score"))
    val top = scored
      .groupBy("doc_id")
      .agg(graft.agg.TopKStrAgg.topK(k)(col("score"), col("t")).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("p", "e")))
      .select(col("doc_id"), (col("p") + 1).cast("int").as("rank"),
        col("e._2").as("term"), col("e._1").as("score"))
    // re-attach tf/df for the audit columns: join back on (doc, term) —
    // ids+term only, co-partitioned with the tf table's own key
    top.join(scored.select(col("doc_id"), col("t").as("term"),
        col("tf"), col("df")), Seq("doc_id", "term"))
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score_r"))
  }
}
