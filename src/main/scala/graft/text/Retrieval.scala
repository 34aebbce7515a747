package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse keyword retrieval over a document corpus — the BM25 scorer every
  * contamination screen / eval-set retrieval harness runs before reaching
  * for embeddings (cf. the reference's eval-set matching utilities; scoring
  * math per Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework: BM25 and Beyond").
  *
  * Scale shape: the query-term set is BOUNDED (a benchmark prompt, a
  * handful of keywords), so per-doc term frequencies are fixed narrow
  * columns — no posting-list shuffle at all. Corpus statistics (N, Σdl,
  * per-term df) are ONE scalar aggregate broadcast back as a 1-row cross
  * join, and final selection is the bounded [[graft.agg.TopKAgg]]: the
  * only exchange moves `partitions × k` candidate rows. A 100 TB corpus
  * costs one scan + one k-row-per-partition shuffle.
  */
object Retrieval {

  /** BM25 top-k over `docs(doc_id, text)` for a bounded `terms` set.
    *
    * Determinism contract (oracle parity): tf/dl/df/N are integer-valued
    * doubles (exact), avgdl = Σdl/N is a single IEEE division, and the
    * per-term partial scores are summed IN `terms` ORDER — the oracle SQL
    * writes the identical expression tree, so scores match bit-for-bit
    * modulo the engines' `ln` (≤1 ulp apart, absorbed by round-6 except
    * on exact representational ties, which tie-break by doc_id in both
    * engines identically). Output: (rank, doc_id, score) with rank by
    * (score desc, doc_id asc).
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    val base = docs.select(col("doc_id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val withTf = terms.indices.foldLeft(base) { case (d, i) =>
      d.withColumn(s"tf_$i",
        size(filter(col("toks"), x => x === lit(terms(i)))).cast("double"))
    }.drop("toks")
    // corpus stats: one tiny scalar aggregate, re-attached by broadcast
    val statAggs = sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i"))
    val stats = withTf.agg(count(lit(1)).cast("double").as("n_docs"),
      statAggs: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl") / col("n_docs")
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val df = col(s"df_$i")
      val idf = log((col("n_docs") - df + lit(0.5)) / (df + lit(0.5))
        + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    }.reduce(_ + _)
    scored.select(lit(1).as("g"), score.as("s"), col("doc_id"))
      .groupBy("g")
      .agg(graft.agg.TopKAgg.topK(k)(col("s"), col("doc_id")).as("top"))
      .select(posexplode(col("top")).as(Seq("p", "t")))
      .select((col("p") + 1).cast("int").as("rank"),
        col("t._2").as("doc_id"),
        round(col("t._1"), 6).as("score"))
  }

  /** Sliding-window chunker with overlap — the RAG/embedding-prep cut
    * (window tokens per chunk, advancing by stride < window so adjacent
    * chunks share context). Pure per-doc integer math: a `sequence` +
    * `posexplode` narrow explode, NO shuffle — output size is corpus
    * tokens × (window/stride) rows regardless of partitioning, the plan
    * every 100 TB chunker wants. Chunk count per doc:
    * 1 if n ≤ window else ceil((n − window) / stride) + 1 (the final
    * chunk is the only one allowed shorter than `window`; empty docs get
    * one empty chunk so corpus accounting stays exact). */
  def slidingChunks(docs: DataFrame, nTokensCol: Column,
                    window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val n = nTokensCol.cast("long")
    val nChunks = when(n <= window, lit(1L))
      .otherwise(ceil((n - lit(window)).cast("double") / lit(stride))
        .cast("long") + lit(1L))
    docs.select(col("doc_id"), n.as("n_tokens"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("n_tokens"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)).as(
          Seq("chunk_idx", "zero")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        least(col("chunk_idx") * stride + window, col("n_tokens"))
          .cast("long").as("end_tok"))
      .withColumn("chunk_tokens", col("end_tok") - col("start_tok"))
  }
}
