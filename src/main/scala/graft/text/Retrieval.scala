package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval selection over the corpus-curation scorers in [[TextOps]].
  */
object Retrieval {

  /** BM25 top-k retrieval: [[TextOps.bm25]] per-doc scores (one stats
    * scan folding N/Σdl/df into codegen literals, then a pure narrow
    * scoring map) + the bounded [[graft.agg.TopKAgg]] selection — the
    * only exchange moves `partitions × k` candidate rows, never a global
    * sort of the corpus. Output: (rank, doc_id, score) ranked by
    * (score desc, doc_id asc); scores carry TextOps.bm25's round-6
    * contract, so ranking is deterministic cross-engine. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    TextOps.bm25(docs, terms, k1, b)
      .select(lit(1).as("g"), col("bm25").as("s"), col("doc_id"))
      .groupBy("g")
      .agg(graft.agg.TopKAgg.topK(k)(col("s"), col("doc_id")).as("top"))
      .select(posexplode(col("top")).as(Seq("p", "t")))
      .select((col("p") + 1).cast("int").as("rank"),
        col("t._2").as("doc_id"),
        col("t._1").as("score"))
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
