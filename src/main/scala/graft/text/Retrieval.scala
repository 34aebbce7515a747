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

  /** Hard-negative mining for retrieval training data (the DPR recipe:
    * the top BM25-scoring docs that are NOT a query's labeled positives
    * become its hard negatives). All queries score in ONE corpus scan:
    * the distinct-term document frequencies fold into one map-side
    * aggregate (|terms|+2 numbers to the driver), every query's score is
    * a codegen'd expression over the SAME row-local token array, and the
    * per-query candidate pool is a bounded [[graft.agg.TopKAgg]]
    * (queries × (k+headroom) rows shuffled — never a corpus sort, never
    * one scan per query). The positive scrub is a left-anti join on the
    * bounded candidate set; the final re-rank window runs over
    * ≤ k+headroom rows per query, not the corpus.
    *
    * Two-stage contract (mirrored exactly by the oracle): top
    * (k+headroom) by (score desc, doc_id asc) → remove positives →
    * re-rank → top k. If a query's positives crowd out more than
    * `headroom` of its pool, it simply yields fewer than k negatives —
    * the deterministic, oracle-checkable behavior. */
  def hardNegatives(docs: DataFrame, queries: Seq[(Long, Seq[String])],
                    positives: DataFrame, k: Int, headroom: Int = 10,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "hardNegatives needs at least one query")
    require(k > 0 && headroom >= 0, s"bad k=$k headroom=$headroom")
    val allTerms = queries.flatMap(_._2).distinct
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    val base = docs.select(col("doc_id"), toks.as("toks"),
      size(toks).cast("long").as("dl"))
    val statAggs = Seq(count(lit(1)).as("n"), sum("dl").as("sumdl")) ++
      allTerms.zipWithIndex.map { case (t, i) =>
        sum(array_contains(col("toks"), t).cast("long")).as(s"df_$i") }
    val stats = base.agg(statAggs.head, statAggs.tail: _*).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    val dfOf = allTerms.zipWithIndex
      .map { case (t, i) => t -> stats.getLong(2 + i) }.toMap
    def scoreOf(terms: Seq[String]): Column = terms.map { t =>
      val df = dfOf(t)
      val idf = log((lit(n) - lit(df) + lit(0.5)) /
        (lit(df) + lit(0.5)) + lit(1.0))
      val tf = size(filter(col("toks"), x => x === t)).cast("double")
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    }.reduceLeft(_ + _)
    val qCols = queries.map { case (qid, terms) =>
      struct(lit(qid).as("query_id"), round(scoreOf(terms), 6).as("score"))
    }
    val cand = base
      .select(col("doc_id"), explode(array(qCols: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("doc_id"),
        col("qs.score").as("score"))
      .groupBy("query_id")
      .agg(graft.agg.TopKAgg.topK(k + headroom)(col("score"), col("doc_id"))
        .as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t._2").as("doc_id"),
        col("t._1").as("score"))
    val negs = cand.join(positives, Seq("query_id", "doc_id"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    negs.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
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
