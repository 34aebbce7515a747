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

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local fingerprinting scheme): hash every k-token shingle,
    * slide a window of `w` consecutive hashes, and keep each window's
    * minimum (rightmost on ties — "robust winnowing", so one selected
    * position covers many windows). Guarantees every match of length
    * ≥ w + k − 1 tokens shares a fingerprint, with expected density 2/(w+1)
    * — the local-span dedup primitive between exact-hash and MinHash.
    *
    * Plan shape: shingle hashing is a narrow `transform`+`posexplode`
    * (corpus-linear, zero shuffle); the window minimum needs per-doc
    * event order, so it hash-partitions by doc_id — docs parallelize
    * across the cluster and a single doc is MB-bounded, so there is no
    * head-of-line task (unlike a corpus-global window). Hash is the
    * 10-hex-digit md5 prefix (40 bits) packed with the 20-bit position
    * into ONE BIGINT so the rightmost-tie argmin is a plain integer `min`
    * that DuckDB replays exactly; swap in xxhash64 when cross-engine
    * parity isn't needed.
    *
    * Output: (doc_id, pos, fp) — distinct selected fingerprints; docs
    * shorter than k + w − 1 tokens yield the minimum over their full
    * (shorter) windows; docs with < k tokens yield no rows.
    */
  def winnow(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(w > 0, s"w must be positive, got $w")
    require(w <= (1 << 20), s"w and doc positions must fit 20 bits")
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    val grams = docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        (size(col("toks")) - k + 1).cast("long").as("n_grams"),
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - k),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(k)))))
          .as(Seq("pos", "gram")))
    // 40-bit hash ⊕ 20-bit complemented position → integer argmin selects
    // (min hash, rightmost pos); decode is shift/mask, never FP division
    val h = conv(substring(md5(col("gram").cast("binary")), 1, 10), 16, 10)
      .cast("long")
    val keyed = grams.select(col("doc_id"), col("n_grams"),
      col("pos").cast("long").as("pos"),
      (h * lit(1L << 20) + (lit((1L << 20) - 1) - col("pos"))).as("key"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    keyed
      .select(col("doc_id"), col("pos"), col("n_grams"),
        min(col("key")).over(win).as("sel"))
      // standard winnowing emits FULL windows only; a doc with fewer than
      // w grams contributes its single whole-doc window (the last row)
      .filter(col("pos") >= least(lit(w - 1L), col("n_grams") - 1))
      .select(col("doc_id"), col("sel")).distinct()
      .select(col("doc_id"),
        (lit((1L << 20) - 1) - col("sel").bitwiseAND(lit((1L << 20) - 1)))
          .as("pos"),
        shiftright(col("sel"), 20).as("fp"))
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
