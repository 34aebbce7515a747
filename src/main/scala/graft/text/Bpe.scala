package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application (Sennrich et al.
  * 2016 — the subword scheme behind GPT/Llama-family vocabularies).
  *
  * Scale shape — the part that matters at 100 TB: BPE never needs the
  * corpus more than once. Training operates on the WORD-FREQUENCY table
  * (one distributed `explode`+`groupBy` scan, map-side combined, capped
  * to `maxVocab` rows by a bounded `TakeOrderedAndProject` heap), and the
  * merge loop itself is driver math over that bounded table — exactly how
  * single-node tokenizer trainers (HF `tokenizers`, sentencepiece) do it,
  * except the corpus-scale word count is Spark's. Application (encoding)
  * touches each DISTINCT word once (vocabulary-bounded shuffle), then
  * re-attaches via a broadcast join — the corpus itself is only ever
  * narrow-mapped.
  *
  * Determinism: merge selection is (max pair frequency, then
  * lexicographically smallest pair) — no iteration-order or hash-order
  * dependence, so the merge table is reproducible run to run and across
  * partitionings (word counts are exact longs).
  */
object Bpe {

  /** Corpus word frequencies, capped to the `maxVocab` most frequent
    * (count desc, word asc — deterministic): ONE corpus scan, bounded
    * result. The heap-based sort-limit moves ≤ partitions × maxVocab
    * rows, never the full distinct-word table, to the driver. */
  def wordFreq(docs: DataFrame, maxVocab: Int = 65536): Seq[(String, Long)] = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    docs
      .select(explode(filter(split(lower(col("text")), " "),
        t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Replace every adjacent (l, r) occurrence with the fused symbol —
    * left-to-right, non-overlapping (the standard BPE merge step). */
  def applyMerge(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Driver merge loop over the bounded word-frequency table: at each of
    * `numMerges` steps count adjacent symbol pairs (weighted by word
    * frequency), fuse the most frequent (ties: lexicographic), stop early
    * if no pairs remain. O(numMerges × Σ word lengths) — bounded by
    * maxVocab, independent of corpus size. */
  def train(freqs: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    var words = freqs.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var done = 0
    var exhausted = false
    while (done < numMerges && !exhausted) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, f) => (applyMerge(syms, best), f) }
        done += 1
      }
    }
    merges.result()
  }

  /** Encode one word with a trained merge-rank table: repeatedly fuse the
    * LOWEST-RANK adjacent pair present (the exact inference rule of
    * rank-ordered BPE; unseen pairs never fuse, so out-of-vocabulary
    * words degrade to characters, never fail). */
  def encode(word: String,
             rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = applyMerge(syms, (syms(bestIdx), syms(bestIdx + 1)))
    }
    syms
  }

  /** Per-doc BPE token counts under a trained merge table:
    * (doc_id, n_words, n_chars, n_bpe_tokens). The merge loop runs once
    * per DISTINCT word (vocabulary-bounded, via a map-side-combined
    * distinct), results re-attach by broadcast join — the corpus pass is
    * narrow. Docs with no tokens keep a zero row (corpus accounting). */
  def tokenCounts(docs: DataFrame,
                  merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val rank = merges.zipWithIndex.toMap
    val bcRank = spark.sparkContext.broadcast(rank)
    val encLen = udf { (w: String) =>
      if (w == null || w.isEmpty) 0L else encode(w, bcRank.value).length.toLong
    }
    val toks = docs.select(col("doc_id"),
      explode(filter(split(lower(col("text")), " "), t => t =!= "")).as("w"))
    // size-gated: the distinct-word table is VOCABULARY-bounded in
    // practice but not by construction — an unconditional broadcast()
    // here would be a driver OOM on a 10⁹-distinct-token crawl. The gate
    // broadcasts when the plan's own estimate fits; above that the join
    // falls back to a hash shuffle keyed by word (still vocab-sized, not
    // corpus-sized, on the encode side).
    val sub = graft.ops.PlanHints.gatedBroadcast(
      toks.select("w").distinct()
        .select(col("w"), encLen(col("w")).as("n_sub"),
          length(col("w")).cast("long").as("n_ch")))
    val perDoc = toks.join(sub, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_ch").as("n_chars"),
        sum("n_sub").as("n_bpe_tokens"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_words", "n_chars", "n_bpe_tokens"))
  }
}
