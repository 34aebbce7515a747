package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich/Haddow/Birch, ACL 2016) —
  * the tokenizer-training primitive of every LLM data pipeline, and the
  * standard trainer design (HuggingFace `tokenizers` BpeTrainer): train
  * on the WORD-FREQUENCY table, not the corpus.
  *
  * Scale design: the corpus is scanned exactly ONCE (the word-count
  * groupBy, map-side combined); every subsequent merge round operates on
  * the word-frequency table, whose row count is the VOCABULARY (further
  * bounded by `wordCap` through a TakeOrderedAndProject top-k — never a
  * global-window rank). At 100 TB the corpus stream is petabytes but the
  * capped word table is megabytes; n merge rounds are n tiny bounded
  * jobs, each one groupBy over ≤ wordCap rows with a LIMIT-1 top pair.
  * Lineage is truncated every few rounds (the symbol column is rewritten
  * per merge) so the plan never deepens past a constant.
  *
  * Merge application is the greedy left-to-right non-overlapping scan of
  * the reference algorithm, expressed as a row-local `aggregate` fold
  * over the symbol array: append the next symbol, or replace the tail
  * symbol with the merged pair when (tail, next) == (l, r). A fold that
  * just merged cannot re-merge the merged symbol in the same round
  * (its spelling `l+r` differs from `l` unless `r` is empty, which
  * cannot occur), reproducing the non-overlap rule — e.g. "aaa" under
  * ("a","a") folds to ["aa","a"], not ["aa","aa"-overlap].
  */
object Bpe {

  /** Word-frequency table from one corpus scan: lowercase whitespace
    * words. `wordCap` bounds the training vocabulary by frequency
    * (deterministic count-then-name order) through a bounded distributed
    * top-k — the same TakeOrderedAndProject shape as
    * [[TextOps.unigramLogprob]]'s vocab cap, never a single-partition
    * window rank. */
  def wordCounts(docs: DataFrame,
                 wordCap: Option[Int] = Some(1 << 18)): DataFrame = {
    val wc = docs
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    wordCap match {
      case Some(cap) => wc.orderBy(col("freq").desc, col("word").asc).limit(cap)
      case None      => wc
    }
  }

  /** Adjacent-symbol pair counts weighted by word frequency, over a
    * (word, freq, syms) table. Words of one symbol contribute nothing.
    * Output is bounded by the symbol-pair vocabulary. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("lhs"),
          element_at(col("syms"), i + 1).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("freq").as("pair_freq"))

  /** One greedy left-to-right merge pass of pair (l, r) over a symbol
    * array, as a row-local fold (see object doc for the non-overlap
    * argument). */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Learn `nMerges` BPE merges from the corpus. Returns the merge table
    * (merge_rank, lhs, rhs, pair_freq) in learned order — bounded output
    * built on the driver from nMerges LIMIT-1 rows. Ties in pair
    * frequency break (lhs, rhs) lexicographically, making the learned
    * tokenizer deterministic at any parallelism. */
  def learnMerges(docs: DataFrame, nMerges: Int,
                  wordCap: Option[Int] = Some(1 << 18)): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // chars of the word: split on the empty pattern yields one-char symbols
    var words = wordCounts(docs, wordCap)
      .select(col("word"), col("freq"), split(col("word"), "").as("syms"))
      // the word table is the loop's working set: materialize it once so
      // merge rounds never re-scan the corpus
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[
      (Int, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("pair_freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((round + 1, l, r, f))
        words = words.select(col("word"), col("freq"),
          applyMerge(col("syms"), l, r).as("syms"))
        // truncate lineage every few rounds: the fold expressions nest
        // and an unbounded chain would deepen codegen past the JIT limit
        if ((round + 1) % 8 == 0) words = words.localCheckpoint()
        round += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_freq")
  }

  /** Encode a token with an ordered merge list (driver-side list — the
    * merge table is nMerges rows by construction): chars, then each merge
    * applied in learned order. The expression nests nMerges folds; keep
    * nMerges modest per-column or materialize between batches. */
  def encodeToken(tok: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(tok, ""): Column) {
      case (syms, (l, r)) => applyMerge(syms, l, r)
    }

  /** Per-document subword count under the learned tokenizer — the
    * "how many tokens is this corpus REALLY" accounting query. Narrow
    * map: whitespace words explode, each encodes row-locally, one
    * doc-keyed sum. */
  def encodedTokenCount(docs: DataFrame,
                        merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"),
        size(encodeToken(col("w"), merges)).cast("long").as("n_sub"))
      .groupBy("doc_id").agg(sum("n_sub").as("n_subwords"))
}
