package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Cross-batch deduplication screen via Bloom-filter membership — the
  * Dolma-style "have we crawled this URL/fingerprint in ANY previous
  * snapshot" primitive. An exact anti-join against 10⁹ historical keys
  * shuffles both sides; a Bloom filter answers "definitely new" with one
  * broadcast bitset and a narrow map, at the price of an ε false-positive
  * rate (never false negatives — a flagged-new row is GUARANTEED new, so
  * the screen only ever over-deletes by ε, the safe direction for dedup).
  *
  * Build: `df.stat.bloomFilter` — per-partition filters OR-merged in a
  * tree aggregate, ONE pass over the seen batch, no shuffle of the keys
  * themselves. Probe: broadcast the bitset, row-local `mightContain`
  * (a UDF is warranted: Spark exposes no public bloom-probe function;
  * the probe is two xxHash evaluations per row, no boxing of the
  * filter).
  *
  * Scale: the bitset is ~1.2 bits×ln(1/fpp)/ln²2 per key — 1% fpp over
  * 10⁸ keys ≈ 120 MB, a routine broadcast; at 10⁹+ keys raise `fpp`
  * (the screen stays sound — only the over-delete ε grows) or fall back
  * to the exact anti-join ([[TextOps]] dedup-apply path). */
object BloomDedup {

  /** Build a Bloom filter over `keyCol` of `seen`. The key is cast to
    * STRING before insertion because [[probe]] hashes strings: without
    * the cast, an integral keyCol is inserted via putLong and every
    * string probe misses — false negatives on every previously-seen
    * key, the one failure mode the screen promises cannot happen. */
  def build(seen: DataFrame, keyCol: String,
            expectedItems: Long = 1L << 20,
            fpp: Double = 0.01): BloomFilter =
    seen.select(col(keyCol).cast("string").as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)

  /** Flag every `incoming` row whose `keyCol` might appear in `seen`:
    * `maybe_seen = false` ⇒ guaranteed new. */
  def flagSeen(seen: DataFrame, incoming: DataFrame, keyCol: String,
               expectedItems: Long = 1L << 20,
               fpp: Double = 0.01): DataFrame = {
    val bf = build(seen, keyCol, expectedItems, fpp)
    incoming.withColumn("maybe_seen", probe(incoming, bf, col(keyCol)))
  }

  /** Row-local membership probe column against a prebuilt filter. */
  def probe(df: DataFrame, bf: BloomFilter, key: Column): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(bf)
    udf((k: String) => k != null && bc.value.mightContainString(k))
      .apply(key.cast("string"))
  }
}
