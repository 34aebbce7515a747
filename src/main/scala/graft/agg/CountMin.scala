package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, when, xxhash64}

/** Count-Min sketch (Cormode–Muthukrishnan 2005) as a mergeable
  * `Aggregator`: point-frequency estimates over an unbounded key domain
  * in `d × w` longs of fixed state.
  *
  * Complements the engine's other frequency machinery: Misra-Gries
  * ([[MisraGries]]) answers "what are the top keys", the CMS answers
  * "how often did THIS key occur" for any key, with the one-sided
  * guarantee est ≥ true and est ≤ true + εN (ε = e/w) w.p. 1−e^−d per
  * query. The reference's space-saving frequent-items pass
  * (`core/autotype/AutoTypeDistinctCountMapper.java:187-230`) has no
  * point-query dual; this is it.
  *
  * Input is PRE-HASHED (codegen'd `xxhash64`, the [[Hll]] convention);
  * the d row hashes derive from the one 64-bit input hash by
  * multiply-shift with d fixed odd constants — no per-row string
  * hashing in the aggregator. Buffer = flattened d·w long counts;
  * merge = elementwise add, associative and commutative, so any merge
  * tree over any partitioning yields BIT-IDENTICAL counts (the same
  * mergeability contract as the HLL registers).
  */
final class CountMinAgg(d: Int, w: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(d >= 1 && d <= 8 && w >= 16 && (w & (w - 1)) == 0,
    s"need 1<=d<=8 and power-of-two w, got d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long],
                      hashed: java.lang.Long): Array[Long] = {
    if (hashed == null) return buf
    val h = hashed.longValue()
    var i = 0
    while (i < d) {
      buf(i * w + CountMin.slot(h, i, w)) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {
  val DefaultDepth = 4
  val DefaultWidth = 2048

  /** Row index for hash `h` in row `i`: multiply-shift universal hashing
    * with fixed odd multipliers (Dietzfelbinger et al.) — deterministic
    * across runs and engines. */
  private val Mults = Array(0x9e3779b97f4a7c15L, 0xc2b2ae3d27d4eb4fL,
    0x165667b19e3779f9L, 0x27d4eb2f165667c5L, 0x85ebca6b2ae35f4bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL)

  def slot(h: Long, row: Int, w: Int): Int = {
    val bits = Integer.numberOfTrailingZeros(w)
    ((h * Mults(row)) >>> (64 - bits)).toInt
  }

  /** Column form: `sketchAgg(d, w)(valueCol)` → flattened d·w counts. */
  def sketchAgg(d: Int = DefaultDepth, w: Int = DefaultWidth)
      : Column => Column = {
    val fn = udaf(new CountMinAgg(d, w), Encoders.LONG)
    v => fn(when(v.isNotNull, xxhash64(v)))
  }

  /** Point estimate for a raw value: min over the d rows. The value is
    * hashed with the SAME xxhash64 the plan used. */
  def estimate(counts: Array[Long], d: Int, w: Int, value: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(org.apache.spark.unsafe.types.UTF8String.fromString(value),
        org.apache.spark.sql.types.StringType, 42L)
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = counts(i * w + slot(h, i, w))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** Elementwise merge of two sketches (must share d·w). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "sketch shape mismatch")
    val out = a.clone()
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }
}
