package graft.agg

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, udaf, xxhash64}

/** Dense HyperLogLog registers as a mergeable `Aggregator` (Flajolet et
  * al. 2007, with the small-range linear-counting correction; 64-bit
  * hashes make the large-range correction unnecessary).
  *
  * Input is a PRE-HASHED 64-bit value — the hashing itself stays in the
  * plan as codegen'd `xxhash64(col)` (the same primitive the engine's
  * own `approx_count_distinct` hashes with), so the aggregator's per-row
  * work is two shifts and a byte max. Buffer and output are the raw
  * `m = 2^p` register bytes: register-wise max is associative and
  * commutative, so any reduce/merge tree over any row order yields
  * BIT-IDENTICAL registers — the property the incremental-catalog path
  * needs (sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly).
  *
  * This closes the last non-additive statistic in [[graft.ops.StatsMerge]]:
  * a finalized catalog's `distinctCount` does not merge, but the
  * persisted registers do — see [[Hll.mergeWithSketches]], the distinct
  * twin of `QuantileSketch.mergeWithSketches`.
  */
final class HllAgg(p: Int)
    extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
  require(p >= 4 && p <= 18, s"precision p=$p out of [4,18]")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(regs: Array[Byte],
                      hashed: java.lang.Long): Array[Byte] = {
    if (hashed == null) return regs // null value → no distinct contribution
    val hash = hashed.longValue()
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    // rank of the first 1-bit in the remaining 64-p bits, 1-based;
    // all-zero suffix saturates at 64-p+1
    val rank = if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Byte]): Array[Byte] = r

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object Hll {

  /** p=14 → 16 KiB registers, standard error 1.04/√16384 ≈ 0.81%. */
  val DefaultP = 14

  /** Column form for grouped use: `sketchAgg(p)(valueCol)` → binary
    * registers per group. Nulls are skipped (the
    * `approx_count_distinct` convention): the hash is gated on
    * `isNotNull` and a null input adds nothing to the registers. */
  def sketchAgg(p: Int = DefaultP): Column => Column = {
    val fn = udaf(new HllAgg(p), Encoders.LONG)
    v => fn(org.apache.spark.sql.functions.when(v.isNotNull, xxhash64(v)))
  }

  /** One agg pass → registers for a whole column (nulls skipped). */
  def sketch(df: DataFrame, colName: String,
             p: Int = DefaultP): Array[Byte] = {
    val r = df.agg(sketchAgg(p)(col(colName))).head()
    if (r.isNullAt(0)) new Array[Byte](1 << p)
    else r.getAs[Array[Byte]](0)
  }

  /** ONE scan → registers for every requested column (the
    * `QuantileSketch.buildFor` shape: per-column aggregates ride the
    * same pass, so sketching 50 columns costs one corpus read). */
  def buildFor(df: DataFrame, cols: Seq[String],
               p: Int = DefaultP): Map[String, Array[Byte]] = {
    require(cols.nonEmpty, "need at least one column")
    val agg = sketchAgg(p)
    val exprs = cols.map(c => agg(col(c)).as(c))
    val r = df.agg(exprs.head, exprs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      c -> (if (r.isNullAt(i)) new Array[Byte](1 << p)
            else r.getAs[Array[Byte]](i))
    }.toMap
  }

  /** Register-wise max into a fresh array (inputs untouched). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"register widths differ: ${a.length} vs ${b.length} — sketches " +
        "must share one precision")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = if (a(i) > b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** Cardinality estimate: harmonic-mean raw estimate with the
    * linear-counting switch below 2.5·m when empty registers remain. */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    require(m >= 16 && (m & (m - 1)) == 0, s"bad register count $m")
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** Base64 of the raw registers — survives a JSON string field or a
    * sidecar file next to the catalog. */
  def serialize(regs: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(regs)

  def deserialize(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  /** [[graft.ops.StatsMerge.merge]] plus sketch-backed distinct count:
    * the merged profile carries `distinctCount` from the MERGED
    * registers instead of surrendering it. Returns the merged registers
    * too so a catalog chain (day 1 ⊕ day 2 ⊕ …) stays incremental —
    * the distinct twin of `QuantileSketch.mergeWithSketches`. */
  def mergeWithSketches(a: graft.catalog.ColumnProfile,
                        b: graft.catalog.ColumnProfile,
                        sa: Array[Byte], sb: Array[Byte])
      : (graft.catalog.ColumnProfile, Array[Byte]) = {
    val merged = graft.ops.StatsMerge.merge(a, b)
    val regs = merge(sa, sb)
    val withD = merged.copy(stats = merged.stats.copy(
      distinctCount = Some(math.round(estimate(regs)))))
    (withD, regs)
  }
}
