package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Streaming equal-population histogram (Ben-Haim & Tom-Tov, "A Streaming
  * Parallel Decision Tree Algorithm", JMLR 11 (2010)) — the same algorithm the
  * reference's SPDT/SPDTI binning uses
  * (`core/binning/EqualPopulationBinning.java`: process :491, locate :392,
  * getDataBin :231-293, mergeExtraSmallBins :300-330). Re-implemented from the
  * published algorithm, weighted, with an amortized buffer-compress update
  * instead of per-point sorted insertion (same result, O(log n) amortized).
  *
  * A histogram is a bounded list of (centroid, weight) pairs; `add` appends
  * and compresses past 4× capacity; `merge` concatenates and compresses —
  * which is exactly the associative/commutative contract Spark's partial
  * aggregation needs, so map-side combine is free and the shuffle carries at
  * most `cap` pairs per group instead of raw rows.
  *
  * Internals are PRIMITIVE parallel arrays ([[DualSort]]): the original
  * `ArrayBuffer[Double]` representation boxed every value on the add path
  * and every comparison in compress — measured 2.5× slower end-to-end on
  * the sf0.1 sketch query.
  */
final class Histogram(initialCap: Int) extends Serializable
    with com.esotericsoftware.kryo.KryoSerializable {
  private var _cap: Int = initialCap
  def cap: Int = _cap
  // parallel primitive arrays; live prefix [0, n), sorted after compress()
  private var vs: Array[Double] = new Array[Double](_cap * 4)
  private var ws: Array[Double] = new Array[Double](_cap * 4)
  private var n: Int = 0
  private var isSorted = true

  /** Kryo wire format: compress first, ship ONLY the live prefix. The
    * default field serialization shipped the full backing arrays (≥ cap×4
    * doubles ×2, and `ensure` can have grown them far past that), breaking
    * the "at most cap pairs per group on the shuffle" contract. At 100 TB
    * the partial-agg exchange payload IS the sketch cost, so the wire form
    * must be the compressed sketch, not the scratch space. */
  override def write(kryo: com.esotericsoftware.kryo.Kryo,
                     out: com.esotericsoftware.kryo.io.Output): Unit = {
    compress() // sorts and reduces n to <= cap
    out.writeInt(_cap)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(vs(i)); out.writeDouble(ws(i)); i += 1 }
  }

  override def read(kryo: com.esotericsoftware.kryo.Kryo,
                    in: com.esotericsoftware.kryo.io.Input): Unit = {
    _cap = in.readInt()
    n = in.readInt()
    val c = math.max(_cap * 4, n)
    vs = new Array[Double](c)
    ws = new Array[Double](c)
    var i = 0
    while (i < n) { vs(i) = in.readDouble(); ws(i) = in.readDouble(); i += 1 }
    isSorted = true
  }

  /** Live centroid values (compressed view; copies — test/inspection use). */
  def values: Array[Double] = {
    compressIfNeeded(); java.util.Arrays.copyOf(vs, n)
  }
  def weights: Array[Double] = {
    compressIfNeeded(); java.util.Arrays.copyOf(ws, n)
  }

  def add(v: Double, w: Double = 1.0): Unit = {
    if (w <= 0) return
    if (n == vs.length) compress()
    vs(n) = v; ws(n) = w; n += 1
    isSorted = false
  }

  def merge(other: Histogram): Histogram = {
    ensure(n + other.n)
    System.arraycopy(other.vs, 0, vs, n, other.n)
    System.arraycopy(other.ws, 0, ws, n, other.n)
    n += other.n
    isSorted = false
    if (n > cap * 4) compress()
    this
  }

  private def ensure(c: Int): Unit = if (c > vs.length) {
    val nc = math.max(c, vs.length * 2)
    vs = java.util.Arrays.copyOf(vs, nc)
    ws = java.util.Arrays.copyOf(ws, nc)
  }

  def totalWeight: Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += ws(i); i += 1 }
    s
  }

  /** Sort, merge duplicate values, then repeatedly merge the closest adjacent
    * pair (weighted mean) until at most `cap` centroids remain. */
  def compress(): Unit = {
    if (n == 0) { isSorted = true; return }
    DualSort.sort(vs, ws, 0, n - 1)
    // merge duplicates in place
    var m = 0
    var i = 1
    while (i < n) {
      if (vs(i) == vs(m)) ws(m) += ws(i)
      else { m += 1; vs(m) = vs(i); ws(m) = ws(i) }
      i += 1
    }
    n = m + 1
    if (n > cap) mergeClosest()
    isSorted = true
  }

  /** Closest-adjacent-pair merging down to `cap` via a primitive min-heap
    * of (gap, leftIndex, leftValueStamp) with lazy deletion — parallel
    * double/int arrays, zero boxing. */
  private def mergeClosest(): Unit = {
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    val alive = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      next(i) = i + 1; prev(i) = i - 1; alive(i) = true; i += 1
    }
    // heap arrays: pushes bounded by (n-1) initial + 2 per merge
    var hg = new Array[Double](n * 3 + 4)
    var hi = new Array[Int](n * 3 + 4)
    var hs = new Array[Double](n * 3 + 4)
    var hn = 0
    def push(g: Double, idx: Int, stamp: Double): Unit = {
      if (hn == hg.length) {
        hg = java.util.Arrays.copyOf(hg, hn * 2)
        hi = java.util.Arrays.copyOf(hi, hn * 2)
        hs = java.util.Arrays.copyOf(hs, hn * 2)
      }
      var c = hn; hn += 1
      hg(c) = g; hi(c) = idx; hs(c) = stamp
      while (c > 0 && hg((c - 1) / 2) > hg(c)) {
        val p = (c - 1) / 2
        val tg = hg(p); hg(p) = hg(c); hg(c) = tg
        val ti = hi(p); hi(p) = hi(c); hi(c) = ti
        val ts = hs(p); hs(p) = hs(c); hs(c) = ts
        c = p
      }
    }
    def pop(): Unit = { // result in popG/popI/popS
      popG = hg(0); popI = hi(0); popS = hs(0)
      hn -= 1
      hg(0) = hg(hn); hi(0) = hi(hn); hs(0) = hs(hn)
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = l + 1
        var s = c
        if (l < hn && hg(l) < hg(s)) s = l
        if (r < hn && hg(r) < hg(s)) s = r
        if (s == c) done = true
        else {
          val tg = hg(s); hg(s) = hg(c); hg(c) = tg
          val ti = hi(s); hi(s) = hi(c); hi(c) = ti
          val ts = hs(s); hs(s) = hs(c); hs(c) = ts
          c = s
        }
      }
    }
    i = 0
    while (i < n - 1) { push(vs(i + 1) - vs(i), i, vs(i)); i += 1 }
    var remaining = n
    while (remaining > cap && hn > 0) {
      pop()
      val a = popI
      // stale if a dead, value changed, or right neighbor changed
      if (alive(a) && vs(a) == popS && next(a) < n && alive(next(a)) &&
          vs(next(a)) - vs(a) == popG) {
        val b = next(a)
        val tw = ws(a) + ws(b)
        vs(a) = (vs(a) * ws(a) + vs(b) * ws(b)) / tw
        ws(a) = tw
        alive(b) = false
        next(a) = next(b)
        if (next(b) < n) prev(next(b)) = a
        remaining -= 1
        if (prev(a) >= 0) push(vs(a) - vs(prev(a)), prev(a), vs(prev(a)))
        if (next(a) < n) push(vs(next(a)) - vs(a), a, vs(a))
      }
    }
    // compact the survivors in place (they are in ascending order already)
    var m = 0
    i = 0
    while (i < n) {
      if (alive(i)) { vs(m) = vs(i); ws(m) = ws(i); m += 1 }
      i += 1
    }
    n = m
  }
  private var popG: Double = 0.0
  private var popI: Int = 0
  private var popS: Double = 0.0

  /** Cumulative weight up to value b — the paper's `sum` procedure with the
    * trapezoidal half-bin interpolation (`EqualPopulationBinning.java:392`). */
  def sum(b: Double): Double = {
    compressIfNeeded()
    if (n == 0) return 0.0
    if (b < vs(0)) return 0.0
    if (b >= vs(n - 1)) return totalWeight
    var i = java.util.Arrays.binarySearch(vs, 0, n, b)
    if (i < 0) i = -i - 2
    // weight strictly before bin i plus half of bin i
    var s = 0.0; var k = 0
    while (k < i) { s += ws(k); k += 1 }
    s += ws(i) / 2.0
    // interpolated trapezoid between centroid i and i+1
    val vi = vs(i); val vj = vs(i + 1)
    val wi = ws(i); val wj = ws(i + 1)
    val frac = (b - vi) / (vj - vi)
    val wb = wi + (wj - wi) * frac
    s + (wi + wb) * frac / 2.0
  }

  /** Equal-population boundaries: B-1 interior cut points (the paper's
    * `uniform` procedure; `EqualPopulationBinning.java:231-293`), deduped,
    * with a -Infinity head per the reference's bin convention. */
  def quantileBoundaries(numBins: Int): Array[Double] = {
    compressIfNeeded()
    val total = totalWeight
    if (n == 0 || total <= 0 || numBins <= 1)
      return Array(Double.NegativeInfinity)
    val cuts = scala.collection.mutable.ArrayBuffer[Double](
      Double.NegativeInfinity)
    var j = 1
    while (j < numBins) {
      val target = total * j / numBins
      val c = invertSum(target)
      if (cuts.last < c) cuts += c
      j += 1
    }
    cuts.toArray
  }

  /** Find b with sum(b) = target by locating the centroid interval then
    * solving the quadratic from the trapezoid model (paper's uniform step). */
  private def invertSum(target: Double): Double = {
    var i = 0
    var si = ws(0) / 2.0 // sum at vs(0)
    while (i < n - 1) {
      val sj = si + (ws(i) + ws(i + 1)) / 2.0
      if (target <= sj || i == n - 2) {
        if (target <= si) return vs(i)
        // solve (wi + wb)/2 * frac = target - si with wb = wi + (wj-wi)*frac
        val wi = ws(i); val wj = ws(i + 1)
        val d = target - si
        val a = (wj - wi) / 2.0
        val frac =
          if (math.abs(a) < 1e-12) d / math.max(wi, 1e-12)
          else {
            val disc = wi * wi + 4 * a * d
            (-wi + math.sqrt(math.max(disc, 0.0))) / (2 * a)
          }
        val f = math.min(math.max(frac, 0.0), 1.0)
        return vs(i) + (vs(i + 1) - vs(i)) * f
      }
      si = sj
      i += 1
    }
    vs(n - 1)
  }

  private def compressIfNeeded(): Unit = if (!isSorted) compress()
}

object Histogram {
  /** cap = expectedBins × scale, reference default scale 100
    * (`EqualPopulationBinning.java:98-101`, `StatsSpdtI.pig:44`). */
  def apply(numBins: Int, scale: Int = 100): Histogram =
    new Histogram(math.max(numBins * scale, 16))
}

/** Typed aggregator: (value, weight) rows → equal-population boundaries.
  * Spark runs update/merge as partial+final agg automatically — the
  * reference needed an explicit two-stage Pig dance for this
  * (`BinningPartialDataUDF` + `BinningDataMergeUDF.java:53`). */
class HistogramAgg(numBins: Int, scale: Int = 100)
    extends Aggregator[(Double, Double), Histogram, Array[Double]] {
  override def zero: Histogram = Histogram(numBins, scale)
  override def reduce(h: Histogram, x: (Double, Double)): Histogram = {
    h.add(x._1, x._2); h
  }
  override def merge(a: Histogram, b: Histogram): Histogram = a.merge(b)
  override def finish(h: Histogram): Array[Double] =
    h.quantileBoundaries(numBins)
  override def bufferEncoder: Encoder[Histogram] = Encoders.kryo[Histogram]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
