package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

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
  */
final class Histogram(val cap: Int) extends Serializable {
  // parallel arrays, kept sorted by value after compress()
  var values: ArrayBuffer[Double] = ArrayBuffer.empty
  var weights: ArrayBuffer[Double] = ArrayBuffer.empty
  private var sorted = true

  def add(v: Double, w: Double = 1.0): Unit = {
    if (w <= 0) return
    values += v; weights += w; sorted = false
    if (values.length > cap * 4) compress()
  }

  def merge(other: Histogram): Histogram = {
    values ++= other.values; weights ++= other.weights
    sorted = false
    if (values.length > cap * 4) compress()
    this
  }

  def totalWeight: Double = { var s = 0.0; var i = 0; while (i < weights.length) { s += weights(i); i += 1 }; s }

  /** Sort, merge duplicate values, then repeatedly merge the closest adjacent
    * pair (weighted mean) until at most `cap` centroids remain. */
  def compress(): Unit = {
    if (values.isEmpty) { sorted = true; return }
    val idx = values.indices.sortBy(values)
    val v = ArrayBuffer[Double]()
    val w = ArrayBuffer[Double]()
    for (i <- idx) {
      if (v.nonEmpty && v.last == values(i)) w(w.length - 1) += weights(i)
      else { v += values(i); w += weights(i) }
    }
    // min-heap of (gap, leftIndex) with lazy deletion via generation stamps
    if (v.length > cap) {
      // doubly linked list over indices
      val next = Array.tabulate(v.length)(i => i + 1)
      val prev = Array.tabulate(v.length)(i => i - 1)
      val alive = Array.fill(v.length)(true)
      val pq = new java.util.PriorityQueue[(Double, Int, Double)](
        v.length, Ordering.by[(Double, Int, Double), Double](_._1))
      for (i <- 0 until v.length - 1) pq.add((v(i + 1) - v(i), i, v(i)))
      var remaining = v.length
      while (remaining > cap && !pq.isEmpty) {
        val (gap, i, stamp) = pq.poll()
        // stale if i dead or value changed or neighbor changed
        if (alive(i) && v(i) == stamp && next(i) < v.length && alive(next(i)) &&
            v(next(i)) - v(i) == gap) {
          val j = next(i)
          val tw = w(i) + w(j)
          v(i) = (v(i) * w(i) + v(j) * w(j)) / tw
          w(i) = tw
          alive(j) = false
          next(i) = next(j)
          if (next(j) < v.length) prev(next(j)) = i
          remaining -= 1
          if (prev(i) >= 0) pq.add((v(i) - v(prev(i)), prev(i), v(prev(i))))
          if (next(i) < v.length) pq.add((v(next(i)) - v(i), i, v(i)))
        }
      }
      val nv = ArrayBuffer[Double](); val nw = ArrayBuffer[Double]()
      for (i <- v.indices if alive(i)) { nv += v(i); nw += w(i) }
      values = nv; weights = nw
    } else { values = v; weights = w }
    sorted = true
  }

  /** Cumulative weight up to value b — the paper's `sum` procedure with the
    * trapezoidal half-bin interpolation (`EqualPopulationBinning.java:392`). */
  def sum(b: Double): Double = {
    compressIfNeeded()
    val n = values.length
    if (n == 0) return 0.0
    if (b < values(0)) return 0.0
    if (b >= values(n - 1)) return totalWeight
    var i = java.util.Arrays.binarySearch(values.toArray, b)
    if (i < 0) i = -i - 2
    // weight strictly before bin i plus half of bin i
    var s = 0.0; var k = 0
    while (k < i) { s += weights(k); k += 1 }
    s += weights(i) / 2.0
    // interpolated trapezoid between centroid i and i+1
    val vi = values(i); val vj = values(i + 1)
    val wi = weights(i); val wj = weights(i + 1)
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
    if (values.isEmpty || total <= 0 || numBins <= 1)
      return Array(Double.NegativeInfinity)
    val cuts = ArrayBuffer[Double](Double.NegativeInfinity)
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
    val n = values.length
    var i = 0
    var si = weights(0) / 2.0 // sum at values(0)
    while (i < n - 1) {
      val sj = si + (weights(i) + weights(i + 1)) / 2.0
      if (target <= sj || i == n - 2) {
        if (target <= si) return values(i)
        // solve (wi + wb)/2 * frac = target - si with wb = wi + (wj-wi)*frac
        val wi = weights(i); val wj = weights(i + 1)
        val d = target - si
        val a = (wj - wi) / 2.0
        val frac =
          if (math.abs(a) < 1e-12) d / math.max(wi, 1e-12)
          else {
            val disc = wi * wi + 4 * a * d
            (-wi + math.sqrt(math.max(disc, 0.0))) / (2 * a)
          }
        val f = math.min(math.max(frac, 0.0), 1.0)
        return values(i) + (values(i + 1) - values(i)) * f
      }
      si = sj
      i += 1
    }
    values(n - 1)
  }

  private def compressIfNeeded(): Unit = if (!sorted) compress()
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
