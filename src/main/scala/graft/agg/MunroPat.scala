package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Munro–Paterson multi-level buffer quantile sketch — the reference's
  * MunroPat/MunroPatI binning algorithms (`core/MunroPatEstimator.java:91-165`,
  * `core/binning/MunroPatBinning.java:29-60`), re-implemented from the
  * published algorithm (Munro & Paterson, "Selection and sorting with
  * limited storage", TCS 1980; buffer-collapse formulation per Manku,
  * Rajagopalan & Lindsay, SIGMOD 1998).
  *
  * Structure: two fill buffers of size k plus higher levels holding at most
  * one sorted size-k buffer each, where a level-l buffer represents each of
  * its elements 2^(l-1) times. When both fill buffers are full they are
  * sorted and collapsed (merge, keep every 2nd element) into level 2,
  * cascading upward on collision. `merge` collapses same-level buffers
  * pairwise, making the sketch usable as a distributed Aggregator with the
  * usual partial/final contract.
  *
  * Buffers are PRIMITIVE `Array[Double]` (sorted with
  * `java.util.Arrays.sort`): the previous `ArrayBuffer[Double]` levels
  * boxed every element on add and every comparison in the collapse sort,
  * which dominated the sketch query's cost at sf0.1.
  */
final class MunroPatSketch(val numQuantiles: Int, val k: Int)
    extends Serializable {

  // two weight-1 fill buffers (live prefixes n0/n1); high(i) is the level
  // i+2 buffer (exactly k elements, sorted, weight 2^(i+1)) or null
  var fill0: Array[Double] = new Array[Double](k)
  var fill1: Array[Double] = new Array[Double](k)
  var n0: Int = 0
  var n1: Int = 0
  var high: ArrayBuffer[Array[Double]] = ArrayBuffer.empty
  var total: Long = 0L
  var minV: Double = Double.PositiveInfinity
  var maxV: Double = Double.NegativeInfinity

  def add(v: Double): Unit = {
    if (v < minV) minV = v
    if (v > maxV) maxV = v
    appendFill(v)
    total += 1
  }

  private def appendFill(v: Double): Unit = {
    if (n0 >= k && n1 >= k) collapseFill()
    if (n0 < k) { fill0(n0) = v; n0 += 1 }
    else { fill1(n1) = v; n1 += 1 }
  }

  /** merge two sorted arrays, keeping every 2nd element (the collapse). */
  private def collapse(a: Array[Double], na: Int,
                       b: Array[Double], nb: Int): Array[Double] = {
    val out = new Array[Double]((na + nb + 1) / 2)
    var ia = 0; var ib = 0; var count = 0; var o = 0
    while (ia < na || ib < nb) {
      val takeB = ia >= na || (ib < nb && a(ia) >= b(ib))
      val v = if (takeB) { val x = b(ib); ib += 1; x }
              else { val x = a(ia); ia += 1; x }
      if (count % 2 == 0) { out(o) = v; o += 1 }
      count += 1
    }
    out
  }

  private def collapseFill(): Unit = {
    java.util.Arrays.sort(fill0)
    java.util.Arrays.sort(fill1)
    val c = collapse(fill0, k, fill1, k)
    n0 = 0; n1 = 0
    pushUp(c, 0)
  }

  private def pushUp(buf: Array[Double], lvl: Int): Unit = {
    while (high.length <= lvl) high += null
    if (high(lvl) == null) high(lvl) = buf
    else {
      val merged = collapse(high(lvl), high(lvl).length, buf, buf.length)
      high(lvl) = null
      pushUp(merged, lvl + 1)
    }
  }

  /** Distributed combine: fold the other sketch's fill elements in, then
    * collapse same-level sorted buffers upward. */
  def mergeWith(other: MunroPatSketch): MunroPatSketch = {
    var i = 0
    while (i < other.n0) { appendFill(other.fill0(i)); i += 1 }
    i = 0
    while (i < other.n1) { appendFill(other.fill1(i)); i += 1 }
    i = 0
    while (i < other.high.length) {
      if (other.high(i) != null) pushUp(other.high(i), i)
      i += 1
    }
    total += other.total
    if (other.minV < minV) minV = other.minV
    if (other.maxV > maxV) maxV = other.maxV
    this
  }

  /** Interior quantile estimates at j/numQuantiles, j=1..numQuantiles-1:
    * weighted merge over all buffers (level-l weight 2^(l-1)), reading off
    * values at the weighted target ranks. */
  def quantiles(): Array[Double] = {
    if (total == 0) return Array.empty
    var count = n0 + n1
    var l = 0
    while (l < high.length) {
      if (high(l) != null) count += high(l).length
      l += 1
    }
    // (value, weight) across all buffers; weights are exact in double
    // far past any realistic level count (2^53 bound)
    val wv = new Array[Double](count)
    val ww = new Array[Double](count)
    var o = 0
    var i = 0
    while (i < n0) { wv(o) = fill0(i); ww(o) = 1.0; o += 1; i += 1 }
    i = 0
    while (i < n1) { wv(o) = fill1(i); ww(o) = 1.0; o += 1; i += 1 }
    l = 0
    while (l < high.length) {
      val buf = high(l)
      if (buf != null) {
        val w = (1L << (l + 1)).toDouble
        i = 0
        while (i < buf.length) { wv(o) = buf(i); ww(o) = w; o += 1; i += 1 }
      }
      l += 1
    }
    DualSort.sort(wv, ww, 0, count - 1)
    var sumW = 0.0
    i = 0
    while (i < count) { sumW += ww(i); i += 1 }
    val out = new Array[Double](numQuantiles - 1)
    var cum = 0.0
    var qi = 0
    i = 0
    while (i < count && qi < out.length) {
      cum += ww(i)
      while (qi < out.length &&
        cum / sumW >= (qi + 1).toDouble / numQuantiles) {
        out(qi) = wv(i)
        qi += 1
      }
      i += 1
    }
    while (qi < out.length) { out(qi) = maxV; qi += 1 }
    out
  }

  /** Bin boundaries with the reference's binMerge convention
    * (`MunroPatBinning.java:33-58`): dedup adjacent equal quantiles and
    * replace the first edge with -Infinity. */
  def binBoundaries(): Array[Double] = {
    val qs = quantiles()
    val dedup = ArrayBuffer.empty[Double]
    qs.foreach(q => if (dedup.isEmpty || dedup.last != q) dedup += q)
    (Double.NegativeInfinity +: dedup).toArray
  }
}

object MunroPatSketch {
  /** Buffer size from the target quantile count — finer targets need
    * larger buffers (the reference derives it from ε = 1/(q-1)). */
  def apply(numQuantiles: Int): MunroPatSketch =
    new MunroPatSketch(numQuantiles, math.max(256, numQuantiles * 64))
}

/** Typed aggregator: values → Munro–Paterson bin boundaries. */
class MunroPatAgg(numQuantiles: Int)
    extends Aggregator[Double, MunroPatSketch, Array[Double]] {
  override def zero: MunroPatSketch = MunroPatSketch(numQuantiles)
  override def reduce(s: MunroPatSketch, v: Double): MunroPatSketch = {
    s.add(v); s
  }
  override def merge(a: MunroPatSketch, b: MunroPatSketch): MunroPatSketch =
    a.mergeWith(b)
  override def finish(s: MunroPatSketch): Array[Double] = s.binBoundaries()
  override def bufferEncoder: Encoder[MunroPatSketch] =
    Encoders.kryo[MunroPatSketch]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
