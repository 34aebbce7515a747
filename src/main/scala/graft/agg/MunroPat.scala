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
  */
final class MunroPatSketch(val numQuantiles: Int, val k: Int)
    extends Serializable {

  // levels(0) and levels(1): fill buffers (weight 1, possibly not full);
  // levels(l >= 2): at most one sorted buffer of EXACTLY k, weight 2^(l-1)
  var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double], ArrayBuffer.empty[Double])
  var total: Long = 0L
  var minV: Double = Double.PositiveInfinity
  var maxV: Double = Double.NegativeInfinity

  def add(v: Double): Unit = {
    if (v < minV) minV = v
    if (v > maxV) maxV = v
    if (levels(0).length >= k && levels(1).length >= k) collapseFill()
    val idx = if (levels(0).length < k) 0 else 1
    levels(idx) += v
    total += 1
  }

  /** merge two sorted buffers, keeping every 2nd element (the collapse). */
  private def collapse(a: ArrayBuffer[Double],
                       b: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    val out = new ArrayBuffer[Double](k)
    var ia = 0; var ib = 0; var count = 0
    while (ia < a.length || ib < b.length) {
      val takeB = ia >= a.length || (ib < b.length && a(ia) >= b(ib))
      val v = if (takeB) { val x = b(ib); ib += 1; x }
              else { val x = a(ia); ia += 1; x }
      if (count % 2 == 0) out += v
      count += 1
    }
    out
  }

  private def collapseFill(): Unit = {
    val a = levels(0).sorted
    val b = levels(1).sorted
    levels(0) = ArrayBuffer.empty
    levels(1) = ArrayBuffer.empty
    pushUp(collapse(a, b), 2)
  }

  private def pushUp(buf: ArrayBuffer[Double], level: Int): Unit = {
    while (levels.length <= level) levels += ArrayBuffer.empty[Double]
    if (levels(level).isEmpty) levels(level) = buf
    else {
      val merged = collapse(levels(level), buf)
      levels(level) = ArrayBuffer.empty
      pushUp(merged, level + 1)
    }
  }

  /** Distributed combine: fold the other sketch's fill elements in, then
    * collapse same-level sorted buffers upward. */
  def mergeWith(other: MunroPatSketch): MunroPatSketch = {
    other.levels.take(2).foreach(_.foreach { v =>
      if (v < minV) minV = v
      if (v > maxV) maxV = v
      if (levels(0).length >= k && levels(1).length >= k) collapseFill()
      val idx = if (levels(0).length < k) 0 else 1
      levels(idx) += v
    })
    var l = 2
    while (l < other.levels.length) {
      if (other.levels(l).nonEmpty) pushUp(other.levels(l), l)
      l += 1
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
    // (value, weight) across all buffers
    val weighted = ArrayBuffer.empty[(Double, Long)]
    levels.take(2).foreach(_.foreach(v => weighted += ((v, 1L))))
    var l = 2
    while (l < levels.length) {
      val w = 1L << (l - 1)
      levels(l).foreach(v => weighted += ((v, w)))
      l += 1
    }
    val sorted = weighted.sortBy(_._1)
    val sumW = sorted.map(_._2).sum
    val out = new Array[Double](numQuantiles - 1)
    var cum = 0L
    var qi = 0
    var i = 0
    while (i < sorted.length && qi < out.length) {
      cum += sorted(i)._2
      while (qi < out.length &&
        cum.toDouble / sumW >= (qi + 1).toDouble / numQuantiles) {
        out(qi) = sorted(i)._1
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
