package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dynamic binning / rebin (reference `core/binning/DynamicBinning.java`,
  * `ColumnConfigDynamicBinning.java:1-194`, two-phase Pig flow
  * `StatsDynamicBinning.pig:57-65` with an `EXEC` barrier at :62).
  *
  * Spark design: the two "jobs" are two actions in driver code — a fine
  * equal-interval pass (distributed), then a driver-side greedy merge of
  * adjacent small bins (the bin table is ≤ fineK rows, exactly the data
  * volume the reference's reducer handled on one node).
  */
object DynamicBinning {

  final case class Bin(lo: Double, pos: Long, neg: Long) {
    def total: Long = pos + neg
  }

  /** Phase 1: fine-grained bin counts (distributed). Phase 2: merge any
    * bin holding < `minShare` of rows into its neighbor (the reference's
    * EXTRA_SMALL_BIN_PERCENTAGE=3% small-bin rule,
    * `EqualPopulationBinning.java:300-330`), never exceeding `maxBins`. */
  def rebin(df: DataFrame, valueCol: String, isPos: Column,
            fineK: Int = 100, maxBins: Int = 10,
            minShare: Double = 0.03): Seq[Bin] = {
    // cast in the agg: min/max of an IntegerType column returns
    // java.lang.Integer and the bare asInstanceOf[Double] threw a
    // ClassCastException deep in row decoding
    val Array(mn, mx) = df
      .agg(min(col(valueCol).cast("double")),
        max(col(valueCol).cast("double"))).head()
      .toSeq.map(_.asInstanceOf[Double]).toArray
    val bounds = Binning.equalInterval(mn, mx, fineK)
    val counts = Binning.binCounts(df, valueCol, bounds, isPos)
      .select("bin_id", "cnt_pos", "cnt_neg").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 < fineK) // value bins only; missing handled separately
      .sortBy(_._1)
    val boundArr = bounds.toArray
    var bins = counts.map { case (b, p, n) => Bin(boundArr(b), p, n) }.toVector
    val totalRows = bins.map(_.total).sum.toDouble
    if (totalRows == 0) return bins
    // greedy: repeatedly merge the smallest bin into its smaller neighbor
    def mergeAt(v: Vector[Bin], i: Int, intoLeft: Boolean): Vector[Bin] =
      if (intoLeft) {
        val m = Bin(v(i - 1).lo, v(i - 1).pos + v(i).pos, v(i - 1).neg + v(i).neg)
        (v.take(i - 1) :+ m) ++ v.drop(i + 1)
      } else {
        val m = Bin(v(i).lo, v(i).pos + v(i + 1).pos, v(i).neg + v(i + 1).neg)
        (v.take(i) :+ m) ++ v.drop(i + 2)
      }
    var done = false
    while (!done && bins.length > 1) {
      val minIdx = bins.indices.minBy(i => (bins(i).total, i))
      val tooSmall = bins(minIdx).total < minShare * totalRows
      if (!tooSmall && bins.length <= maxBins) done = true
      else {
        val intoLeft =
          if (minIdx == 0) false
          else if (minIdx == bins.length - 1) true
          else bins(minIdx - 1).total <= bins(minIdx + 1).total
        bins = mergeAt(bins, minIdx, intoLeft)
      }
    }
    bins
  }
}
