package graft.ops

import graft.catalog.{ColumnBinning, ColumnProfile, ColumnStats}

/** Distributive merge of column profiles computed over DISJOINT row sets
  * with the SAME frozen bin boundaries — the incremental-catalog path.
  *
  * At 100 TB you never re-profile the whole corpus when a day of data
  * lands: yesterday's catalog freezes the boundaries
  * (`StatsPipeline.profileNumeric(boundsOverride = ...)`), the new
  * partition is profiled alone, and the catalogs MERGE:
  *
  *  - counts (total/missing/valid, per-bin pos/neg, weighted duals) are
  *    integers/exact sums → they add EXACTLY; KS/IV/WoE are pure
  *    functions of the merged bin counts (`StatsMath.columnMetrics`), so
  *    the merged metrics equal a full recompute over the union
  *    bit-for-bit;
  *  - mean/stdDev/skewness/kurtosis pool through recovered raw power
  *    sums (Σx..Σx⁴ — the same quantities the reference streams in
  *    `ColumnStatsCalculator`), exact up to FP addition order;
  *  - min/max combine;
  *  - quantiles and the HLL distinct estimate are NOT recoverable from a
  *    finalized catalog (their sketches were discarded) → None in the
  *    merged profile. Both have sidecar twins that close the gap when
  *    the sketch bytes are kept: `QuantileSketch.mergeWithSketches`
  *    (median/p25/p75) and `agg.Hll.mergeWithSketches` (distinctCount),
  *    wired to `<catalog>.quantiles` / `<catalog>.hll` by the CLI's
  *    `stats --sketch/--hll` and `stats --merge` verbs, and
  *    contract-checked by q_stats_merge's distinct_* rows.
  */
object StatsMerge {

  /** Raw power sums recovered from finalized stats — the inverse of the
    * NIST formulas in [[StatsMath]]. n < 2 degenerates exactly (one value
    * x: Σx² = x², etc.). */
  private final case class Sums(n: Long, miss: Long, sum: Double,
      sumSq: Double, sum3: Double, sum4: Double, min: Double, max: Double)

  private def recover(s: ColumnStats): Sums = {
    val n = s.validNumCount
    val mean = s.mean.getOrElse(0.0)
    val sum = mean * n
    val std = s.stdDev.getOrElse(0.0)
    val sumSq =
      if (n < 2) sum * mean else std * std * (n - 1) + sum * sum / n
    val sum3 = s.skewness match {
      case Some(g1) if n > 0 && std > 0 =>
        g1 * n * std * std * std + 3 * sumSq * mean -
          3 * mean * mean * sum + n * mean * mean * mean
      case _ => sum * mean * mean // degenerate: constant column
    }
    val sum4 = s.kurtosis match {
      case Some(g2) if n > 0 && std > 0 =>
        g2 * n * std * std * std * std + 4 * sum3 * mean -
          6 * sumSq * mean * mean + 4 * sum * mean * mean * mean -
          n * mean * mean * mean * mean
      case _ => sum * mean * mean * mean
    }
    Sums(n, s.missingCount, sum, sumSq, sum3, sum4,
      s.min.getOrElse(Double.PositiveInfinity),
      s.max.getOrElse(Double.NegativeInfinity))
  }

  private def addVec[T](a: Vector[T], b: Vector[T])(
      implicit num: Numeric[T]): Vector[T] =
    a.zipAll(b, num.zero, num.zero).map { case (x, y) => num.plus(x, y) }

  /** PSI between two profiles sharing a frozen binning — the incremental
    * drift monitor: yesterday's catalog vs today's partition catalog,
    * PURE DRIVER MATH from the persisted bin counts (no data scan at
    * all). Works for numeric (boundaries) and categorical (category
    * list) profiles alike.
    *
    * `eps = 0` (default) keeps exact parity with [[Psi.compute]]'s guard —
    * a bin contributes only when BOTH sides put mass there. That
    * convention silently reports 0 for fully-disjoint distributions, so
    * a MONITOR should pass `eps = 1e-10` (the reference's ε convention,
    * `ColumnStatsCalculator.EPS`): empty bins floor at ε and total drift
    * reads as the huge number it is. */
  def psiBetween(expected: ColumnProfile, actual: ColumnProfile,
                 eps: Double = 0.0): Double = {
    require(
      expected.binning.binBoundary == actual.binning.binBoundary &&
        expected.binning.binCategory == actual.binning.binCategory,
      s"binning differs for ${expected.columnName}: PSI needs one frozen " +
        "catalog on both sides")
    def dist(p: ColumnProfile): Vector[Double] = {
      val tot = p.binning.binCountPos.zip(p.binning.binCountNeg)
        .map { case (a, b) => (a + b).toDouble }
      val s = tot.sum
      if (s <= 0) tot else tot.map(_ / s)
    }
    val e = dist(expected)
    val a = dist(actual)
    e.zipAll(a, 0.0, 0.0).map { case (ev0, av0) =>
      val ev = math.max(ev0, eps)
      val av = math.max(av0, eps)
      if (ev > 0 && av > 0) (av - ev) * math.log(av / ev) else 0.0
    }.sum
  }

  /** Categorical merge under a frozen category list
    * (`profileCategorical(categoriesOverride = ...)` gives every
    * partition the same slots, zero-filled where absent): per-slot
    * counts and weighted masses ADD exactly, KS/IV/WoE recompute from
    * the merged counts — bit-equal to a full re-profile. */
  private def mergeCategorical(a: ColumnProfile,
                               b: ColumnProfile): ColumnProfile = {
    require(a.binning.binCategory == b.binning.binCategory,
      s"category lists differ for ${a.columnName}: profiles must share a " +
        "frozen catalog (profileCategorical(categoriesOverride = ...))")
    val pos = addVec(a.binning.binCountPos, b.binning.binCountPos)
    val neg = addVec(a.binning.binCountNeg, b.binning.binCountNeg)
    val wPos = addVec(a.binning.binWeightedPos, b.binning.binWeightedPos)
    val wNeg = addVec(a.binning.binWeightedNeg, b.binning.binWeightedNeg)
    val nBins = pos.length
    val m = StatsMath.columnMetrics(neg.map(_.toDouble), pos.map(_.toDouble))
    val wm = StatsMath.columnMetrics(wNeg, wPos)
    val total = a.stats.totalCount + b.stats.totalCount
    val miss = a.stats.missingCount + b.stats.missingCount
    a.copy(stats = ColumnStats(
      totalCount = total, missingCount = miss,
      missingPercentage = if (total > 0) miss.toDouble / total else 0.0,
      distinctCount = a.stats.distinctCount, // = the frozen list size
      ks = m.map(_.ks), iv = m.map(_.iv), woe = m.map(_.woe),
      weightedKs = wm.map(_.ks), weightedIv = wm.map(_.iv),
      weightedWoe = wm.map(_.woe)),
      binning = a.binning.copy(
        binCountPos = pos, binCountNeg = neg,
        binPosRate = pos.zip(neg).map { case (p, ng) =>
          if (p + ng > 0) p.toDouble / (p + ng) else 0.0 },
        binWeightedPos = wPos, binWeightedNeg = wNeg,
        binCountWoe = m.map(_.binWoe).getOrElse(Vector.fill(nBins)(0.0)),
        binWeightedWoe = wm.map(_.binWoe)
          .getOrElse(Vector.fill(nBins)(0.0)),
        binAvgScore = Vector.empty)) // needs a score pass — cleared
  }

  /** Merge two profiles over disjoint rows and an identical frozen
    * binning (numeric boundaries or categorical category list). Throws
    * if they differ — adding counts binned against different edges or
    * category slots is silent corruption, never do it. */
  def merge(a: ColumnProfile, b: ColumnProfile): ColumnProfile = {
    require(a.kind == b.kind,
      s"column kind differs for ${a.columnName}: ${a.kind} vs ${b.kind}")
    if (a.kind == graft.catalog.ColumnKind.Categorical)
      return mergeCategorical(a, b)
    require(a.binning.binBoundary == b.binning.binBoundary,
      s"bin boundaries differ for ${a.columnName}: profiles must share a " +
        "frozen catalog (profileNumeric(boundsOverride = ...))")
    val sa = recover(a.stats)
    val sb = recover(b.stats)
    val n = sa.n + sb.n
    val sum = sa.sum + sb.sum
    val sumSq = sa.sumSq + sb.sumSq
    val sum3 = sa.sum3 + sb.sum3
    val sum4 = sa.sum4 + sb.sum4
    val miss = sa.miss + sb.miss
    val total = n + miss
    val mean = if (n > 0) sum / n else 0.0
    val std = if (n > 1) StatsMath.stdDevFromSums(n, sum, sumSq) else 0.0
    val pos = addVec(a.binning.binCountPos, b.binning.binCountPos)
    val neg = addVec(a.binning.binCountNeg, b.binning.binCountNeg)
    val wPos = addVec(a.binning.binWeightedPos, b.binning.binWeightedPos)
    val wNeg = addVec(a.binning.binWeightedNeg, b.binning.binWeightedNeg)
    val nBins = pos.length
    val m = StatsMath.columnMetrics(
      neg.map(_.toDouble), pos.map(_.toDouble))
    val wm = StatsMath.columnMetrics(wNeg, wPos)
    val haveMoments =
      a.stats.skewness.isDefined && b.stats.skewness.isDefined
    a.copy(stats = ColumnStats(
      max = Some(math.max(sa.max, sb.max)),
      min = Some(math.min(sa.min, sb.min)),
      mean = Some(mean),
      median = None, p25 = None, p75 = None, // sketches not retained
      totalCount = total, missingCount = miss, validNumCount = n,
      missingPercentage = if (total > 0) miss.toDouble / total else 0.0,
      distinctCount = None,
      stdDev = Some(std),
      ks = m.map(_.ks), iv = m.map(_.iv), woe = m.map(_.woe),
      weightedKs = wm.map(_.ks), weightedIv = wm.map(_.iv),
      weightedWoe = wm.map(_.woe),
      skewness =
        if (haveMoments && n > 0 && std > 0)
          Some(StatsMath.skewness(n, mean, std, sum, sumSq, sum3))
        else None,
      kurtosis =
        if (haveMoments && n > 0 && std > 0)
          Some(StatsMath.kurtosis(n, mean, std, sum, sumSq, sum3, sum4))
        else None),
      binning = ColumnBinning(
        binBoundary = a.binning.binBoundary,
        binCountPos = pos, binCountNeg = neg,
        binPosRate = pos.zip(neg).map { case (p, ng) =>
          if (p + ng > 0) p.toDouble / (p + ng) else 0.0 },
        binWeightedPos = wPos, binWeightedNeg = wNeg,
        binCountWoe = m.map(_.binWoe).getOrElse(Vector.fill(nBins)(0.0)),
        binWeightedWoe = wm.map(_.binWoe)
          .getOrElse(Vector.fill(nBins)(0.0))))
  }
}
