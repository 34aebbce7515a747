package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.catalog._

/** The `shifu stats` step (SURVEY §3.1), Spark-native: one scan computes
  * moments for every candidate column, one scan counts per-bin pos/neg for
  * every column simultaneously (stacked, partial-aggregated), and the tiny
  * per-column vectors get the exact `ColumnStatsCalculator` driver math.
  * The result is the typed catalog that drives normalize/varselect/eval —
  * replacing the reference's two MR jobs + ColumnConfig.json mutation
  * (`MapReducerStatsWorker.java:93-150`, `UpdateBinningInfoReducer`).
  *
  * Scale: both passes are full scans with map-side partial aggregation;
  * shuffled data is O(columns × bins), independent of row count.
  */
object StatsPipeline {

  final case class NumStats(name: String, count: Long, missing: Long,
      sum: Double, sumSq: Double, min: Double, max: Double) {
    def mean: Double = sum / count
    def stdDev: Double = StatsMath.stdDevFromSums(count, sum, sumSq)
  }

  /** Pass 1: moments for all numeric columns in ONE aggregation. */
  def numericStats(df: DataFrame, cols: Seq[String]): Map[String, NumStats] = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__miss"),
        sum(col(c)).as(s"${c}__sum"),
        sum(col(c) * col(c)).as(s"${c}__sumsq"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      c -> NumStats(c,
        r.getAs[Long](s"${c}__cnt"), r.getAs[Long](s"${c}__miss"),
        r.getAs[Double](s"${c}__sum"), r.getAs[Double](s"${c}__sumsq"),
        r.getAs[Double](s"${c}__min"), r.getAs[Double](s"${c}__max"))
    }.toMap
  }

  /** Pass 2: per-bin pos/neg counts for ALL columns in one scan — each row
    * contributes (column, binId, pos) via `stack`, then a single
    * groupBy((col, bin)) with map-side combine. `boundsFor` gives each
    * column's boundary list (missing → last bin inside binIndex). */
  def allBinCounts(df: DataFrame, cols: Seq[String],
                   boundsFor: Map[String, Seq[Double]],
                   isPos: Column): DataFrame = {
    val pairs = cols.map { c =>
      struct(lit(c).as("col_name"),
        Binning.binIndex(col(c), boundsFor(c)).as("bin_id"))
    }
    df.select(explode(array(pairs: _*)).as("cb"), isPos.cast("long").as("pos"))
      .select(col("cb.col_name"), col("cb.bin_id"), col("pos"))
      .groupBy("col_name", "bin_id")
      .agg(sum("pos").as("cnt_pos"),
        (count(lit(1)) - sum("pos")).as("cnt_neg"))
  }

  /** Full numeric profiling: moments + equal-interval bins + bin counts +
    * KS/IV/WoE. Returns catalog profiles keyed by column. */
  def profileNumeric(df: DataFrame, cols: Seq[String], isPos: Column,
                     k: Int = 10): Map[String, ColumnProfile] = {
    if (cols.isEmpty) return Map.empty
    val stats = numericStats(df, cols)
    val bounds = cols.map { c =>
      val s = stats(c)
      c -> Binning.equalInterval(s.min, s.max, k)
    }.toMap
    val counts = allBinCounts(df, cols, bounds, isPos).collect()
      .groupBy(_.getString(0))
    cols.zipWithIndex.map { case (c, i) =>
      val s = stats(c)
      val nBins = bounds(c).length + 1 // + missing bin
      val pos = Array.fill(nBins)(0.0)
      val neg = Array.fill(nBins)(0.0)
      counts.getOrElse(c, Array.empty).foreach { r =>
        pos(r.getInt(1)) = r.getLong(2).toDouble
        neg(r.getInt(1)) = r.getLong(3).toDouble
      }
      val m = StatsMath.columnMetrics(neg.toIndexedSeq, pos.toIndexedSeq)
      c -> ColumnProfile(
        columnNum = i, columnName = c, kind = ColumnKind.Numeric,
        stats = ColumnStats(
          max = Some(s.max), min = Some(s.min), mean = Some(s.mean),
          totalCount = s.count + s.missing, missingCount = s.missing,
          validNumCount = s.count, stdDev = Some(s.stdDev),
          ks = m.map(_.ks), iv = m.map(_.iv), woe = m.map(_.woe)),
        binning = ColumnBinning(
          binBoundary = bounds(c).toVector,
          binCountPos = pos.map(_.toLong).toVector,
          binCountNeg = neg.map(_.toLong).toVector,
          binPosRate = pos.zip(neg).map { case (p, n) =>
            if (p + n > 0) p / (p + n) else 0.0 }.toVector,
          binCountWoe = m.map(_.binWoe).getOrElse(Vector.fill(nBins)(0.0))))
    }.toMap
  }

  /** Categorical profiling: one scan collects per-category pos/neg counts;
    * categories ordered lexicographically (deterministic catalog).
    * High-cardinality guard: only the `maxCategories` most frequent
    * categories per column ever reach the driver (the reference's
    * MAX_CATEGORICAL_BINC_COUNT cap) — the rank filter runs distributed,
    * partitioned by column. */
  def profileCategorical(df: DataFrame, cols: Seq[String], isPos: Column,
                         maxCategories: Int = 10000)
      : Map[String, ColumnProfile] = {
    if (cols.isEmpty) return Map.empty
    val pairs = cols.map(c => struct(lit(c).as("col_name"),
      col(c).cast("string").as("v")))
    val grouped = df
      .select(explode(array(pairs: _*)).as("cv"), isPos.cast("long").as("pos"))
      .select(col("cv.col_name"), col("cv.v"), col("pos"))
      .groupBy("col_name", "v")
      .agg(sum("pos").as("cnt_pos"), (count(lit(1)) - sum("pos")).as("cnt_neg"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("col_name")
      .orderBy((col("cnt_pos") + col("cnt_neg")).desc, col("v").asc)
    val counts = grouped
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= maxCategories)
      .drop("rnk")
      .collect()
      .groupBy(_.getString(0))
    cols.zipWithIndex.map { case (c, i) =>
      val rows = counts.getOrElse(c, Array.empty)
        .map(r => (Option(r.getString(1)), r.getLong(2), r.getLong(3)))
      val cats = rows.collect { case (Some(v), p, n) => (v, p, n) }
        .sortBy(_._1)
      val missing = rows.collect { case (None, p, n) => (p, n) }
      val pos = cats.map(_._2.toDouble) :+
        missing.map(_._1).sum.toDouble
      val neg = cats.map(_._3.toDouble) :+
        missing.map(_._2).sum.toDouble
      val m = StatsMath.columnMetrics(neg.toIndexedSeq, pos.toIndexedSeq)
      c -> ColumnProfile(
        columnNum = i, columnName = c, kind = ColumnKind.Categorical,
        stats = ColumnStats(
          totalCount = (pos.sum + neg.sum).toLong,
          missingCount = missing.map(t => t._1 + t._2).sum,
          distinctCount = Some(cats.length.toLong),
          ks = m.map(_.ks), iv = m.map(_.iv), woe = m.map(_.woe)),
        binning = ColumnBinning(
          binCategory = cats.map(_._1).toVector,
          binCountPos = pos.map(_.toLong).toVector,
          binCountNeg = neg.map(_.toLong).toVector,
          binPosRate = pos.zip(neg).map { case (p, n) =>
            if (p + n > 0) p / (p + n) else 0.0 }.toVector,
          binCountWoe = m.map(_.binWoe)
            .getOrElse(Vector.fill(pos.length)(0.0))))
    }.toMap
  }
}
