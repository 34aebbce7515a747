package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed evaluation operators.
  *
  * The reference sorts all scores with a Hadoop total-order sort
  * (`Eval.pig:39`) then streams them SINGLE-THREADED through the driver
  * (`core/ConfusionMatrix.java:276-520`
  * bufferedComputeConfusionMatrixAndPerformance) — a non-starter at 100 TB.
  * Here the whole sweep is a window cumulative sum over the score order:
  * one range-partitioned sort shuffle, per-bucket aggregation, and only the
  * ≤ numBucket+1 bucket rows ever reach the driver (for AUC trapezoids,
  * `core/eval/AreaUnderCurve.java:9-60`).
  */
object Eval {

  /** Bucketed confusion matrix: rows ordered by score desc (deterministic
    * tie-break), split into `buckets` equal-frequency buckets (ntile
    * semantics, reference `performanceBucketNum=10`, `EvalConfig.java:46`);
    * emits cumulative TP/FP/TN/FN at each bucket boundary — all integers.
    * Math mirrors `core/PerformanceEvaluator.java:201-330`.
    *
    * Scale note: `ntile().over(Window.orderBy(...))` would funnel every row
    * through ONE partition. Instead: range-repartition on the sort key (the
    * same distributed total-order sort Spark uses for `orderBy`), rank via
    * `zipWithIndex` (one partition-count job), assign ntile buckets in
    * closed form, and aggregate per partition — only `buckets` tiny rows
    * ever leave the executors. */
  def confusionSweep(df: DataFrame, score: Column, isPos: Column,
                     tieBreak: Seq[Column], buckets: Int = 10): DataFrame = {
    val spark = df.sparkSession
    val cols = Seq(isPos.cast("long").as("pos"), score.as("s")) ++
      tieBreak.zipWithIndex.map { case (c, i) => c.as(s"tb_$i") }
    val order = col("s").desc +: tieBreak.indices.map(i => col(s"tb_$i").asc)
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val sorted = df.select(cols: _*)
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .select("pos")
    val posRanked = sorted.rdd.zipWithIndex() // (row, 0-based global rank)
      .map { case (r, i) => (r.getLong(0), i) }
    posRanked.cache()
    val n = posRanked.count()
    val base = n / buckets
    val rem = (n % buckets).toInt
    val cut = rem * (base + 1) // ranks below this are in the +1-sized buckets
    val perBucket = posRanked
      .map { case (pos, r) =>
        val b = if (base == 0 || r < cut) (r / (base + 1)).toInt + 1
                else rem + ((r - cut) / base).toInt + 1
        (b, (pos, 1L))
      }
      .reduceByKey((a, b) => (a._1 + b._1, a._2 + b._2))
      .collect()
      .sortBy(_._1)
    posRanked.unpersist(false)
    // cumulative sweep over <= buckets rows: driver math, like the
    // reference's ColumnStatsCalculator pattern
    val totPos = perBucket.map(_._2._1).sum
    val totN = perBucket.map(_._2._2).sum
    var cumPos = 0L; var cumN = 0L
    val rows = perBucket.map { case (b, (bPos, bN)) =>
      cumPos += bPos; cumN += bN
      (b, cumPos, cumN - cumPos, totPos - cumPos,
        (totN - totPos) - (cumN - cumPos))
    }
    import spark.implicits._
    rows.toSeq.toDF("bucket", "tp", "fp", "fn", "tn")
  }

  /** Gain-chart rows per bucket (reference `core/eval/GainChart.java` /
    * PerformanceObject fields :34-69): action rate, recall, precision,
    * lift — derived from the integer sweep, rounded for oracle parity. */
  def gainChart(sweep: DataFrame): DataFrame =
    sweep.select(
      col("bucket"),
      col("tp"), col("fp"), col("fn"), col("tn"),
      round((col("tp") + col("fp")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn")), 6).as("action_rate"),
      round(col("tp").cast("double") / (col("tp") + col("fn")), 6).as("recall"),
      round(col("tp").cast("double") / (col("tp") + col("fp")), 6).as("precision"),
      round((col("tp").cast("double") / (col("tp") + col("fn"))) /
        ((col("tp") + col("fp")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn"))), 6).as("lift"))

  /** ROC AUC by trapezoid over the bucket boundaries, with the (0,0) origin
    * prepended (`AreaUnderCurve.ofRoc`). Driver gets only bucket rows. */
  def rocAuc(sweep: DataFrame): DataFrame = {
    val w = Window.orderBy("bucket")
    sweep.select(
      col("bucket"),
      (col("fp").cast("double") / (col("fp") + col("tn"))).as("fpr"),
      (col("tp").cast("double") / (col("tp") + col("fn"))).as("tpr"))
      .select(
        col("fpr"), col("tpr"),
        lag("fpr", 1, 0.0).over(w).as("fpr0"),
        lag("tpr", 1, 0.0).over(w).as("tpr0"))
      .agg(round(sum((col("fpr") - col("fpr0")) *
        (col("tpr") + col("tpr0")) / 2), 6).as("auc"))
  }
}
