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
    import spark.implicits._
    sweepBuckets(df, score, isPos, tieBreak, lit(1.0), buckets)
      .map { case (b, tp, fp, fn, tn, _, _, _, _) => (b, tp, fp, fn, tn) }
      .toSeq.toDF("bucket", "tp", "fp", "fn", "tn")
  }

  /** Weighted dual of the sweep (reference PerformanceObject's weighted
    * TP/FP/FN/TN, `core/PerformanceEvaluator.java:201-330`): cumulative
    * POSITIVE-WEIGHT and total-weight sums at the same ntile boundaries. */
  def weightedSweep(df: DataFrame, score: Column, isPos: Column,
                    weight: Column, tieBreak: Seq[Column],
                    buckets: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    sweepBuckets(df, score, isPos, tieBreak, weight, buckets)
      .map { case (b, tp, fp, fn, tn, wtp, wfp, wfn, wtn) =>
        (b, tp, fp, fn, tn, math.rint(wtp * 1e4) / 1e4,
          math.rint(wfp * 1e4) / 1e4, math.rint(wfn * 1e4) / 1e4,
          math.rint(wtn * 1e4) / 1e4)
      }
      .toSeq
      .toDF("bucket", "tp", "fp", "fn", "tn", "wtp", "wfp", "wfn", "wtn")
  }

  /** Operating points at fixed FPR targets (reference
    * `PerformanceEvaluator.java:201-330` buckets performance by FPR /
    * recall as well as action rate): run the distributed sweep at fine
    * resolution, then pick for each target the FIRST bucket whose FPR
    * reaches it — bounded driver selection over ≤ `buckets` rows, no
    * extra scan. */
  def operatingPoints(df: DataFrame, score: Column, isPos: Column,
                      tieBreak: Seq[Column], buckets: Int = 100,
                      fprTargetsPct: Seq[Int] = (10 to 90 by 10))
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = confusionSweep(df, score, isPos, tieBreak, buckets)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    val picked = fprTargetsPct.flatMap { t =>
      rows.find { case (_, _, fp, _, tn) =>
        fp.toDouble / (fp + tn) >= t / 100.0
      }.map { case (b, tp, fp, fn, tn) =>
        (t.toLong, b.toLong, tp, fp, fn, tn)
      }
    }
    picked.toDF("target_pct", "bucket", "tp", "fp", "fn", "tn")
  }

  /** Recall-bucketed dual of [[operatingPoints]] (the reference's other
    * PerformanceObject bucketing mode): first bucket reaching each
    * recall target. */
  def recallPoints(df: DataFrame, score: Column, isPos: Column,
                   tieBreak: Seq[Column], buckets: Int = 100,
                   recallTargetsPct: Seq[Int] = (10 to 90 by 10))
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = confusionSweep(df, score, isPos, tieBreak, buckets)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    val picked = recallTargetsPct.flatMap { t =>
      rows.find { case (_, tp, _, fn, _) =>
        tp.toDouble / (tp + fn) >= t / 100.0
      }.map { case (b, tp, fp, fn, tn) =>
        (t.toLong, b.toLong, tp, fp, fn, tn)
      }
    }
    picked.toDF("target_pct", "bucket", "tp", "fp", "fn", "tn")
  }

  /** Shared distributed sweep core: range-sort + zipWithIndex ranking,
    * closed-form ntile buckets, per-bucket (count, weight) partials, and
    * the tiny cumulative pass on the driver. */
  private def sweepBuckets(df: DataFrame, score: Column, isPos: Column,
                           tieBreak: Seq[Column], weight: Column,
                           buckets: Int): Array[(Int, Long, Long, Long, Long,
                             Double, Double, Double, Double)] = {
    // NULL tag = not the positive class, NULL weight = no mass (both
    // mirror the oracles' CASE/sum-skip arithmetic; nullable here NPE'd
    // the driver decode — fuzz gate, nulls mode). NULL scores stay:
    // both engines rank them last under DESC.
    val cols = Seq(coalesce(isPos.cast("long"), lit(0L)).as("pos"),
      coalesce(weight.cast("double"), lit(0.0)).as("w"), score.as("s")) ++
      tieBreak.zipWithIndex.map { case (c, i) => c.as(s"tb_$i") }
    val order = col("s").desc +: tieBreak.indices.map(i => col(s"tb_$i").asc)
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val ranked = df.select(cols: _*)
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .select("pos", "w").rdd
      .map(r => (r.getLong(0), r.getDouble(1)))
    ranked.cache()
    // job 1 (fills the cache): per-partition row counts → rank offsets
    val partCounts = ranked
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partCounts.scanLeft(0L)(_ + _)
    val n = offsets.last
    val base = n / buckets
    val rem = (n % buckets).toInt
    val cut = rem * (base + 1) // ranks below this are in the +1-sized buckets
    // job 2 (from cache): per-partition per-bucket partials — ≤ buckets
    // tiny tuples per task come to the driver, no shuffle at all
    val perBucket = ranked.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      val acc = new java.util.TreeMap[Int, Array[Double]]()
      it.foreach { case (pos, w) =>
        val b = if (base == 0 || r < cut) (r / (base + 1)).toInt + 1
                else rem + ((r - cut) / base).toInt + 1
        val slot = acc.computeIfAbsent(b, _ => new Array[Double](4))
        slot(0) += pos; slot(1) += 1
        if (pos == 1L) slot(2) += w
        slot(3) += w
        r += 1
      }
      import scala.jdk.CollectionConverters._
      acc.asScala.iterator.map { case (b, s) =>
        (b, (s(0).toLong, s(1).toLong, s(2), s(3)))
      }
    }.collect()
      .groupBy(_._1).map { case (b, xs) =>
        // partitions are rank-contiguous: merge order is by partition, and
        // all weights per bucket are integer-valued → sums exact anyway
        (b, xs.map(_._2).reduce((a, c) =>
          (a._1 + c._1, a._2 + c._2, a._3 + c._3, a._4 + c._4)))
      }
      .toArray.sortBy(_._1)
    ranked.unpersist(false)
    // cumulative sweep over <= buckets rows: driver math, like the
    // reference's ColumnStatsCalculator pattern
    val totPos = perBucket.map(_._2._1).sum
    val totN = perBucket.map(_._2._2).sum
    val totWPos = perBucket.map(_._2._3).sum
    val totW = perBucket.map(_._2._4).sum
    var cumPos = 0L; var cumN = 0L; var cumWPos = 0.0; var cumW = 0.0
    perBucket.map { case (b, (bPos, bN, bWPos, bW)) =>
      cumPos += bPos; cumN += bN; cumWPos += bWPos; cumW += bW
      (b, cumPos, cumN - cumPos, totPos - cumPos,
        (totN - totPos) - (cumN - cumPos),
        cumWPos, cumW - cumWPos, totWPos - cumWPos,
        (totW - totWPos) - (cumW - cumWPos))
    }
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

  /** Self-contained HTML gain-chart report (reference `shifu eval`'s
    * `core/eval/GainChart.java:39-110` `generateHtml`; the reference
    * inlines a JS template — here a dependency-free static page): the
    * per-bucket table plus an inline SVG of recall & lift vs action rate.
    * Driver-side rendering of an already-aggregated ≤buckets-row frame —
    * no executor work beyond the sweep itself. */
  def gainChartHtml(gain: DataFrame, path: String,
                    title: String = "graft eval"): Unit = {
    val rows = gain.orderBy("bucket").collect()
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    def fmt(v: Any): String = v match {
      case d: Double => f"$d%.6f"
      case x => esc(String.valueOf(x))
    }
    if (rows.isEmpty) {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        s"<!DOCTYPE html><html><body><h2>${esc(title)} — gain chart" +
          "</h2><p>no buckets</p></body></html>\n")
      return
    }
    val cols = gain.columns
    val thead = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val tbody = rows.map(r =>
      "<tr>" + cols.indices.map(i => s"<td>${fmt(r.get(i))}</td>").mkString +
        "</tr>").mkString("\n")
    def polyline(xs: Seq[Double], ys: Seq[Double], color: String): String = {
      val pts = xs.zip(ys).map { case (x, y) =>
        f"${40 + x * 500}%.1f,${260 - y * 220}%.1f"
      }.mkString(" ")
      s"""<polyline fill="none" stroke="$color" stroke-width="2" points="$pts"/>"""
    }
    val ar = rows.map(_.getAs[Double]("action_rate"))
    val recall = rows.map(_.getAs[Double]("recall"))
    val maxLift = rows.map(_.getAs[Double]("lift")).max.max(1e-9)
    val lift = rows.map(_.getAs[Double]("lift") / maxLift)
    val svg =
      s"""<svg width="580" height="300" style="border:1px solid #ccc">
         |<line x1="40" y1="260" x2="540" y2="260" stroke="#888"/>
         |<line x1="40" y1="40" x2="40" y2="260" stroke="#888"/>
         |${polyline(ar.toIndexedSeq, recall.toIndexedSeq, "#1f77b4")}
         |${polyline(ar.toIndexedSeq, lift.toIndexedSeq, "#d62728")}
         |<text x="440" y="60" fill="#1f77b4">recall</text>
         |<text x="440" y="80" fill="#d62728">lift (/${f"$maxLift%.2f"})</text>
         |<text x="250" y="285" fill="#555">action rate</text>
         |</svg>""".stripMargin
    val html =
      s"""<!DOCTYPE html><html><head><meta charset="utf-8">
         |<title>${esc(title)}</title>
         |<style>table{border-collapse:collapse}td,th{border:1px solid #999;
         |padding:3px 8px;font:12px monospace}</style></head>
         |<body><h2>${esc(title)} — gain chart</h2>
         |$svg
         |<table><thead><tr>$thead</tr></thead><tbody>
         |$tbody
         |</tbody></table></body></html>
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), html)
  }

  /** PR AUC by trapezoid over the bucket boundaries
    * (`AreaUnderCurve.ofPr`): recall on x, precision on y; the first
    * segment extends flat from recall 0 at the first bucket's precision
    * (lag-coalesce — identical formulation in the SQL oracle). */
  def prAuc(sweep: DataFrame): DataFrame = {
    // constant partition key: the sweep is ≤ buckets+1 rows BY DESIGN, so
    // a single-partition window is bounded — but a bare orderBy window
    // emits a "No Partition Defined" WARN on every run, burying real
    // warnings in test/bench logs
    val w = Window.partitionBy(lit(1)).orderBy("bucket")
    sweep.select(
      col("bucket"),
      (col("tp").cast("double") / (col("tp") + col("fn"))).as("recall"),
      (col("tp").cast("double") / (col("tp") + col("fp"))).as("precision"))
      .select(
        col("recall"), col("precision"),
        lag("recall", 1, 0.0).over(w).as("r0"),
        lag("precision", 1).over(w).as("p0"))
      .agg(round(sum((col("recall") - col("r0")) *
        (col("precision") + coalesce(col("p0"), col("precision"))) / 2), 6)
        .as("pr_auc"))
  }

  /** Reliability-diagram bins (calibration curve): equal-width bins over
    * a [0,1] probability, per-bin count, mean predicted probability, and
    * observed positive rate. The modern companion to the score-stats /
    * gain-chart family: a model can rank well (high AUC) and still be
    * mis-calibrated, and calibration is what decision thresholds consume.
    * One map-combined scan; intermediate is `bins` rows. */
  def calibrationBins(df: DataFrame, p: Column, isPos: Column,
                      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    df.select(p.as("p"), isPos.cast("int").cast("double").as("y"))
      .groupBy(least(floor(col("p") * bins), lit(bins - 1))
        .cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg("p"), 6).as("mean_pred_r"),
        round(avg("y"), 6).as("pos_rate_r"))
  }

  /** Expected calibration error (bin-weighted |observed − predicted|)
    * and Brier score (mean squared probability error) in ONE scan: the
    * per-bin partial agg carries (n, Σp, Σy, Σ(p−y)²), so both summary
    * numbers reduce from `bins` rows — no second pass over the data. */
  def calibrationSummary(df: DataFrame, p: Column, isPos: Column,
                         bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    df.select(p.as("p"), isPos.cast("int").cast("double").as("y"))
      .groupBy(least(floor(col("p") * bins), lit(bins - 1))
        .cast("int").as("bin"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum("p").as("sp"), sum("y").as("sy"),
        sum(pow(col("p") - col("y"), 2)).as("sq"))
      .agg(
        round(sum(abs(col("sy") / col("n") - col("sp") / col("n")) *
          col("n")) / sum("n"), 6).as("ece_r"),
        round(sum("sq") / sum("n"), 6).as("brier_r"),
        sum("n").cast("long").as("n_rows"))
  }

  /** ROC AUC by trapezoid over the bucket boundaries, with the (0,0) origin
    * prepended (`AreaUnderCurve.ofRoc`). Driver gets only bucket rows. */
  def rocAuc(sweep: DataFrame): DataFrame = {
    // bounded single-partition window; constant key suppresses the
    // misleading WindowExec WARN (see prAuc)
    val w = Window.partitionBy(lit(1)).orderBy("bucket")
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
