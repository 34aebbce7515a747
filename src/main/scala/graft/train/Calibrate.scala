package graft.train

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{IsotonicRegression, IsotonicRegressionModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Score calibration — mapping a model's raw score to a probability.
  * The reference's eval pipeline consumes raw scores and leaves
  * calibration to the modeler; any production scoring system (and every
  * quality-classifier-driven corpus filter) needs the calibrated
  * probability, so this is a first-class post-train step here.
  *
  * Isotonic regression (pool-adjacent-violators) is the standard
  * non-parametric calibrator: fits the least-squares MONOTONE
  * step-function from score to P(label=1). MLlib's implementation
  * aggregates duplicate scores distributed, then PAV runs over the
  * bounded distinct-score sequence — the corpus is touched by one
  * aggregation pass, and the fitted model is a pair of bounded
  * boundary/prediction arrays that broadcast into a codegen'd transform.
  */
object Calibrate {

  /** Calibratable score: non-null and finite. Written null-safe so its
    * NEGATION is also the exact complement (a NULL score makes the
    * naive `s =!= Inf` conjunct NULL, which `filter` drops on BOTH
    * sides — losing rows instead of routing them to the NULL arm). */
  private def finiteScore(s: Column): Column =
    s.isNotNull && !isnan(s) &&
      s =!= lit(Double.PositiveInfinity) &&
      s =!= lit(Double.NegativeInfinity)

  /** Fit an isotonic calibrator from `score` to binary `isPos`. */
  def isotonicFit(df: DataFrame, score: Column,
                  isPos: Column): IsotonicRegressionModel = {
    // rows with no score or no label can't calibrate anything (the
    // fit raises on NULL/NaN labels — fuzz gate, nulls mode; MLlib's
    // assembler also rejects ±Infinity scores — NaN gate)
    val d = df.select(score.cast("double").as("s"),
      coalesce(isPos.cast("double"), lit(0.0)).as("label"))
      .filter(finiteScore(col("s")))
    new IsotonicRegression()
      .setFeaturesCol("sv").setLabelCol("label").setPredictionCol("p")
      .fit(new VectorAssembler().setInputCols(Array("s"))
        .setOutputCol("sv").transform(d))
  }

  /** Sidecar text form: one `boundary<TAB>prediction` line per PAV block
    * (same convention as the `<catalog>.quantiles` sidecar). */
  def serialize(model: IsotonicRegressionModel): String =
    model.boundaries.toArray.zip(model.predictions.toArray)
      .map { case (b, p) => s"$b\t$p" }.mkString("\n")

  /** Rebuild the scoring function from a sidecar. Reproduces MLlib's
    * predict exactly: clamp outside the boundary range, exact-match hit,
    * linear interpolation between adjacent boundaries. */
  def deserializeFn(s: String): Double => Double = {
    val rows = s.split("\n").filter(_.nonEmpty).map { l =>
      val Array(b, p) = l.split("\t"); (b.toDouble, p.toDouble)
    }
    val bs = rows.map(_._1)
    val ps = rows.map(_._2)
    (x: Double) => {
      val i = java.util.Arrays.binarySearch(bs, x)
      if (i >= 0) ps(i)
      else {
        val ins = -i - 1
        if (ins == 0) ps.head
        else if (ins == bs.length) ps.last
        else {
          val (b0, b1, p0, p1) = (bs(ins - 1), bs(ins), ps(ins - 1), ps(ins))
          p0 + (p1 - p0) * (x - b0) / (b1 - b0)
        }
      }
    }
  }

  /** Apply: returns `df` plus a `calibrated` probability column. Uses the
    * model's own transform — a per-row binary search over the PAV
    * boundary array shipped once in the task closure. (A literal
    * when-chain would be O(blocks) PER ROW and the block count is only
    * bounded by the number of distinct scores — fine for bins, wrong for
    * a continuous score.) */
  def apply(df: DataFrame, score: Column,
            model: IsotonicRegressionModel): DataFrame = {
    // scoreless/non-finite rows calibrate to NULL (the assembler would
    // abort the whole pass on them — fuzz gate nulls mode, NaN gate):
    // split, transform the scoreable side, union the rest back with a
    // NULL calibration
    val withS = df.withColumn("__cal_s", score.cast("double"))
    val scoreable = withS.filter(finiteScore(col("__cal_s")))
    val rest = withS.filter(!finiteScore(col("__cal_s")))
      .withColumn("calibrated", lit(null).cast("double"))
      .drop("__cal_s")
    val withVec = new VectorAssembler().setInputCols(Array("__cal_s"))
      .setOutputCol("sv")
      .transform(scoreable)
    model.setFeaturesCol("sv").setPredictionCol("calibrated")
      .transform(withVec)
      .drop("__cal_s", "sv")
      .unionByName(rest)
  }
}
