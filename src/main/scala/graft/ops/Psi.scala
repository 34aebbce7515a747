package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Population Stability Index across population units.
  *
  * Reference: `udf/PopulationCounterUDF.java:62-110` counts per
  * (psiUnit, columnId, bin), then `udf/PSICalculatorUDF.java:45-105` computes
  * psi = Σ (a−e)·ln(a/e) per unit against the global expected distribution
  * (dataflow `PSI.pig:31-48`; unit column `ModelStatsConf.java:95`).
  *
  * Spark design: one groupBy(unit, bin) count, a window sum per unit and a
  * global bin distribution joined back (broadcast — bin table is tiny), no
  * second scan. Scales as a single shuffle on (unit, bin).
  */
object Psi {

  /** Per-unit PSI of `value`'s bin distribution vs the global one.
    * Output: (unit, psi) with psi rounded to 6 for oracle parity. */
  def compute(df: DataFrame, value: Column, unit: Column,
              boundaries: Seq[Double]): DataFrame = {
    val binned = df.select(
      unit.as("unit"),
      Binning.binIndex(value, boundaries).as("bin_id"))
    val counts = binned.groupBy("unit", "bin_id").agg(count(lit(1)).as("c"))
    val unitTot = Window.partitionBy("unit")
    val withActual = counts.withColumn("a",
      col("c").cast("double") / sum("c").over(unitTot))
    val global = binned.groupBy("bin_id").agg(count(lit(1)).as("gc"))
    // constant partition key: the table is the bounded bin list (≤
    // dozens of rows), but an EXPLICIT single partition silences the
    // WindowExec all-to-one warning and states the intent
    val globalTot = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val expected = global.withColumn("e",
      col("gc").cast("double") / sum("gc").over(globalTot))
    withActual.join(broadcast(expected), "bin_id")
      .groupBy("unit")
      .agg(round(sum(
        when(col("a") > 0 && col("e") > 0,
          (col("a") - col("e")) * log(col("a") / col("e")))
          .otherwise(0.0)), 6).as("psi"))
  }
}
