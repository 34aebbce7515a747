package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group quantile normalization (batch-effect removal): map each
  * group's value distribution onto the GLOBAL distribution, so a value
  * is replaced by the global quantile at its group-relative rank. The
  * standard fix when per-source score scales drift (different crawls,
  * different annotators) — the rank-based sibling of the reference's
  * ZSCALE family (`core/Normalizer.java:444-520`), robust to the
  * per-group scale/shape instead of just mean/variance.
  *
  * Scale shape: ONE grouped exact-percentile aggregate (groups × (k-1)
  * values — bounded), one tiny global aggregate folded to literals, a
  * size-gated broadcast re-attach, and a narrow array-lambda map. The
  * per-row work is `size(filter(bounds, b -> v >= b))` — k comparisons
  * against a 20-ish-entry array, no join per row, no sort anywhere.
  */
object QuantileNorm {

  /** Returns `df` + (src_bin, qnorm): the group-relative k-quantile bin
    * of `value`, and the global distribution's bin-lower-edge for that
    * bin. Integer-typed end to end when `value` is integral. */
  def normalize(df: DataFrame, group: String, value: String,
      k: Int = 20): DataFrame = {
    // the rank/bin math below is long-typed end to end; accept any
    // integral value column by widening to long, and fail FAST with a
    // clear message otherwise (a double column used to surface as a
    // ClassCastException deep inside head())
    import org.apache.spark.sql.types._
    df.schema(value).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"QuantileNorm.normalize: value column '$value' must be integral " +
          s"(byte/short/int/long), got $other")
    }
    val v = col(value).cast("long")
    val qs = (1 until k).map(_.toDouble / k)
    val gb = df.groupBy(group)
      .agg(percentile_approx(v, array(qs.map(lit): _*),
        lit(2147483647)).as("__gbounds"))
    val g = df.agg(min(v),
        percentile_approx(v, array(qs.map(lit): _*),
          lit(2147483647))).head()
    val gedges = g.getLong(0) +: g.getSeq[Long](1)
    val joined = df.join(PlanHints.gatedBroadcast(gb), Seq(group))
    val srcBin = size(filter(col("__gbounds"),
      b => col(value).cast("long") >= b))
    joined
      .withColumn("src_bin", srcBin.cast("long"))
      .withColumn("qnorm",
        element_at(array(gedges.map(lit): _*), (srcBin + 1).cast("int")))
      .drop("__gbounds")
  }
}
