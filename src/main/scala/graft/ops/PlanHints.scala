package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated plan hints.
  *
  * An explicit `broadcast()` is honored by Spark REGARDLESS of the side's
  * size — on an O(n) table that is a driver OOM at 10⁹ rows, the single
  * worst at-scale failure mode a hint can cause. But post-transform plans
  * often hide the scan's size statistic from CBO (aggregates, typed maps),
  * so the engine misses broadcasts it would happily make with perfect
  * stats. The middle path: hint ONLY when the plan's own size estimate
  * fits under the session's `autoBroadcastJoinThreshold` with headroom —
  * the hint then merely restores the choice CBO would make, and can never
  * force a too-large broadcast. When broadcasting is disabled (threshold
  * -1) no hint is ever added (ScalePlanSpec asserts the resulting plans).
  */
object PlanHints {

  /** Session broadcast threshold in bytes; -1 when disabled. */
  def broadcastThreshold(df: DataFrame): Long = {
    val s = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
    catch { case _: NumberFormatException => -1L } // "-1" = disabled
  }

  /** `broadcast(df)` iff the optimized plan's size estimate × `headroom`
    * is under the broadcast threshold; otherwise `df` unchanged. */
  def gatedBroadcast(df: DataFrame, headroom: Int = 2): DataFrame = {
    val threshold = broadcastThreshold(df)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && est * headroom < threshold) broadcast(df) else df
  }
}
