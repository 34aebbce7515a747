package graft.ops

import org.apache.spark.sql.DataFrame

/** Widen-only respread for compute-heavy consumers of narrow scans.
  *
  * The bench/test corpora are single-row-group parquet files, so every
  * scan stage is ONE task and all per-row work chained onto it (hashing,
  * sketches, MLlib iterations, explode fan-outs) runs serially on one
  * core while the other 31 idle (guide §2.5: input parallelism). This
  * helper repartitions to the session's default parallelism ONLY when
  * the plan is narrower than half of it — on production inputs whose
  * split count already meets or exceeds the cluster (100 TB = thousands
  * of splits) it is a no-op and never adds a shuffle. Same heuristic as
  * TextOps.spread (r11), shared here for the non-text operators.
  *
  * Never use on a path whose ORACLE-compared output is a rounded
  * float sum at the query's precision boundary — repartitioning
  * reassociates the sum (check.py's float-close flag guards this). */
object Spread {
  /** Runtime-settable kill switch (A/B probes; `false` disables all
    * widening in the session). */
  val Key = "spark.sql.graft.widen"

  def widen(df: DataFrame): DataFrame = {
    if (!df.sparkSession.conf.get(Key, "true").toBoolean) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
