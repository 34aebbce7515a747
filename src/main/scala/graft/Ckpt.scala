package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-level lineage-truncation policy.
  *
  * Several engine internals materialize an intermediate once and
  * truncate its lineage — the iterative-CC rounds, the trainers'
  * fit-assembly projections, the quality-model feature table. On
  * `local[n]` the right tool is `localCheckpoint` (executor-local
  * blocks, no filesystem round-trip); on a real cluster an executor
  * loss silently drops those blocks and fails the job, so long-running
  * production pipelines want a RELIABLE `checkpoint` into a durable
  * directory (HDFS/object store).
  *
  * One switch covers every such site: set
  * `spark.sql.graft.checkpointDir=<dir>` on the session (runtime-
  * settable; CLI/stream paths inherit it with no per-operator flag) and
  * [[Ckpt.truncate]] checkpoints reliably into it; unset, the
  * local-mode default is unchanged. Operators with an explicit
  * checkpoint-dir parameter (e.g. `TextOps.dedupClustersIterative`)
  * treat that parameter as an override of the session conf. */
object Ckpt {

  /** The session conf key. `spark.sql.`-prefixed so it is
    * runtime-settable through `SparkSession.conf` (bare `spark.graft.*`
    * would be rejected as a static Spark-core key by some shells). */
  val DirKey = "spark.sql.graft.checkpointDir"

  def dir(sp: SparkSession): Option[String] =
    sp.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty)

  /** Materialize `df` once and truncate its lineage: a RELIABLE
    * `checkpoint()` into the configured directory when the session
    * (or the `explicit` override) names one, `localCheckpoint()`
    * otherwise. Eager in both modes. */
  def truncate(df: DataFrame, explicit: Option[String] = None): DataFrame =
    explicit.orElse(dir(df.sparkSession)) match {
      case Some(d) =>
        df.sparkSession.sparkContext.setCheckpointDir(d)
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
}
