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

  /** The root last passed to `setCheckpointDir`, per SparkContext
    * identity: Spark's setter MUTATES GLOBAL context state and mkdirs
    * a fresh UUID subdirectory on every call, so an iterative caller
    * (dedupClustersIterative checkpoints once per round) must not
    * re-set an unchanged root 40 times per job. Concurrent driver
    * threads wanting DIFFERENT roots still race on Spark's one global
    * slot — callers needing that isolation pass `explicit` dirs and
    * serialize themselves. */
  private val lastRoot =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  /** Materialize `df` once and truncate its lineage: a RELIABLE
    * `checkpoint()` into the configured directory when the session
    * (or the `explicit` override) names one, `localCheckpoint()`
    * otherwise. Eager in both modes. */
  def truncate(df: DataFrame, explicit: Option[String] = None): DataFrame =
    explicit.orElse(dir(df.sparkSession)) match {
      case Some(d) =>
        val sc = df.sparkSession.sparkContext
        val key = Integer.valueOf(System.identityHashCode(sc))
        // the context's CURRENT dir must also still live under our
        // root: external code may have re-pointed the global slot at a
        // foreign dir since we last set it, and skipping the set then
        // would silently checkpoint there instead of the configured one
        val curUnderRoot = sc.getCheckpointDir.exists { cur =>
          val parent = new org.apache.hadoop.fs.Path(cur).getParent
          parent != null && {
            val want = new org.apache.hadoop.fs.Path(d)
            val fs = want.getFileSystem(sc.hadoopConfiguration)
            fs.makeQualified(parent) == fs.makeQualified(want)
          }
        }
        if (lastRoot.put(key, d) != d || !curUnderRoot)
          sc.setCheckpointDir(d)
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
}
