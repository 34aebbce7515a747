package graft.tools

import org.apache.spark.sql.SparkSession

/** ONE copy of the measurement-harness session recipe (Bench, Soak,
  * TimeQ, AnnProbe) — the same engine defaults `graft.Cli.buildSession`
  * gives a production session (GraftExtensions, hugeMethodLimit, UTC),
  * so harness numbers measure the plans a CLI user actually runs.
  * Config drift between four hand-rolled builders was a review finding;
  * fix it here, everywhere. */
object Harness {

  def session(cpus: String =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    // SPARK_GRAFT_MASTER=local-cluster[2,2,2048] runs any tool on real
    // multi-JVM executors (the soak battery's wire-format evidence) —
    // same recipe as graft.Verify: fresh executor JVMs need the
    // compiled classes and the module opens on their own command lines
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val builderM =
      if (!master.startsWith("local-cluster")) builder0
      else {
        if (!sys.env.contains("SPARK_HOME"))
          System.setProperty("spark.test.home", "/opt/spark")
        val opens = Seq("java.lang", "java.lang.invoke",
          "java.lang.reflect", "java.io", "java.net", "java.nio",
          "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar")
          .map(p => s"--add-opens java.base/$p=ALL-UNNAMED").mkString(" ")
        builder0
          .config("spark.executor.extraClassPath", new java.io.File(
            "target/scala-2.13/classes").getAbsolutePath)
          .config("spark.executor.extraJavaOptions", opens)
      }
    val spark = builderM
      // JVM JIT refuses methods past ~8KB bytecode: a whole-stage method
      // bigger than that runs INTERPRETED (measured 18x on
      // wide-expression plans) — fall back to per-operator codegen there
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      // keep intentional constant-key windows single-partitioned AS
      // DECLARED: EliminateWindowPartitions folds `partitionBy(lit(1))`
      // away, turning every bounded-table global window back into a
      // warning-emitting unpartitioned WindowExec. The "optimization"
      // saves nothing (one partition either way) and erases the
      // engine's declared intent, so it is excluded session-wide.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
      // AQE coalescing for consumers of cached frames — see the
      // buildSession twin in graft.Cli for the measured rationale
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Drop leftover cached plans and persistent RDDs (operator-internal
    * cache()/localCheckpoint blocks) so one query's leftovers never tax
    * the next measurement — block-manager growth across hundreds of
    * queries in one session was the round-8 bench-inflation cause. */
  def dropLeftovers(s: SparkSession): Unit = {
    try s.catalog.clearCache() catch { case _: Throwable => () }
    try s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    catch { case _: Throwable => () }
    // memory-sink temp views: the streaming helpers register one
    // stream_<n> table per invocation, each pinning its full result set
    // in memory for the session lifetime — across a 256-query bench
    // session that is leaked storage nothing else reclaims
    try s.catalog.listTables().collect()
      .filter(t => t.isTemporary &&
        (t.name.startsWith("stream_") || t.name.startsWith("warm_")))
      .foreach(t => s.catalog.dropTempView(t.name))
    catch { case _: Throwable => () }
  }
}
