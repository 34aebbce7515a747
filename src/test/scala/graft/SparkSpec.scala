package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // JVM JIT refuses methods past ~8KB bytecode: a whole-stage method
      // bigger than that runs INTERPRETED (measured 18x on wide-expression
      // plans). Make Spark fall back to per-operator codegen there.
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      // keep intentional constant-key windows single-partitioned AS
      // DECLARED: EliminateWindowPartitions folds `partitionBy(lit(1))`
      // away, turning every bounded-table global window back into a
      // warning-emitting unpartitioned WindowExec. The "optimization"
      // saves nothing (one partition either way) and erases the
      // engine's declared intent, so it is excluded session-wide.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
