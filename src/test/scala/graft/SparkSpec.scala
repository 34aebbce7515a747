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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
