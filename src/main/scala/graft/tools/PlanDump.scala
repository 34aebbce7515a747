package graft.tools

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence for optimization rounds.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... scripts/run.sh graft.tools.PlanDump \
  *          <outDir> <suffix> q_a q_b ...
  * writes <outDir>/<query>_<suffix>.txt per query. Queries whose body
  * is driver-side orchestration (drills) still dump the plan of the
  * returned frame — for those the interesting plans are the inner
  * operators', captured separately where needed. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()
    // SPARK_GRAFT_PLANDUMP_CONF="k=v,k=v" — runtime confs to set before
    // building plans (e.g. the Spread kill switch, for BEFORE shapes)
    sys.env.get("SPARK_GRAFT_PLANDUMP_CONF").foreach(_.split(",")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} B)")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
