package graft.tools

/** Split each query's wall into DRIVER PLANNING (analyze+optimize+
  * physical-plan, forced via queryExecution.executedPlan before any
  * job) vs EXECUTION (the count() after) — finds queries whose cost is
  * optimizer time on a huge plan, not cluster work (guide §7.3).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... scripts/run.sh graft.tools.PlanTime q_a ... */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm
      Harness.dropLeftovers(spark)
      val t0 = System.nanoTime()
      // per-iteration control flow, NOT `return`: a non-local return
      // from inside foreach would abort main on the first bad query,
      // silently skipping the rest (and spark.stop())
      val built =
        try Some(fn(spark, sfDir))
        catch { case e: Throwable =>
          println(s"[plantime] $name build FAILED: ${e.getMessage}"); None }
      built.foreach { df =>
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+planning
        val tPlan = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        try df.count() catch { case _: Throwable => () }
        val tExec = (System.nanoTime() - t2) / 1e9
        println(f"[plantime] $name%-28s build=$tBuild%6.2f " +
          f"plan=$tPlan%6.2f exec=$tExec%6.2f")
      }
      Harness.dropLeftovers(spark)
    }
    spark.stop()
  }
}
