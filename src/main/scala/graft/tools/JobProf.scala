package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-query job/stage/task profile — answers "is this query's wall
  * time compute or fixed per-job overhead?" for the drill-style
  * operators whose bodies run many sequential actions.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... scripts/run.sh graft.tools.JobProf q_a q_b ...
  * Prints, per query (steady-state rep after one warm rep):
  *   jobs, stages, tasks, sum(task run time) sec, wall sec,
  *   wall - taskTime/cores (the un-parallelized residue). */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm
      Harness.dropLeftovers(spark)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        println(s"[jobprof] $name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — let counters drain
      Thread.sleep(300)
      val cores = spark.sparkContext.defaultParallelism
      val taskSec = taskMs.get() / 1e3
      println(f"[jobprof] $name%-28s jobs=${jobs.get()}%4d " +
        f"stages=${stages.get()}%4d tasks=${tasks.get()}%5d " +
        f"taskSec=$taskSec%8.2f wall=$wall%6.2f " +
        f"residue=${wall - taskSec / cores}%6.2f")
      Harness.dropLeftovers(spark)
    }
    spark.stop()
  }
}
