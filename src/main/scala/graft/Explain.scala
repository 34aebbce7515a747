package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints `explain("formatted")` for selected queries so
  * scan pruning (`PushedFilters`/`ReadSchema`), broadcast strategies, and
  * WholeStageCodegen spans can be eyeballed per round.
  * Usage: scripts/run.sh graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.sameElements(Array("entry"))) {
      // drive the flagship exactly as the driver's smoke does
      val df = SparkEntry.entry(spark)
      df.show(20, truncate = false)
      println(s"entry rows: ${df.count()}")
    } else {
      val names = if (args.nonEmpty) args.toSeq
        else Seq("q_jexl_filter", "q_stats_moments", "q_join_enrich",
          "q_cosine_topk", "q_bin_counts")
      names.foreach { n =>
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
