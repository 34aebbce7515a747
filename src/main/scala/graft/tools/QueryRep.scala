package graft.tools

import org.apache.spark.sql.functions._

/** Repeat `queryTopK` N times against an existing ANN index through the
  * HARNESS session (the exact config the soaks run under) — the
  * minimal repro harness for the multi-JVM row-loss investigation:
  * same index + fresh read-only session isolates session-config vs
  * write-history as the poison.
  *
  * Usage: scripts/run.sh graft.tools.QueryRep <indexDir> [reps] */
object QueryRep {
  def main(args: Array[String]): Unit = {
    val idx = args(0)
    val reps = if (args.length > 1) args(1).toInt else 6
    val spark = Harness.session()
    val q = spark.range(0L, 200L).select(col("id").as("vec_id"), expr(
      "transform(sequence(0, 31), d -> cast(0.0 + 1.0 * " +
        "sin(id * 131 + d * 17) AS float))").as("embedding"))
    (1 to reps).foreach { i =>
      val rows = graft.streaming.AnnIngest
        .queryTopK(spark, idx, q, k = 3, nProbe = 1).count()
      println(s"REP$i=$rows")
    }
    spark.stop()
  }
}
