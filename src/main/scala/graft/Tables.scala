package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-generated test tables (TESTDATA.md).
  *
  * At 100 TB each `load` is a plain parquet scan: column pruning and predicate
  * pushdown are delegated to the parquet source, so every query below should
  * show `PushedFilters`/`ReadSchema` restricted to what it actually touches.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects; read
      // as raw nanos-since-epoch LONG and do integer time arithmetic (a
      // double would lose precision above 2^53 ns ≈ 1970+104 days).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
