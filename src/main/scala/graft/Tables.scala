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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
