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
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
      // Spark 4 only reads as a raw LONG via nanosAsLong) and
      // TIMESTAMP(MICROS). Normalize to nanos-since-epoch LONG either way
      // so every consumer does integer time arithmetic (a double would
      // lose precision above 2^53 ns ≈ 1970+104 days).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => df // already raw nanos
        case _ => // TIMESTAMP / TIMESTAMP_NTZ (micros precision)
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr(
              "unix_micros(cast(ts as timestamp)) * 1000"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
