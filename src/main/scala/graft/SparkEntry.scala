package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full `shifu stats` lifecycle (SURVEY §3.1), Spark-native:
    * one moments scan + one stacked bin-count scan over all candidate
    * columns, driver KS/IV/WoE math, catalog rows out. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val profiles = graft.ops.StatsPipeline.profileNumeric(
      Tables.load(spark, dir, "lineitem"), cols,
      col("l_returnflag") === "R")
    cols.map { c =>
      val p = profiles(c)
      (p.columnNum, p.columnName, p.stats.totalCount,
        p.stats.mean.getOrElse(0.0), p.stats.stdDev.getOrElse(0.0),
        p.stats.ks.getOrElse(0.0), p.stats.iv.getOrElse(0.0),
        p.binning.binBoundary.length)
    }.toDF("column_num", "column_name", "total_count", "mean", "std_dev",
      "ks", "iv", "n_bins")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
