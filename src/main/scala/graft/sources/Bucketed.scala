package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style bucketed tables — the PRE-SHUFFLED join path (SURVEY §2.5
  * scale note: "repartition()/bucketing for co-located joins").
  *
  * Writing a fact table bucketed (and sorted) by its join key pays the
  * key shuffle ONCE at write time; every later equi-join between tables
  * bucketed the same way on the same key runs with ZERO exchanges — at
  * 100 TB that converts the recurring dominant cost of a fact-fact join
  * into a one-time materialization. Spark's reader exposes the bucket
  * spec as `HashPartitioning(outputPartitioning)`, so the planner drops
  * both Exchange nodes (and, with `sortBy`, the Sorts) from the
  * sort-merge join.
  *
  * Bucket metadata only survives through the catalog, so these are
  * `saveAsTable` managed tables (the path-based `.parquet(dir)` writer
  * silently drops the bucket spec — a classic Spark footgun this module
  * exists to encapsulate).
  */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed AND sorted by `keys`
    * (sorting makes the later sort-merge join exchange-free and
    * sort-free). Overwrites any existing table of the same name. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(keys.nonEmpty, "bucket keys must be non-empty")
    val spark = df.sparkSession
    // a managed-table LOCATION can outlive the (in-memory) catalog entry
    // across sessions; overwrite alone then fails LOCATION_ALREADY_EXISTS —
    // drop both the entry and any orphaned directory first
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Hadoop FS, not java.io.File: the warehouse may be hdfs://, s3a://
    // or any other scheme — a local-File probe silently no-ops there
    // and the orphaned LOCATION resurfaces as LOCATION_ALREADY_EXISTS,
    // the exact cross-session failure this cleanup exists to prevent.
    // Database-qualified names live under <db>.db/ in the warehouse.
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val rel = table.toLowerCase.split("\\.") match {
      case Array(db, t) => s"$db.db/$t"
      case _            => table.toLowerCase
    }
    val loc = new org.apache.hadoop.fs.Path(warehouse, rel)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on their bucket keys. The caller
    * asserts the plan (BucketedSpec does): with equal bucket counts the
    * join subtree contains NO Exchange — only the post-join aggregation
    * (if any) shuffles. */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
           leftKeys: Seq[String], rightKeys: Seq[String]): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
      "join key lists must be non-empty and of equal length")
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    val cond = leftKeys.zip(rightKeys)
      .map { case (a, b) => l(a) === r(b) }
      .reduce(_ && _)
    l.join(r, cond)
  }
}
