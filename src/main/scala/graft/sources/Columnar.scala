package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar format of the Hadoop ecosystem
  * next to parquet (the reference's pig layer reads/writes both through
  * PigStorage/OrcStorage; see reference `pig/` store statements). Spark's
  * built-in `orc` datasource gives the same scan machinery parquet gets:
  * column pruning, predicate pushdown into stripe/row-group indexes, and
  * splittable zstd compression — so a 100 TB ORC corpus scans with the
  * identical plan shape as the parquet path (ReadSchema + PushedFilters,
  * asserted in Round8bOpsSpec).
  */
object Columnar {

  /** Write `df` as zstd-compressed ORC. zstd is the right default at
    * scale: ~parquet-snappy read speed at a noticeably better ratio, and
    * ORC stripes stay independently splittable under it (unlike gzip'd
    * text, which serializes a whole file into one task). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.format("orc").option("compression", "zstd")
      .mode("overwrite").save(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("orc").load(path)
}
