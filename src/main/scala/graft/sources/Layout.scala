package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operations — the operational side of keeping a 100 TB
  * parquet corpus scannable:
  *
  *  - **Compaction**: streaming ingest and fine-grained writes leave
  *    thousands of KB-sized part files; every one costs a task + a
  *    footer read per scan. Compacting to ~`targetBytes` parts restores
  *    O(bytes / 128 MB) task counts.
  *  - **Sorted layout**: parquet row-group min/max statistics only prune
  *    when values CLUSTER. Range-partitioning + in-partition sorting on
  *    the hot filter key makes every row group's [min, max] narrow, so a
  *    pushed predicate skips whole row groups (measured in LayoutSpec by
  *    recordsRead, not claimed). The write pays one range shuffle ONCE;
  *    every selective scan afterwards reads a fraction of the data —
  *    the classic layout-for-skipping trade.
  */
object Layout {

  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Rewrite `inDir` as ~`targetBytes`-sized parquet parts. Returns the
    * part count written. Sizing uses the INPUT byte sum (compressed), so
    * output parts land near the target without a pre-scan of values. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val bytes = dirBytes(spark, inDir)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    parts
  }

  /** Range-partitioned, in-partition-sorted parquet write on `key` —
    * the layout that makes row-group stats selective for filters on
    * `key`. */
  def sortedWrite(df: DataFrame, outDir: String, key: String,
                  nParts: Int): Unit = {
    require(nParts > 0, s"nParts must be positive: $nParts")
    df.repartitionByRange(nParts, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(outDir)
  }
}
