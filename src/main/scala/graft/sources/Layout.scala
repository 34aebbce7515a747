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

  /** Interleave the low `bits` bits of an integer Column into even bit
    * positions (Morton spreading) — pure shift/mask Column arithmetic,
    * fully codegen'd. `bits <= 16` so the spread fits 32 bits and a
    * two-dim z-value fits a long. */
  private def spreadBits(c: org.apache.spark.sql.Column,
                         bits: Int): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 16, s"bits=$bits out of [1,16]")
    val masked = c.bitwiseAND(lit((1L << bits) - 1))
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))
      .foldLeft(masked) { case (x, (sh, mask)) =>
        x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
      }
  }

  /** Z-order (Morton-curve) layout over TWO numeric keys: each key is
    * linearly scaled to a `bits`-bit code between its min and max, the
    * codes' bits interleave into one z-value, and the write
    * range-partitions + sorts on z. A contiguous z-range covers a
    * bounded RECTANGLE of the (A, B) code space, so parquet row-group
    * min/max stats become selective for filters on EITHER key — the
    * multi-dimension generalization of [[sortedWrite]] (which prunes
    * only its leading key). Costs: one min/max agg pass + one range
    * shuffle at write time; per-row z math is O(1) shift/mask codegen.
    *
    * Linear min/max codes assume the keys aren't pathologically skewed;
    * for a long-tailed key, pre-transform it (log) before layout — the
    * curve needs code mass spread across the range to cut rectangles. */
  def zorderWrite(df: DataFrame, outDir: String, keyA: String, keyB: String,
                  nParts: Int, bits: Int = 16): Unit = {
    require(nParts > 0, s"nParts must be positive: $nParts")
    val mm = df.agg(
      min(col(keyA).cast("double")), max(col(keyA).cast("double")),
      min(col(keyB).cast("double")), max(col(keyB).cast("double"))).head()
    require(!mm.isNullAt(0) && !mm.isNullAt(2),
      s"z-order keys must have non-null values: $keyA, $keyB")
    val maxCode = (1L << bits) - 1
    def code(key: String, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else least(lit(maxCode), greatest(lit(0L),
        floor((col(key).cast("double") - lit(lo)) / lit(hi - lo) *
          lit(maxCode.toDouble)).cast("long")))
    val za = spreadBits(code(keyA, mm.getDouble(0), mm.getDouble(1)), bits)
    val zb = spreadBits(code(keyB, mm.getDouble(2), mm.getDouble(3)), bits)
    df.withColumn("__z", za.bitwiseOR(shiftleft(zb, 1)))
      .repartitionByRange(nParts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
