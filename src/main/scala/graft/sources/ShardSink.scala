package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sharded corpus export + integrity manifest — the release
  * sink of a training-data pipeline (a corpus ships as N reproducible
  * shards plus a manifest the trainer and auditors can check against).
  *
  * Shard assignment is the same md5(doc_id) arithmetic as sequence
  * packing — content-independent and stable across runs/partitionings, so
  * re-exporting an unchanged corpus yields bit-identical shard membership
  * and manifest. Each shard is one output file (`partitionBy` on the
  * shard value after a shard-keyed repartition), so file count = shard
  * count regardless of input parallelism.
  *
  * The manifest rolls up per shard: doc count, token count, id range and
  * an ORDER-INDEPENDENT content fingerprint (sum of per-doc md5-prefix
  * longs, summed as decimal so the total cannot overflow at corpus
  * scale) — computable by any engine over the shard files, and
  * insensitive to row order inside a shard. One agg pass, ≤ numShards
  * rows; written as a single JSON file next to the shards. */
object ShardSink {

  /** Manifest rollup over a (doc_id, text, shard) frame — shared by the
    * writer, the verifier and the oracle-checked q_shard_manifest query.
    * The fingerprint is emitted as a STRING so its exact integer value is
    * engine-representation-independent. */
  def manifestOf(withShard: DataFrame): DataFrame =
    withShard.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long")).as("n_tokens"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"),
        // coalesce: concat_ws SKIPS a null text, silently hashing the
        // bare doc_id — a null-text doc's audit line is defined as the
        // hash of the empty document instead (fuzz gate, nulls mode)
        sum(conv(substring(md5(concat_ws("|",
            col("doc_id").cast("string"), coalesce(col("text"), lit("")))
            .cast("binary")),
          1, 15), 16, 10).cast("decimal(20,0)"))
          .cast("string").as("content_sum"))
      .orderBy("shard")

  /** The deterministic md5 shard key (same arithmetic as packing). */
  def shardCol(numShards: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("long"), lit(numShards))

  /** Write `docs` (must have doc_id, text; extra columns pass through) as
    * `numShards` jsonl.gz or parquet shards under `outDir`, plus
    * `manifest.json`. Returns the manifest as a DataFrame. */
  def writeShards(docs: DataFrame, outDir: String, numShards: Int = 16,
                  format: String = "jsonl"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(Set("jsonl", "parquet")(format), s"unknown format $format")
    val spark = docs.sparkSession
    // persist: the shard write and the manifest aggregation otherwise
    // each re-read the source corpus (two full scans + double the md5
    // work per export)
    val withShard = docs.withColumn("shard", shardCol(numShards)).persist()
    try {
      val arranged = withShard
        .repartition(numShards, col("shard"))
        .sortWithinPartitions("shard", "doc_id")
      val w = arranged.write.mode("overwrite").partitionBy("shard")
      format match {
        case "jsonl"   => w.option("compression", "gzip").json(outDir)
        case "parquet" => w.parquet(outDir)
      }
      val manifest = manifestOf(withShard)
      val rows = manifest.collect()
      writeText(spark, s"$outDir/manifest.json", manifestJson(rows))
      // return the ALREADY-COLLECTED rows as a local frame: the lazy
      // `manifest` plan would re-scan the full corpus (+ the md5 work)
      // on any caller action, after the persist below is gone
      spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        manifest.schema)
    } finally { withShard.unpersist(false); () }
  }

  /** ONE manifest-row rendering for writer and verifier: verification
    * compares the stored text byte-for-byte, so two hand-kept copies of
    * this string builder would silently fail every valid export the
    * moment one of them changed. */
  private def manifestJson(rows: Array[org.apache.spark.sql.Row]): String =
    rows.map { r =>
      s"""{"shard":${r.getLong(0)},"n_docs":${r.getLong(1)},""" +
        s""""n_tokens":${r.getLong(2)},"min_doc_id":${r.getLong(3)},""" +
        s""""max_doc_id":${r.getLong(4)},""" +
        s""""content_sum":"${r.getString(5)}"}"""
    }.mkString("[\n", ",\n", "\n]\n")

  /** Re-read an exported shard dir and recompute the manifest — returns
    * (manifest, matches) where `matches` is true iff it equals the stored
    * manifest.json byte-for-byte field set. */
  def verifyShards(spark: SparkSession, outDir: String,
                   format: String = "jsonl"): (DataFrame, Boolean) = {
    // scope to the shard dirs — the root also holds manifest.json
    val df = format match {
      case "jsonl" =>
        spark.read.option("basePath", outDir).json(s"$outDir/shard=*")
      case "parquet" =>
        spark.read.option("basePath", outDir).parquet(s"$outDir/shard=*")
    }
    val recomputed =
      manifestOf(df.withColumn("shard", col("shard").cast("long")))
    val stored = readText(spark, s"$outDir/manifest.json")
    (recomputed, stored == manifestJson(recomputed.collect()))
  }

  /** Manifest publish via write-temp-then-rename(OVERWRITE) — the same
    * commit discipline as the LSM index manifests: a crash mid-write
    * must leave the OLD manifest (or none), never a truncated one that
    * an auditor's verify pass would have to distinguish from a corrupt
    * export. */
  private def writeText(spark: SparkSession, path: String,
                        content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(p).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readText(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }
}
