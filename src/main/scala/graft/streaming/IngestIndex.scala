package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Physical layout of the streaming ingest-gate's dedup index — the
  * piece that makes [[StreamOps.dedupIngestStream]]'s per-batch cost
  * INDEPENDENT of stream history, i.e. the part of the 100 TB/day
  * design claim the naive "re-read every batch=N dir" layout could not
  * meet. LSM-shaped, three mechanisms:
  *
  *  1. '''Delta + compacted base.''' Each micro-batch appends a small
  *     UNpartitioned `batch=<id>` delta (overwrite mode — the retry
  *     idempotency shape is unchanged). [[compact]] periodically folds
  *     base + deltas into a fresh '''hash-prefix-partitioned''' base
  *     (`base_v<K>/hp=XX/`, `hp` = first [[HashPrefixLen]] hex chars
  *     of the key), so the live dir count is O(batches since last
  *     compaction), never O(stream lifetime). The new base is written
  *     to a VERSIONED dir and committed by a single `manifest.json`
  *     pointer swap — no rename window in which index rows exist
  *     nowhere; a crash mid-compaction leaves at worst an orphan
  *     `base_v*` dir that the next compaction deletes. (On an object
  *     store the same manifest-pointer commit applies verbatim; only
  *     the orphan cleanup would consult the manifest rather than
  *     relying on rename semantics.)
  *  2. '''Bloom pre-screen.''' Every delta (and the base) carries a
  *     Bloom sidecar over its keys. A batch row whose key misses ALL
  *     blooms is '''guaranteed new''' (no false negatives) and never
  *     touches the index; only the maybe-seen suspects proceed to the
  *     exact probe joins, so a mostly-clean crawl batch costs ~zero
  *     index IO. False positives only cost a probe — decisions stay
  *     exact and bit-identical with or without the screen.
  *  3. '''Prefix-pruned probes.''' The suspects' distinct `hp`
  *     prefixes (≤ 16^[[HashPrefixLen]] values, collected driver-side)
  *     become a partition filter on the base scan — the exact join
  *     reads only the base partitions that could possibly match
  *     (`PartitionFilters` in the scan, spec-asserted), instead of the
  *     whole corpus index.
  *
  * Bloom sizing: delta sidecars share a fixed [[BloomItems]] geometry
  * so they OR-merge into one probe filter; the base sidecar is re-sized
  * to its true row count at each compaction (it cannot merge with the
  * deltas' geometry, so the probe tests base and merged-deltas
  * separately). A delta larger than [[BloomItems]] only degrades the
  * sidecar's FP rate — more rows probe the index, none are misjudged.
  */
object IngestIndex {

  /** Hex chars of the key used as the base partition column `hp`:
    * 2 → 256 partitions, enough that a pruned probe reads ≲1/256 of
    * the base per suspect prefix while keeping file counts sane. */
  val HashPrefixLen = 2

  /** `hp` partition value for a key: a letter prefix keeps an
    * all-digit prefix ("07") from being type-inferred back as an INT
    * partition column, which would silently break the string `isin`
    * pruning filter. */
  private[streaming] def hpOf(key: Column): Column =
    concat(lit("x"), substring(key, 1, HashPrefixLen))

  /** Shared delta-sidecar Bloom geometry (must be identical across
    * deltas for OR-merge); ~1.2 MB at 1% FPP. */
  val BloomItems: Long = 1L << 20
  val BloomFpp: Double = 0.01

  /** The two index families: exact md5 hashes and MinHash band keys. */
  private[streaming] val Kinds = Seq("hashes", "bands")

  private def fsFor(sp: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(sp.sparkContext.hadoopConfiguration)

  // ---- manifest -----------------------------------------------------------

  /** (maxCompacted batch id, base dir name) — (-1, None) before any
    * compaction. The manifest is the single commit point of a
    * compaction; it is a 1-line JSON file, rewritten atomically-enough
    * (create + rename by the FS client) and tiny to re-read per batch. */
  private[streaming] def readManifest(sp: SparkSession, indexDir: String)
      : (Long, Option[String]) = {
    val fs = fsFor(sp, indexDir)
    val p = new Path(s"$indexDir/manifest.json")
    if (!fs.exists(p)) (-1L, None)
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val mc = "\"maxCompacted\"\\s*:\\s*(-?\\d+)".r
        .findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(-1L)
      val base = "\"base\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(txt).map(_.group(1))
      (mc, base)
    }
  }

  private[streaming] def writeManifest(sp: SparkSession, indexDir: String,
                                       maxCompacted: Long, base: String): Unit = {
    val fs = fsFor(sp, indexDir)
    val out = fs.create(new Path(s"$indexDir/manifest.json"), true)
    try out.write(
      s"""{"maxCompacted": $maxCompacted, "base": "$base"}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  // ---- deltas -------------------------------------------------------------

  /** Delta dirs of `kind` with maxCompacted < id < batchId, oldest
    * first. Listing cost is O(deltas since compaction), the bounded
    * quantity the layout is built around. */
  private[streaming] def deltaDirs(sp: SparkSession, indexDir: String,
      kind: String, maxCompacted: Long, batchId: Long): Seq[(Long, String)] = {
    val fs = fsFor(sp, indexDir)
    val p = new Path(s"$indexDir/$kind")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .map(d => (d.getName.stripPrefix("batch=").toLong, d.toString))
      .filter { case (id, _) => id > maxCompacted && id < batchId }
      .sortBy(_._1)
  }

  private def bloomPath(indexDir: String, kind: String, name: String) =
    new Path(s"$indexDir/blooms/${kind}_$name.bloom")

  private def writeBloom(fs: FileSystem, p: Path, bf: BloomFilter): Unit = {
    val out = fs.create(p, true)
    try bf.writeTo(out) finally out.close()
  }

  private def readBloom(fs: FileSystem, p: Path): Option[BloomFilter] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(BloomFilter.readFrom(in)) finally in.close()
    }

  /** Write one batch's delta of `kind` (distinct single-column `key`
    * rows) plus its Bloom sidecar, both in overwrite mode so a
    * foreachBatch retry leaves them bit-identical. */
  private[streaming] def writeDelta(keys: DataFrame, indexDir: String,
      kind: String, batchId: Long): Unit = {
    val sp = keys.sparkSession
    val dir = s"$indexDir/$kind/batch=$batchId"
    keys.write.mode("overwrite").parquet(dir)
    // sidecar AFTER the rows (a retry that crashed between the two
    // re-does both); built from the written delta so sidecar and rows
    // can never disagree
    val keyCol = keys.columns.head
    val bf = sp.read.parquet(dir).stat
      .bloomFilter(keyCol, BloomItems, BloomFpp)
    writeBloom(fsFor(sp, indexDir),
      bloomPath(indexDir, kind, s"batch=$batchId"), bf)
  }

  // ---- probe --------------------------------------------------------------

  /** All prior index state of `kind` visible to `batchId`:
    * (base dir if compacted, delta dirs, Bloom filters if COMPLETE).
    * An incomplete sidecar set (legacy dirs, mid-write crash) returns
    * None for the blooms — the probe then skips the pre-screen and
    * reads the index exactly, never wrongly. */
  private[streaming] case class Prior(baseDir: Option[String],
                                      deltas: Seq[String],
                                      blooms: Option[Seq[BloomFilter]])

  private[streaming] def prior(sp: SparkSession, indexDir: String,
      kind: String, batchId: Long): Prior = {
    val fs = fsFor(sp, indexDir)
    val (mc, baseName) = readManifest(sp, indexDir)
    val base = baseName.map(b => s"$indexDir/$kind/$b")
      .filter(d => fs.exists(new Path(d)))
    val deltas = deltaDirs(sp, indexDir, kind, mc, batchId)
    val baseBloom = baseName.map(b =>
      readBloom(fs, bloomPath(indexDir, kind, b)))
    val deltaBlooms = deltas.map { case (id, _) =>
      readBloom(fs, bloomPath(indexDir, kind, s"batch=$id")) }
    val all = (baseBloom.toSeq ++ deltaBlooms)
    val blooms = if (all.forall(_.isDefined)) Some(all.flatten) else None
    Prior(base, deltas.map(_._2), blooms)
  }

  /** Might `key` appear in ANY of `bfs`? Geometry-compatible filters
    * are OR-merged into one bitset first; the probe is then ≤2 UDF
    * broadcasts (merged deltas + differently-sized base). */
  private[streaming] def mightContainAny(df: DataFrame,
      bfs: Seq[BloomFilter], key: Column): Column = {
    val groups = bfs.groupBy(_.bitSize()).values.toSeq.map { g =>
      g.reduce { (a, b) => a.mergeInPlace(b); a }
    }
    groups.map(bf => graft.text.BloomDedup.probe(df, bf, key))
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Read prior `kind` rows as a single-column `keyName` frame, pruned:
    * only base partitions whose `hp` appears in `hps` are scanned
    * (deltas are small and unpartitioned — read whole). `hps = None`
    * means "no suspect information" — read everything (exact fallback
    * when sidecars are incomplete). */
  private[streaming] def readPruned(sp: SparkSession, pr: Prior,
      keyName: String, hps: Option[Seq[String]]): DataFrame = {
    val base = pr.baseDir.map { d =>
      val full = sp.read.option("basePath", d).parquet(d)
      hps.fold(full)(ps => full.filter(col("hp").isin(ps: _*)))
        .select(col(keyName))
    }
    val delta =
      if (pr.deltas.isEmpty) None
      else Some(sp.read.parquet(pr.deltas: _*).select(col(keyName)))
    (base.toSeq ++ delta.toSeq)
      .reduceOption(_ union _)
      .getOrElse(sp.emptyDataFrame
        .select(lit("").as(keyName)).limit(0))
  }

  /** The full routed probe for one kind: Bloom-screen `keys` (single
    * key column) against `pr`, collect the suspects' hash prefixes,
    * return the pruned prior rows to exact-join against. With complete
    * sidecars and zero suspects this reads NO index bytes at all. */
  private[streaming] def probeRows(sp: SparkSession, pr: Prior,
      keys: DataFrame, keyName: String): DataFrame = {
    if (pr.baseDir.isEmpty && pr.deltas.isEmpty)
      return sp.emptyDataFrame.select(lit("").as(keyName)).limit(0)
    val hps: Option[Seq[String]] = pr.blooms match {
      case Some(bfs) =>
        val suspects = keys
          .filter(mightContainAny(keys, bfs, col(keyName)))
        Some(suspects
          .select(hpOf(col(keyName)).as("hp"))
          .distinct().collect().map(_.getString(0)).toSeq)
      case None => None // incomplete sidecars: exact unpruned fallback
    }
    if (hps.exists(_.isEmpty))
      sp.emptyDataFrame.select(lit("").as(keyName)).limit(0)
    else readPruned(sp, pr, keyName, hps)
  }

  // ---- compaction ---------------------------------------------------------

  /** Fold base + every delta with id ≤ `upTo` into a fresh
    * hp-partitioned `base_v<upTo>` for both kinds, commit via the
    * manifest pointer, then delete the folded deltas and any stale
    * base. Safe to re-run (idempotent: rebuilding the same version
    * overwrites it; probes meanwhile see base + still-present deltas,
    * and duplicate membership rows cannot change a decision). */
  def compact(sp: SparkSession, indexDir: String, upTo: Long): Unit = {
    val fs = fsFor(sp, indexDir)
    val (mc, oldBase) = readManifest(sp, indexDir)
    if (upTo <= mc) return // nothing newer than the base
    val newBase = s"base_v$upTo"
    Kinds.foreach { kind =>
      val pr = prior(sp, indexDir, kind, upTo + 1)
      val keyName = if (kind == "hashes") "h" else "bk"
      val all = readPruned(sp, pr, keyName, None).distinct()
        .withColumn("hp", hpOf(col(keyName)))
      val dir = s"$indexDir/$kind/$newBase"
      // one shuffle keyed on hp → ~one file per populated partition
      all.repartition(col("hp"))
        .write.mode("overwrite").partitionBy("hp").parquet(dir)
      // base sidecar re-sized to the true row count (own geometry)
      val written = sp.read.option("basePath", dir).parquet(dir)
      val n = written.count()
      val bf = written.stat.bloomFilter(keyName,
        math.max(n, BloomItems), BloomFpp)
      writeBloom(fs, bloomPath(indexDir, kind, newBase), bf)
    }
    writeManifest(sp, indexDir, upTo, newBase) // the commit point
    // cleanup AFTER commit: folded deltas, their sidecars, prior base
    Kinds.foreach { kind =>
      deltaDirs(sp, indexDir, kind, -1L, upTo + 1).foreach { case (id, d) =>
        fs.delete(new Path(d), true)
        fs.delete(bloomPath(indexDir, kind, s"batch=$id"), false)
        ()
      }
      oldBase.filter(_ != newBase).foreach { b =>
        fs.delete(new Path(s"$indexDir/$kind/$b"), true)
        fs.delete(bloomPath(indexDir, kind, b), false)
        ()
      }
    }
  }

  /** Does `indexDir` hold state from a previous run? (Restart-guard
    * probe for [[StreamOps.dedupIngestStream]].) */
  private[streaming] def nonEmpty(sp: SparkSession, indexDir: String)
      : Boolean = {
    val fs = fsFor(sp, indexDir)
    fs.exists(new Path(s"$indexDir/manifest.json")) ||
      Kinds.exists { kind =>
        val p = new Path(s"$indexDir/$kind")
        fs.exists(p) && fs.listStatus(p)
          .exists(_.getPath.getName.startsWith("batch="))
      }
  }
}
