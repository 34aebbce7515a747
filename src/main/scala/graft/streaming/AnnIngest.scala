package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.DotProduct.dot
import graft.streaming.IngestIndex.{Manifest, Run}

/** Streaming ANN index ingest — the similarity-family counterpart of
  * the dedup ingest gate ([[StreamOps.dedupIngestStream]]): a continuous
  * embedding feed is folded into a PERSISTED, cell-partitioned IVF index
  * that the query path reads with partition pruning. Reference scope:
  * the reference engine has no vector surface at all (ShifuML/shifu is
  * tabular); this is a beyond-reference operator for the
  * training-data-pipeline family (SURVEY "similarity search" scale
  * path), built from the in-repo IVF pieces ([[graft.sim.Ivf]]).
  *
  * Layout (`indexDir/`):
  *  - `centroids.json` — the coarse quantizer, written exactly once by
  *    the first non-empty batch (`Ivf.centroids` is deterministic:
  *    hash-stride sample, driver-local Lloyd) and FROZEN under ingest:
  *    cell assignment is a pure function of the vector, so batches
  *    never need to revisit earlier state and two ingests of the same
  *    vector land in the same cell forever. The ONLY path that may
  *    replace it is retrain-at-compaction (below), which rebuilds the
  *    whole index under the new quantizer in the same atomic commit.
  *  - `vectors/batch=<id>/cell=<c>/` — per-batch delta, OVERWRITE mode
  *    (foreachBatch retry idempotency, same shape as [[IngestIndex]]).
  *  - `vectors/run_<K>_<k>/cell=<c>/` + `manifest.json` — size-tiered
  *    compacted runs, committed by the manifest pointer swap
  *    ([[IngestIndex]] manifest helpers reused verbatim): [[compact]]
  *    folds the new deltas into one run (O(deltas)) and merges runs of
  *    the same power-of-two size class binary-counter style, so the
  *    biggest run is rewritten only when the corpus doubles — never
  *    "the whole base every cycle".
  *  - `skew_v<K>.json` — cell-occupancy report written at each
  *    compaction (bounded: ≤ nCells rows, counted from parquet footers
  *    via the partition column): a frozen quantizer under distribution
  *    shift silently piles rows into a few hot cells, and this is the
  *    operator's own telemetry for noticing (`skew` = max/mean cell
  *    share; ≥ ~4 with many cells means pruning has stopped helping).
  *  - `tombs/t_<tag>/` — deletion tombstones ([[delete]]): readers
  *    anti-join them immediately; compaction folds them into every run
  *    it writes and sweeps each tombstone once no live run predates it
  *    (plus one retention generation) — the LSM delete, required the
  *    moment a real corpus faces takedowns.
  *
  * Scale shape: ingest is APPEND-ONLY — unlike the dedup gate it never
  * probes prior state, so per-batch cost is O(batch) by construction
  * (broadcast centroids, narrow assignment map, one cell-partitioned
  * write). Queries probe nProbe cells per vector: the probed cell set
  * (≤ nCells values) becomes a partition filter on every run scan, so a
  * query touches `nProbe / nCells` of the corpus regardless of index
  * size. Cells are the IVF sharding — on a cluster each cell's files
  * co-locate and brute-force scoring stays within the pruned slice.
  */
object AnnIngest {

  /** Default coarse-quantizer width. 16 cells suits the sf-scale specs;
    * production callers size via [[cellsFor]]. */
  val DefaultCells = 16

  /** Session conf key selecting the AT-REST vector codec for the
    * index's run/delta writes: `f64` (default — `array<double>`,
    * lossless for any input) or `f32` (`array<float>` — HALF the
    * vector bytes at rest, which at 10⁹ × 1024-dim is ~4 TB saved per
    * index and a byte-bound serving scan read twice as fast).
    *
    * Loss model: when the source embeddings are float32 — the common
    * case for learned embeddings, and the `embeddings` table's own
    * type — the f32 round-trip is EXACT (float→double→float is the
    * identity on representable values), so queries are bit-identical
    * to f64 storage. Double-born vectors round to the nearest float
    * (half-ulp per component); opt-in by design.
    *
    * Decoding is SCHEMA-driven: every index read casts `e` back to
    * `array<double>` (a no-op cast Catalyst removes under f64), so an
    * index may MIX runs written under either codec — the flag only
    * matters to writers, and a reader session needs no conf at all. */
  val VectorCodecKey = "spark.sql.graft.ann.vectorCodec"

  /** Apply the session's at-rest codec to a (vec_id, e, norm, cell)
    * frame about to be written as a run/delta. */
  private def encodeVec(sp: SparkSession, df: DataFrame): DataFrame =
    sp.conf.getOption(VectorCodecKey).getOrElse("f64") match {
      case "f64" => df
      case "f32" => df.withColumn("e", col("e").cast("array<float>"))
      case other => throw new IllegalArgumentException(
        s"$VectorCodecKey must be f64|f32, got '$other'")
    }

  /** Standard IVF cell count for an EXPECTED corpus size: ~sqrt(n)
    * (cell size ≈ cell count balances probe cost against assignment
    * selectivity), clamped to [1, 65536] so the probed-cell partition
    * filter and the driver-side centroid broadcast stay bounded. The
    * quantizer freezes at the first batch, so the caller passes the
    * corpus it EXPECTS to ingest, not the first batch's size — same
    * contract as sizing any offline-trained IVF. Mirrors
    * `Similarity.bitsFor` for the LSH family: fixed geometry was that
    * family's measured 10× cliff (BENCH_SCALE.md), and a fixed
    * DefaultCells has the same failure mode at corpus scale. */
  def cellsFor(expectedN: Long): Int = {
    require(expectedN > 0, s"expectedN must be positive, got $expectedN")
    math.min(1 << 16, math.max(1, math.round(math.sqrt(
      expectedN.toDouble)).toInt))
  }

  private def fs(sp: SparkSession, dir: String) =
    new Path(dir).getFileSystem(sp.sparkContext.hadoopConfiguration)

  /** Anything to compact at `indexDir`? The ANN layout's dual of
    * [[IngestIndex.nonEmpty]] (which checks the GATE's hashes/bands
    * subdirs): a committed manifest, or any vector delta. Guards the
    * stream's empty-batch compaction cadence against compacting an
    * index that has never seen a row. */
  private def indexNonEmpty(sp: SparkSession, indexDir: String): Boolean = {
    val f = fs(sp, indexDir)
    f.exists(new Path(s"$indexDir/manifest.json")) || {
      val p = new Path(vectorsDir(indexDir))
      f.exists(p) &&
        f.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
    }
  }

  private def centroidsPath(indexDir: String, name: String) =
    new Path(s"$indexDir/$name")

  /** Serialize centroids exactly: `java.lang.Double.toString` round
    * trips every finite double, so a re-read quantizer is bit-identical
    * to the trained one (assignment determinism across restarts). */
  private[streaming] def writeCentroids(sp: SparkSession, indexDir: String,
      cents: Array[Array[Double]], name: String = "centroids.json"): Unit = {
    val txt = cents.map(_.mkString("[", ",", "]"))
      .mkString("[", ",\n", "]")
    // write-temp-then-rename, same as the manifest: an in-place write
    // crashed mid-stream leaves a TRUNCATED quantizer — and the frozen
    // first-batch centroids.json is not manifest-gated, so a retry
    // would parse the partial text into a short/jagged array and
    // either wedge on it or silently freeze a degenerate quantizer
    val f = fs(sp, indexDir)
    val tmp = centroidsPath(indexDir, s"$name.tmp")
    val out = f.create(tmp, true)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
    // rename with OVERWRITE (same commit discipline as the manifest):
    // a delete-then-rename pair has a window where NO quantizer file
    // exists — a crash there would make a restart retrain a fresh
    // frozen quantizer while existing rows keep cells assigned by the
    // lost one
    IngestIndex.renameOverwrite(f,
      sp.sparkContext.hadoopConfiguration, tmp,
      centroidsPath(indexDir, name))
  }

  /** Name of the manifest-committed quantizer file, if retrain-at-
    * compaction has replaced the original (None = the frozen
    * first-batch `centroids.json` is still live). Telemetry surface for
    * callers auditing whether a retrain took effect. */
  def quantizerName(sp: SparkSession, indexDir: String): Option[String] =
    IngestIndex.readManifest(sp, indexDir).cents

  /** The quantizer queries and ingest must use: the manifest's `cents`
    * pointer when retrain-at-compaction has committed one, else the
    * frozen first-batch `centroids.json`. */
  def readCentroids(sp: SparkSession, indexDir: String)
      : Option[Array[Array[Double]]] =
    centroidsOf(IngestIndex.readManifest(sp, indexDir), sp, indexDir)

  private def centroidsOf(m: Manifest, sp: SparkSession, indexDir: String)
      : Option[Array[Array[Double]]] =
    readCentroidsFile(sp, indexDir, m.cents.getOrElse("centroids.json"))

  private def readCentroidsFile(sp: SparkSession, indexDir: String,
      name: String): Option[Array[Array[Double]]] = {
    val f = fs(sp, indexDir)
    val p = centroidsPath(indexDir, name)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(txt.split("\\],?\\s*\\[").toArray
        .map(_.replaceAll("[\\[\\]\\s]", ""))
        .filter(_.nonEmpty)
        .map(_.split(",").map(_.toDouble)))
    }
  }

  /** The frozen quantizer for this index: read it, or train it from
    * `firstBatch` (deterministic) and persist. Later batches always
    * take the read path — the quantizer never drifts under ingest.
    * Training is REFUSED when vector deltas already exist without a
    * centroids file (manual deletion, partial restore): a retrained
    * quantizer would assign new batches under different cells than the
    * existing index rows, silently corrupting every pruned query. */
  private[streaming] def ensureCentroids(batch: DataFrame, indexDir: String,
      nCells: Int): Array[Array[Double]] = {
    val sp = batch.sparkSession
    readCentroids(sp, indexDir).getOrElse {
      if (fs(sp, indexDir).exists(new Path(vectorsDir(indexDir))))
        throw new IllegalStateException(
          s"ANN index at $indexDir has vector deltas but no " +
            "centroids.json — retraining would assign cells " +
            "inconsistently with the existing index; restore the " +
            "centroids file or rebuild the index from scratch")
      val v = graft.sim.Similarity.prep(batch)
      val cents = graft.sim.Ivf.centroids(v, nCells)
      writeCentroids(sp, indexDir, cents)
      cents
    }
  }

  /** Ingest one batch: assign each vector to its (frozen) nearest cell
    * and append under `vectors/batch=<id>`, partitioned by cell.
    * Overwrite mode → a foreachBatch retry leaves the index
    * bit-identical. No prior index state is read — ingest cost is
    * O(batch) whatever the corpus size. */
  def ingestBatch(batch: DataFrame, batchId: Long, indexDir: String,
                  nCells: Int = DefaultCells): Unit =
      IngestIndex.withWriterLease(batch.sparkSession, indexDir) {
    val cents = ensureCentroids(batch, indexDir, nCells)
    val assigned = graft.sim.Ivf.assignCells(
      graft.sim.Similarity.prep(batch), cents)
    val sp = batch.sparkSession
    // ~one file per populated cell partition. The exchange width is
    // bounded by the quantizer size (there are at most |cells| distinct
    // keys): a full configured-width exchange (AQE is off inside
    // foreachBatch) is mostly empty tasks when |cells| is small, and
    // capping at the session width changes nothing at production cell
    // counts
    val w = graft.ops.Spread.cellWidth(sp, cents.length)
    encodeVec(sp, assigned)
      .repartition(w, col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/vectors/batch=$batchId")
  }

  private def vectorsDir(indexDir: String) = s"$indexDir/vectors"
  private def tombsDir(indexDir: String) = s"$indexDir/tombs"

  /** Slot ids of LIVE centroids. A cold-cell fold deadens a slot by
    * writing an all-NaN centroid in place (slot ids ARE cell ids, so
    * folding must never renumber the survivors): dead slots hold no
    * rows, win no argmin (NaN never beats a running min), and are
    * filtered out of probe sets — they cost one NaN check per row in
    * the assignment loop and nothing anywhere else. */
  private[streaming] def liveSlots(cents: Array[Array[Double]]): Seq[Int] =
    cents.indices.filter(c => !cents(c)(0).isNaN)

  /** Count of live (non-dead) quantizer slots — the figure that
    * bounds probe sets, partition counts, and skew mean. Telemetry
    * surface for callers auditing fold/split heals. */
  def liveCellCount(sp: SparkSession, indexDir: String): Int =
    readCentroids(sp, indexDir).map(liveSlots(_).size).getOrElse(0)

  /** Register vectors for deletion (takedowns, dedup corrections): a
    * TOMBSTONE — `ids` (single `vec_id` column) written under
    * `tombs/t_<tag>` in overwrite mode, so re-issuing the same tag is
    * idempotent. Readers anti-join live tombstones immediately (the
    * ids vanish from every readIndex/queryTopK result as soon as this
    * returns); the next [[compact]] APPLIES them (the rebuilt runs
    * physically exclude the rows) and the one after SWEEPS the applied
    * tombstone dirs (same one-generation retention as runs, so a
    * reader planned before the apply still sees them). Semantics: a
    * tombstone excludes its ids until it is swept — re-ingesting a
    * deleted id becomes visible only after that second compaction.
    * Call from the ingest control loop, not concurrently with a
    * running compaction. */
  def delete(sp: SparkSession, indexDir: String, ids: DataFrame,
             tag: String): Unit =
      IngestIndex.withWriterLease(sp, indexDir) {
    require(tag.matches("[A-Za-z0-9_\\-]+"),
      s"tombstone tag must be [A-Za-z0-9_-]+, got '$tag'")
    // the split_ namespace is reserved: split-retrain tombstones are
    // MANIFEST-GATED (a dir is honored only when committed), which
    // would silently defer a user takedown issued under such a tag
    require(!tag.startsWith("split_"),
      s"tag '$tag' collides with the reserved split-retrain namespace " +
        "(t_split_*); pick another tag")
    // an APPLIED tag must not be re-issued with more ids: the sweep
    // proof covers what was applied under that name, so extending it
    // could sweep before the new ids are removed — silently undoing a
    // takedown. Overwriting a not-yet-applied tag stays allowed (the
    // idempotent-retry shape).
    val m = IngestIndex.readManifest(sp, indexDir)
    val applied = (m.runs.getOrElse("tombs", Nil) ++
      m.runs.getOrElse("tswept", Nil)).map(_.name).toSet
    if (applied.contains(s"t_$tag"))
      throw new IllegalArgumentException(
        s"tombstone tag '$tag' was already applied by a compaction — " +
          "issue the additional ids under a fresh tag")
    // SOURCE-SCOPE the takedown: it removes the id's copies from
    // sources that exist NOW. Without the bound a vec_id re-ingested
    // AFTER the delete (fresh content under a recycled id) was
    // silently hidden until the tombstone swept — and a compaction in
    // that window physically dropped the fresh row. Writers are
    // lease-serialized, so every future batch/compaction id is > the
    // max source id observed here.
    val bound = 1L + math.max(m.maxCompacted,
      liveWith(m, sp, indexDir, Long.MaxValue)._2
        .map(d => srcIdOf(d)).maxOption.getOrElse(-1L))
    ids.select(col("vec_id").cast("long"))
      .distinct()
      .withColumn("tb_bound", lit(bound))
      .write.mode("overwrite").parquet(s"${tombsDir(indexDir)}/t_$tag")
  }

  /** Live (not yet swept) tombstone dirs on disk. Bounded: tombstones
    * are applied at each compaction and swept one generation later.
    *
    * MANIFEST-GATING for split tombstones: a `t_split_*` dir is live
    * ONLY IF the manifest's tombs/tswept lists it. A takedown
    * tombstone ([[delete]]) is deliberately live the moment its dir
    * exists — the user asked for the exclusion, committed or not. A
    * SPLIT tombstone is compaction-internal: it is written just before
    * the manifest swap that also publishes the relocation run, and a
    * crash in between leaves the dir on disk with the relocated copies
    * UNCOMMITTED — honoring it would silently hide every mover (its
    * old-cell copy excluded, its new-cell copy nonexistent). Gated on
    * the manifest, the orphan dir is inert and the next compaction
    * retry overwrites it with the same deterministic content. */
  private[streaming] def tombDirs(sp: SparkSession, indexDir: String)
      : Seq[String] =
    tombDirsWith(IngestIndex.readManifest(sp, indexDir), sp, indexDir)

  private def tombDirsWith(m: Manifest, sp: SparkSession,
      indexDir: String): Seq[String] = {
    val p = new Path(tombsDir(indexDir))
    val f = fs(sp, indexDir)
    if (!f.exists(p)) return Nil
    val recognized = (m.runs.getOrElse("tombs", Nil) ++
      m.runs.getOrElse("tswept", Nil)).map(_.name).toSet
    f.listStatus(p).toSeq.map(_.getPath.toString)
      .filter { d =>
        val n = d.split("/").last
        n.startsWith("t_") &&
          (!n.startsWith("t_split_") || recognized(n))
      }.sorted
  }

  /** Source id of a run/delta dir: the compaction id that wrote a run
    * (`run_<id>_<k>`) or a delta's batch id (`batch=<id>`) — both on
    * the batch-id axis the tombstone ledger's applied-at ids use. An
    * unrecognized name reads 0 (oldest — conservatively INSIDE every
    * cell-scoped tombstone's exclusion scope: the failure mode of
    * guessing "new" would be resurrecting a stale pre-split copy). */
  private def srcIdOf(dir: String): Long = IngestIndex.srcIdOf(dir)

  /** Live tombstone rows normalized to (vec_id, cell, tb_applied):
    * takedown tombstones ([[delete]]) carry only vec_id — cell reads
    * NULL, meaning "exclude everywhere, from every source"; split-
    * retrain relocation tombstones are CELL-SCOPED (vec_id, cell) AND
    * SOURCE-SCOPED (tb_applied = the manifest's applied-at id): they
    * exclude only the STALE copy left in the row's former cell by a
    * run that PREDATES the split. Without the source scope, a vec_id
    * re-ingested after the split with an updated embedding whose
    * argmin lands back in its old cell would match the (vec_id, cell)
    * tombstone and be silently excluded — and the next compaction's
    * fold would physically drop the fresh row. */
  private def tombRows(m: Manifest, sp: SparkSession,
      dirs: Seq[String]): DataFrame =
    dirs.map { d =>
      val n = d.split("/").last
      val df = sp.read.parquet(d)
      val cellCol =
        if (df.columns.contains("cell")) col("cell").cast("int")
        else lit(null).cast("int")
      val applied: Column =
        if (n.startsWith("t_split_"))
          // split tombstones are manifest-gated, so a live one always
          // has a ledger record; a missing one (impossible by
          // construction) reads MaxValue = exclude from every source,
          // the pre-scoping behavior
          lit((m.runs.getOrElse("tombs", Nil) ++
            m.runs.getOrElse("tswept", Nil))
            .find(_.name == n).map(_.rows).getOrElse(Long.MaxValue))
        else if (df.columns.contains("tb_bound"))
          // source-scoped takedown ([[delete]] stamps the bound); a
          // legacy dir without it excludes from every source
          col("tb_bound").cast("long")
        else lit(null).cast("long")
      df.select(col("vec_id"), cellCol.as("cell"),
        applied.as("tb_applied"))
    }.reduce(_ unionByName _)

  /** Anti-join `rows` (must carry vec_id + cell + src_id) against
    * normalized tombstone rows: match on vec_id, scoped to the row's
    * cell when the tombstone names one, and to sources older than the
    * tombstone's application when it carries an applied-at id. Small
    * tombstone sets broadcast (shuffle-free BroadcastHashJoin — the
    * vec_id equality is the hash key, the cell/source scopes ride
    * along as the join's extra condition). */
  private def antiTombs(rows: DataFrame, tombs: DataFrame,
      small: Boolean): DataFrame = {
    val t = (if (small) broadcast(tombs) else tombs)
      .withColumnRenamed("vec_id", "tb_vid")
      .withColumnRenamed("cell", "tb_cell")
    // cell scope and source scope are INDEPENDENT: a split tombstone
    // carries both (stale old-cell copy, pre-split sources); a scoped
    // takedown carries only the source bound (every cell, pre-delete
    // sources); a legacy takedown carries neither (exclude everywhere)
    rows.join(t,
      rows("vec_id") === t("tb_vid") &&
        (t("tb_cell").isNull || t("tb_cell") === rows("cell")) &&
        (t("tb_applied").isNull || rows("src_id") < t("tb_applied")),
      "left_anti")
  }


  /** Exclude tombstoned rows from `rows` — a no-op plan when no
    * tombstones are live (the common case pays nothing). Takes the
    * SAME manifest the caller planned its run set against, both for
    * read consistency and for the split-tombstone gating. */
  private def minusTombs(m: Manifest, sp: SparkSession, indexDir: String,
      rows: DataFrame): DataFrame = {
    val dirs = tombDirsWith(m, sp, indexDir)
    if (dirs.isEmpty) rows
    else {
      val t = tombRows(m, sp, dirs)
      antiTombs(rows, t, IngestIndex.tombsSmall(sp, dirs, t))
    }
  }

  /** Live (run dirs, delta dirs) under the manifest, batch deltas
    * strictly below `beforeBatch` (Long.MaxValue = everything). */
  private[streaming] def live(sp: SparkSession, indexDir: String,
      beforeBatch: Long): (Seq[String], Seq[String]) =
    liveWith(IngestIndex.readManifest(sp, indexDir), sp, indexDir,
      beforeBatch)

  private def liveWith(m: Manifest, sp: SparkSession, indexDir: String,
      beforeBatch: Long): (Seq[String], Seq[String]) = {
    val f = fs(sp, indexDir)
    val runs = m.runs.getOrElse("vectors", Nil)
      .map(r => s"${vectorsDir(indexDir)}/${r.name}")
    // manifest-referenced runs are committed-before-publish and
    // retained one generation — a missing dir is corruption, and
    // silently querying without it would drop its vectors from every
    // top-k result
    runs.find(d => !f.exists(new Path(d)))
      .foreach(d => throw new IllegalStateException(
        s"index run $d is referenced by the manifest but missing on " +
          "disk — the index is corrupted; restore it or re-ingest"))
    val deltas = {
      val p = new Path(vectorsDir(indexDir))
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("batch="))
        .map(d => (d.getName.stripPrefix("batch=").toLong, d.toString))
        .filter { case (id, _) => id > m.maxCompacted && id < beforeBatch }
        .sortBy(_._1).map(_._2)
    }
    (runs, deltas)
  }

  /** All live index rows (vec_id, e, norm, cell), cell-pruned when
    * `cells` is given — the pruned read is the query fast path
    * (PartitionFilters on the scan, spec-asserted). */
  def readIndex(sp: SparkSession, indexDir: String,
      cells: Option[Seq[Int]]): DataFrame =
    readIndexWith(IngestIndex.readManifest(sp, indexDir), sp, indexDir,
      cells)

  private def readIndexWith(m: Manifest, sp: SparkSession,
      indexDir: String, cells: Option[Seq[Int]]): DataFrame = {
    val (runs, deltas) = liveWith(m, sp, indexDir, Long.MaxValue)
    val frames = (runs ++ deltas).map { d =>
      // codec decode: f32-written runs come back as array<double>
      // (no-op cast under f64, removed by SimplifyCasts)
      val full = sp.read.option("basePath", d).parquet(d)
        .withColumn("e", col("e").cast("array<double>"))
      cells.fold(full)(cs => full.filter(col("cell").isin(cs: _*)))
        .withColumn("src_id", lit(srcIdOf(d)))
    }
    // empty-index fallback reuses vecSchema so the two can never
    // drift (a diverged empty schema breaks unionByName callers)
    val all = frames.reduceOption(_ unionByName _).getOrElse(
      sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        vecSchema.add("src_id", org.apache.spark.sql.types.LongType)))
    minusTombs(m, sp, indexDir, all).drop("src_id")
  }

  private val vecSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("e",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
    org.apache.spark.sql.types.StructField("norm",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.IntegerType)))

  /** Partition-column-only read schema for footer counts and run-count
    * read-backs: no data columns at all, so the read is codec-agnostic
    * by construction (and provably never touches vector bytes). */
  private val cellOnlySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.IntegerType)))

  /** Write `df` (vec_id, e, norm, cell) as the cell-partitioned run
    * `name` and return its manifest entry. Explicit-schema read-back:
    * a fully-tombstoned input writes an empty partitioned dir, and a
    * schema-inferring read of that throws — wedging compaction
    * permanently (the retry hits the same empty write). */
  private def writeRun(sp: SparkSession, indexDir: String, name: String,
      df: DataFrame, nCells: Int): Run = {
    val dir = s"${vectorsDir(indexDir)}/$name"
    // exchange width bounded by the quantizer size, like ingestBatch:
    // at most |cells| distinct keys exist, and compactions often run
    // inside foreachBatch where AQE cannot coalesce the empties.
    // `nCells` comes from the CALLER's already-loaded quantizer — one
    // compaction was re-reading manifest + centroids JSON per run it
    // wrote (per-call FS round-trips that add up on an object store).
    val w = graft.ops.Spread.cellWidth(sp, math.max(nCells, 1))
    encodeVec(sp, df.select(col("vec_id"), col("e"), col("norm"),
        col("cell")))
      .repartition(w, col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    // run row count off the just-written footers — saves one Spark job
    // per run written (the drill wall is job-count × dispatch overhead)
    Run(name, IngestIndex.footerRows(sp, Seq(dir)))
  }

  /** Read one run/delta dir, carrying its source id ([[srcIdOf]]) so
    * downstream tombstone anti-joins can source-scope split
    * tombstones. Writers ([[writeRun]], [[reassign]]) select their
    * columns explicitly, so src_id never reaches disk. */
  private def readRunDir(sp: SparkSession, d: String): DataFrame =
    sp.read.option("basePath", d).parquet(d)
      .select(col("vec_id"), col("e").cast("array<double>").as("e"),
        col("norm"), col("cell"))
      .withColumn("src_id", lit(srcIdOf(d)))

  private def sizeClass(rows: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(math.max(rows, 1L))

  /** Nearest-centroid REassignment that carries each row's current cell
    * through ([[graft.sim.Ivf.assignCells]] drops extra columns): the
    * split step needs (old_cell, new cell) per row to find movers as a
    * narrow map — no corpus-wide self-join. Same allocation-free
    * running-min loop as assignCells (per-row hot path). */
  private def reassign(v: DataFrame, cents: Array[Array[Double]])
      : DataFrame = {
    val sp = v.sparkSession
    import sp.implicits._
    val bc = sp.sparkContext.broadcast(cents)
    v.select(col("vec_id"), col("e"), col("norm"), col("cell"))
      .as[(Long, Array[Double], Double, Int)]
      .map { case (id, e, norm, old) =>
        val cs = bc.value
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          val cv = cs(c)
          while (i < e.length) { val t = e(i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (id, e, norm, old, best)
      }
      .toDF("vec_id", "e", "norm", "old_cell", "cell")
  }

  /** Cell-occupancy skew report, written as `skew_v<upTo>.json` at each
    * compaction. Counts the PHYSICAL runs/deltas directly — a
    * partition-column-only aggregate (parquet footers, no vector bytes
    * read), deliberately WITHOUT the tombstone anti-join the reader
    * path applies: occupancy telemetry describes the layout, and the
    * anti-join would force vec_id reads of the whole corpus whenever a
    * tombstone is live. Cheap even on a big index. EXCEPT right after
    * a heal: the split/fold just computed exact LIVE counts and the
    * mover deltas, and the physical footers still show every stale
    * copy — a report from them reads the healed cell as still-hot and
    * re-fires the stream's skew trigger into a useless full-scan heal
    * attempt every compaction until merges drop the stale copies. The
    * heal passes its adjusted live counts via `liveCounts`, so the
    * cycle after a heal sees honest occupancy. Returns
    * (skew ratio, per-cell counts). */
  private[streaming] def skewReport(sp: SparkSession, indexDir: String,
      upTo: Long, liveCounts: Option[Map[Int, Long]] = None)
      : (Double, Map[Int, Long]) = {
    val counts = liveCounts.getOrElse {
      val (runs, deltas) = live(sp, indexDir, Long.MaxValue)
      cellFootersOf(sp, runs ++ deltas)
    }
    // skew = max / mean over the QUANTIZER's LIVE cell count, empty
    // cells counting as zero occupancy. Dividing by the populated-cell
    // count (the groupBy's row count) reads TOTAL COLLAPSE — every
    // vector in one cell, the worst drift this telemetry exists for —
    // as "1.0, perfectly balanced", so a retrainSkewAbove trigger
    // would never fire exactly when it is most needed. Dead (folded)
    // slots are excluded the other way: they CANNOT receive rows, so
    // counting them as zero-occupancy cells would inflate skew and
    // spuriously trip the retrain trigger on a healthy folded index.
    val nCells = math.max(
      readCentroids(sp, indexDir).map(liveSlots(_).size).getOrElse(0),
      counts.size)
    val skew =
      if (counts.isEmpty) 0.0
      else counts.values.max.toDouble * nCells / counts.values.sum
    val body = counts.toSeq.sorted.map { case (c, n) => s""""$c": $n""" }
      .mkString("{", ", ", "}")
    // Locale.ROOT: the default-locale f-interpolator writes a comma
    // decimal separator on e.g. de_DE JVMs — malformed JSON that would
    // silently disable the retrainSkewAbove trigger
    val skewTxt = "%.4f".formatLocal(java.util.Locale.ROOT, skew)
    val out = fs(sp, indexDir)
      .create(new Path(s"$indexDir/skew_v$upTo.json"), true)
    try out.write(
      (s"""{"skew": $skewTxt, "cells": $body}""").getBytes("UTF-8"))
    finally out.close()
    (skew, counts)
  }

  /** Per-cell PHYSICAL occupancy straight off the parquet footers —
    * driver-side, no Spark job: the cell id is the partition dir name
    * and the row count is footer metadata. Same values as the
    * cellOnlySchema scan this replaces (physical rows per cell, no
    * tombstone anti-join). */
  private def cellFootersOf(sp: SparkSession, dirs: Seq[String])
      : Map[Int, Long] = {
    val conf = sp.sparkContext.hadoopConfiguration
    val acc = scala.collection.mutable.Map.empty[Int, Long]
    dirs.foreach { d =>
      val p = new Path(d)
      val f = p.getFileSystem(conf)
      if (f.exists(p)) f.listStatus(p).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory && n.startsWith("cell=")) {
          val c = n.stripPrefix("cell=").toInt
          acc(c) = acc.getOrElse(c, 0L) +
            IngestIndex.footerRows(sp, Seq(s.getPath.toString))
        }
      }
    }
    acc.toMap
  }

  /** Fold the new deltas (id ≤ `upTo`) into a run and binary-counter
    * merge same-size-class runs — O(deltas) for a normal cycle, biggest
    * run rewritten only when the corpus doubles — then commit via the
    * manifest pointer and sweep folded deltas (ALL ids ≤ upTo, so a
    * retry-rewritten delta whose compaction already committed cannot be
    * orphaned), superseded runs, and crashed-compaction orphans.
    * Decision-invariant by construction (same rows, same cells;
    * spec-asserted on query results).
    *
    * `retrain = true` is the quantizer-drift escape hatch: re-train the
    * coarse quantizer on the CURRENT corpus (deterministic hash-stride
    * sample), re-assign every row, and write the result as one run plus
    * a `centroids_v<upTo>.json` — all committed by the SAME single
    * manifest swap (`runs` + `cents` flip together), so queries never
    * see new cells under old centroids or vice versa. This is a
    * deliberate full rewrite (the cost of changing the hash of a
    * hash-partitioned index) — reach for it when [[skewReport]] says
    * the frozen quantizer no longer fits the feed. */
  def compact(sp: SparkSession, indexDir: String, upTo: Long,
              retrain: Boolean = false, splitHot: Double = 0.0,
              foldColdBelow: Double = 0.0): Unit =
    IngestIndex.withWriterLease(sp, indexDir)(
      compactLocked(sp, indexDir, upTo, retrain, splitHot, foldColdBelow))

  private def compactLocked(sp: SparkSession, indexDir: String, upTo: Long,
      retrain: Boolean, splitHot: Double, foldColdBelow: Double): Unit = {
    val m = IngestIndex.readManifest(sp, indexDir)
    if (upTo <= m.maxCompacted) return
    val (runDirs, deltaDirs) = live(sp, indexDir, upTo + 1)
    val f = fs(sp, indexDir)
    var runs = m.runs.getOrElse("vectors", Nil)
    var cents = m.cents
    // current quantizer slot count, read ONCE for the whole compaction
    // (writeRun was re-reading manifest + centroids file per run):
    // fold/merge runs are written under the pre-heal quantizer; the
    // heal paths pass their own new quantizer's length explicitly
    val preSlots = centroidsOf(m, sp, indexDir).map(_.length).getOrElse(1)
    // heal tombstones written THIS compaction (split and/or fold) —
    // both live in the manifest-gated t_split_* namespace
    val healTombs = scala.collection.mutable.ArrayBuffer.empty[Run]
    // exact post-heal live occupancy (the heal's scan counts adjusted
    // by its mover deltas) — fed to skewReport so the cycle after a
    // heal is not re-triggered by stale physical copies
    var healedCounts: Option[Map[Int, Long]] = None
    def adjustCounts(pre: Map[Int, Long],
        movers: DataFrame): Map[Int, Long] = {
      // ONE aggregation job for both tallies (was two collects over
      // the persisted movers — the drill wall is job-count × dispatch)
      val pairs = movers.groupBy("old_cell", "cell")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      val out = pairs.groupBy(_._1).map { case (c, xs) =>
        c -> xs.map(_._3).sum }
      val in = pairs.groupBy(_._2).map { case (c, xs) =>
        c -> xs.map(_._3).sum }
      (pre.keySet ++ in.keySet).map { c =>
        c -> (pre.getOrElse(c, 0L) - out.getOrElse(c, 0L) +
          in.getOrElse(c, 0L))
      }.filter(_._2 > 0).toMap
    }
    var seq = 0
    def nextName(): String = { val n = s"run_${upTo}_$seq"; seq += 1; n }
    // ONE heal-commit implementation for the split AND the fold — the
    // two heals differ only in slot selection, and their commit
    // machinery (relocation run + cell-scoped source-scoped tombstone
    // in the reserved t_split_* namespace, applied-at upTo+1 +
    // quantizer file + post-heal live telemetry, all recorded for the
    // single manifest swap below) must never drift apart. `movers`
    // must carry (vec_id, e, norm, cell, old_cell); `tag` is "" for
    // the split, "f" for the fold (heals serialize, so same-cycle
    // collisions are impossible — the suffix just keeps the
    // artifact's origin readable on disk).
    def commitHeal(movers: DataFrame, newCents: Array[Array[Double]],
        tag: String, counts: Map[Int, Long]): Unit = {
      val reloc = writeRun(sp, indexDir, nextName(),
        movers.select("vec_id", "e", "norm", "cell"), newCents.length)
      if (reloc.rows > 0) {
        runs = (runs :+ reloc).sortBy(-_.rows)
        movers.select(col("vec_id"),
          col("old_cell").cast("int").as("cell"))
          .write.mode("overwrite")
          .parquet(s"${tombsDir(indexDir)}/t_split_$tag$upTo")
        healTombs += Run(s"t_split_$tag$upTo", upTo + 1)
      }
      val centsName =
        if (tag.isEmpty) s"centroids_v$upTo.json"
        else s"centroids_v${upTo}_$tag.json"
      writeCentroids(sp, indexDir, newCents, centsName)
      cents = Some(centsName)
      healedCounts = Some(adjustCounts(counts, movers))
    }
    // tombstone ledger: every run written from here on excludes the
    // live tombstones' ids, so a run's creation id (run_<id>_*) ≥ a
    // tombstone's first-applied id proves the run is physically clean
    // of it. `rows` in the "tombs" manifest kind records that
    // first-applied compaction id; dirs in "tswept" were logically
    // swept last cycle and await physical deletion (not live).
    val prevTombs = m.runs.getOrElse("tombs", Nil)
    val sweptPending = m.runs.getOrElse("tswept", Nil)
    val liveTombPaths = tombDirsWith(m, sp, indexDir)
      .filterNot(d => sweptPending.exists(_.name == d.split("/").last))
    val tombRecords = liveTombPaths.map { d =>
      val n = d.split("/").last
      prevTombs.find(_.name == n).getOrElse(Run(n, upTo))
    }
    val clean: DataFrame => DataFrame =
      if (liveTombPaths.isEmpty) identity
      else {
        val ids = tombRows(m, sp, liveTombPaths)
        val small = IngestIndex.tombsSmall(sp, liveTombPaths, ids)
        df => antiTombs(df, ids, small)
      }
    if (retrain) {
      val all = (runDirs ++ deltaDirs).map(readRunDir(sp, _))
        .reduceOption(_ union _)
      if (all.isEmpty) return
      // clean BEFORE dropping the cell column: relocation tombstones
      // are cell-scoped and need the row's current cell to match
      val corpus = clean(all.get).select("vec_id", "e", "norm").persist()
      if (corpus.isEmpty) {
        // fully-tombstoned corpus: there is nothing to train a
        // quantizer on (Ivf.centroids on zero rows throws), and an
        // unguarded throw here WEDGES compaction — retrainOnCompact /
        // a tripped skew trigger re-fires every cycle into the same
        // state, the tombstone stays live forever, and maxCompacted
        // never advances. Commit an empty run set instead (quantizer
        // pointer unchanged) and let the normal tombstone lifecycle
        // below apply-and-sweep as usual.
        corpus.unpersist(false)
        runs = Nil
      } else {
        // retrain width = LIVE slot count: a full rebuild writes a
        // fresh positional array, and carrying dead (folded) slots
        // into it would resurrect them as real cells
        val nCells = readCentroids(sp, indexDir)
          .map(c => math.max(1, liveSlots(c).size)).getOrElse(DefaultCells)
        val newCents = graft.sim.Ivf.centroids(corpus, nCells)
        val centsName = s"centroids_v$upTo.json"
        writeCentroids(sp, indexDir, newCents, centsName)
        val rebuilt = writeRun(sp, indexDir, nextName(),
          graft.sim.Ivf.assignCells(corpus, newCents), newCents.length)
        corpus.unpersist(false)
        runs = Seq(rebuilt)
        cents = Some(centsName)
      }
    } else {
      if (deltaDirs.nonEmpty) {
        val folded = writeRun(sp, indexDir, nextName(),
          clean(deltaDirs.map(readRunDir(sp, _)).reduce(_ union _)),
          preSlots)
        if (folded.rows > 0) runs :+= folded
      }
      // merge ANY adjacent same-size-class pair, not just the bottom
      // one: a fold can land directly in a higher class that already
      // has an occupant (runs [2,5] + a new class-5 fold), and the
      // bottom-pair-only loop would leave that 5/5 pair unmerged
      // forever — breaking the <= log2(n) run-count bound
      var sorted = runs.sortBy(r => (r.rows, r.name))
      def samePair(rs: Seq[Run]): Option[Int] =
        (0 until rs.length - 1).find(i =>
          sizeClass(rs(i).rows) == sizeClass(rs(i + 1).rows))
      var pair = samePair(sorted)
      while (pair.isDefined) {
        val i = pair.get
        val (a, b) = (sorted(i), sorted(i + 1))
        val merged = writeRun(sp, indexDir, nextName(), clean(
          readRunDir(sp, s"${vectorsDir(indexDir)}/${a.name}")
            .union(readRunDir(sp, s"${vectorsDir(indexDir)}/${b.name}"))),
          preSlots)
        // a fully-tombstoned merge yields zero rows — drop it instead
        // of looping on an empty size class
        sorted = (sorted.patch(i,
          if (merged.rows > 0) Seq(merged) else Nil, 2))
          .sortBy(r => (r.rows, r.name))
        pair = samePair(sorted)
      }
      runs = sorted.sortBy(-_.rows)
    }
    // ---- split-cell LOCAL retrain ------------------------------------------
    // The affordable self-heal for moderate drift: instead of the
    // all-or-nothing full rebuild (`retrain = true` — the cost of
    // re-hashing a hash-partitioned index), re-cluster ONLY the cells
    // whose LIVE occupancy exceeds `splitHot` × mean. Each hot cell's
    // centroid slot is replaced by its first sub-centroid and the rest
    // are APPENDED (slot positions are cell ids — untouched cells keep
    // their ids, files, and assignments). Rows whose argmin changes
    // under the extended quantizer are rewritten ONCE into a relocation
    // run under their new cells; their stale old-cell copies stay
    // physically in place but are excluded by a CELL-SCOPED tombstone
    // (vec_id, old_cell) and physically dropped as their runs merge.
    // Everything — relocation run, tombstone record, extended
    // centroids file — commits in the SAME single manifest swap below,
    // so queries never see new cells under the old quantizer or vice
    // versa. The tombstone's applied-at id is upTo+1: runs written
    // THIS cycle (the fold/merge above) still hold stale copies, so
    // only strictly-later runs count as clean for its sweep — and the
    // anti-join SOURCE-SCOPES the exclusion the same way (src_id <
    // applied-at), so a vec_id re-ingested after the split whose new
    // embedding lands back in its old cell is NOT mistaken for the
    // stale copy.
    // Bytes rewritten = movers only (hot-cell rows that leave their
    // slot + boundary rows pulled to a new sub-centroid) — the <20%%
    // heal the full rebuild could not offer. The hot/mover scan uses
    // the LIVE view (tombstone-applied), so re-running after a heal is
    // a cheap no-op even while skewReport's PHYSICAL counts still show
    // the stale copies.
    // Known upgrade path if heals become frequent: the mover scan is
    // ONE full read pass (narrow map, no shuffle — SplitProbe shows
    // the write savings dominate from ~500k vectors up). A per-run
    // per-cell max-radius sidecar would prune it to at-risk cells via
    // the bisector bound (cell d can lose rows to new centroid k only
    // if dist(c_d, k) < 2·R_d), honored only for runs stamped with the
    // current quantizer version; not built yet because splits are
    // drift-rare and the scan is the cheap half of the heal.
    var splitThisCycle = false
    def liveAll() = clean(runs.map(r =>
      readRunDir(sp, s"${vectorsDir(indexDir)}/${r.name}"))
      .reduce(_ union _))
    if (!retrain && splitHot > 0 && runs.nonEmpty) {
      readCentroidsFile(sp, indexDir,
          cents.getOrElse("centroids.json")).foreach { base =>
        val nC = liveSlots(base).size
        // exact live occupancy from an UNPERSISTED plan: Catalyst
        // prunes the scan to (vec_id, cell, src_id) — the embedding
        // bytes, the dominant read cost, are touched only when a heal
        // actually fires below
        val counts = liveAll().groupBy("cell")
          .agg(count(lit(1)).as("n")).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        // record the LIVE view even when nothing is hot: a scan that
        // finds no heal must still feed skewReport, or the next
        // cycle's PHYSICAL fallback (stale copies included) would
        // re-read as hot and re-trigger this full scan on every
        // compaction of a slow-growing stream
        healedCounts = Some(counts)
        val total = counts.values.sum
        val mean = total.toDouble / nC
        val hot = counts.filter { case (_, n) => n > splitHot * mean }
          .keys.toSeq.sorted
        if (total > 0 && hot.nonEmpty) {
          val liveRows = liveAll().persist() // WITH vectors, heal-only
          try {
            val buf = base.clone()
            val appended =
              scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
            hot.foreach { c =>
              // sub-cell count sized so healed occupancy ≈ mean
              val sub = graft.sim.Ivf.centroids(
                liveRows.filter(col("cell") === c)
                  .select("vec_id", "e", "norm"),
                math.max(2, math.min(64,
                  math.round(counts(c) / math.max(mean, 1.0)).toInt)),
                nHint = counts(c))
              buf(c) = sub(0)
              appended ++= sub.tail
            }
            val full = buf ++ appended.toArray
            val moved = reassign(liveRows, full)
              .filter(col("cell") =!= col("old_cell")).persist()
            try {
              commitHeal(moved, full, "", counts)
              splitThisCycle = true
            } finally { moved.unpersist(false); () }
          } finally { liveRows.unpersist(false); () }
        }
      }
    }
    // ---- cold-cell FOLD (the split's inverse) --------------------------------
    // Split-only healing grows the quantizer monotonically: every heal
    // APPENDS sub-centroids and nothing ever removes a cell that
    // drained (drift moved the feed away, or a takedown wave emptied
    // it), so a long-drifting stream accretes centroids — and with
    // them per-row argmin cost and partition-set width — without
    // bound. The fold is the inverse operation on the SAME machinery:
    // cells whose LIVE occupancy is below `foldColdBelow` × mean are
    // DEADENED in place (their slot keeps its id — slot ids ARE cell
    // ids, so survivors must never renumber — but the centroid becomes
    // all-NaN, which no argmin and no probe set can select), their
    // remaining rows are rewritten ONCE into a relocation run under
    // their nearest SURVIVING cells, and the stale cold-cell copies
    // are excluded by a cell-scoped, source-scoped, manifest-gated
    // tombstone (t_split_f<id> — same reserved namespace, lifecycle,
    // and crash-orphan story as the split's). Quantizer file,
    // relocation run, and tombstone commit in the ONE manifest swap
    // below. Cost control: the exact cold determination needs the
    // LIVE view (a full read pass), so a footer-only pre-check
    // (partition-column counts, no vector bytes) skips it whenever no
    // cell is even PHYSICALLY below threshold — physical ≥ live can
    // delay a fold behind stale copies for a cycle or two (harmless —
    // merges drop the stale copies and the footer count converges),
    // never trigger a wasted scan.
    //
    // AT MOST ONE HEAL PER COMPACTION: when the split ran this cycle,
    // the fold DEFERS to the next one. Applied-at scoping works at
    // run-ID granularity, and two heals in one cycle share run ids
    // (run_<upTo>_*) — a fold relocating a row BACK into a cell the
    // same-cycle split just tombstoned would write a live copy with
    // src_id < the split tombstone's applied-at, and the anti-join
    // would eat it (the heal-soak drill caught exactly this: split
    // moved boundary rows into fresh sub-cells, the fold — whose live
    // view predates the split's tombstone and whose mean was inflated
    // by the stale copies — judged those brand-new sub-cells cold and
    // bounced the rows straight back). Serialized heals can never
    // collide: a fold's reloc rows carry src_id = upTo, and every
    // tombstone from an EARLIER cycle has applied-at ≤ upTo.
    if (!retrain && foldColdBelow > 0 && !splitThisCycle &&
        runs.nonEmpty) {
      readCentroidsFile(sp, indexDir,
          cents.getOrElse("centroids.json")).foreach { base =>
        val live = liveSlots(base)
        // the live view, when some path already paid for it THIS
        // cycle: a split scan that found nothing hot recorded its
        // counts in healedCounts (the run set is unchanged since —
        // a split heal would have set splitThisCycle and skipped the
        // fold entirely), so the fold never re-reads what the split
        // just counted
        val counts: Option[Map[Int, Long]] = healedCounts.orElse {
          // physical pre-check straight off the footers (driver-side,
          // no job — was a cellOnlySchema scan job per fold-armed
          // compaction)
          val footer = cellFootersOf(sp,
            runs.map(r => s"${vectorsDir(indexDir)}/${r.name}"))
          val fMean = footer.values.sum.toDouble / math.max(live.size, 1)
          // while tombstones are LIVE, physical counts overstate live
          // occupancy (a takedown wave that just drained a cell is
          // exactly the fold's trigger scenario) — defer to the exact
          // scan; tombstones are transient, so the steady no-tombstone
          // case keeps the zero-cost skip. The exact scan itself is
          // column-pruned (vec_id, cell, src_id — no vector bytes)
          val maybeCold = liveTombPaths.nonEmpty || live.exists(c =>
            footer.getOrElse(c, 0L) < foldColdBelow * fMean)
          if (live.size > 1 && footer.values.sum > 0 && maybeCold) {
            val c = liveAll().groupBy("cell")
              .agg(count(lit(1)).as("n")).collect()
              .map(r => r.getInt(0) -> r.getLong(1)).toMap
            // record the live view even when no fold fires (same
            // telemetry contract as the split scan)
            healedCounts = Some(c)
            Some(c)
          } else None
        }
        counts.foreach { cnt =>
          val total = cnt.values.sum
          val mean = total.toDouble / live.size
          val cold = live.filter(c =>
            cnt.getOrElse(c, 0L) < foldColdBelow * mean)
          val survivors = live.filterNot(cold.contains)
          // never fold the last survivors: rows need a live argmin
          if (live.size > 1 && total > 0 && cold.nonEmpty &&
              survivors.nonEmpty) {
            val buf = base.clone()
            cold.foreach(c =>
              buf(c) = Array.fill(base(c).length)(Double.NaN))
            // only the COLD cells' residents move — a cell-PRUNED
            // read (cell is the runs' partition column), never the
            // full-corpus vector pass the split needs
            val movers = reassign(
              liveAll().filter(col("cell").isin(cold: _*)), buf)
              .persist()
            try commitHeal(movers, buf, "f", cnt)
            finally { movers.unpersist(false); () }
          }
        }
      }
    }
    // tombstone lifecycle, two-phase so readers get the same
    // one-generation grace as runs: LOGICALLY sweepable once every
    // live run postdates-or-equals its first application AND that
    // already held at the previous manifest; it then moves to "tswept"
    // (files stay — in-flight readers still anti-join them,
    // harmlessly) and is PHYSICALLY deleted at the NEXT compaction.
    def allClean(rs: Seq[Run], appliedAt: Long): Boolean =
      rs.forall(r => "run_(\\d+)_".r.findFirstMatchIn(r.name)
        .exists(_.group(1).toLong >= appliedAt))
    val (sweep, keepTombs) = tombRecords.partition { tb =>
      prevTombs.exists(_.name == tb.name) &&
        allClean(m.runs.getOrElse("vectors", Nil), tb.rows) &&
        allClean(runs, tb.rows)
    }
    // physical deletion of LAST cycle's logically-swept tombstones,
    // BEFORE publishing the manifest that drops their tswept records:
    // the reverse order leaves a crash window (manifest published, dirs
    // still on disk with no record) where the next compaction would
    // read the undeleted dir as a brand-new LIVE tombstone and silently
    // re-delete ids that were legitimately re-ingested after the sweep.
    // Deletion-first leaves at worst dirs-gone + old-manifest-names-
    // them-in-tswept, which the next cycle drops as a no-op.
    sweptPending.foreach { tb =>
      f.delete(new Path(s"${tombsDir(indexDir)}/${tb.name}"), true); ()
    }
    IngestIndex.writeManifest(sp, indexDir,
      Manifest(upTo,
        Map("vectors" -> runs,
          "tombs" -> (keepTombs ++ healTombs),
          // the tswept record KEEPS the first-applied id: readers
          // still anti-join the dir for one generation, and tombRows
          // resolves tb_applied from tombs ++ tswept — recording the
          // sweep id here would inflate the source scope and eat a
          // row legitimately re-ingested into its old cell (src >=
          // first-applied but < sweep id) for exactly that window
          "tswept" -> sweep.map(tb => Run(tb.name, tb.rows)))
          .filter(_._2.nonEmpty),
        cents))
    // cleanup AFTER commit, with ONE-GENERATION retention (MVCC-lite,
    // same contract as [[IngestIndex.compact]]): dirs superseded by
    // THIS compaction stay until the NEXT one, so a concurrent
    // [[queryTopK]] that planned its scan against the previous
    // manifest survives this cleanup — the serving path only needs to
    // finish within one compaction interval. Deleted now: deltas the
    // PREVIOUS manifest had folded (swept from the disk listing, not
    // the manifest-filtered live set — a retry-rewritten delta is
    // still collected one generation later, never orphaned forever)
    // and run dirs neither the new nor the previous manifest names.
    val p = new Path(vectorsDir(indexDir))
    if (f.exists(p)) {
      val retained = runs.map(_.name).toSet ++
        m.runs.getOrElse("vectors", Nil).map(_.name)
      f.listStatus(p).toSeq.map(_.getPath).foreach { d =>
        val n = d.getName
        val stale =
          (n.startsWith("batch=") &&
            n.stripPrefix("batch=").toLong <= m.maxCompacted) ||
          ((n.startsWith("run_") || n.startsWith("base_v")) &&
            !retained(n))
        if (stale) { f.delete(d, true); () }
      }
    }
    // orphan split-tombstone dirs — a crash between a previous split's
    // tombstone write and its manifest publish: inert for every reader
    // and compaction (manifest-gated in tombDirs), collected here so
    // they do not accumulate
    val keptTombNames =
      (keepTombs ++ healTombs ++ sweep).map(_.name).toSet
    val tombsRoot = new Path(tombsDir(indexDir))
    if (f.exists(tombsRoot)) {
      f.listStatus(tombsRoot).toSeq.map(_.getPath).foreach { d =>
        if (d.getName.startsWith("t_split_") && !keptTombNames(d.getName)) {
          f.delete(d, true); ()
        }
      }
    }
    // this compaction's skew report is written BEFORE older ones are
    // deleted, and the cleanup filter excludes the new file by name: the
    // reverse order (delete-all, then write) had a crash window in which
    // NO skew report exists, so lastSkew() reads None and the
    // retrainSkewAbove trigger is silently disabled for the next
    // compaction interval — mirrors the keep-current-and-previous rule
    // used for the centroids files
    skewReport(sp, indexDir, upTo, healedCounts)
    // superseded retrain quantizers and older skew reports: the
    // manifest-referenced centroids file, the PREVIOUS one (readers of
    // the prior manifest may still resolve it), the original fallback,
    // and the latest skew telemetry stay — a forever stream must not
    // accumulate one sidecar file per compaction
    f.listStatus(new Path(indexDir)).toSeq.map(_.getPath)
      .filter { d =>
        val n = d.getName
        (n.matches("centroids_v\\d+(_f)?\\.json") &&
          !cents.contains(n) && !m.cents.contains(n)) ||
          n.matches("centroids.*\\.json\\.tmp") || // crashed quantizer publish
          (n.matches("skew_v\\d+\\.json") && n != s"skew_v$upTo.json")
      }
      .foreach { d => f.delete(d, false); () }
    ()
  }

  /** Top-k cosine neighbors of `queries` (vec_id, embedding) against
    * the persisted index, probing each query's `nProbe` nearest cells.
    * The union of probed cells (bounded by nCells, collected
    * driver-side) prunes the index scan to the slices that can match;
    * scoring joins on `cell` so candidate volume is
    * ~n·nProbe/nCells, never n². Self-matches (same vec_id) are kept —
    * callers screening a corpus against itself filter them. */
  def queryTopK(sp: SparkSession, indexDir: String, queries: DataFrame,
                k: Int = 3, nProbe: Int = 1): DataFrame = {
    // ONE manifest read for both the quantizer and the run set: a
    // retrain commit between two separate reads would pair old
    // centroids with new-quantizer cell ids — same value range,
    // semantically wrong cells, silent recall collapse
    val m = IngestIndex.readManifest(sp, indexDir)
    val cents = centroidsOf(m, sp, indexDir).getOrElse(
      throw new IllegalStateException(
        s"no centroids at $indexDir — ingest at least one batch first"))
    // ONE materialization of the query set: this plan embeds `queries`
    // three times (probe assignment, the pruning collect, the vector
    // re-attach join), and a caller-supplied NON-DETERMINISTIC frame —
    // an unordered limit(), a sample — would otherwise evaluate to a
    // DIFFERENT row set in each, silently joining to empty/partial
    // results. local[n] masks it (stable partition arrival order); the
    // r15 multi-JVM soak surfaced it as nondeterministic zero-row
    // queries. localCheckpoint is eager + lineage-truncating, so every
    // use sees the same snapshot; query sets are small by contract.
    val q = graft.sim.Similarity.prep(queries).localCheckpoint(true)
    val probes = graft.sim.Ivf.assignProbes(q, cents, nProbe)
    val cells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded: ≤ nCells values
    val idx = readIndexWith(m, sp, indexDir, Some(cells))
      .select(col("cell"), col("vec_id").as("nb_id"), col("e").as("eb"),
        col("norm").as("nb"))
    val pairs = probes
      .join(q.select(col("vec_id"), col("e").as("ea"),
        col("norm").as("na")), Seq("vec_id"))
      .join(idx, Seq("cell"))
      .withColumn("cos", graft.sim.Similarity.cosine(dot(col("ea"), col("eb")), col("na"), col("nb")))
    pairs.groupBy("vec_id")
      .agg(graft.agg.TopKAgg.topK(k)(col("cos"), col("nb_id")).as("nn"))
      .select(col("vec_id"), posexplode(col("nn")).as(Seq("p", "nb")))
      .select(col("vec_id"), (col("p") + 1).cast("int").as("rank"),
        col("nb._2").as("nb_id"), round(col("nb._1"), 6).as("cos_r"))
  }

  /** Skew ratio recorded by the most recent compaction (None before
    * the first one). One tiny JSON read — the consumer side of
    * [[skewReport]], used by the auto-retrain trigger. */
  private[graft] def lastSkew(sp: SparkSession, indexDir: String)
      : Option[Double] = {
    val f = fs(sp, indexDir)
    val dir = new Path(indexDir)
    if (!f.exists(dir)) return None
    val latest = f.listStatus(dir).toSeq.map(_.getPath.getName)
      .flatMap { n =>
        "skew_v(\\d+)\\.json".r.findFirstMatchIn(n)
          .map(m => (m.group(1).toLong, n))
      }.sortBy(-_._1).headOption
    latest.flatMap { case (_, name) =>
      val in = f.open(new Path(s"$indexDir/$name"))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      "\"skew\"\\s*:\\s*([0-9.]+)".r.findFirstMatchIn(txt)
        .map(_.group(1).toDouble)
    }
  }

  /** Does `indexDir` hold vector state from a previous run? */
  private def nonEmpty(sp: SparkSession, indexDir: String): Boolean = {
    val f = fs(sp, indexDir)
    f.exists(centroidsPath(indexDir, "centroids.json")) ||
      f.exists(new Path(vectorsDir(indexDir)))
  }

  /** Start the streaming ingest. Same restart contract as
    * [[StreamOps.dedupIngestStream]]: resuming over a non-empty index
    * without a checkpoint is refused (batch ids would restart at 0 and
    * overwrite committed deltas); `compactEvery` > 0 folds the index
    * periodically so delta-dir count stays bounded on a forever
    * stream. `retrainOnCompact` opts every compaction into the
    * quantizer rebuild ([[compact]]'s `retrain`); `retrainSkewAbove`
    * closes the telemetry loop instead — when the LAST compaction's
    * recorded cell skew ([[skewReport]], max/mean occupancy) exceeds
    * the threshold, THIS compaction retrains. Feeds whose distribution
    * drifts past the frozen first-batch quantizer then self-heal at
    * the next compaction boundary, paying the full rebuild only when
    * the index's own telemetry says pruning has degraded (~2-4 is a
    * sensible threshold; ∞ = never, the default). `splitSkewAbove` is
    * the CHEAPER heal on the same trigger: when the recorded skew
    * exceeds it, this compaction runs the split-cell LOCAL retrain
    * ([[compact]]'s `splitHot`, with the same value as the hot-cell
    * factor — skew > f guarantees at least the max cell is hot) —
    * movers only are rewritten, untouched cells keep their files. If
    * both thresholds trip, the full rebuild wins. `foldColdBelow` > 0
    * arms the inverse heal at every compaction: cells drained below
    * that fraction of the mean live occupancy fold into their nearest
    * survivors ([[compact]]'s `foldColdBelow`), keeping the quantizer
    * bounded under repeated splits; the footer pre-check keeps the
    * no-cold common case at zero extra read cost. */
  def annIngestStream(stream: DataFrame, indexDir: String,
                      checkpoint: Option[String] = None,
                      nCells: Int = DefaultCells,
                      compactEvery: Int = 16,
                      retrainOnCompact: Boolean = false,
                      retrainSkewAbove: Double = Double.PositiveInfinity,
                      splitSkewAbove: Double = Double.PositiveInfinity,
                      foldColdBelow: Double = 0.0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    if (checkpoint.isEmpty && nonEmpty(stream.sparkSession, indexDir))
      throw new IllegalStateException(
        s"ANN index at $indexDir holds state from a previous run; pass " +
          "that run's checkpoint to resume it, or use a fresh indexDir " +
          "(batch ids restart at 0 without a checkpoint and would " +
          "overwrite committed deltas)")
    val writer = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
        if (!batch.isEmpty)
          ingestBatch(batch.toDF(), batchId, indexDir, nCells)
        // the compaction cadence must NOT hide behind the emptiness
        // check: an empty micro-batch (a zero-row upstream file) still
        // consumes a batchId, and a feed whose empty files align with
        // the boundary would otherwise never compact — unbounded delta
        // dirs, and a skew/heal telemetry loop that never runs
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0 &&
            indexNonEmpty(batch.sparkSession, indexDir)) {
          val sp = batch.sparkSession
          val skew = lastSkew(sp, indexDir)
          val fullTrip = retrainOnCompact ||
            skew.exists(_ > retrainSkewAbove)
          val splitTrip = !fullTrip && skew.exists(_ > splitSkewAbove)
          compact(sp, indexDir, batchId, retrain = fullTrip,
            splitHot = if (splitTrip) splitSkewAbove else 0.0,
            foldColdBelow = if (fullTrip) 0.0 else foldColdBelow)
        }
        ()
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
