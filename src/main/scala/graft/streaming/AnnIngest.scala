package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.DotProduct.dot

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
  *  - `centroids.json` — the FROZEN coarse quantizer, written exactly
  *    once by the first non-empty batch (`Ivf.centroids` is
  *    deterministic: hash-stride sample, driver-local Lloyd), never
  *    retrained. Frozen centroids are what make streaming ingest sound:
  *    cell assignment is a pure function of the vector, so batches
  *    never need to revisit earlier state and two ingests of the same
  *    vector land in the same cell forever.
  *  - `vectors/batch=<id>/cell=<c>/` — per-batch delta, OVERWRITE mode
  *    (foreachBatch retry idempotency, same shape as [[IngestIndex]]).
  *  - `vectors/base_v<K>/cell=<c>/` + `manifest.json` — compacted base,
  *    committed by the manifest pointer swap ([[IngestIndex]] manifest
  *    helpers reused verbatim); [[compact]] folds delta dirs so live
  *    dir count stays O(batches since compaction).
  *
  * Scale shape: ingest is APPEND-ONLY — unlike the dedup gate it never
  * probes prior state, so per-batch cost is O(batch) by construction
  * (broadcast centroids, narrow assignment map, one cell-partitioned
  * write). Queries probe nProbe cells per vector: the probed cell set
  * (≤ nCells values) becomes a partition filter on the base scan, so a
  * query touches `nProbe / nCells` of the corpus regardless of index
  * size. Cells are the IVF sharding — on a cluster each cell's files
  * co-locate and brute-force scoring stays within the pruned slice.
  */
object AnnIngest {

  /** Default coarse-quantizer width. 16 cells suits the sf-scale specs;
    * production callers size via [[cellsFor]]. */
  val DefaultCells = 16

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

  private def centroidsPath(indexDir: String) =
    new Path(s"$indexDir/centroids.json")

  /** Serialize centroids exactly: `java.lang.Double.toString` round
    * trips every finite double, so a re-read quantizer is bit-identical
    * to the trained one (assignment determinism across restarts). */
  private[streaming] def writeCentroids(sp: SparkSession, indexDir: String,
      cents: Array[Array[Double]]): Unit = {
    val txt = cents.map(_.mkString("[", ",", "]"))
      .mkString("[", ",\n", "]")
    val out = fs(sp, indexDir).create(centroidsPath(indexDir), true)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
  }

  def readCentroids(sp: SparkSession, indexDir: String)
      : Option[Array[Array[Double]]] = {
    val f = fs(sp, indexDir)
    val p = centroidsPath(indexDir)
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
                  nCells: Int = DefaultCells): Unit = {
    val cents = ensureCentroids(batch, indexDir, nCells)
    val assigned = graft.sim.Ivf.assignCells(
      graft.sim.Similarity.prep(batch), cents)
    assigned
      .repartition(col("cell")) // ~one file per populated cell partition
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/vectors/batch=$batchId")
  }

  private def vectorsDir(indexDir: String) = s"$indexDir/vectors"

  /** Live (base dir, delta dirs) under the manifest, batch deltas
    * strictly below `beforeBatch` (Long.MaxValue = everything). */
  private[streaming] def live(sp: SparkSession, indexDir: String,
      beforeBatch: Long): (Option[String], Seq[String]) = {
    val (mc, baseName) = IngestIndex.readManifest(sp, indexDir)
    val base = baseName.map(b => s"${vectorsDir(indexDir)}/$b")
      .filter(d => fs(sp, indexDir).exists(new Path(d)))
    val deltas = {
      val p = new Path(vectorsDir(indexDir))
      val f = fs(sp, indexDir)
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("batch="))
        .map(d => (d.getName.stripPrefix("batch=").toLong, d.toString))
        .filter { case (id, _) => id > mc && id < beforeBatch }
        .sortBy(_._1).map(_._2)
    }
    (base, deltas)
  }

  /** All live index rows (vec_id, e, norm, cell), cell-pruned when
    * `cells` is given — the pruned read is the query fast path
    * (PartitionFilters on the scan, spec-asserted). */
  def readIndex(sp: SparkSession, indexDir: String,
      cells: Option[Seq[Int]]): DataFrame = {
    val (base, deltas) = live(sp, indexDir, Long.MaxValue)
    val frames = (base.toSeq ++ deltas).map { d =>
      val full = sp.read.option("basePath", d).parquet(d)
      cells.fold(full)(cs => full.filter(col("cell").isin(cs: _*)))
    }
    frames.reduceOption(_ unionByName _).getOrElse(
      sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("e",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)),
          org.apache.spark.sql.types.StructField("norm",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("cell",
            org.apache.spark.sql.types.IntegerType)))))
  }

  /** Fold base + all deltas ≤ `upTo` into `base_v<upTo>`, commit via
    * the manifest pointer, delete folded dirs — decision-invariant by
    * construction (same rows, same cells; spec-asserted on query
    * results). */
  def compact(sp: SparkSession, indexDir: String, upTo: Long): Unit = {
    val (mc, oldBase) = IngestIndex.readManifest(sp, indexDir)
    if (upTo <= mc) return
    val (base, deltas) = live(sp, indexDir, upTo + 1)
    val all = (base.toSeq ++ deltas).map(d =>
      sp.read.option("basePath", d).parquet(d))
      .reduceOption(_ unionByName _)
    if (all.isEmpty) return
    val newBase = s"base_v$upTo"
    all.get
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${vectorsDir(indexDir)}/$newBase")
    IngestIndex.writeManifest(sp, indexDir, upTo, newBase)
    val f = fs(sp, indexDir)
    deltas.foreach(d => { f.delete(new Path(d), true); () })
    oldBase.filter(_ != newBase).foreach { b =>
      f.delete(new Path(s"${vectorsDir(indexDir)}/$b"), true); ()
    }
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
    val cents = readCentroids(sp, indexDir).getOrElse(
      throw new IllegalStateException(
        s"no centroids at $indexDir — ingest at least one batch first"))
    val q = graft.sim.Similarity.prep(queries)
    val probes = graft.sim.Ivf.assignProbes(q, cents, nProbe)
    val cells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded: ≤ nCells values
    val idx = readIndex(sp, indexDir, Some(cells))
      .select(col("cell"), col("vec_id").as("nb_id"), col("e").as("eb"),
        col("norm").as("nb"))
    val pairs = probes
      .join(q.select(col("vec_id"), col("e").as("ea"),
        col("norm").as("na")), Seq("vec_id"))
      .join(idx, Seq("cell"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
    pairs.groupBy("vec_id")
      .agg(graft.agg.TopKAgg.topK(k)(col("cos"), col("nb_id")).as("nn"))
      .select(col("vec_id"), posexplode(col("nn")).as(Seq("p", "nb")))
      .select(col("vec_id"), (col("p") + 1).cast("int").as("rank"),
        col("nb._2").as("nb_id"), round(col("nb._1"), 6).as("cos_r"))
  }

  /** Does `indexDir` hold vector state from a previous run? */
  private def nonEmpty(sp: SparkSession, indexDir: String): Boolean = {
    val f = fs(sp, indexDir)
    f.exists(centroidsPath(indexDir)) ||
      f.exists(new Path(vectorsDir(indexDir)))
  }

  /** Start the streaming ingest. Same restart contract as
    * [[StreamOps.dedupIngestStream]]: resuming over a non-empty index
    * without a checkpoint is refused (batch ids would restart at 0 and
    * overwrite committed deltas); `compactEvery` > 0 folds the index
    * periodically so delta-dir count stays bounded on a forever
    * stream. */
  def annIngestStream(stream: DataFrame, indexDir: String,
                      checkpoint: Option[String] = None,
                      nCells: Int = DefaultCells,
                      compactEvery: Int = 16)
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
        if (!batch.isEmpty) {
          ingestBatch(batch.toDF(), batchId, indexDir, nCells)
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
            compact(batch.sparkSession, indexDir, batchId)
        }
        ()
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
