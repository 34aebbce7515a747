package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN index ingest (AnnIngest): frozen-quantizer assignment,
  * retry idempotency, partition-pruned queries, compaction invariance,
  * and the restart guard. */
class AnnIngestSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  /** Deterministic little corpus: 60 vectors in 8 dims, values spread
    * enough that cells are non-degenerate. */
  private def vecs(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("ingest assigns every vector to its argmin cell exactly once; " +
    "a retried batchId leaves the index bit-identical") {
    val t = java.nio.file.Files.createTempDirectory("graft_ann1").toString
    AnnIngest.ingestBatch(vecs(0 until 30), 0L, s"$t/idx", nCells = 4)
    AnnIngest.ingestBatch(vecs(30 until 60), 1L, s"$t/idx", nCells = 4)
    val idx = AnnIngest.readIndex(spark, s"$t/idx", None)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(idx.map(_._1) === (0L until 60L))
    // argmin recompute with the SAME frozen centroids must agree
    val cents = AnnIngest.readCentroids(spark, s"$t/idx").get
    val expect = graft.sim.Ivf.assignCells(
      graft.sim.Similarity.prep(vecs(0 until 60)), cents)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(idx === expect)
    // retry batch 1: bit-identical index, centroids untouched
    AnnIngest.ingestBatch(vecs(30 until 60), 1L, s"$t/idx", nCells = 4)
    val again = AnnIngest.readIndex(spark, s"$t/idx", None)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(again === idx)
    assert(AnnIngest.readCentroids(spark, s"$t/idx").get.flatten.toSeq ===
      cents.flatten.toSeq)
  }

  test("centroids freeze at first batch: a later batch with different " +
    "vectors does not retrain the quantizer") {
    val t = java.nio.file.Files.createTempDirectory("graft_ann2").toString
    AnnIngest.ingestBatch(vecs(0 until 20), 0L, s"$t/idx", nCells = 4)
    val c0 = AnnIngest.readCentroids(spark, s"$t/idx").get.flatten.toSeq
    AnnIngest.ingestBatch(vecs(100 until 140), 1L, s"$t/idx", nCells = 4)
    assert(AnnIngest.readCentroids(spark, s"$t/idx").get.flatten.toSeq
      === c0)
  }

  test("query self-hit and compaction invariance: top-1 of an indexed " +
    "vector is itself at cos 1.0, identically before and after compact; " +
    "the compacted base scan carries a cell partition filter") {
    val t = java.nio.file.Files.createTempDirectory("graft_ann3").toString
    (0 until 3).foreach(b => AnnIngest.ingestBatch(
      vecs(b * 20 until (b + 1) * 20), b.toLong, s"$t/idx", nCells = 4))
    val q = vecs(5 until 15)
    def top1() = AnnIngest.queryTopK(spark, s"$t/idx", q, k = 1,
        nProbe = 1)
      .select("vec_id", "nb_id", "cos_r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val before = top1()
    assert(before.map(_._1) === (5L until 15L))
    before.foreach { case (id, nb, cos) =>
      assert(nb === id && cos === 1.0, s"self-hit failed for $id")
    }
    AnnIngest.compact(spark, s"$t/idx", 2L)
    assert(top1() === before)
    // folded: one run remains, and a pruned read shows the filter
    val (runs, deltas) = AnnIngest.live(spark, s"$t/idx", Long.MaxValue)
    assert(runs === Seq(s"$t/idx/vectors/run_2_0") && deltas.isEmpty)
    // compaction wrote the skew report (bounded: <= nCells entries)
    val skewTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/idx/skew_v2.json")), "UTF-8")
    assert(skewTxt.contains("\"skew\""))
    val pruned = AnnIngest.readIndex(spark, s"$t/idx", Some(Seq(1)))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition filter:\n$plan")
  }

  test("nProbe recall knob: probe-4 recall@3 >= probe-1 recall@3 vs " +
    "exact cosine truth (self-matches excluded)") {
    val t = java.nio.file.Files.createTempDirectory("graft_ann4").toString
    val all = vecs(0 until 60)
    AnnIngest.ingestBatch(all, 0L, s"$t/idx", nCells = 4)
    val exact = graft.sim.Similarity.cosineTopK(all, k = 3)
      .select("vec_id", "nb_id")
    def recall(nProbe: Int): Double = {
      val approx = AnnIngest.queryTopK(spark, s"$t/idx", all, k = 4,
          nProbe = nProbe)
        .filter(col("vec_id") =!= col("nb_id"))
        .select("vec_id", "nb_id")
      approx.join(exact, Seq("vec_id", "nb_id"), "left_semi")
        .count().toDouble / exact.count()
    }
    val r1 = recall(1); val r4 = recall(4)
    assert(r1 >= 0.0 && r1 <= 1.0)
    assert(r4 >= r1, s"probe-4 recall $r4 < probe-1 $r1")
    assert(r4 === 1.0, // nProbe = nCells probes every cell → brute force
      s"probing all 4 cells must recover exact truth, got $r4")
  }

  test("cellsFor grows with expected corpus (~sqrt n) and clamps at " +
    "both ends — the anti-fixed-geometry knob") {
    assert(AnnIngest.cellsFor(1L) === 1)
    assert(AnnIngest.cellsFor(10000L) === 100)
    assert(AnnIngest.cellsFor(1000000L) === 1000)
    assert(AnnIngest.cellsFor(1000000000L) === 31623)
    assert(AnnIngest.cellsFor(Long.MaxValue / 4) === (1 << 16)) // clamp
    assert(AnnIngest.cellsFor(100L) > AnnIngest.cellsFor(10L))
    intercept[IllegalArgumentException](AnnIngest.cellsFor(0L))
  }

  test("leveled compaction: small compactions fold only their deltas — " +
    "the big run survives by name across later cycles") {
    val t = java.nio.file.Files.createTempDirectory("graft_ann7").toString
    // 8 batches of 8 vectors, compact after every batch: binary counter
    (0 until 8).foreach { b =>
      AnnIngest.ingestBatch(vecs(b * 8 until (b + 1) * 8), b.toLong,
        s"$t/idx", nCells = 4)
      AnnIngest.compact(spark, s"$t/idx", b.toLong)
      if (b == 6) {
        val runs = graft.streaming.IngestIndex
          .readManifest(spark, s"$t/idx").runs("vectors")
        assert(runs.map(_.rows) === Seq(32L, 16L, 8L))
        assert(runs.head.name.startsWith("run_3_"),
          s"32-run built at t=3 must survive t=4..6: $runs")
      }
    }
    val m = graft.streaming.IngestIndex.readManifest(spark, s"$t/idx")
    assert(m.runs("vectors").map(_.rows) === Seq(64L))
    // every vector is in the index exactly once through all the merges
    val ids = AnnIngest.readIndex(spark, s"$t/idx", None)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === (0L until 64L))
    // skew telemetry never accumulates (one report per compaction would
    // leak on a forever stream) and is never left ABSENT either — the
    // newest report survives its own cleanup pass (write-then-delete
    // ordering, keep-current rule)
    val skews = new java.io.File(s"$t/idx").listFiles.toSeq
      .map(_.getName).filter(_.startsWith("skew_v"))
    assert(skews === Seq("skew_v7.json"))
  }

  test("skew telemetry reads TOTAL COLLAPSE as maximal skew — the " +
    "denominator is the quantizer's cell count, not the populated-cell " +
    "count — and retrainSkewAbove fires on exactly that state") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // hand-placed 4-cell quantizer: cell 0 sits on the feed, cells 1-3
    // far away — EVERY ingested vector collapses into cell 0, the
    // worst-case drift the telemetry exists for
    val farCents = Array(
      Array.fill(8)(0.0),
      Array.fill(8)(-100.0),
      Array.tabulate(8)(d => if (d % 2 == 0) 100.0 else -100.0),
      Array.fill(8)(100.0))
    val t = java.nio.file.Files.createTempDirectory("graft_ann11").toString
    AnnIngest.writeCentroids(spark, s"$t/idx", farCents)
    AnnIngest.ingestBatch(vecs(0 until 20), 0L, s"$t/idx", nCells = 4)
    val (skew, counts) = AnnIngest.skewReport(spark, s"$t/idx", 0L)
    assert(counts.keySet === Set(0) && counts(0) === 20L)
    // max * nCells / sum = 20 * 4 / 20; the populated-cell denominator
    // reads this as 1.0 ("perfectly balanced") and the trigger never fires
    assert(skew === 4.0)
    // the closed loop: a stream over the same collapsing feed self-heals
    val t2 = java.nio.file.Files.createTempDirectory("graft_ann12").toString
    AnnIngest.writeCentroids(spark, s"$t2/idx", farCents)
    val ms = MemoryStream[(Long, Seq[Double])]
    def feed(ids: Range) = ids.map(i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 31 + d * 7))))
    val q = AnnIngest.annIngestStream(
      ms.toDF().toDF("vec_id", "embedding"), s"$t2/idx",
      checkpoint = Some(s"$t2/ckpt"), nCells = 4, compactEvery = 2,
      retrainSkewAbove = 2.0)
    try {
      ms.addData(feed(0 until 20)); q.processAllAvailable()
      ms.addData(feed(20 until 40)); q.processAllAvailable()
      // upTo=1 compaction recorded the collapse (no prior telemetry yet)
      assert(AnnIngest.quantizerName(spark, s"$t2/idx").isEmpty)
      assert(AnnIngest.lastSkew(spark, s"$t2/idx").exists(_ >= 3.9))
      ms.addData(feed(40 until 60)); q.processAllAvailable()
      ms.addData(feed(60 until 80)); q.processAllAvailable()
    } finally q.stop()
    // the upTo=3 compaction read skew 4.0 > 2.0 and retrained
    assert(AnnIngest.quantizerName(spark, s"$t2/idx")
      === Some("centroids_v3.json"))
    // the healed quantizer spreads the actual feed back across cells
    assert(AnnIngest.lastSkew(spark, s"$t2/idx").exists(_ < 4.0))
    assert(AnnIngest.readIndex(spark, s"$t2/idx", None).count() === 80L)
  }

  test("retrain over a fully-tombstoned corpus commits an empty run set " +
    "instead of wedging: maxCompacted advances, the tombstone lifecycle " +
    "proceeds to its sweep, and re-ingest works afterward") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann13").toString
    val idx = s"$t/idx"
    AnnIngest.ingestBatch(vecs(0 until 20), 0L, idx, nCells = 4)
    AnnIngest.delete(spark, idx, (0L until 20L).toDF("vec_id"), "all")
    // the unguarded path called Ivf.centroids on zero rows and threw —
    // and every retry (retrainOnCompact / a tripped skew trigger)
    // re-entered the same state, so compaction never advanced
    AnnIngest.compact(spark, idx, 0L, retrain = true)
    val m = graft.streaming.IngestIndex.readManifest(spark, idx)
    assert(m.maxCompacted === 0L)
    assert(m.runs.get("vectors").isEmpty)
    assert(m.runs("tombs").map(_.name) === Seq("t_all"))
    assert(AnnIngest.readIndex(spark, idx, None).count() === 0L)
    // lifecycle proceeds: logical sweep, then physical deletion
    AnnIngest.ingestBatch(vecs(20 until 25), 1L, idx, nCells = 4)
    AnnIngest.compact(spark, idx, 1L)
    assert(graft.streaming.IngestIndex.readManifest(spark, idx)
      .runs("tswept").map(_.name) === Seq("t_all"))
    AnnIngest.compact(spark, idx, 2L)
    assert(AnnIngest.tombDirs(spark, idx).isEmpty)
    // post-sweep re-ingest of formerly-deleted ids is visible again
    AnnIngest.ingestBatch(vecs(0 until 5), 3L, idx, nCells = 4)
    val ids = AnnIngest.readIndex(spark, idx, None)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === ((0L until 5L) ++ (20L until 25L)))
  }

  test("retrain-at-compaction: a distribution-shifted feed is detected " +
    "by the skew report, and the retrained index still satisfies the " +
    "probe-all == exact contract with queries flipped atomically") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann8").toString
    // first batch: well-spread vectors — the frozen quantizer's 4
    // cells tile THAT distribution...
    def cluster(ids: Range, base: Double) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (base + 0.01 * math.sin(i * 31 + d * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    AnnIngest.ingestBatch(vecs(0 until 30), 0L, s"$t/idx", nCells = 4)
    // ...then the feed SHIFTS: a tight far-away cluster piles into one
    // frozen cell — the drift the skew report exists to flag
    AnnIngest.ingestBatch(cluster(30 until 90, -5.0), 1L, s"$t/idx",
      nCells = 4)
    AnnIngest.compact(spark, s"$t/idx", 1L)
    val (skewBefore, _) = AnnIngest.skewReport(spark, s"$t/idx", 1L)
    assert(skewBefore > 1.3, // >= 60 of 90 rows crowd one old cell
      s"expected skew from the shifted feed, got $skewBefore")
    // retrain rebuilds cells for the ACTUAL corpus and commits the new
    // centroids + reassigned run in one manifest swap
    AnnIngest.ingestBatch(cluster(90 until 120, -5.2), 2L, s"$t/idx",
      nCells = 4)
    AnnIngest.compact(spark, s"$t/idx", 2L, retrain = true)
    val m = graft.streaming.IngestIndex.readManifest(spark, s"$t/idx")
    assert(m.cents === Some("centroids_v2.json"))
    val (_, counts) = AnnIngest.skewReport(spark, s"$t/idx", 2L)
    assert(counts.values.sum === 120L) // nothing lost in the rebuild
    // index rows agree with the NEW quantizer (atomic flip: no row
    // still carries an old-centroid cell)
    val cents = AnnIngest.readCentroids(spark, s"$t/idx").get
    val idx = AnnIngest.readIndex(spark, s"$t/idx", None)
    val expect = graft.sim.Ivf.assignCells(
      idx.select("vec_id", "e", "norm"), cents)
      .select(col("vec_id"), col("cell").as("cell_x"))
    assert(idx.join(expect, Seq("vec_id"))
      .filter(col("cell") =!= col("cell_x")).count() === 0L)
    // probe-all == exact: probing every cell through the retrained
    // index recovers each vector as its own top-1 at cos 1.0
    val q = vecs(0 until 10).union(cluster(40 until 50, -5.0))
    val self = AnnIngest.queryTopK(spark, s"$t/idx", q, k = 1, nProbe = 4)
      .filter(col("nb_id") =!= col("vec_id") || col("cos_r") < 1.0)
    assert(self.count() === 0L)
    // ingest AFTER retrain assigns under the new quantizer too
    AnnIngest.ingestBatch(cluster(120 until 130, -4.8), 3L, s"$t/idx",
      nCells = 4)
    val post = AnnIngest.readIndex(spark, s"$t/idx", None)
      .filter(col("vec_id") >= 120)
    val postExpect = graft.sim.Ivf.assignCells(
      post.select("vec_id", "e", "norm"), cents)
      .select(col("vec_id"), col("cell").as("cell_x"))
    assert(post.join(postExpect, Seq("vec_id"))
      .filter(col("cell") =!= col("cell_x")).count() === 0L)
  }

  test("retrainSkewAbove closes the telemetry loop: a compaction whose " +
    "predecessor recorded high cell skew retrains automatically, without " +
    "retrainOnCompact") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t = java.nio.file.Files.createTempDirectory("graft_ann9").toString
    def cluster(ids: Range, base: Double) = ids.map { i =>
      (i.toLong, Seq.tabulate(8)(d =>
        base + 0.01 * math.sin(i * 31 + d * 7)))
    }
    def spread(ids: Range) = ids.map { i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 31 + d * 7)))
    }
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = AnnIngest.annIngestStream(
      ms.toDF().toDF("vec_id", "embedding"), s"$t/idx",
      checkpoint = Some(s"$t/ckpt"), nCells = 4, compactEvery = 2,
      retrainSkewAbove = 1.3)
    try {
      // batch 0 spread (quantizer freezes on it), batch 1 the shifted
      // cluster -> compaction at upTo=1 records high skew (no retrain:
      // there is no prior telemetry yet)
      ms.addData(spread(0 until 30)); q.processAllAvailable()
      ms.addData(cluster(30 until 90, -5.0)); q.processAllAvailable()
      assert(AnnIngest.quantizerName(spark, s"$t/idx").isEmpty)
      assert(AnnIngest.lastSkew(spark, s"$t/idx").exists(_ > 1.3))
      // two more shifted batches -> the upTo=3 compaction reads the
      // recorded skew and self-heals by retraining
      ms.addData(cluster(90 until 110, -5.1)); q.processAllAvailable()
      ms.addData(cluster(110 until 120, -5.2)); q.processAllAvailable()
    } finally q.stop()
    assert(AnnIngest.quantizerName(spark, s"$t/idx")
      === Some("centroids_v3.json"))
    // the rebuilt index is consistent with the committed quantizer
    val cents = AnnIngest.readCentroids(spark, s"$t/idx").get
    val idx = AnnIngest.readIndex(spark, s"$t/idx", None)
    val expect = graft.sim.Ivf.assignCells(
      idx.select("vec_id", "e", "norm"), cents)
      .select(col("vec_id"), col("cell").as("cell_x"))
    assert(idx.join(expect, Seq("vec_id"))
      .filter(col("cell") =!= col("cell_x")).count() === 0L)
    assert(idx.count() === 120L)
  }

  test("delete tombstones: ids vanish from queries immediately, " +
    "compaction folds them out of every run it writes, and the " +
    "tombstone is swept only after no live run predates it (plus one " +
    "reader generation)") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann10").toString
    val idx = s"$t/idx"
    AnnIngest.ingestBatch(vecs(0 until 20), 0L, idx, nCells = 4)
    AnnIngest.ingestBatch(vecs(20 until 40), 1L, idx, nCells = 4)
    AnnIngest.compact(spark, idx, 1L) // run_1_0 holds 0..39
    // a 40-vector batch so the t=2 fold lands in run_1_0's size class
    // and the merge cascade rewrites EVERY run under the tombstone
    AnnIngest.ingestBatch(vecs(40 until 80), 2L, idx, nCells = 4)
    // tombstone two ids: one in the compacted run, one in the delta
    AnnIngest.delete(spark, idx, Seq(5L, 45L).toDF("vec_id"), "case1")
    def liveIds() = AnnIngest.readIndex(spark, idx, None)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(liveIds() === ((0L until 80L).filterNot(Set(5L, 45L))),
      "reader-side exclusion is immediate")
    // query path excludes them too (probe-all top-1 of a deleted id
    // must NOT return itself)
    val top1 = AnnIngest.queryTopK(spark, idx, vecs(5 until 6),
      k = 1, nProbe = 4).select("nb_id").collect().map(_.getLong(0))
    assert(!top1.contains(5L))
    // compaction at t=2: fold (39 rows) shares run_1_0's size class ->
    // cascade merge; every written run is clean, but the tombstone is
    // NOT yet sweepable at its first application
    AnnIngest.compact(spark, idx, 2L)
    assert(AnnIngest.tombDirs(spark, idx).nonEmpty,
      "first application must not sweep (reader generation)")
    val m2 = graft.streaming.IngestIndex.readManifest(spark, idx)
    assert(m2.runs("tombs").map(_.name) === Seq("t_case1"))
    assert(m2.runs("vectors").map(_.rows) === Seq(78L)) // 80 - 2 deleted
    // the physical run excludes the ids (read the run parquet raw,
    // bypassing the reader-side anti-join)
    val raw = m2.runs("vectors").map(r =>
      spark.read.option("basePath", s"$idx/vectors/${r.name}")
        .parquet(s"$idx/vectors/${r.name}"))
      .reduce(_ unionByName _).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(!raw.contains(5L) && !raw.contains(45L))
    // next compaction: all runs postdate the tomb AND the condition
    // held at the previous manifest -> LOGICAL sweep (manifest entry
    // moves to tswept; the files stay one more generation so readers
    // that planned an anti-join against them can finish)
    AnnIngest.ingestBatch(vecs(80 until 100), 3L, idx, nCells = 4)
    AnnIngest.compact(spark, idx, 3L)
    val m3 = graft.streaming.IngestIndex.readManifest(spark, idx)
    assert(m3.runs.get("tombs").isEmpty)
    assert(m3.runs("tswept").map(_.name) === Seq("t_case1"))
    assert(AnnIngest.tombDirs(spark, idx).nonEmpty,
      "files stay through the reader-grace generation")
    // re-issuing an APPLIED tag is refused — extending it could sweep
    // before the new ids are physically removed
    val ex = intercept[IllegalArgumentException] {
      AnnIngest.delete(spark, idx, Seq(7L).toDF("vec_id"), "case1")
    }
    assert(ex.getMessage.contains("already applied"))
    // one more compaction physically deletes the tombstone
    AnnIngest.compact(spark, idx, 4L)
    assert(AnnIngest.tombDirs(spark, idx).isEmpty, "deleted at gen+2")
    assert(graft.streaming.IngestIndex.readManifest(spark, idx)
      .runs.get("tswept").isEmpty)
    // a live tombstone is a STANDING exclusion; once physically gone,
    // a deleted id can be re-ingested and becomes visible again
    AnnIngest.ingestBatch(vecs(5 until 6), 5L, idx, nCells = 4)
    assert(liveIds() === ((0L until 100L).filterNot(_ == 45L)),
      "re-ingest after the sweep is visible")
  }

  test("takedown tombstones are SOURCE-scoped: a vec_id re-ingested " +
    "after the delete is visible immediately — not hidden until the " +
    "sweep — and compaction keeps the fresh row while dropping the " +
    "pre-delete copies") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann21").toString
    val idx = s"$t/idx"
    AnnIngest.ingestBatch(vecs(0 until 20), 0L, idx, nCells = 4)
    AnnIngest.compact(spark, idx, 0L)
    AnnIngest.delete(spark, idx, Seq(5L).toDF("vec_id"), "gone")
    def ids() = AnnIngest.readIndex(spark, idx, None)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(!ids().contains(5L), "pre-delete copy excluded immediately")
    // recycle the id with FRESH content while the tombstone is live
    AnnIngest.ingestBatch(vecs(5 until 6), 1L, idx, nCells = 4)
    assert(ids().count(_ == 5L) === 1,
      "the re-ingest must be visible IMMEDIATELY, not after the sweep")
    // compaction folds the fresh row through the scoped anti-join —
    // live view exactly-once (the pre-delete copy stays PHYSICALLY in
    // run_0 until a merge rewrites it; the reader anti-join hides it)
    AnnIngest.compact(spark, idx, 1L)
    assert(ids().sorted === (0L until 20L).sorted,
      "live view: every id exactly once, including the recycled one")
    // a 20-row batch lands the fold in run_0's size class: the merge
    // cascade rewrites the pre-application run — the scoped clean
    // drops the pre-delete copy and KEEPS the fresh one
    AnnIngest.ingestBatch(vecs(20 until 40), 2L, idx, nCells = 4)
    AnnIngest.compact(spark, idx, 2L)
    val m = IngestIndex.readManifest(spark, idx)
    val raw = m.runs("vectors").map(r =>
      spark.read.option("basePath", s"$idx/vectors/${r.name}")
        .parquet(s"$idx/vectors/${r.name}"))
      .reduce(_ unionByName _).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(raw.count(_ == 5L) === 1,
      "the merge must keep the post-delete re-ingest and drop the " +
        "pre-delete copy")
    // the tombstone still runs its normal lifecycle to the sweep
    AnnIngest.compact(spark, idx, 3L)
    AnnIngest.compact(spark, idx, 4L)
    assert(AnnIngest.tombDirs(spark, idx).isEmpty, "swept")
    assert(ids().sorted === (0L until 40L).sorted)
  }

  test("split-cell local retrain: hot cells re-cluster into appended " +
    "sub-centroids, <20% of index rows are rewritten, the pre-split " +
    "run survives by name, and the argmin-cell contract holds under " +
    "the extended quantizer") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann15").toString
    val idx = s"$t/idx"
    def cluster(ids: Range, base: Double) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (base + 0.01 * math.sin(i * 31 + d * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    // freeze a 16-cell quantizer on a 300-vector spread batch...
    AnnIngest.ingestBatch(vecs(0 until 300), 0L, idx, nCells = 16)
    // ...then drift: a tight far-away 40-vector cluster piles into ONE
    // frozen cell (~3x the mean occupancy)
    AnnIngest.ingestBatch(cluster(300 until 340, -5.0), 1L, idx,
      nCells = 16)
    AnnIngest.compact(spark, idx, 1L)
    val centsBefore = AnnIngest.readCentroids(spark, idx).get
    val runsBefore = graft.streaming.IngestIndex
      .readManifest(spark, idx).runs("vectors")
    // the heal: local split, not the full rebuild
    AnnIngest.compact(spark, idx, 2L, splitHot = 2.0)
    val m = graft.streaming.IngestIndex.readManifest(spark, idx)
    assert(m.cents === Some("centroids_v2.json"))
    // post-heal telemetry is LIVE, not physical: the skew report's
    // per-cell counts equal the live view exactly (stale copies
    // excluded), so the stream's skew trigger cannot re-fire a
    // useless heal off the healed cell's stale physical copies
    val skewTxt2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$idx/skew_v2.json")), "UTF-8")
    val reported = "\"(\\d+)\": (\\d+)".r.findAllMatchIn(skewTxt2)
      .map(mm => mm.group(1).toInt -> mm.group(2).toLong).toMap
    val liveCounts = AnnIngest.readIndex(spark, idx, None)
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(reported === liveCounts,
      s"post-heal skew cells must be the LIVE occupancy:\n$skewTxt2\n$liveCounts")
    val centsAfter = AnnIngest.readCentroids(spark, idx).get
    assert(centsAfter.length > centsBefore.length,
      "sub-centroids must be appended")
    // untouched cells keep their files: every pre-split run survives
    // by name (a full rebuild would replace them all)
    assert(runsBefore.map(_.name)
      .forall(n => m.runs("vectors").exists(_.name == n)),
      s"pre-split runs must survive: before=$runsBefore after=${m.runs("vectors")}")
    // <20% of index rows rewritten (the relocation run holds movers only)
    val reloc = m.runs("vectors").filter(_.name.startsWith("run_2_"))
    val movedRows = reloc.map(_.rows).sum
    assert(movedRows > 0, "the split must relocate the hot-cell movers")
    assert(movedRows.toDouble / 340 < 0.20,
      s"split rewrote $movedRows of 340 rows — not a local heal")
    // cell-scoped tombstone recorded, applied-at next cycle (this
    // cycle's runs still hold the stale copies)
    assert(m.runs("tombs").map(_.name).contains("t_split_2"))
    // live view: nothing lost, nothing duplicated (stale copies are
    // excluded by the cell-scoped tombstone)
    val live = AnnIngest.readIndex(spark, idx, None)
    assert(live.count() === 340L)
    assert(live.select("vec_id").distinct().count() === 340L)
    // argmin contract: every live row sits in its argmin cell under
    // the COMMITTED extended quantizer
    val expect = graft.sim.Ivf.assignCells(
      live.select("vec_id", "e", "norm"), centsAfter)
      .select(col("vec_id"), col("cell").as("cell_x"))
    assert(live.join(expect, Seq("vec_id"))
      .filter(col("cell") =!= col("cell_x")).count() === 0L)
    // probe-all == exact through the healed index
    val q = vecs(0 until 10).union(cluster(310 until 320, -5.0))
    val self = AnnIngest.queryTopK(spark, idx, q, k = 1,
      nProbe = centsAfter.length)
      .filter(col("nb_id") =!= col("vec_id") || col("cos_r") < 1.0)
    assert(self.count() === 0L)
    // ingest AFTER the split assigns under the extended quantizer
    AnnIngest.ingestBatch(cluster(340 until 350, -5.1), 3L, idx,
      nCells = 16)
    val post = AnnIngest.readIndex(spark, idx, None)
      .filter(col("vec_id") >= 340)
    val postEx = graft.sim.Ivf.assignCells(
      post.select("vec_id", "e", "norm"), centsAfter)
      .select(col("vec_id"), col("cell").as("cell_x"))
    assert(post.join(postEx, Seq("vec_id"))
      .filter(col("cell") =!= col("cell_x")).count() === 0L)
    // the next compaction folds/merges with the cell-scoped tombstone
    // applied — the live view stays exact through it
    AnnIngest.compact(spark, idx, 3L)
    assert(AnnIngest.readIndex(spark, idx, None).count() === 350L)
    assert(AnnIngest.readIndex(spark, idx, None)
      .select("vec_id").distinct().count() === 350L)
  }

  test("splitSkewAbove closes the telemetry loop with the LOCAL heal: " +
    "a collapsing feed trips the recorded skew and the next compaction " +
    "splits the hot cell instead of rebuilding the index") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val farCents = Array(
      Array.fill(8)(0.0),
      Array.fill(8)(-100.0),
      Array.tabulate(8)(d => if (d % 2 == 0) 100.0 else -100.0),
      Array.fill(8)(100.0))
    val t = java.nio.file.Files.createTempDirectory("graft_ann16").toString
    AnnIngest.writeCentroids(spark, s"$t/idx", farCents)
    val ms = MemoryStream[(Long, Seq[Double])]
    def feed(ids: Range) = ids.map(i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 31 + d * 7))))
    val q = AnnIngest.annIngestStream(
      ms.toDF().toDF("vec_id", "embedding"), s"$t/idx",
      checkpoint = Some(s"$t/ckpt"), nCells = 4, compactEvery = 2,
      splitSkewAbove = 2.0)
    try {
      ms.addData(feed(0 until 20)); q.processAllAvailable()
      ms.addData(feed(20 until 40)); q.processAllAvailable()
      assert(AnnIngest.quantizerName(spark, s"$t/idx").isEmpty)
      ms.addData(feed(40 until 60)); q.processAllAvailable()
      ms.addData(feed(60 until 80)); q.processAllAvailable()
    } finally q.stop()
    // the upTo=3 compaction split the collapsed cell: quantizer
    // extended (not rebuilt at the same width), committed atomically
    assert(AnnIngest.quantizerName(spark, s"$t/idx")
      === Some("centroids_v3.json"))
    val cents = AnnIngest.readCentroids(spark, s"$t/idx").get
    assert(cents.length > 4, "split must APPEND sub-centroids")
    val idx = AnnIngest.readIndex(spark, s"$t/idx", None)
    assert(idx.count() === 80L)
    val expect = graft.sim.Ivf.assignCells(
      idx.select("vec_id", "e", "norm"), cents)
      .select(col("vec_id"), col("cell").as("cell_x"))
    assert(idx.join(expect, Seq("vec_id"))
      .filter(col("cell") =!= col("cell_x")).count() === 0L)
  }

  test("cold-cell FOLD (the split's inverse): a drift-then-drain feed " +
    "shrinks the LIVE quantizer back — drained cells deaden in place " +
    "(slot ids stable), their residual rows relocate into surviving " +
    "cells via the same relocation-run + cell-scoped tombstone + one " +
    "manifest swap, and argmin + live-exactly-once + probe-all==exact " +
    "hold through the fold and the next compaction") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann20").toString
    val idx = s"$t/idx"
    def cluster(ids: Range, base: Double) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (base + 0.01 * math.sin(i * 31 + d * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    // drift: freeze 16 cells on a spread batch, pile a far cluster
    // into one hot cell, split-heal it (quantizer GROWS)
    AnnIngest.ingestBatch(vecs(0 until 300), 0L, idx, nCells = 16)
    AnnIngest.ingestBatch(cluster(300 until 340, -5.0), 1L, idx,
      nCells = 16)
    AnnIngest.compact(spark, idx, 1L)
    AnnIngest.compact(spark, idx, 2L, splitHot = 2.0)
    val centsSplit = AnnIngest.readCentroids(spark, idx).get
    val liveSplit = AnnIngest.liveCellCount(spark, idx)
    assert(centsSplit.length > 16 && liveSplit === centsSplit.length)
    // drain: a takedown wave empties most of the far cluster — its
    // sub-cells drop far below mean occupancy
    AnnIngest.delete(spark, idx,
      (300L until 332L).toDF("vec_id"), "drainwave")
    AnnIngest.compact(spark, idx, 3L, foldColdBelow = 0.5)
    val centsFold = AnnIngest.readCentroids(spark, idx).get
    val liveFold = AnnIngest.liveCellCount(spark, idx)
    assert(liveFold < liveSplit, s"fold must shrink the LIVE quantizer " +
      s"($liveSplit -> $liveFold)")
    assert(centsFold.length === centsSplit.length,
      "slot ids must stay stable — dead slots keep their positions")
    assert(graft.streaming.IngestIndex.readManifest(spark, idx)
      .cents === Some("centroids_v3_f.json"))
    // residual rows of the folded cells were relocated: the fold
    // tombstone is recorded and the live view is exact
    val m3 = graft.streaming.IngestIndex.readManifest(spark, idx)
    assert(m3.runs("tombs").map(_.name).contains("t_split_f3"),
      s"fold tombstone missing: ${m3.runs.get("tombs")}")
    def liveView() = AnnIngest.readIndex(spark, idx, None)
    assert(liveView().count() === 308L) // 340 - 32 drained
    assert(liveView().select("vec_id").distinct().count() === 308L)
    // argmin contract under the committed folded quantizer (NaN slots
    // never win a running min)
    val expect = graft.sim.Ivf.assignCells(
      liveView().select("vec_id", "e", "norm"), centsFold)
      .select(col("vec_id"), col("cell").as("cell_x"))
    assert(liveView().join(expect, Seq("vec_id"))
      .filter(col("cell") =!= col("cell_x")).count() === 0L)
    // no live row sits in a dead slot
    val deadSlots = centsFold.indices.filter(c => centsFold(c)(0).isNaN)
    assert(deadSlots.nonEmpty)
    assert(liveView().filter(col("cell").isin(deadSlots: _*))
      .count() === 0L)
    // probe-all == exact through the folded index (probe sets skip
    // dead slots)
    val q = vecs(10 until 20).union(cluster(332 until 336, -5.0))
    val self = AnnIngest.queryTopK(spark, idx, q, k = 1,
      nProbe = centsFold.length)
      .filter(col("nb_id") =!= col("vec_id") || col("cos_r") < 1.0)
    assert(self.count() === 0L)
    // post-fold ingest assigns under the folded quantizer; the next
    // compaction folds/merges with the fold tombstone applied and the
    // live view stays exact
    AnnIngest.ingestBatch(vecs(400 until 420), 4L, idx, nCells = 16)
    AnnIngest.compact(spark, idx, 4L)
    assert(liveView().count() === 328L)
    assert(liveView().select("vec_id").distinct().count() === 328L)
    assert(AnnIngest.liveCellCount(spark, idx) === liveFold,
      "a plain compaction must not resurrect dead slots")
  }

  test("long-horizon heal soak: 16 batches with two distribution " +
    "shifts and a takedown wave, splitSkewAbove + foldColdBelow armed " +
    "— repeated heals keep live-exactly-once green at every compaction " +
    "boundary, splits grow the live quantizer under drift, and the " +
    "post-drain folds shrink it back") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t = java.nio.file.Files.createTempDirectory("graft_ann21").toString
    val idx = s"$t/idx"
    def feed(ids: Range, base: Double, spread: Double) = ids.map(i =>
      (i.toLong, Seq.tabulate(8)(d =>
        base + spread * math.sin(i * 31 + d * 7))))
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = AnnIngest.annIngestStream(
      ms.toDF().toDF("vec_id", "embedding"), idx,
      checkpoint = Some(s"$t/ckpt"), nCells = 8, compactEvery = 2,
      splitSkewAbove = 2.0, foldColdBelow = 0.3)
    val widths = scala.collection.mutable.ArrayBuffer.empty[Int]
    try {
      (0 until 16).foreach { b =>
        val ids = (b * 100) until ((b + 1) * 100)
        // era 1: spread base; era 2 (drift A): tight far cluster; era
        // 3 (drift B): tight cluster on the other side
        val rows =
          if (b < 6) feed(ids, 0.0, 1.0)
          else if (b < 11) feed(ids, -7.0, 0.01)
          else feed(ids, 9.0, 0.01)
        ms.addData(rows); q.processAllAvailable()
        if ((b + 1) % 2 == 0) {
          widths += AnnIngest.liveCellCount(spark, idx)
          // the standing contract at every compaction boundary
          val live = AnnIngest.readIndex(spark, idx, None)
          assert(live.count() === ((b + 1) * 100).toLong,
            s"live count broken after batch $b")
          assert(live.select("vec_id").distinct().count()
            === ((b + 1) * 100).toLong)
        }
      }
    } finally q.stop()
    val peak = widths.max
    assert(peak > 8, s"the drift eras must trigger splits (widths=$widths)")
    // takedown wave: era-2 is fully retracted; the fold at the next
    // compactions collects its drained cells
    AnnIngest.delete(spark, idx, (600L until 1100L).toDF("vec_id"),
      "waveA")
    AnnIngest.compact(spark, idx, 16L, foldColdBelow = 0.3)
    AnnIngest.compact(spark, idx, 17L, foldColdBelow = 0.3)
    val after = AnnIngest.liveCellCount(spark, idx)
    assert(after < peak,
      s"post-drain folds must shrink the live quantizer ($peak -> $after)")
    // end-state contracts through every heal in the horizon
    val cents = AnnIngest.readCentroids(spark, idx).get
    val live = AnnIngest.readIndex(spark, idx, None).persist()
    try {
      assert(live.count() === 1100L) // 1600 - 500 drained
      assert(live.select("vec_id").distinct().count() === 1100L)
      val expect = graft.sim.Ivf.assignCells(
        live.select("vec_id", "e", "norm"), cents)
        .select(col("vec_id"), col("cell").as("cell_x"))
      assert(live.join(expect, Seq("vec_id"))
        .filter(col("cell") =!= col("cell_x")).count() === 0L)
      val dead = cents.indices.filter(c => cents(c)(0).isNaN)
      assert(dead.nonEmpty, "the folds must have deadened slots")
      assert(live.filter(col("cell").isin(dead: _*)).count() === 0L)
      // probe-all == exact across survivors of all three eras
      val sample = feed(0 until 10, 0.0, 1.0) ++
        feed(1200 until 1210, 9.0, 0.01)
      val self = AnnIngest.queryTopK(spark, idx,
        sample.toDF("vec_id", "embedding"), k = 1,
        nProbe = cents.length)
        .filter(col("nb_id") =!= col("vec_id") || col("cos_r") < 1.0)
      assert(self.count() === 0L)
    } finally { live.unpersist(false); () }
  }

  test("split tombstones are SOURCE-scoped: a vec_id re-ingested after " +
    "the split whose updated embedding lands back in its old cell is " +
    "not mistaken for the stale pre-split copy — it stays live and " +
    "survives the next compaction's fold") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann18").toString
    val idx = s"$t/idx"
    def cluster(ids: Range, base: Double) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (base + 0.01 * math.sin(i * 31 + d * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    AnnIngest.ingestBatch(vecs(0 until 300), 0L, idx, nCells = 16)
    AnnIngest.ingestBatch(cluster(300 until 340, -5.0), 1L, idx,
      nCells = 16)
    AnnIngest.compact(spark, idx, 1L)
    AnnIngest.compact(spark, idx, 2L, splitHot = 2.0)
    val m = graft.streaming.IngestIndex.readManifest(spark, idx)
    assert(m.runs("tombs").map(_.name).contains("t_split_2"))
    // pick a mover straight from the live split tombstone: its stale
    // copy sits in (vid, oldCell) of a pre-split run
    val mover = spark.read.parquet(s"$idx/tombs/t_split_2")
      .select("vec_id", "cell").head()
    val (vid, oldCell) = (mover.getLong(0), mover.getInt(1))
    // re-ingest the SAME vec_id with an UPDATED embedding that argmins
    // back into its old cell under the extended quantizer (the old
    // slot id still exists — the split replaced its centroid in place)
    val cents = AnnIngest.readCentroids(spark, idx).get
    val eNew = cents(oldCell).map(_.toFloat)
    AnnIngest.ingestBatch(Seq((vid, eNew)).toDF("vec_id", "embedding"),
      3L, idx, nCells = 16)
    val freshRow = spark.read.option("basePath", s"$idx/vectors/batch=3")
      .parquet(s"$idx/vectors/batch=3").select("vec_id", "cell").head()
    assert(freshRow.getInt(1) === oldCell,
      "drill setup: the fresh row must land in the tombstoned cell")
    // live view: BOTH copies of vid visible — the relocated split copy
    // and the fresh re-ingest; the cell-scoped tombstone hides only
    // the stale PRE-SPLIT copy (source-scoped: src_id < applied-at)
    def vidRows() = AnnIngest.readIndex(spark, idx, None)
      .filter(col("vec_id") === vid)
    assert(vidRows().count() === 2L,
      "the fresh re-ingest must not be eaten by the split tombstone")
    assert(vidRows().filter(col("cell") === oldCell).count() === 1L)
    // the next compaction folds the delta THROUGH the tombstone
    // anti-join — the fresh row must be physically retained
    AnnIngest.compact(spark, idx, 3L)
    assert(vidRows().count() === 2L,
      "the fold must not physically drop the fresh re-ingest")
    assert(vidRows().filter(col("cell") === oldCell).count() === 1L)
  }

  test("a heal SCAN that fires no heal still records LIVE telemetry: " +
    "with a live takedown tombstone, the post-compaction skew report's " +
    "cells equal the live view — the physical fallback (stale copies " +
    "included) would re-trigger the full scan on every later cycle") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann20").toString
    val idx = s"$t/idx"
    AnnIngest.ingestBatch(vecs(0 until 200), 0L, idx, nCells = 8)
    AnnIngest.compact(spark, idx, 0L)
    AnnIngest.delete(spark, idx,
      (0L until 100L by 2).toDF("vec_id"), "half")
    // the scan runs (splitHot armed) and finds nothing hot
    AnnIngest.compact(spark, idx, 1L, splitHot = 100.0)
    assert(IngestIndex.readManifest(spark, idx)
      .runs.getOrElse("tombs", Nil).nonEmpty,
      "drill setup: the takedown tombstone must still be live")
    val skewTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$idx/skew_v1.json")), "UTF-8")
    val reported = "\"(\\d+)\": (\\d+)".r.findAllMatchIn(skewTxt)
      .map(mm => mm.group(1).toInt -> mm.group(2).toLong).toMap
    val liveCounts = AnnIngest.readIndex(spark, idx, None)
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(liveCounts.values.sum === 150L)
    assert(reported === liveCounts,
      s"no-heal scan must still report LIVE occupancy:\n$skewTxt\n$liveCounts")
  }

  test("a SWEPT split tombstone keeps its FIRST-APPLIED id through the " +
    "tswept reader-grace window: recording the sweep id instead would " +
    "inflate tb_applied and the still-anti-joined dir would eat a " +
    "legitimately re-ingested vec_id living in its old cell") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann19").toString
    val idx = s"$t/idx"
    def cluster(ids: Range, base: Double) = ids.map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (base + 0.01 * math.sin(i * 31 + d * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    AnnIngest.ingestBatch(vecs(0 until 300), 0L, idx, nCells = 16)
    AnnIngest.ingestBatch(cluster(300 until 340, -5.0), 1L, idx,
      nCells = 16)
    AnnIngest.compact(spark, idx, 1L)
    AnnIngest.compact(spark, idx, 2L, splitHot = 2.0) // t_split_2, applied 3
    assert(IngestIndex.readManifest(spark, idx)
      .runs("tombs").map(_.name).contains("t_split_2"))
    val mover = spark.read.parquet(s"$idx/tombs/t_split_2")
      .select("vec_id", "cell").head()
    val (vid, oldCell) = (mover.getLong(0), mover.getInt(1))
    // re-ingest the mover back into its old (tombstoned) cell — the
    // source scope (src_id >= applied-at 3) is what keeps it live
    val eNew = AnnIngest.readCentroids(spark, idx).get(oldCell)
      .map(_.toFloat)
    AnnIngest.ingestBatch(Seq((vid, eNew)).toDF("vec_id", "embedding"),
      3L, idx, nCells = 16)
    AnnIngest.compact(spark, idx, 3L)
    def vidInOldCell() = AnnIngest.readIndex(spark, idx, None)
      .filter(col("vec_id") === vid && col("cell") === oldCell).count()
    assert(vidInOldCell() === 1L, "drill setup: re-ingest visible")
    // age the pre-application runs out by feeding SAME-SIZE-CLASS
    // batches (far cluster — irrelevant cells): each merge rewrites a
    // pre-split run under the current compaction id, until every live
    // run postdates the tombstone's application and it can sweep
    def runRows() = IngestIndex.readManifest(spark, idx).runs("vectors")
    Seq(4L, 5L).foreach { b =>
      val oldest = runRows().filter(r =>
        "run_(\\d+)_".r.findFirstMatchIn(r.name)
          .exists(_.group(1).toLong < 3L))
      if (oldest.nonEmpty) {
        val sz = oldest.maxBy(_.rows).rows.toInt
        AnnIngest.ingestBatch(
          cluster(10000 + b.toInt * 1000 until
            10000 + b.toInt * 1000 + sz, 9.0), b, idx, nCells = 16)
      }
      AnnIngest.compact(spark, idx, b)
    }
    assert(runRows().forall(r => "run_(\\d+)_".r.findFirstMatchIn(r.name)
      .exists(_.group(1).toLong >= 3L)), "drill setup: all runs aged past 3")
    AnnIngest.compact(spark, idx, 6L) // the sweep cycle
    val m6 = IngestIndex.readManifest(spark, idx)
    val swept = m6.runs.getOrElse("tswept", Nil).find(_.name == "t_split_2")
    assert(swept.isDefined, "drill setup: tombstone logically swept")
    assert(swept.get.rows === 3L,
      "the tswept record must keep the FIRST-APPLIED id, not the sweep id")
    // the dir is still on disk for one reader generation — and the
    // re-ingested row must stay visible THROUGH that window
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idx/tombs/t_split_2")))
    assert(vidInOldCell() === 1L,
      "re-ingest must survive the tswept reader-grace window")
    AnnIngest.compact(spark, idx, 7L) // physical deletion
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idx/tombs/t_split_2")))
    assert(vidInOldCell() === 1L)
  }

  test("an ORPHAN split tombstone (crash between its write and the " +
    "manifest publish) is inert: readers ignore it — honoring it would " +
    "hide movers whose relocated copies were never committed — and the " +
    "next compaction collects the dir; the split_ tag namespace is " +
    "reserved") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann17").toString
    val idx = s"$t/idx"
    AnnIngest.ingestBatch(vecs(0 until 20), 0L, idx, nCells = 4)
    AnnIngest.compact(spark, idx, 0L)
    // forge the crash state: a cell-scoped split tombstone dir with NO
    // manifest record, targeting a live row's current cell
    val victim = AnnIngest.readIndex(spark, idx, None)
      .select("vec_id", "cell").head()
    Seq((victim.getLong(0), victim.getInt(1))).toDF("vec_id", "cell")
      .write.parquet(s"$idx/tombs/t_split_99")
    // readers ignore it — the row stays live (manifest-gated)
    assert(AnnIngest.tombDirs(spark, idx).isEmpty)
    assert(AnnIngest.readIndex(spark, idx, None).count() === 20L)
    // ...while a TAKEDOWN tombstone dir is honored the moment it
    // exists, committed or not (the user asked for the exclusion)
    AnnIngest.delete(spark, idx,
      Seq(victim.getLong(0)).toDF("vec_id"), "realcase")
    assert(AnnIngest.readIndex(spark, idx, None).count() === 19L)
    // the next compaction collects the orphan dir (it never applies it)
    AnnIngest.ingestBatch(vecs(20 until 25), 1L, idx, nCells = 4)
    AnnIngest.compact(spark, idx, 1L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idx/tombs/t_split_99")),
      "orphan split dir must be collected")
    assert(AnnIngest.readIndex(spark, idx, None).count() === 24L)
    // user tags cannot enter the reserved (manifest-gated) namespace
    assert(intercept[IllegalArgumentException] {
      AnnIngest.delete(spark, idx, Seq(1L).toDF("vec_id"), "split_x")
    }.getMessage.contains("reserved"))
  }

  test("f32 at-rest codec: deltas AND compacted runs store " +
    "array<float>, every read decodes to array<double>, float-born " +
    "inputs query bit-identically to f64 storage, and a MIXED-codec " +
    "index stays correct through compaction") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    def elemType(dir: String) = spark.read.parquet(dir)
      .schema("e").dataType.asInstanceOf[ArrayType].elementType
    val t = java.nio.file.Files.createTempDirectory("graft_annc").toString
    val f32 = s"$t/f32"; val f64 = s"$t/f64"
    spark.conf.set(AnnIngest.VectorCodecKey, "f32")
    try {
      AnnIngest.ingestBatch(vecs(0 until 30), 0L, f32, nCells = 4)
      AnnIngest.ingestBatch(vecs(30 until 60), 1L, f32, nCells = 4)
      assert(elemType(s"$f32/vectors/batch=0") === FloatType,
        "delta writes must store the f32 codec")
      AnnIngest.compact(spark, f32, 1L)
      val runDir = new java.io.File(s"$f32/vectors").listFiles()
        .map(_.getName).filter(_.startsWith("run_")).sorted.head
      assert(elemType(s"$f32/vectors/$runDir") === FloatType,
        "compacted runs must keep the f32 codec")
      assert(AnnIngest.readIndex(spark, f32, None)
        .schema("e").dataType.asInstanceOf[ArrayType]
        .elementType === DoubleType,
        "reads must decode to double regardless of the at-rest codec")
    } finally spark.conf.unset(AnnIngest.VectorCodecKey)
    // f64 dual over the same corpus (deterministic quantizer → same
    // cells): float-born embeddings make the f32 round-trip exact, so
    // the two indexes must answer bit-identically
    AnnIngest.ingestBatch(vecs(0 until 30), 0L, f64, nCells = 4)
    AnnIngest.ingestBatch(vecs(30 until 60), 1L, f64, nCells = 4)
    AnnIngest.compact(spark, f64, 1L)
    def top(dir: String) = AnnIngest.queryTopK(spark, dir,
      vecs(0 until 10), k = 3, nProbe = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(top(f32) === top(f64))
    // mixed codec: a later f64-session batch lands in the f32 index
    // and the next compaction merges across codecs without drama
    AnnIngest.ingestBatch(vecs(60 until 80), 2L, f32, nCells = 4)
    assert(elemType(s"$f32/vectors/batch=2") === DoubleType)
    AnnIngest.compact(spark, f32, 2L)
    val all = AnnIngest.readIndex(spark, f32, None)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(all === (0L until 80L))
    // a bad codec value fails loudly at write time
    spark.conf.set(AnnIngest.VectorCodecKey, "f16")
    try intercept[IllegalArgumentException] {
      AnnIngest.ingestBatch(vecs(80 until 90), 3L, f32, nCells = 4)
    } finally spark.conf.unset(AnnIngest.VectorCodecKey)
  }

  test("write lease: a held lease makes ingest/compact/delete fail " +
    "loudly with the index untouched; the lease releases after each op") {
    val s = spark
    import s.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_ann14").toString
    val idx = s"$t/idx"
    AnnIngest.ingestBatch(vecs(0 until 10), 0L, idx, nCells = 4)
    val lease = java.nio.file.Paths.get(idx, "_writer.lease")
    assert(!java.nio.file.Files.exists(lease), "released after ingest")
    java.nio.file.Files.writeString(lease, """{"owner": "pid1@other"}""")
    val before = AnnIngest.readIndex(spark, idx, None).count()
    assert(intercept[IllegalStateException] {
      AnnIngest.ingestBatch(vecs(10 until 20), 1L, idx, nCells = 4)
    }.getMessage.contains("another writer"))
    assert(intercept[IllegalStateException] {
      AnnIngest.compact(spark, idx, 0L)
    }.getMessage.contains("another writer"))
    assert(intercept[IllegalStateException] {
      AnnIngest.delete(spark, idx, Seq(1L).toDF("vec_id"), "blocked")
    }.getMessage.contains("another writer"))
    assert(AnnIngest.readIndex(spark, idx, None).count() === before)
    assert(AnnIngest.tombDirs(spark, idx).isEmpty)
    java.nio.file.Files.delete(lease)
    AnnIngest.compact(spark, idx, 0L) // released -> proceeds
    assert(graft.streaming.IngestIndex.readManifest(spark, idx)
      .maxCompacted === 0L)
  }

  test("lost centroids file with existing deltas fails fast instead of " +
    "retraining an inconsistent quantizer") {
    val t = java.nio.file.Files.createTempDirectory("graft_ann6").toString
    AnnIngest.ingestBatch(vecs(0 until 20), 0L, s"$t/idx", nCells = 4)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$t/idx/centroids.json"))
    val ex = intercept[IllegalStateException] {
      AnnIngest.ingestBatch(vecs(20 until 40), 1L, s"$t/idx", nCells = 4)
    }
    assert(ex.getMessage.contains("centroids"))
  }

  test("restart without a checkpoint over a non-empty index is refused; " +
    "with a checkpoint the stream resumes and indexes only new batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t = java.nio.file.Files.createTempDirectory("graft_ann5").toString
    def stream(ms: MemoryStream[(Long, Seq[Double])]) =
      ms.toDF().toDF("vec_id", "embedding")
    val ms1 = MemoryStream[(Long, Seq[Double])]
    val q1 = AnnIngest.annIngestStream(stream(ms1), s"$t/idx",
      checkpoint = Some(s"$t/ckpt"), nCells = 2)
    ms1.addData((1 to 20).map(i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 31 + d * 7)))))
    q1.processAllAvailable(); q1.stop()
    // no checkpoint + existing state → refused
    val ms2 = MemoryStream[(Long, Seq[Double])]
    val ex = intercept[IllegalStateException] {
      AnnIngest.annIngestStream(stream(ms2), s"$t/idx", nCells = 2)
    }
    assert(ex.getMessage.contains("previous run"))
    // checkpointed resume: only the new batch lands, nothing re-ingested
    val q2 = AnnIngest.annIngestStream(stream(ms1), s"$t/idx",
      checkpoint = Some(s"$t/ckpt"), nCells = 2)
    ms1.addData((21 to 30).map(i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 31 + d * 7)))))
    q2.processAllAvailable(); q2.stop()
    val ids = AnnIngest.readIndex(spark, s"$t/idx", None)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === (1L to 30L))
  }
}
