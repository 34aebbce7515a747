package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ingest-gate index layout (IngestIndex): compaction equivalence,
  * partition-pruned probes, Bloom zero-read routing, the
  * restart-without-checkpoint guard, and the checkpointed stop/restart
  * drill. This is the spec behind the "per-batch cost independent of
  * stream history" claim — structure asserted here, wall-time flatness
  * measured by tools.IngestSoak (BENCH_SCALE.md). */
class IngestIndexSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def decisions(outDir: String) =
    spark.read.parquet(outDir)
      .select("doc_id", "dup_exact", "dup_near", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3)))
      .sorted.toSeq

  private def mkBatches(n: Int): Seq[(Long, org.apache.spark.sql.DataFrame)] =
    (0 until n).map { b =>
      b.toLong -> docs(
        // one doc duplicating batch 0's seed, one unique per batch
        (10L * b + 1) -> "seed text shared by the very first batch here",
        (10L * b + 2) -> s"unique content belonging to batch $b only")
    }

  test("compaction is decision-invariant: interleaving compact() " +
    "between batches yields bit-identical verdicts, folds deltas away, " +
    "and later batches keep matching against compacted state") {
    val t1 = java.nio.file.Files.createTempDirectory("graft_ii1").toString
    val t2 = java.nio.file.Files.createTempDirectory("graft_ii2").toString
    val batches = mkBatches(5)
    // run A: no compaction
    batches.foreach { case (id, b) =>
      StreamOps.ingestBatch(b, id, s"$t1/idx", s"$t1/out") }
    // run B: compact after every second batch
    batches.foreach { case (id, b) =>
      StreamOps.ingestBatch(b, id, s"$t2/idx", s"$t2/out")
      if ((id + 1) % 2 == 0) IngestIndex.compact(spark, s"$t2/idx", id)
    }
    assert(decisions(s"$t2/out") === decisions(s"$t1/out"))
    // batch 0's seed was flagged in every later batch
    assert(decisions(s"$t2/out").count(d => d._2 && !d._4) === 4)
    // layout: manifest points at base_v3 (last compact at id=3), only
    // delta batch=4 remains, folded deltas and their sidecars deleted
    val (mc, base) = IngestIndex.readManifest(spark, s"$t2/idx")
    assert(mc === 3L && base === Some("base_v3"))
    IngestIndex.Kinds.foreach { kind =>
      val live = IngestIndex.deltaDirs(spark, s"$t2/idx", kind, -1L,
        Long.MaxValue).map(_._1)
      assert(live === Seq(4L), s"$kind deltas after compaction")
    }
    // compacted base is hp-partitioned and holds every distinct hash
    val baseDf = spark.read
      .option("basePath", s"$t2/idx/hashes/base_v3")
      .parquet(s"$t2/idx/hashes/base_v3")
    assert(baseDf.columns.toSet === Set("h", "hp"))
    assert(baseDf.schema("hp").dataType ===
      org.apache.spark.sql.types.StringType) // the "x" prefix guard
    val allH = spark.read.parquet(s"$t2/idx/hashes/batch=4")
      .union(baseDf.select("h"))
      .distinct().count()
    assert(allH === 6L) // 1 shared seed + 5 unique texts
  }

  test("probe plan prunes: suspect hash prefixes become partition " +
    "filters on the base scan; a bloom-clean batch reads no index at all") {
    val t = java.nio.file.Files.createTempDirectory("graft_ii3").toString
    val idx = s"$t/idx"
    mkBatches(4).foreach { case (id, b) =>
      StreamOps.ingestBatch(b, id, idx, s"$t/out") }
    IngestIndex.compact(spark, idx, 3L)
    val pr = IngestIndex.prior(spark, idx, "hashes", 4L)
    assert(pr.baseDir.isDefined && pr.deltas.isEmpty &&
      pr.blooms.isDefined)
    // (a) pruned read: pick one REAL hp, assert the scan carries it as
    // a partition filter and returns only that partition's rows
    val one = spark.read
      .option("basePath", pr.baseDir.get).parquet(pr.baseDir.get)
      .select("hp").head().getString(0)
    val pruned = IngestIndex.readPruned(spark, pr, "h", Some(Seq(one)))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(one),
      s"expected hp partition filter in plan:\n$plan")
    assert(pruned.collect().map(_.getString(0))
      .forall(h => s"x${h.take(IngestIndex.HashPrefixLen)}" == one))
    // (b) bloom-clean keys: the probe returns an EMPTY LOCAL relation —
    // zero index files touched (the 100 TB fast path for clean batches)
    val clean = docs(99L -> "text the index has never seen anywhere")
      .select(md5(col("text").cast("binary")).as("h"))
    val probed = IngestIndex.probeRows(spark, pr, clean, "h")
    assert(probed.isEmpty)
    assert(!probed.queryExecution.executedPlan.toString.contains("FileScan"),
      "clean-batch probe must not scan the index")
    // (c) a real suspect still finds its row (bloom has no false negatives)
    val suspect = docs(100L -> "seed text shared by the very first batch here")
      .select(md5(col("text").cast("binary")).as("h"))
    assert(IngestIndex.probeRows(spark, pr, suspect, "h").count() === 1L)
  }

  test("restart without a checkpoint over a non-empty index is refused") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t = java.nio.file.Files.createTempDirectory("graft_ii4").toString
    // leave prior-run state behind
    StreamOps.ingestBatch(docs(1L -> "stale state from a previous run"),
      0L, s"$t/idx", s"$t/out")
    val ms = MemoryStream[(Long, String)]
    val ex = intercept[IllegalStateException] {
      StreamOps.dedupIngestStream(ms.toDF().toDF("doc_id", "text"),
        s"$t/idx", s"$t/out")
    }
    assert(ex.getMessage.contains("previous run"))
    // with a checkpoint the same call is allowed (resume semantics)
    val q = StreamOps.dedupIngestStream(ms.toDF().toDF("doc_id", "text"),
      s"$t/idx", s"$t/out", checkpoint = Some(s"$t/ckpt"))
    q.stop()
  }

  test("checkpointed stop/restart drill: committed batches are not " +
    "re-screened, the index holds each batch once, and cross-restart " +
    "duplicates are still flagged") {
    val s = spark
    val t = java.nio.file.Files.createTempDirectory("graft_ii5").toString
    val feed = s"$t/feed"
    val schema = docs(0L -> "x").schema
    def feedFile(rows: (Long, String)*): Unit =
      docs(rows: _*).coalesce(1).write.mode("append").parquet(feed)
    def stream() = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
    feedFile(1L -> "first run document one of the crawl feed",
      2L -> "first run document two with different words")
    val q1 = StreamOps.dedupIngestStream(stream(), s"$t/idx", s"$t/out",
      checkpoint = Some(s"$t/ckpt"))
    q1.processAllAvailable(); q1.stop()
    val afterRun1 = decisions(s"$t/out")
    assert(afterRun1.size === 2 && afterRun1.forall(_._4)) // all kept
    // second run: same checkpoint+index, new files (one cross-restart dup)
    feedFile(3L -> "first run document one of the crawl feed", // dup of 1
      4L -> "second run brings an entirely new document")
    val q2 = StreamOps.dedupIngestStream(stream(), s"$t/idx", s"$t/out",
      checkpoint = Some(s"$t/ckpt"))
    q2.processAllAvailable(); q2.stop()
    val afterRun2 = decisions(s"$t/out")
    // no re-screening: docs 1,2 appear exactly once; 4 rows total
    assert(afterRun2.size === 4)
    assert(afterRun2.count(d => d._1 == 1L) === 1)
    // the cross-restart duplicate was caught against the resumed index
    assert(afterRun2.contains((3L, true, true, false)))
    assert(afterRun2.contains((4L, false, false, true)))
    // index holds each committed batch id exactly once
    val hashDeltas = IngestIndex.deltaDirs(spark, s"$t/idx", "hashes",
      -1L, Long.MaxValue).map(_._1)
    assert(hashDeltas === hashDeltas.distinct)
  }
}
