package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized checkpoint/restart interleaving fuzz for the four
  * checkpointed streaming paths (dedupWithinWatermark, the ingest dedup
  * gate, the ANN ingest index, the left-outer stream-stream join).
  *
  * The r15 drills exercised crash windows at FIXED points; here a
  * seeded schedule decides (a) how many feed files arrive between
  * restarts, (b) where an extra no-op restart lands, and (c) after
  * which drains the newest checkpoint COMMIT file is deleted — the
  * canonical at-least-once window (offsets + sink landed, commit log
  * lost), which forces Structured Streaming to REPLAY that micro-batch
  * on the next start. Contract: a run with injected crashes must be
  * indistinguishable from a clean run over the SAME arrival schedule —
  * foreachBatch sinks by overwrite-idempotence (`batch=<id>` dirs),
  * file sinks by the FileStreamSink manifest, state stores by version
  * rewind.
  *
  * (The clean reference uses the same CHUNKED arrivals, not one giant
  * batch: watermark advancement and expiry are legitimately
  * batch-boundary-dependent semantics — the fuzz must not blur a
  * replay bug with an arrival-pattern difference.)
  *
  * Seeds rotate freely; failures print the seed + schedule. Findings
  * land in FUZZ.md's streaming section and pin like FuzzRegressionSpec.
  */
class StreamInterleaveFuzzSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  // ---- seeded schedule ----

  private final case class Schedule(chunks: Seq[Seq[Int]],
      dropAfter: Set[Int], extraRestartAfter: Set[Int]) {
    override def toString: String =
      s"chunks=${chunks.map(_.mkString("+")).mkString(",")} " +
        s"drop=$dropAfter extra=$extraRestartAfter"
  }

  private def schedule(seed: Long, nFiles: Int): Schedule = {
    val rnd = new scala.util.Random(seed)
    val chunks = Seq.newBuilder[Seq[Int]]
    var i = 0
    while (i < nFiles) {
      val take = math.min(rnd.between(1, 4), nFiles - i)
      chunks += (i until i + take)
      i += take
    }
    val cs = chunks.result()
    Schedule(cs,
      cs.indices.filter(_ => rnd.nextDouble() < 0.5).toSet,
      cs.indices.filter(_ => rnd.nextDouble() < 0.3).toSet)
  }

  /** Delete the newest commit-log entry (+crc sibling) under a
    * checkpoint location — simulates a crash after the sink committed
    * batch N but before the commit log recorded it. */
  private def dropLatestCommit(ckptLoc: String): Boolean = {
    val d = new java.io.File(s"$ckptLoc/commits")
    val fs = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.nonEmpty && f.getName.forall(_.isDigit))
    if (fs.isEmpty) false
    else {
      val m = fs.maxBy(_.getName.toLong)
      new java.io.File(d, s".${m.getName}.crc").delete()
      m.delete()
    }
  }

  /** Stage one parquet file per logical batch with increasing mtimes
    * (the file source orders batches by them). */
  private def stageFile(feed: String, idx: Int,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val scratch = s"$feed/_s$idx"
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(f"$feed/b$idx%03d.parquet"))
    new java.io.File(f"$feed/b$idx%03d.parquet")
      .setLastModified(1700000000000L + idx * 60000L): Unit
  }

  /** Run one schedule: stage chunk files, drain, inject. `drain` must
    * start a resumable query against the shared checkpoint and block
    * until available data is consumed. */
  private def runSchedule(sched: Schedule, inject: Boolean,
      files: Int => org.apache.spark.sql.DataFrame, feed: String,
      ckptLoc: String, drain: () => Unit): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(feed))
    sched.chunks.zipWithIndex.foreach { case (chunk, ci) =>
      chunk.foreach(i => stageFile(feed, i, files(i)))
      drain()
      if (inject && sched.extraRestartAfter(ci)) drain() // no-op restart
      if (inject && sched.dropAfter(ci)) dropLatestCommit(ckptLoc)
    }
    drain() // final drain: a dropped commit replays its batch here
  }

  // ---- path 1: ingest dedup gate (foreachBatch + LSM index) ----

  private def docFile(i: Int) = {
    val s = spark
    import s.implicits._
    // one doc duplicating file 0's seed text, one near-dup of file 1's
    // base (shared shingles), one unique — every verdict class fires
    Seq(
      (100L * i + 1) -> "seed text shared by the very first batch of the feed",
      (100L * i + 2) -> ("rolling near duplicate base sentence with shared " +
        s"shingle structure variant token$i"),
      (100L * i + 3) -> s"entirely unique content belonging to file $i only")
      .toDF("doc_id", "text")
  }

  private def gateRun(tag: String, seed: Long, inject: Boolean): Seq[Any] = {
    val t = java.nio.file.Files
      .createTempDirectory(s"graft_ifz_gate_$tag").toString
    val feed = s"$t/feed"; val ck = s"$t/ck"
    val schema = docFile(0).schema
    def drain(): Unit = {
      val q = StreamOps.dedupIngestStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(feed),
        s"$t/idx", s"$t/out", checkpoint = Some(ck), compactEvery = 3)
      q.processAllAvailable(); q.stop()
    }
    runSchedule(schedule(seed, 8), inject, docFile, feed, ck, () => drain())
    spark.read.parquet(s"$t/out")
      .select("doc_id", "dup_exact", "dup_near", "kept").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3))).sorted.toSeq
  }

  test("ingest gate: seeded restart/replay schedules leave decisions " +
    "bit-identical to a clean run over the same arrivals") {
    Seq(101L, 202L).foreach { seed =>
      val clean = gateRun("c", seed, inject = false)
      val fuzzed = gateRun("f", seed, inject = true)
      assert(fuzzed === clean, s"seed=$seed sched=${schedule(seed, 8)}")
      assert(clean.nonEmpty)
    }
  }

  // ---- path 2: dedupWithinWatermark (state store + file sink) ----

  private def eventFile(i: Int) = {
    val s = spark
    import s.implicits._
    val t0 = 1704067200L * 1000000L // 2024-01-01 micros
    val min = 60L * 1000000L
    // advancing timestamps so the watermark expires keys mid-sequence;
    // every third event re-uses a key 2 minutes later (in-window dup)
    val rows = Seq.newBuilder[(Long, Long, Long, String)]
    (0 until 4).foreach { j =>
      val n = i * 4 + j
      val ts = t0 + n * 6 * min
      rows += ((n.toLong * 10, ts, (n % 3).toLong, "view"))
      if (n % 3 == 0) rows += ((n.toLong * 10 + 1, ts + 2 * min,
        (n % 3).toLong, "view"))
    }
    rows.result()
      .toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def wmRun(tag: String, seed: Long, inject: Boolean): Seq[Long] = {
    val t = java.nio.file.Files
      .createTempDirectory(s"graft_ifz_wm_$tag").toString
    val feed = s"$t/feed"; val ckRoot = s"$t/ckroot"
    def drain(): Unit = {
      StreamOps.dedupWithinWatermark(spark, feed,
        Seq("user_id", "event_type"), delay = "10 minutes",
        checkpoint = Some(ckRoot))
      ()
    }
    runSchedule(schedule(seed, 6), inject, eventFile, feed,
      s"$ckRoot/ckpt", () => drain())
    spark.read.parquet(s"$ckRoot/out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
  }

  test("dedupWithinWatermark: commit-loss replays rewind the dedup " +
    "state to the same emitted set as a clean run (exactly-once " +
    "through the file-sink manifest)") {
    Seq(303L, 404L).foreach { seed =>
      val clean = wmRun("c", seed, inject = false)
      val fuzzed = wmRun("f", seed, inject = true)
      assert(fuzzed === clean, s"seed=$seed sched=${schedule(seed, 6)}")
      // emission count is legitimately schedule-dependent (state expiry
      // only advances between batches — a big chunk dedups harder);
      // the contract here is equivalence + no sink double-emit
      assert(clean.nonEmpty)
      assert(clean.toSet.size === clean.size, "file sink double-emitted")
    }
  }

  // ---- path 3: ANN ingest index (foreachBatch + heals) ----

  private def vecFile(i: Int) = {
    val s = spark
    import s.implicits._
    (0 until 6).map { j =>
      val id = i * 6L + j
      (id, Array.tabulate(8)(d => math.sin(id * 31.0 + d * 17).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def annRun(tag: String, seed: Long, inject: Boolean)
      : (Seq[(Long, Int)], Seq[(Long, Long, Double)]) = {
    val t = java.nio.file.Files
      .createTempDirectory(s"graft_ifz_ann_$tag").toString
    val feed = s"$t/feed"; val ck = s"$t/ck"; val idx = s"$t/idx"
    val schema = vecFile(0).schema
    def drain(): Unit = {
      val q = AnnIngest.annIngestStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(feed),
        idx, checkpoint = Some(ck), nCells = 4, compactEvery = 3,
        foldColdBelow = 0.1)
      q.processAllAvailable(); q.stop()
    }
    runSchedule(schedule(seed, 8), inject, vecFile, feed, ck, () => drain())
    val content = AnnIngest.readIndex(spark, idx, None)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val probes = vecFile(0).limit(3).localCheckpoint(true)
    val top = AnnIngest.queryTopK(spark, idx, probes, k = 3, nProbe = 2)
      .select(col("vec_id"), col("nb_id"), col("cos_r")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    (content, top)
  }

  test("ANN ingest: seeded restart/replay schedules (incl. replayed " +
    "compactions) leave index content and query results identical to " +
    "a clean run") {
    Seq(505L, 606L).foreach { seed =>
      val clean = annRun("c", seed, inject = false)
      val fuzzed = annRun("f", seed, inject = true)
      assert(fuzzed._1 === clean._1,
        s"index content diverged; seed=$seed sched=${schedule(seed, 8)}")
      assert(fuzzed._2 === clean._2,
        s"query results diverged; seed=$seed sched=${schedule(seed, 8)}")
      assert(clean._1.size === 48)
    }
  }

  // ---- path 4: left-outer stream-stream interval join ----

  private def ssFile(i: Int) = {
    val s = spark
    import s.implicits._
    val t0 = 1704067200L * 1000000L
    val min = 60L * 1000000L
    // file i: one purchase per user i%2 at t0+i*40min, context clicks
    // for SOME purchases 10min before (others emit as outer nulls);
    // the last file is a far-future sentinel that flushes held state
    val rows =
      if (i == 5) Seq(
        (-1L, t0 + 10000 * min, -1L, "purchase"),
        (-1L, t0 + 10000 * min, -1L, "click"))
      else {
        val base = Seq((i * 10L, t0 + i * 40 * min, (i % 2).toLong,
          "purchase"))
        if (i % 2 == 0)
          base :+ ((i * 10L + 1, t0 + i * 40 * min - 10 * min,
            (i % 2).toLong, "click"))
        else base
      }
    rows.toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def ssRun(tag: String, seed: Long, inject: Boolean)
      : Seq[(Long, Long)] = {
    val t = java.nio.file.Files
      .createTempDirectory(s"graft_ifz_ss_$tag").toString
    val feed = s"$t/feed"; val ck = s"$t/ck"; val out = s"$t/out"
    def drain(): Unit = {
      val q = StreamOps.outerJoinFrames(spark, feed, windowMin = 30)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }
    runSchedule(schedule(seed, 6), inject, ssFile, feed, ck, () => drain())
    spark.read.parquet(out).filter(col("p_id") =!= -1L)
      .groupBy("p_id").agg(count(col("c_ts")).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
  }

  test("outer stream-stream join: replayed batches neither double-join " +
    "nor double-flush outer rows — per-purchase context counts match " +
    "the clean run") {
    Seq(707L, 808L).foreach { seed =>
      val clean = ssRun("c", seed, inject = false)
      val fuzzed = ssRun("f", seed, inject = true)
      assert(fuzzed === clean, s"seed=$seed sched=${schedule(seed, 6)}")
      // 5 real purchases, even-file ones have exactly one context click
      assert(clean.map(_._1) === Seq(0L, 10L, 20L, 30L, 40L))
      assert(clean.toMap.apply(0L) === 1L && clean.toMap.apply(10L) === 0L)
    }
  }
}
