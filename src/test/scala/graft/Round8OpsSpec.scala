package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operators: BM25 retrieval, overlapping chunking, the
  * stream-stream interval join, and the events.ts physical-type
  * normalization. */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bm25TopK: hand-computed scores on a planted corpus; shuffle moves " +
    "only bounded top-k candidates (no global sort exchange)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "fast merge sort"),          // tf(merge)=1, dl=3
      (2L, "merge merge conflict now"), // tf(merge)=2, dl=4
      (3L, "no relevant words here"),   // tf=0
      (4L, "merge")                     // tf=1, dl=1
    ).toDF("doc_id", "text")
    val got = graft.text.Retrieval.bm25TopK(docs, Seq("merge"), k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // N=4, df=3, idf = ln((4-3+0.5)/(3+0.5)+1) = ln(1.42857142857...)
    // avgdl = 12/4 = 3
    val idf = math.log((4.0 - 3.0 + 0.5) / (3.0 + 0.5) + 1.0)
    def s(tf: Double, dl: Double): Double = BigDecimal(
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc4 (tf=1, dl=1): denom shortest → highest; then doc2 (tf=2);
    // then doc1
    assert(got.toSeq === Seq(
      (1, 4L, s(1, 1)), (2, 2L, s(2, 4)), (3, 1L, s(1, 3))))
    // plan shape: the selection is TopKAgg partial+final (ObjectHashAgg or
    // SortAgg pairs), never a global TakeOrderedAndProject over all docs
    val plan = graft.text.Retrieval.bm25TopK(docs, Seq("merge"), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k must be the bounded aggregator, not a global sort:\n$plan")
  }

  test("slidingChunks: spans, overlap, and edge docs (empty, exact-window, " +
    "one-over) are integer-exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, 0L),   // empty doc → one empty chunk
      (2L, 256L), // exactly one window
      (3L, 257L), // one token over → 2 chunks
      (4L, 600L)  // ceil((600-256)/128)+1 = ceil(2.6875)+1 = 4 chunks
    ).toDF("doc_id", "n")
    val got = graft.text.Retrieval
      .slidingChunks(docs, col("n"), window = 256, stride = 128)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    val expected = Seq(
      (1L, 0L, 0L, 0L, 0L),
      (2L, 0L, 0L, 256L, 256L),
      (3L, 0L, 0L, 256L, 256L), (3L, 1L, 128L, 257L, 129L),
      (4L, 0L, 0L, 256L, 256L), (4L, 1L, 128L, 384L, 256L),
      (4L, 2L, 256L, 512L, 256L), (4L, 3L, 384L, 600L, 216L))
    assert(got.toSeq === expected)
    // every token of every non-empty doc is covered by ≥1 chunk
    val covered = got.filter(_._1 == 4L)
    assert(covered.head._3 == 0L && covered.last._4 == 600L)
    assert(covered.toSeq.sliding(2).forall {
      case Seq(a, b) => b._3 < a._4 // stride < window → overlap
      case _ => true
    })
  }

  test("purchaseContextJoin: planted purchase/context timeline equals " +
    "hand-computed window counts (and zero-context purchases are absent)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssjoin").toString
    val min = 60L * 1000000L // one minute in micros
    val t0 = 1704067200L * 1000000L // 2024-01-01, like the real data
    // user 7: context at t=0,10,40min; purchases at 30min (sees 0,10),
    //   45min (sees 40); user 8: purchase at 5min with no context
    val rows = Seq(
      (1L, t0 + 0L * min, 7L, "view", 1.0, "{}"),
      (2L, t0 + 10L * min, 7L, "view", 1.0, "{}"),
      (3L, t0 + 30L * min, 7L, "purchase", 1.0, "{}"),
      (4L, t0 + 40L * min, 7L, "click", 1.0, "{}"),
      (5L, t0 + 45L * min, 7L, "purchase", 1.0, "{}"),
      (6L, t0 + 5L * min, 8L, "purchase", 1.0, "{}"))
    // the stream's pathGlobFilter matches LEAF file names, so the fixture
    // must be a flat `events.parquet` FILE like the driver's testdata —
    // write to a scratch dir and move the single part file into place
    val scratch = s"$dir/_scratch"
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = graft.streaming.StreamOps.purchaseContextJoin(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // purchase 3 at 30min: context 0 and 10min are within [0, 30] → 2
    // purchase 5 at 45min: context 40min within [15, 45] → 1 (0,10 are out)
    assert(got === Map(3L -> 2L, 5L -> 1L))
  }

  test("dedupWithinWatermark: in-window duplicate dropped, state expires " +
    "with the watermark, late re-arrival re-admitted (bounded state, " +
    "pinned cross-batch contract)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wmdedup")
      .toString
    val t0 = 1704067200L * 1000000L // 2024-01-01 micros
    val min = 60L * 1000000L
    def writeBatch(idx: Int, rows: Seq[(Long, Long, Long, String)]): Unit = {
      val scratch = s"$dir/_s$idx"
      rows.map { case (id, us, u, ty) => (id, us, u, ty, 1.0, "{}") }
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(f"$dir/b$idx%02d.parquet"))
      // distinct mtimes: the file source orders batches by them
      new java.io.File(f"$dir/b$idx%02d.parquet")
        .setLastModified(1700000000000L + idx * 60000L): Unit
    }
    // key = (user_id, event_type); delay = 10 minutes. Each run resumes
    // the same checkpoint — state and watermark persist, each run drains
    // only the newly-arrived file (real feed arrival order).
    val ckpt = s"$dir/_ckpt"
    def runOnce(): Set[Long] = graft.streaming.StreamOps
      .dedupWithinWatermark(spark, dir, Seq("user_id", "event_type"),
        checkpoint = Some(ckpt))
      .collect().map(_.getLong(0)).toSet
    // (parquet sink → each run returns the CUMULATIVE deduped feed)
    // run 1: key (7, view) at t+0 → emitted
    writeBatch(1, Seq((1L, t0, 7L, "view")))
    assert(runOnce() === Set(1L))
    // run 2: duplicate key at t+5min (IN window → dropped) and a
    // watermark-advancing event at t+120min (key's state then expires)
    writeBatch(2, Seq((2L, t0 + 5 * min, 7L, "view"),
      (3L, t0 + 120 * min, 8L, "click")))
    assert(runOnce() === Set(1L, 3L), "in-window duplicate dropped")
    // run 3: same key again at t+121min — state expired → re-admitted
    writeBatch(3, Seq((4L, t0 + 121 * min, 7L, "view")))
    assert(runOnce() === Set(1L, 3L, 4L),
      "state expired with the watermark; late re-arrival re-admitted")
  }

  test("Bpe: classic corpus gives the hand-computed merge sequence; " +
    "encode handles trained, partially-OOV and fully-OOV words; the " +
    "distributed passes stay bounded (heap top-k, broadcast re-attach)") {
    import spark.implicits._
    // Sennrich/HF walkthrough corpus: hug×10 pug×5 pun×12 bun×4 hugs×5
    // pair counts: (u,g)=20 → "ug"; then (u,n)=16 → "un"; then (h,ug)=15
    val freqs = Seq("hug" -> 10L, "pug" -> 5L, "pun" -> 12L, "bun" -> 4L,
      "hugs" -> 5L)
    val merges = graft.text.Bpe.train(freqs, numMerges = 3)
    assert(merges === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    val rank = merges.zipWithIndex.toMap
    assert(graft.text.Bpe.encode("hugs", rank) === Vector("hug", "s"))
    assert(graft.text.Bpe.encode("bug", rank) === Vector("b", "ug"))
    assert(graft.text.Bpe.encode("zzz", rank) === Vector("z", "z", "z"))
    assert(graft.text.Bpe.encode("x", rank) === Vector("x"))
    // early exhaustion: a single-char vocab has no pairs to merge
    assert(graft.text.Bpe.train(Seq("a" -> 3L), numMerges = 5) === Seq())
    // distributed passes: word-freq cap is a bounded heap (TakeOrdered),
    // and tokenCounts re-attaches the vocab via broadcast, never a
    // corpus-sized shuffle join
    val docs = Seq((1L, "hug pug pun"), (2L, "bun hugs hug"), (3L, ""))
      .toDF("doc_id", "text")
    val wfPlan = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(10)
      .queryExecution.executedPlan.toString
    assert(wfPlan.contains("TakeOrderedAndProject"),
      s"vocab cap must be the bounded heap:\n$wfPlan")
    val tc = graft.text.Bpe.tokenCounts(docs, merges)
    val tcPlan = tc.queryExecution.executedPlan.toString
    assert(tcPlan.contains("BroadcastHashJoin"),
      s"vocab re-attach must broadcast:\n$tcPlan")
    val m = tc.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc1: hug→1, pug→2 (p+ug), pun→2 (p+un) = 5 bpe tokens, 9 chars
    assert(m(1L) === ((3L, 9L, 5L)))
    // doc2: bun→2 (b+un), hugs→2, hug→1 = 5 bpe tokens, 10 chars
    assert(m(2L) === ((3L, 10L, 5L)))
    assert(m(3L) === ((0L, 0L, 0L)), "empty doc keeps its zero row")
  }

  test("Bucketed co-located join: ZERO exchanges in the join subtree " +
    "(the shuffle was paid at write time); the identical non-bucketed " +
    "join shuffles both sides") {
    import spark.implicits._
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force SMJ so the exchange count is the tell
    try {
      val fact = (1L to 2000L).map(i => (i % 97, i.toDouble))
        .toDF("k", "v")
      val dim = (0L until 97L).map(i => (i, s"g${i % 5}")).toDF("j", "g")
      graft.sources.Bucketed.writeBucketed(fact, "bkt_spec_fact", 4, Seq("k"))
      graft.sources.Bucketed.writeBucketed(dim, "bkt_spec_dim", 4, Seq("j"))
      val joined = graft.sources.Bucketed.join(spark,
        "bkt_spec_fact", "bkt_spec_dim", Seq("k"), Seq("j"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed equi-join must not shuffle either side:\n$plan")
      // differential: the same join over the raw frames shuffles
      val rawPlan = fact.join(dim, col("k") === col("j"))
        .queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"),
        "control: the non-bucketed join is expected to shuffle")
      // and the values are the ordinary join
      val got = joined.groupBy("g").agg(sum("v").as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exp = fact.join(dim, col("k") === col("j"))
        .groupBy("g").agg(sum("v").as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === exp)
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS bkt_spec_fact")
      spark.sql("DROP TABLE IF EXISTS bkt_spec_dim")
    }
  }

  test("StatsMerge: disjoint halves under frozen bounds merge to the " +
    "whole-table profile (counts/metrics exact, moments to FP tolerance); " +
    "mismatched boundaries are refused") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map { i =>
      val v: java.lang.Double =
        if (i % 13 == 0) null else rnd.nextGaussian() * 3 + 1
      (i, v, rnd.nextBoolean())
    }
    val df = rows.toDF("id", "v", "y")
    val isPos = col("y")
    val whole = graft.ops.StatsPipeline.profileNumeric(
      df, Seq("v"), isPos, full = true)
    val bounds: Map[String, Seq[Double]] =
      whole.map { case (c, p) => c -> (p.binning.binBoundary: Seq[Double]) }
    def half(cond: org.apache.spark.sql.Column) =
      graft.ops.StatsPipeline.profileNumeric(df.filter(cond), Seq("v"),
        isPos, full = true, boundsOverride = Some(bounds))
    val m = graft.ops.StatsMerge.merge(
      half(col("id") % 2 === 0)("v"), half(col("id") % 2 === 1)("v"))
    val w = whole("v")
    assert(m.stats.totalCount === w.stats.totalCount)
    assert(m.stats.missingCount === w.stats.missingCount)
    assert(m.binning.binCountPos === w.binning.binCountPos)
    assert(m.binning.binCountNeg === w.binning.binCountNeg)
    assert(m.stats.ks === w.stats.ks, "KS from merged counts is EXACT")
    assert(m.stats.iv === w.stats.iv)
    assert(m.binning.binCountWoe === w.binning.binCountWoe)
    assert(m.stats.min === w.stats.min && m.stats.max === w.stats.max)
    def close(a: Option[Double], b: Option[Double], tol: Double) =
      math.abs(a.get - b.get) <= tol * math.max(1.0, math.abs(b.get))
    assert(close(m.stats.mean, w.stats.mean, 1e-12))
    assert(close(m.stats.stdDev, w.stats.stdDev, 1e-12))
    assert(close(m.stats.skewness, w.stats.skewness, 1e-9))
    assert(close(m.stats.kurtosis, w.stats.kurtosis, 1e-9))
    // refusing to add counts binned against different edges
    val other = whole("v").copy(binning =
      w.binning.copy(binBoundary = w.binning.binBoundary.map(_ + 1.0)))
    assertThrows[IllegalArgumentException] {
      graft.ops.StatsMerge.merge(w, other)
    }
    // constant column: std 0 on both sides → moments degrade to None,
    // counts still merge
    val cdf = (1L to 50L).map(i => (i, 5.0, i % 2 == 0)).toDF("id", "v", "y")
    val cw = graft.ops.StatsPipeline.profileNumeric(
      cdf, Seq("v"), col("y"), full = true)
    val cb: Map[String, Seq[Double]] =
      cw.map { case (c, p) => c -> (p.binning.binBoundary: Seq[Double]) }
    val ch1 = graft.ops.StatsPipeline.profileNumeric(
      cdf.filter(col("id") <= 25), Seq("v"), col("y"), full = true,
      boundsOverride = Some(cb))
    val ch2 = graft.ops.StatsPipeline.profileNumeric(
      cdf.filter(col("id") > 25), Seq("v"), col("y"), full = true,
      boundsOverride = Some(cb))
    val cm = graft.ops.StatsMerge.merge(ch1("v"), ch2("v"))
    assert(cm.stats.totalCount === 50L)
    assert(cm.stats.mean === Some(5.0))
    assert(cm.stats.skewness === None)
  }

  test("StatsMerge categorical: frozen-category halves merge to the " +
    "whole-table profile exactly; unseen categories fold into the " +
    "missing slot; mismatched category lists are refused") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cats = Vector("a", "b", "c", "d")
    val rows = (1L to 300L).map { i =>
      val v: String = if (i % 11 == 0) null else cats(rnd.nextInt(cats.size))
      (i, v, rnd.nextBoolean())
    }
    val df = rows.toDF("id", "v", "y")
    val whole = graft.ops.StatsPipeline.profileCategorical(
      df, Seq("v"), col("y"))
    val frozen: Map[String, Seq[String]] =
      whole.map { case (c, p) => c -> (p.binning.binCategory: Seq[String]) }
    def half(cond: org.apache.spark.sql.Column) =
      graft.ops.StatsPipeline.profileCategorical(df.filter(cond), Seq("v"),
        col("y"), categoriesOverride = Some(frozen))
    val m = graft.ops.StatsMerge.merge(
      half(col("id") % 2 === 0)("v"), half(col("id") % 2 === 1)("v"))
    val w = whole("v")
    assert(m.binning.binCategory === w.binning.binCategory)
    assert(m.binning.binCountPos === w.binning.binCountPos)
    assert(m.binning.binCountNeg === w.binning.binCountNeg)
    assert(m.stats.totalCount === w.stats.totalCount)
    assert(m.stats.ks === w.stats.ks, "KS from merged counts is EXACT")
    assert(m.stats.iv === w.stats.iv)
    // a category OUTSIDE the frozen list folds into the missing slot
    val extra = (Seq((1000L, "zzz", true), (1001L, "a", false)))
      .toDF("id", "v", "y")
    val p = graft.ops.StatsPipeline.profileCategorical(extra, Seq("v"),
      col("y"), categoriesOverride = Some(frozen))("v")
    assert(p.binning.binCategory === w.binning.binCategory)
    assert(p.stats.missingCount === 1L, "unseen 'zzz' counted as invalid")
    // mismatched frozen lists refuse to merge
    val other = w.copy(binning = w.binning.copy(
      binCategory = w.binning.binCategory :+ "extra"))
    assertThrows[IllegalArgumentException] {
      graft.ops.StatsMerge.merge(w, other)
    }
  }

  test("QuantileSketch: half-sketches merge to whole-data quantiles " +
    "within the rank-error bound; serialization round-trips; merged " +
    "profile regains median/p25/p75") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1L to 4000L).map(i => (i, rnd.nextGaussian() * 10, i % 2 == 0))
    val df = rows.toDF("id", "v", "y")
    val sorted = rows.map(_._2).sorted
    def exactRank(x: Double): Double =
      sorted.count(_ <= x).toDouble / sorted.length
    val sa = graft.ops.QuantileSketch.buildFor(
      df.filter(col("id") % 2 === 0), Seq("v"))("v")
    val sb = graft.ops.QuantileSketch.buildFor(
      df.filter(col("id") % 2 === 1), Seq("v"))("v")
    val m = sa.compress().merge(sb.compress())
    // each queried quantile's EXACT rank must sit within eps of its target
    Seq(0.25, 0.5, 0.75, 0.9).foreach { p =>
      val q = m.query(p).get
      assert(math.abs(exactRank(q) - p) <= 2 * 0.001 + 1e-3,
        s"quantile $p -> $q rank=${exactRank(q)}")
    }
    // serialize → deserialize preserves queries and stays mergeable
    val rt = graft.ops.QuantileSketch.deserialize(
      graft.ops.QuantileSketch.serialize(m))
    assert(rt.query(0.5) === m.query(0.5))
    assert(rt.merge(rt.compress()).count === 2 * m.count)
    // profile merge regains the quantiles StatsMerge alone surrenders
    val whole = graft.ops.StatsPipeline.profileNumeric(
      df, Seq("v"), col("y"), full = true)
    val bounds: Map[String, Seq[Double]] =
      whole.map { case (c, pr) => c -> (pr.binning.binBoundary: Seq[Double]) }
    def half(cond: org.apache.spark.sql.Column) =
      graft.ops.StatsPipeline.profileNumeric(df.filter(cond), Seq("v"),
        col("y"), full = true, boundsOverride = Some(bounds))("v")
    val (prof, sketch) = graft.ops.QuantileSketch.mergeWithSketches(
      half(col("id") % 2 === 0), half(col("id") % 2 === 1), sa, sb)
    assert(prof.stats.median.isDefined && prof.stats.p25.isDefined &&
      prof.stats.p75.isDefined)
    assert(math.abs(exactRank(prof.stats.median.get) - 0.5) <= 0.003)
    assert(sketch.count === 4000L)
  }

  test("psiBetween: catalog-level drift equals the data-level Psi.compute " +
    "on the same frozen bins (zero scan vs full scan, same number)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // day A centered at 0, day B drifted to +1 — real drift signal
    val rows = (1L to 1000L).map { i =>
      val day = if (i <= 500) "A" else "B"
      val v = rnd.nextGaussian() + (if (day == "B") 1.0 else 0.0)
      (i, day, v, i % 3 == 0)
    }
    val df = rows.toDF("id", "day", "v", "y")
    val Array(mn, mx) = df.agg(min("v"), max("v")).head()
      .toSeq.map(_.asInstanceOf[Double]).toArray
    val bounds = graft.ops.Binning.equalInterval(mn, mx, 10)
    val bMap: Map[String, Seq[Double]] = Map("v" -> bounds)
    def prof(day: String) = graft.ops.StatsPipeline.profileNumeric(
      df.filter(col("day") === day), Seq("v"), col("y"),
      boundsOverride = Some(bMap))("v")
    val pa = prof("A")
    val pb = prof("B")
    // Psi.compute's expected side is the GLOBAL distribution — mirror
    // that exactly: expected = merged(A+B), actual = each day
    val merged = graft.ops.StatsMerge.merge(pa, pb)
    val catalogPsi = Map(
      "A" -> graft.ops.StatsMerge.psiBetween(merged, pa),
      "B" -> graft.ops.StatsMerge.psiBetween(merged, pb))
    val dataPsi = graft.ops.Psi.compute(df, col("v"), col("day"), bounds)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    catalogPsi.foreach { case (day, p) =>
      assert(math.abs(p - dataPsi(day)) < 1e-6,
        s"day $day catalog=$p data=${dataPsi(day)}")
    }
    assert(catalogPsi("B") > 0.05, "the planted +1 shift is a real drift")
    assert(graft.ops.StatsMerge.psiBetween(pa, pa) === 0.0)
  }

  test("normalizeText + stripHtml: NFC composes decomposed accents, " +
    "controls/whitespace canonicalize, script subtrees and tags drop, " +
    "entities decode without double-decoding") {
    import spark.implicits._
    // "é" decomposed (e + U+0301) must compose to the single NFC char
    val decomposed = "Cafe\u0301"
    val df = Seq(
      (1L, s"  $decomposed\tBAR  x  "),
      (2L, "<html><script>var x = '<p>';</script><p>Hi &amp;lt; "
        + "&quot;you&quot; &#39;there&#39;&nbsp;</p></html>"),
      (3L, "plain text")
    ).toDF("doc_id", "text")
    val norm = graft.text.TextOps.normalizeText(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(1L) === "caf\u00e9 bar x", "NFC + controls + collapse + fold")
    assert(norm(3L) === "plain text")
    val stripped = graft.text.TextOps.stripHtml(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // script SUBTREE (including its '<p>' literal) is gone; &amp;lt;
    // decodes to the literal "&lt;", never twice to "<"
    assert(stripped(2L) === "Hi &lt; \"you\" 'there'")
    assert(stripped(3L) === "plain text")
    // stripHtml stays UDF-free (pure codegen narrow map)
    val plan = graft.text.TextOps.stripHtml(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Exchange"))
  }

  test("Tables.load normalizes events.ts to LONG nanos for both physical " +
    "types (timestamp and raw-long parquet)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
    Seq((1L, 1704067200123456L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val fromTimestamp = Tables.load(spark, dir, "events")
    assert(fromTimestamp.schema("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(fromTimestamp.select("ts").head().getLong(0) ===
      1704067200123456000L)
    // raw-long (legacy nanos) parquet passes through untouched
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ts2").toString
    Seq((1L, 1704067200123456789L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val fromLong = Tables.load(spark, dir2, "events")
    assert(fromLong.select("ts").head().getLong(0) === 1704067200123456789L)
  }
}
