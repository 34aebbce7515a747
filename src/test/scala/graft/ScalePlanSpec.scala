package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.{Ivf, Similarity}
import graft.text.TextOps

/** At-scale plan hygiene for the ANN/dedup family (round-2 verdict item 1):
  * the O(n) vector/size tables must NOT be force-broadcast — with the
  * broadcast threshold disabled, the executed plans must contain no
  * BroadcastExchange at all, proving the engine (not a hint) chooses the
  * strategy, so at 10⁹ vectors the joins key on the id instead of pulling
  * the corpus through the driver. Item 3: the jaccard df cap keeps one hot
  * shingle from emitting ~df² candidate pairs. */
class ScalePlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embFixture(n: Int): DataFrame = {
    import spark.implicits._
    // deterministic pseudo-random 64-dim float vectors
    (0 until n).map { i =>
      val a = Array.tabulate(64) { d =>
        (math.sin(i * 131.0 + d * 17.0) * 10).toFloat
      }
      (i.toLong, a)
    }.toDF("vec_id", "embedding")
  }

  /** Runs `df` with auto-broadcast disabled and returns the FINAL (post-AQE)
    * plan string. */
  private def finalPlanNoBroadcast(mk: => DataFrame): (String, Long) = {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe =
      conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = mk
      val n = df.count()
      (df.queryExecution.executedPlan.toString, n)
    } finally {
      saved.foreach(conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      savedAqe.foreach(
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      if (saved.isEmpty) conf.unset("spark.sql.autoBroadcastJoinThreshold")
      if (savedAqe.isEmpty)
        conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("cosineTopK / hammingTopK respread the n² stream side: the plan " +
    "carries a RoundRobin exchange (NLJ parallelism = stream partitions " +
    "— the single-split landmine the 10x soak caught)") {
    val emb = embFixture(300)
    val cosPlan = Similarity.cosineTopK(emb, 3)
      .queryExecution.executedPlan.toString
    assert(cosPlan.contains("RoundRobinPartitioning"),
      s"cosineTopK lost its stream-side respread:\n$cosPlan")
    val hamPlan = graft.sim.Quantize.hammingTopK(emb, dims = 64, k = 3)
      .queryExecution.executedPlan.toString
    assert(hamPlan.contains("RoundRobinPartitioning"),
      s"hammingTopK lost its stream-side respread:\n$hamPlan")
  }

  test("annTopK: no BroadcastExchange when threshold disabled") {
    val (plan, n) = finalPlanNoBroadcast(Similarity.annTopK(embFixture(300), 3))
    assert(!plan.contains("BroadcastExchange"),
      s"vector re-attach was force-broadcast:\n$plan")
    assert(n > 0)
  }

  test("nearDupPairs: no BroadcastExchange when threshold disabled") {
    val (plan, _) =
      finalPlanNoBroadcast(Similarity.nearDupPairs(embFixture(300), 0.2))
    assert(!plan.contains("BroadcastExchange"),
      s"vector re-attach was force-broadcast:\n$plan")
  }

  test("ivfTopK: no BroadcastExchange when threshold disabled") {
    // IVF legitimately broadcasts the CENTROIDS via sparkContext.broadcast
    // (not a SQL BroadcastExchange); the vector re-attach must not hint
    val (plan, n) =
      finalPlanNoBroadcast(Ivf.ivfTopK(embFixture(300), 3, nCells0 = 4))
    assert(!plan.contains("BroadcastExchange"),
      s"vector re-attach was force-broadcast:\n$plan")
    assert(n > 0)
  }

  test("jaccardPairs: no BroadcastExchange when threshold disabled") {
    import spark.implicits._
    val docs = (0 until 50).map { i =>
      (i.toLong, s"alpha beta w$i x$i y$i z${i % 7} end")
    }.toDF("doc_id", "text")
    val (plan, _) = finalPlanNoBroadcast(TextOps.jaccardPairs(docs, 0.5))
    assert(!plan.contains("BroadcastExchange"),
      s"size/hot-set join was force-broadcast:\n$plan")
  }

  test("jaccardPairs df cap: one hot shingle in 2000 docs emits no pairs") {
    import spark.implicits._
    // every doc shares the shingle "common stop words"; tails are unique.
    // Without the cap this key alone would emit ~2·10⁶ candidate pairs.
    val skewed = (0 until 2000).map { i =>
      (i.toLong, s"common stop words unique$i tail$i")
    }
    // plus one genuine near-dup pair with all-rare shingles
    val dups = Seq(
      (9001L, "alpha beta gamma delta epsilon zeta"),
      (9002L, "alpha beta gamma delta epsilon zeta"))
    val docs = (skewed ++ dups).toDF("doc_id", "text")
    val got = TextOps.jaccardPairs(docs, 0.5, dfCap = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((9001L, 9002L)),
      "df cap must suppress hot-shingle pairs but keep rare-shingle dups")
  }

  test("simhashPairs bucket cap: a degenerate hot bucket emits no pairs") {
    import spark.implicits._
    // 500 identical docs land in the same (band, value) bucket in all four
    // bands — uncapped, that one bucket alone emits ~1.2·10⁵ pairs (the
    // round-3 scale-killer shape); the cap must suppress it while keeping
    // the small genuine near-dup bucket.
    val hot = (0 until 500).map(i =>
      (i.toLong, "the exact same boilerplate text repeated everywhere"))
    val dups = Seq(
      (9001L, "alpha beta gamma delta epsilon zeta"),
      (9002L, "alpha beta gamma delta epsilon zeta"))
    val docs = (hot ++ dups).toDF("doc_id", "text")
    val got = TextOps.simhashPairs(docs, maxHamming = 3, maxBucket = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((9001L, 9002L)),
      "bucket cap must suppress the hot fingerprint but keep rare dups")
  }

  test("profileNumeric(full=true) is exactly TWO scans regardless of " +
    "column count: one wide agg pass + one stacked bin-count pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(37)
    val cols = (1 to 12).map(i => s"c$i")
    val df = (1 to 2000).map { _ =>
      (rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble(),
        rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble(),
        rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble(),
        rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble())
    }.toDF(cols: _*).withColumn("pos", rand(11) > 0.5)
    // materialize to parquet so task input metrics count source rows
    val tmp = java.nio.file.Files.createTempDirectory("graft_twoscan").toString
    df.write.mode("overwrite").parquet(tmp)
    val src = spark.read.parquet(tmp)
    val rowsRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null)
          rowsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val profiles = graft.ops.StatsPipeline.profileNumeric(
        src, cols, col("pos"), full = true)
      // listener events are async; the actions have returned, give the
      // bus a beat to drain
      Thread.sleep(1000)
      assert(profiles.size === 12)
      // exactly TWO source scans — full-stats agg + stacked bin counts.
      // A per-column implementation would read 12x+ here and O(k) scans
      // of 100 TB in production
      assert(rowsRead.get() === 2L * 2000,
        s"expected 2 scans x 2000 rows, saw ${rowsRead.get()} records read")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("filters and projection push down into the parquet scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_push").toString
    (1 to 1000).map(i => (i.toLong, i * 2.0, s"s$i", i % 7, i * 1.1))
      .toDF("a", "b", "c", "d", "e")
      .write.mode("overwrite").parquet(tmp)
    val q = spark.read.parquet(tmp)
      .filter(col("b") > 100.0).select("a", "b")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(b), GreaterThan(b,100.0)]"),
      s"filter not pushed to scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<a:bigint,b:double>"),
      s"projection not pruned at scan:\n$plan")
    assert(q.count() === 950)
  }

  test("scrubPii masks all three kinds and counts the originals") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a.b+c@x.co.uk and b@y.io phone 555-123-4567 ssn 123-45-6789"),
      (2L, "clean text no pii at all")).toDF("doc_id", "text")
    val got = TextOps.scrubPii(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_email") === 2)
    assert(got(1L).getAs[Long]("n_phone") === 1)
    assert(got(1L).getAs[Long]("n_ssn") === 1)
    val clean = got(1L).getAs[String]("clean_text")
    assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>") &&
      clean.contains("<SSN>"))
    assert(!clean.contains("@") && !clean.contains("555-123-4567"))
    assert(got(2L).getAs[String]("clean_text") === "clean text no pii at all")
  }

  test("repetition: looping text scores near 1, diverse text near 0") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq.fill(50)("buy now").mkString(" ")), // one bigram dominates
      (2L, (1 to 100).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextOps.repetition(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("top_bigram_share")).toMap
    assert(got(1L) > 0.49, s"looping doc share=${got(1L)}")
    assert(got(2L) < 0.02, s"diverse doc share=${got(2L)}")
  }

  test("dedupClusters: transitive chain collapses to one min-labeled cluster") {
    import spark.implicits._
    // chain 1~2~3~4 (diameter 3) + separate pair 10~11 + clique 20,21,22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L), (21L, 22L)).toDF("doc_a", "doc_b")
    val got = TextOps.dedupClusters(pairs, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(got(10L) === 10L && got(11L) === 10L)
    assert(Seq(20L, 21L, 22L).forall(got(_) == 20L))
  }

  test("HLL distinct path: within rsd bound and same typing decisions") {
    // the scale path for autotype distinct counts (approx_count_distinct =
    // HyperLogLog++): no oracle possible (engines' sketches differ), so
    // the contract is spec-asserted — estimate within ~3×rsd of exact,
    // and the downstream col_kind decision unchanged
    import spark.implicits._
    val d = (1 to 60000).map(i =>
      (i % 20000, s"cat_${i % 37}", i * 0.5)).toDF("hi_card", "lo_card", "num")
    val cols = Seq("hi_card", "lo_card", "num")
    val exact = graft.ops.AutoType.profile(d, cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(5))).toMap
    val approx = graft.ops.AutoType.profile(d, cols, approxDistinct = true)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(5))).toMap
    cols.foreach { c =>
      val (ne, ke) = exact(c)
      val (na, ka) = approx(c)
      assert(math.abs(na - ne).toDouble / ne <= 0.06,
        s"$c: approx $na vs exact $ne")
      assert(ka === ke, s"$c: typing decision changed")
    }
  }

  test("contamination: zero shuffle exchanges — a pure narrow map") {
    import spark.implicits._
    val docs = (1 to 40).map(i => (i.toLong, s"alpha beta gamma tail$i"))
      .toDF("doc_id", "text")
    val plan = TextOps.contamination(docs, Seq("alpha beta gamma"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange "),
      s"contamination should never shuffle:\n$plan")
  }

  test("jaccardPairs df cap: capped hot shingle lowers jaccard, full sizes") {
    import spark.implicits._
    // docs share 'a b c' (hot at cap=1) and each has 3 more shingles;
    // capping drops the shared shingle from pairing only — sizes stay full
    val docs = Seq(
      (1L, "a b c p q r"), // shingles: abc, bcp, cpq, pqr
      (2L, "a b c p q r"),
      (3L, "a b c x y z")).toDF("doc_id", "text")
    val capped = TextOps.jaccardPairs(docs, 0.1, dfCap = 2)
      .select("doc_a", "doc_b", "inter").as[(Long, Long, Long)]
      .collect().toSet
    // 'a b c' df=3 > 2 → dropped; docs 1,2 still share bcp,cpq,pqr →
    // inter=3, jaccard = 3/(4+4-3) = 0.6; doc 3 pairs with nothing
    assert(capped === Set((1L, 2L, 3L)))
  }

  test("unigramLogprob capped path: bounded top-k, no single-partition " +
    "window rank (round-6 verdict item 1)") {
    import spark.implicits._
    val docs = (1 to 60).map(i => (i.toLong,
      s"the quick fox tok$i jumps tok${i % 7}")).toDF("doc_id", "text")
    val df = TextOps.unigramLogprob(docs, vocabCap = Some(5))
    val plan = df.queryExecution.executedPlan.toString
    // the cap cut must be a distributed bounded top-k, never a global
    // row_number() window (which sorts the whole vocab in ONE task)
    assert(!plan.contains("Window"),
      s"capped vocab rank went through a window operator:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a bounded top-k (TakeOrderedAndProject):\n$plan")
    assert(df.count() === 60)
  }
}
