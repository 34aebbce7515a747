package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 second batch: ORC round-trip + pushdown, exact-k stratum
  * sampling, embedding pooling, MMR re-ranking, isotonic calibration. */
class Round8bOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ORC round-trip preserves values and pushes filters into the scan") {
    import spark.implicits._
    val d = Seq((1L, 10.0, "A"), (2L, 30.0, "B"), (3L, 50.0, "A"))
      .toDF("id", "qty", "flag")
    val tmp = s"/tmp/graft_orc_spec_${java.util.UUID.randomUUID()}"
    graft.sources.Columnar.writeOrc(d, tmp)
    val back = graft.sources.Columnar.readOrc(spark, tmp)
      .filter(col("qty") > 25)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    // the filter must reach the ORC scan as a pushed predicate, and the
    // projection must prune to the read schema — both are what make a
    // 100 TB ORC corpus scan stripe-skippable
    val plan = back.select("id").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"expected pushed qty>25 in ORC scan:\n$plan")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("sample_group_k: exactly min(k, |stratum|) rows per stratum, " +
    "deterministic across runs, via bounded TopK partial aggregation") {
    import spark.implicits._
    val docs = (1L to 97L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("doc_id", "source")
    def pick(k: Int) = docs
      .select(col("source"),
        concat(md5(col("doc_id").cast("string").cast("binary")),
          lit("|"), col("doc_id").cast("string")).as("key"))
      .groupBy("source")
      .agg(graft.agg.TopKStrAgg.topK(k)(lit(0.0), col("key")).as("ks"))
      .select(col("source"), explode(col("ks")).as("kv"))
      .select(col("source"),
        split(col("kv._2"), "\\|").getItem(1).cast("long").as("doc_id"))
    val got = pick(10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.groupBy(_._1).view.mapValues(_.length).toMap ===
      Map("a" -> 10, "b" -> 10, "c" -> 10))
    // k above the stratum size returns the whole stratum, no padding
    val all = pick(1000).collect()
    assert(all.length === 97)
    // determinism: same picks on a differently-partitioned input
    val got2 = pick(10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sorted.toSeq === got2.sorted.toSeq)
  }

  test("embed pooling: bit-exact mean of chunk embeddings per group") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 4.0f)),
      (10L, Array(5.0f, 6.0f))).toDF("vec_id", "embedding")
    val got = emb
      .select(expr("vec_id div 10").as("gid"), col("vec_id"),
        posexplode(expr("transform(embedding, x -> cast(x AS double))"))
          .as(Seq("pos", "x")))
      .groupBy("gid", "pos")
      .agg(count(lit(1)).as("n"),
        expr("""aggregate(array_sort(collect_list(struct(vec_id, x))),
              |  cast(0.0 AS double), (acc, p) -> acc + p.x)"""
          .stripMargin).as("sm"))
      .select(col("gid"), col("pos"), (col("sm") / col("n")).as("m"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    assert(got === Map((0L, 0) -> 2.0, (0L, 1) -> 3.0,
      (1L, 0) -> 5.0, (1L, 1) -> 6.0))
  }

  test("MMR re-rank prefers a diverse pick over a redundant higher-rel one") {
    import spark.implicits._
    // query q = (1, 0, 0, ...). a and a2 are near-identical high-rel
    // vectors (sim ~0.9998); b is half-relevant but diverse (sim ~0.5).
    // Pure relevance ranks (a, a2); at lambda=0.5 the redundancy
    // penalty (0.5*0.9998 vs 0.5*0.5) flips rank 2 to b:
    //   a2: 0.5*0.9926 - 0.5*0.9998 = -0.0036
    //   b : 0.5*0.5026 - 0.5*0.5001 = +0.0013
    def v(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(64 - xs.length)(0.0)).map(_.toFloat).toArray
    val emb = Seq(
      (0L, v(1.0)),              // the query vector
      (1L, v(0.99, 0.1)),        // a
      (2L, v(0.98, 0.12)),       // a2 ~ a
      (3L, v(0.5, 0.0, 0.86))    // b, diverse
    ).toDF("vec_id", "embedding")
    val got = graft.sim.Mmr.mmrTopK(emb, queryId = 0L, nCand = 3, k = 2,
        lambda = 0.5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1L, 3L),
      s"expected diverse pick (1, 3), got $got")
    // and the rank-1 pick is always the pure-relevance argmax
    assert(got.head === 1L)
  }

  test("Misra-Gries: guarantee holds under adversarial order and merges") {
    import spark.implicits._
    // 3 heavy items among 60 distinct light ones, k=8 counters, shuffled
    // across 4 partitions so the PODS'12 merge path runs
    val items = (Seq.fill(500)("heavy_a") ++ Seq.fill(300)("heavy_b") ++
      Seq.fill(200)("heavy_c") ++
      (1 to 60).flatMap(i => Seq.fill(5)(s"light_$i")))
    val n = items.length.toLong
    val k = 8
    val shuffled = new scala.util.Random(7).shuffle(items)
    val df = shuffled.toDF("t").repartition(4)
    // null items must be gated, not become null Map keys that fail
    // the buffer encoder at the partial-agg shuffle
    val withNulls = df.union(Seq.fill(5)(null: String).toDF("t"))
    val nn = withNulls.agg(graft.agg.MisraGries.sketch(k)(col("t")).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e._1"))
      .collect().map(_.getString(0))
    assert(!nn.contains(null), "null never enters the sketch")
    val got = df.agg(graft.agg.MisraGries.sketch(k)(col("t")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1"), col("e._2"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val truth = items.groupBy(identity).view.mapValues(_.length.toLong)
    val eps = n / (k + 1) // 1300/9 = 144
    assert(got.size <= k)
    // every item with true count > n/(k+1) is present
    for ((t, c) <- truth if c > eps) assert(got.contains(t), s"missing $t")
    // estimates bounded: truth - eps <= est <= truth
    for ((t, e) <- got) {
      assert(e <= truth(t), s"$t overestimated: $e > ${truth(t)}")
      assert(e >= truth(t) - eps, s"$t undershot: $e < ${truth(t)} - $eps")
    }
  }

  test("selectTopMassBySource: budgets are independent per source") {
    import spark.implicits._
    // source A has huge high-score mass; source B's docs must still be
    // selected under B's own budget
    val docs = Seq(
      (1L, "A", 0.9, 5000L), (2L, "A", 0.8, 4000L), (3L, "A", 0.7, 3000L),
      (4L, "B", 0.6, 100L), (5L, "B", 0.5, 200L), (6L, "B", 0.1, 9999L)
    ).toDF("doc_id", "source", "score", "n_tokens")
    val got = graft.text.TextOps.selectTopMassBySource(
      docs, col("score"), col("n_tokens"), budgetPerSource = 9000L)
      .collect().map(_.getLong(0)).sorted.toSeq
    // A: 5000+4000=9000 fits, +3000 would not -> docs 1,2
    // B: 100+200 fits, 9999 busts -> docs 4,5 (A's mass doesn't matter)
    assert(got === Seq(1L, 2L, 4L, 5L))
  }

  test("StreamStats: merged streaming catalog equals the batch profile") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (1 to 300).map(i =>
      (i.toDouble % 37, if (i % 5 == 0) "R" else "N"))
    val batchDf = rows.toDF("x", "flag")
    val whole = graft.ops.StatsPipeline.profileNumeric(
      batchDf, Seq("x"), col("flag") === "R")
    val bounds = Map("x" -> (whole("x").binning.binBoundary: Seq[Double]))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Double, String)]
    rows.grouped(100).foreach(g => ms.addData(g))
    val (q, get, nb) = graft.streaming.StreamStats.maintainNumericCounted(
      ms.toDF().toDF("x", "flag"), Seq("x"), col("flag") === "R", bounds)
    q.processAllAvailable()
    q.stop()
    val m = get()("x")
    val w = whole("x")
    assert(nb() >= 1)
    assert(m.stats.totalCount === w.stats.totalCount)
    assert(m.binning.binCountPos === w.binning.binCountPos)
    assert(m.binning.binCountNeg === w.binning.binCountNeg)
    assert(m.stats.ks === w.stats.ks && m.stats.iv === w.stats.iv)
    assert(math.abs(m.stats.mean.get - w.stats.mean.get) < 1e-9)
  }

  test("maintainTopK: streamed MG sketch keeps the planted heavy item " +
    "with valid bounds across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val items = Seq.fill(400)("heavy") ++
      (1 to 50).flatMap(i => Seq.fill(4)(s"light_$i"))
    val shuffled = new scala.util.Random(3).shuffle(items)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    shuffled.grouped(200).foreach(g => ms.addData(g))
    val (q, get) = graft.streaming.StreamStats.maintainTopK(
      ms.toDF().toDF("t"), col("t"), k = 6)
    q.processAllAvailable()
    q.stop()
    val got = get().toMap
    val n = items.length
    assert(got.size <= 6)
    assert(got.contains("heavy"), s"heavy item lost across batches: $got")
    assert(got("heavy") <= 400 && got("heavy") >= 400 - n / 7)
  }

  test("PQ: planted prototypes share codes; ADC ranks the query's own " +
    "prototype group first") {
    import spark.implicits._
    // 4 prototypes far apart in 64-dim; 5 vectors per prototype with tiny
    // deterministic jitter. ksub=4 per subspace is enough to separate.
    def proto(p: Int): Array[Double] =
      Array.tabulate(64)(i => if (i % 4 == p) 10.0 else 0.0)
    // interleaved ids (id % 4 = prototype) so the deterministic seeds —
    // the first ksub subvectors in vec_id order — span all 4 prototypes
    val vecs = for (p <- 0 until 4; r <- 0 until 5) yield {
      val e = proto(p).clone()
      e(p) += 0.01 * r // jitter that k-means noise-floors away
      ((r * 4 + p).toLong, e.map(_.toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val v = graft.sim.Similarity.prep(emb)
    val cb = graft.sim.Pq.train(v, m = 8, ksub = 4, nHint = vecs.length)
    val codes = graft.sim.Pq.encode(v, cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toVector)).toMap
    // same prototype -> same code word in every subspace
    for (p <- 0 until 4; r <- 1 until 5)
      assert(codes(p.toLong) === codes((r * 4 + p).toLong),
        s"prototype $p member $r diverged")
    // different prototypes -> different codes
    assert(codes(0L) !== codes(1L))
    // ADC from vec 0 (prototype 0): its 4 groupmates fill the top-4
    val top = graft.sim.Pq.adcTopK(emb, queryId = 0L, k = 4, m = 8,
      ksub = 4).collect().map(_.getLong(1)).toSet
    assert(top === Set(4L, 8L, 12L, 16L),
      s"expected prototype-0 group, $top")
  }

  test("Fuzzy.editDistance1Pairs: substitution + insertion found, " +
    "distance-2 excluded, bucket cap honored") {
    import spark.implicits._
    val terms = Seq("kitten", "mitten", "kittens", "mutton", "dog")
      .toDF("t")
    val got = graft.text.Fuzzy.editDistance1Pairs(terms)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // kitten~mitten: substitution; kitten~kittens: insertion;
    // mitten~kittens would be distance 2; mutton is distance 2 from
    // mitten (u/i + o/e), dog unrelated
    assert(got === Set(("kitten", "kittens"), ("kitten", "mitten")))
    // a bucket cap of 1 suppresses every pair (skew guard semantics)
    assert(graft.text.Fuzzy.editDistance1Pairs(terms, bucketCap = 1)
      .count() === 0)
  }

  test("scrubSelfRepeats: second occurrence of an in-doc chorus is cut, " +
    "first kept; singleton docs untouched") {
    import spark.implicits._
    val chorus = "a b c d e f g h" // exactly k=8 tokens
    val docs = Seq(
      (1L, s"$chorus x y z $chorus"),      // repeated chorus
      (2L, s"$chorus only once here")      // no repeat
    ).toDF("doc_id", "text")
    val got = graft.text.TextOps.scrubSelfRepeats(docs, k = 8)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1: 19 tokens, second chorus (8 tokens) removed
    assert(got(1L) === ((19L, 8L, s"$chorus x y z")))
    // doc 2: untouched
    assert(got(2L) === ((11L, 0L, s"$chorus only once here")))
  }

  test("hardNegatives: positives scrubbed, ranks dense, one corpus scan " +
    "worth of candidates per query") {
    import spark.implicits._
    val docs = Seq(
      (1L, "merge merge merge"),   // top for 'merge', a positive
      (2L, "merge merge fast"),
      (3L, "merge slow"),
      (4L, "slow other words"),
      (5L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val pos = Seq((7L, 1L)).toDF("query_id", "doc_id")
    val got = graft.text.Retrieval.hardNegatives(
      docs, Seq((7L, Seq("merge"))), pos, k = 2, headroom = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    // doc 1 (the positive) is excluded even though it scores highest;
    // the two next-best 'merge' docs fill ranks 1..2
    assert(got.toSeq === Seq((1, 2L), (2, 3L)))
  }

  test("IVFADC: residual-PQ search finds the query's prototype group") {
    import spark.implicits._
    def proto(p: Int): Array[Double] =
      Array.tabulate(64)(i => if (i % 4 == p) 10.0 else 0.0)
    val vecs = for (p <- 0 until 4; r <- 0 until 5) yield {
      val e = proto(p).clone()
      e(p) += 0.01 * r
      ((r * 4 + p).toLong, e.map(_.toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    // 4 coarse cells (one per prototype given interleaved seed order),
    // nProbe=1: the probed cell IS the query's prototype cluster
    val top = graft.sim.Pq.ivfadcTopK(emb, queryId = 0L, k = 4,
      nCells0 = 4, nProbe = 1, m = 8, ksub = 4)
      .collect().map(_.getLong(1)).toSet
    assert(top === Set(4L, 8L, 12L, 16L),
      s"expected prototype-0 groupmates, got $top")
  }

  test("isotonic calibration reproduces the hand-computed PAV solution") {
    import spark.implicits._
    // scores 1..4 with labels 0,1,0,1: PAV pools the violating middle
    // pair -> predictions (0, 0.5, 0.5, 1)
    val d = Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)).toDF("s", "y")
    val m = graft.train.Calibrate.isotonicFit(d, col("s"), col("y") === 1)
    assert(m.predictions.toArray.toSeq === Seq(0.0, 0.5, 0.5, 1.0))
    val applied = graft.train.Calibrate(d, col("s"), m)
      .select("s", "calibrated").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(applied(1.0) === 0.0 && applied(4.0) === 1.0)
    assert(applied(2.0) === 0.5 && applied(3.0) === 0.5)
  }
}
