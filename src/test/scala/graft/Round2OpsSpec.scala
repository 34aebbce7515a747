package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.agg.TopKAgg
import graft.eval.Eval
import graft.sim.Similarity

/** Round-2 operators: bounded top-k aggregator, PR AUC, weighted sweep,
  * embedding near-dup dedup. */
class Round2OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("TopKAgg keeps k best by (score desc, id asc), partial-merge safe") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0.9, 10L), (1L, 0.7, 11L), (1L, 0.9, 9L), (1L, 0.95, 12L),
      (1L, 0.1, 13L), (2L, 0.5, 20L))
      .toDF("g", "score", "id").repartition(4) // force partial buffers
    val out = rows.groupBy("g")
      .agg(TopKAgg.topK(3)(col("score"), col("id")).as("nn"))
      .select(col("g"), posexplode(col("nn")).as(Seq("p", "nb")))
      .select(col("g"), col("p"), col("nb._1").as("s"), col("nb._2").as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out === Array(
      (1L, 0, 0.95, 12L), (1L, 1, 0.9, 9L), (1L, 2, 0.9, 10L),
      (2L, 0, 0.5, 20L)))
  }

  test("weightedSweep: weighted duals consistent with unweighted on w=1") {
    import spark.implicits._
    val d = (1 to 40).map(i => (i.toLong, i % 4 == 0)).toDF("id", "pos")
    val sw = Eval.weightedSweep(d, col("id").cast("double"), col("pos"),
      lit(1.0), Seq(col("id")), 4).orderBy("bucket").collect()
    sw.foreach { r =>
      assert(r.getAs[Double]("wtp") === r.getAs[Long]("tp").toDouble)
      assert(r.getAs[Double]("wfp") === r.getAs[Long]("fp").toDouble)
    }
  }

  test("prAuc: perfect ranking gives PR AUC 1") {
    import spark.implicits._
    val d = (1 to 100).map(i => (i.toLong, i <= 20)).toDF("id", "pos")
    // score descending with id: positives (ids 1..20) rank first
    val sweep = Eval.confusionSweep(d, (lit(1000) - col("id")).cast("double"),
      col("pos"), Seq(col("id")), 10)
    val auc = Eval.prAuc(sweep).head().getDouble(0)
    assert(auc === 1.0)
  }

  test("weightedEqualBounds: hand-computed thresholds on integer weights") {
    import spark.implicits._
    // values 1..4 with weights 1,2,3,4 (tot=10), k=2: threshold j=1 at
    // cw*2 >= 10 → first v with cw >= 5 → v=3 (cw=6)
    val d = Seq((1.0, 1), (2.0, 2), (3.0, 3), (4.0, 4)).toDF("v", "w")
    val b = graft.ops.Binning.weightedEqualBounds(d, "v", col("w"), 2)
    assert(b === Seq((1, 3.0)))
    // k=4: thresholds at cw>=2.5,5,7.5 → v=2 (cw=3), v=3 (cw=6), v=4 (cw=10)
    val b4 = graft.ops.Binning.weightedEqualBounds(d, "v", col("w"), 4)
    assert(b4 === Seq((1, 2.0), (2, 3.0), (3, 4.0)))
  }

  test("streaming PSI equals batch PSI on the same frozen bins") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamOps.psiWindows(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val events = Tables.load(spark, dir, "events")
    val Array(mn, mx) = events.agg(min("value"), max("value")).head()
      .toSeq.map(_.asInstanceOf[Double]).toArray
    val batch = graft.ops.Psi.compute(events, col("value"),
      date_format(timestamp_millis(expr("ts div 1000000")), "yyyy-MM-dd HH:00"),
      graft.ops.Binning.equalInterval(mn, mx, 10))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(streamed.size === batch.size)
    streamed.foreach { case (hr, psi) =>
      assert(math.abs(psi - batch(hr)) < 1e-9, s"hour $hr")
    }
  }

  test("readGuarded drops malformed rows and reports them via observe") {
    import spark.implicits._
    val tmp = s"/tmp/graft_guard_spec_${java.util.UUID.randomUUID()}"
    Seq("1|a|x", "2|b|y", "3|c", "4|d|z|EXTRA", "5|e|w")
      .toDF("value").write.text(tmp)
    // isolated session: a registered Observation poisons closure
    // serialization for every later job on the owning session (see
    // build.sbt note); newSession() gives a private ObservationManager
    val s2 = spark.newSession()
    val obs = new org.apache.spark.sql.Observation()
    val df = graft.sources.Delimited.readGuarded(s2, tmp, "|",
      Seq("id", "s", "t"), Some(obs))
    assert(df.count() === 3)
    val m = obs.get
    assert(m("malformed_cnt") === 2L)
    assert(m("total_cnt") === 5L)
  }

  test("linear model export/import round-trips exactly and scores equal") {
    import spark.implicits._
    val models = Seq(
      graft.score.Score.LinearModel(
        Seq("a" -> 0.12345678901234567, "b" -> -3.5e-7), 0.25),
      graft.score.Score.LinearModel(Seq("a" -> 1.5, "b" -> 2.5), -1.0))
    val back = graft.score.Score.importJson(
      graft.score.Score.exportJson(models))
    assert(back === models)
    // a column name carrying a quote and a backslash must survive the
    // JSON round trip (the unescaped interpolation emitted bad JSON)
    val hostile = Seq(graft.score.Score.LinearModel(
      Seq("txn\"usd\\x" -> 0.5), 0.1))
    assert(graft.score.Score.importJson(
      graft.score.Score.exportJson(hostile)) === hostile)
    // control characters (newline/tab/U+0001) must also survive —
    // jesc previously passed them through raw, emitting invalid JSON
    val ctl = Seq(graft.score.Score.LinearModel(
      Seq("a\nb\tc\u0001d" -> -2.5), 0.0))
    assert(graft.score.Score.importJson(
      graft.score.Score.exportJson(ctl)) === ctl)
    val d = Seq((1.0, 2.0), (-0.5, 3.5)).toDF("a", "b")
    val s1 = d.select(models.head.score.as("s")).collect().map(_.getDouble(0))
    val s2 = d.select(back.head.score.as("s")).collect().map(_.getDouble(0))
    assert(s1.toSeq === s2.toSeq)
  }

  test("nearDupPairs finds planted near-duplicates") {
    import spark.implicits._
    val dim = 64
    val base = Array.tabulate(dim)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val far = Array.tabulate(dim)(i => math.cos(3 * i + 2).toFloat * (if (i % 2 == 0) 1 else -1))
    val emb = Seq((0L, base), (1L, near), (2L, far))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(emb, 0.99)
      .select("keep_id", "dup_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)))
  }
}
