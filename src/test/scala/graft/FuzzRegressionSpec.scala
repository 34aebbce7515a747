package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the engine defects the differential fuzz gate
  * (scripts/fuzz_gate.py, FUZZ.md) surfaced in round 15 — each test is
  * the minimal adversarial input that used to crash or silently
  * corrupt a result. The gate itself re-runs whole fixtures; these
  * keep the root causes from regressing without a DuckDB in the loop. */
class FuzzRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def emb(rows: (Long, Seq[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("zero-norm cosine contract: a zero vector scores 0 against " +
    "everything instead of an ANSI divide-by-zero, and never outranks " +
    "a real neighbor") {
    val d = emb(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(0.9f, 0.1f, 0f),
      2L -> Seq(0f, 0f, 0f))
    val top = graft.sim.Similarity.cosineTopK(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // vec 0's best neighbor is 1 (cos ~0.994), the zero vector trails at 0
    val v0 = top.filter(_._1 == 0L).sortBy(_._2)
    assert(v0.head._3 === 1L && v0.head._4 > 0.9)
    assert(v0(1)._3 === 2L && v0(1)._4 === 0.0)
    // the zero vector's own neighbors all score exactly 0
    assert(top.filter(_._1 == 2L).forall(_._4 === 0.0))
  }

  test("NULL embeddings are excluded from every similarity surface " +
    "(prep, kmeans, covariance, hamming) instead of NPEing typed rows") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, Some(Seq(1f, 2f, 3f, 4f))), (1L, None),
      (2L, Some(Seq(4f, 3f, 2f, 1f))))
      .toDF("vec_id", "embedding")
    assert(graft.sim.Similarity.prep(d).count() === 2)
    val km = graft.sim.KMeans.fit(d, k = 8) // also: k clamps to n
    assert(km.assign.count() === 2)
    assert(graft.sim.Quantize.hammingTopK(d, dims = 4, k = 1)
      .filter(col("vec_id") === 1L || col("nb_id") === 1L).count() === 0)
  }

  test("floor(huge double) SATURATES in Spark — longWeight clamps " +
    "before floor so downstream long sums never overflow") {
    val s = spark
    import s.implicits._
    // raw floor saturates silently: the clamp must keep sums finite
    val d = Seq(1e300, -1e300, 25.0, Double.MinPositiveValue)
      .toDF("v")
    val summed = d.agg(sum(graft.ops.Binning.longWeight(
      col("v") * 1000, graft.ops.Binning.MilsClamp))).head().getLong(0)
    assert(summed === 25000L) // +clamp -clamp cancel; tiny floors to 0
  }

  test("weightedEqualBounds: negative weights cross a threshold more " +
    "than once — the bound is the FIRST crossing; null values/weights " +
    "carry nothing; totals accumulate in 128-bit") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1.0, 6.0), (2.0, -5.0), (3.0, 6.0), // cum 6, 1, 7: crosses 50% twice
      (4.0, 1.0),
      (5.0, Double.NaN)).toDF("v", "w")
      .withColumn("w", when(isnan(col("w")), lit(null)).otherwise(col("w")))
      .unionByName(Seq((Option.empty[Double], Option(3.0)))
        .toDF("v", "w"))
    val b = graft.ops.Binning.weightedEqualBounds(d, "v", col("w"), 2)
    // tot = 8, j=1 threshold = 4: running sum 6 -> 1 -> 7 -> 8 crosses
    // it at v=1.0 AND AGAIN at v=3.0 — the bound is the first (min v)
    assert(b === Seq((1, 1.0)))
  }

  test("weightedEqualBounds: zero/negative total mass has no quantile " +
    "axis — engine and oracle both emit NO bounds (r16 ADVICE)") {
    val s = spark
    import s.implicits._
    val zero = Seq((1.0, 0.0), (2.0, 0.0)).toDF("v", "w")
    assert(graft.ops.Binning.weightedEqualBounds(
      zero, "v", col("w"), 4) === Seq.empty)
    val neg = Seq((1.0, 2.0), (2.0, -5.0)).toDF("v", "w")
    assert(graft.ops.Binning.weightedEqualBounds(
      neg, "v", col("w"), 4) === Seq.empty)
  }

  test("KMeans.fit on an empty / all-null-embedding corpus returns the " +
    "empty Fitted instead of crashing MLlib (r16 ADVICE)") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, Option.empty[Seq[Float]]),
      (1L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val km = graft.sim.KMeans.fit(d, k = 4)
    assert(km.assign.count() === 0L)
    assert(km.centroids.isEmpty && km.inertia === 0.0)
  }

  test("TargetEncode: a (cat, fold) cell whose EVERY target is NULL " +
    "carries zero positive mass instead of poisoning enc to the prior " +
    "(r16 fuzz, skew x nulls collapsed a hot key behind one null slice)") {
    val s = spark
    import s.implicits._
    // keys chosen so md5-fold spreads them; cat 'a' has one cell whose
    // only row has a null target — enc for that cell must be the real
    // OOF value (all_pos - 0 + prior*m)/(all_n - fold_n + m), never null
    val d = Seq(
      (1L, "a", Some(1)), (2L, "a", Some(0)), (3L, "a", None),
      (4L, "b", Some(1)), (5L, "b", Some(0)), (6L, "b", Some(1)))
      .toDF("id", "cat", "t")
    val out = graft.ops.TargetEncode.oofMean(d, col("cat"),
      col("t").cast("int"), col("id").cast("string"), folds = 3,
      smoothing = 2.0)
    assert(out.filter(col("enc").isNull).count() === 0L)
    // prior over non-null targets: 3/6 (sum skips the null, count doesn't)
    val prior = 3.0 / 6
    // if row 3's cell is alone in its (cat, fold), its enc is the
    // full-category mass: (1 - 0 + prior*2)/(2 - 1 + 2)
    val r3 = out.filter(col("id") === 3L).head()
    val othersA = out.filter(col("cat") === "a" && col("id") =!= 3L)
      .select("enc").collect().map(_.getDouble(0))
    assert(!r3.isNullAt(r3.fieldIndex("enc")))
    assert((othersA :+ r3.getDouble(r3.fieldIndex("enc")))
      .forall(e => e >= 0.0 && e <= 1.0))
  }

  test("sequence(1, 0) counts DOWN in Spark — scrubs emit empty docs " +
    "unharmed instead of indexing element_at past an empty token array") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, "a b c d e f g h a b c d e f g h"), (1L, ""),
      (2L, "   "), (3L, (null: String))).toDF("doc_id", "text")
    val out = graft.text.TextOps.scrubSelfRepeats(d, k = 4)
    assert(out.count() >= 3) // no crash; empty docs pass through
    assert(out.filter(col("doc_id") === 1L)
      .head().getAs[String]("scrubbed_text") === "")
  }

  test("winsorize keeps nulls null (least/greatest would clamp a " +
    "missing value to the LOW bound)") {
    val s = spark
    import s.implicits._
    val d = Seq(Option(5.0), None, Option(100.0)).toDF("v")
    val out = d.select(
      graft.ops.Normalize.winsorize(col("v"), 1.0, 10.0).as("w"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq === Seq(Some(5.0), None, Some(10.0)))
  }

  test("snapshotDiff: a null-text doc present in both snapshots is " +
    "'unchanged', not 'added' (presence must not ride hash nullability)") {
    val s = spark
    import s.implicits._
    val prev = Seq((1L, (null: String)), (2L, "x")).toDF("doc_id", "text")
    val next = Seq((1L, (null: String)), (2L, "y")).toDF("doc_id", "text")
    val m = graft.text.TextOps.snapshotDiff(prev, next).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("null-text docs produce NO minhash signatures (they used to " +
    "share one constant signature and LSH-pair with each other n²)") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, (null: String)), (2L, (null: String)),
      (3L, "real content words here")).toDF("doc_id", "text")
    assert(graft.text.TextOps.minhash(d).count() === 1)
    assert(graft.text.TextOps
      .lshPairs(graft.text.TextOps.minhash(d)).count() === 0)
  }

  test("SemDedup keeper invariant survives a dup chain deeper than the " +
    "fixed-3-round CC (converging min-label propagation)") {
    val s = spark
    import s.implicits._
    // a 6-link PATH at threshold 0.99: adjacent cosines sit just above
    // it, two-apart just below — component diameter 6 > the old fixed
    // 3 rounds, so the non-converging CC left node 3 both "keeper of
    // 6" and "pruned under 0"
    def v(i: Int): Seq[Float] = {
      val base = Array.fill(8)(0f); base(0) = 1f
      base(1) = i * 0.12f
      base.toSeq
    }
    val d = emb((0 to 6).map(i => i.toLong -> v(i)): _*)
    val pruned = graft.sim.SemDedup.prune(d, threshold = 0.99, nCells0 = 1)
    val prunedIds = pruned.select("vec_id").collect().map(_.getLong(0)).toSet
    val keepers = pruned.select("keep_id").collect().map(_.getLong(0)).toSet
    assert(keepers.intersect(prunedIds).isEmpty,
      s"keepers must never be pruned: $keepers vs $prunedIds")
  }

  test("Pq codebooks record the EFFECTIVE ksub when the sample is " +
    "smaller than nominal — encode/decode stays in bounds") {
    val s = spark
    import s.implicits._
    val d = emb((0L to 4L).map(i =>
      i -> Seq.tabulate(8)(j => (i + j).toFloat)): _*)
    val v = graft.sim.Similarity.prep(d)
    val cb = graft.sim.Pq.train(v, m = 2, ksub = 16, iters = 2)
    assert(cb.ksub === 5)
    assert(graft.sim.Pq.encode(v, cb).count() === 5)
  }

  test("training ignores rows with NULL labels or non-finite features " +
    "instead of aborting the fit") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1.0, 1e300, Option(true)), (2.0, 2.0, Option(false)),
      (3.0, Double.PositiveInfinity, Option(true)),
      (4.0, 4.0, Option.empty[Boolean]),
      (1.5, 1.0, Option(true)), (2.5, 3.0, Option(false)),
      (1.2, 1.0, Option(true)), (2.2, 3.0, Option(false)),
      (1.7, 1.0, Option(true)), (2.7, 3.0, Option(false)))
      .toDF("a", "b", "tag")
    val t = graft.train.Train.logistic(d, Seq("a", "b"),
      col("tag") === true, maxIter = 5)
    assert(!t.auc.isNaN)
  }

  test("A-ES weighted sampling: non-positive weights get key 0 — never " +
    "a crash (w=0) and never the 1/u inversion that outranks " +
    "everything (w<0)") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "g", 100L), (2L, "g", 0L), (3L, "g", -50L),
      (4L, "g", 80L)).toDF("id", "grp", "w")
    val top = graft.ops.TemporalJoin.weightedSample(
      d, col("grp"), col("id"), col("w"), k = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // the two positive-weight ids rank first; zero/negative trail at 0
    assert(top.take(2).map(_._2).toSet === Set(1L, 4L))
    assert(top.drop(2).forall(_._3 === 0.0))
  }

  // ---- round-16 NaN gate (scripts/nan_gate.py): non-finite inputs must
  // degrade to NaN/NULL/excluded rows, never throw -----------------------

  test("kmeans excludes non-finite vectors (MLlib's fit asserts " +
    "finiteness) and still clusters the finite rest") {
    val d = emb(
      0L -> Seq(1f, 0f), 1L -> Seq(Float.NaN, 1f),
      2L -> Seq(Float.PositiveInfinity, 0f), 3L -> Seq(0f, 1f))
    val f = graft.sim.KMeans.fit(d, k = 2)
    assert(f.assign.select("vec_id").collect()
      .map(_.getLong(0)).toSet === Set(0L, 3L))
  }

  test("covariance passes a non-finite co-moment through as NaN " +
    "instead of crashing BigDecimal rounding") {
    val d = emb(0L -> Seq(1f, Float.NaN), 1L -> Seq(2f, 1f),
      2L -> Seq(3f, 2f))
    val cov = graft.sim.Pca.covariance(d, dims = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cov((0L, 0L)) === 1.0) // finite column stays exact
    assert(cov((1L, 1L)).isNaN && cov((0L, 1L)).isNaN)
  }

  test("isotonic calibration: ±Infinity scores are uncalibratable — " +
    "excluded from the fit, calibrated to NULL on apply (the MLlib " +
    "assembler used to abort the whole pass)") {
    val s = spark
    import s.implicits._
    val d = Seq((1.0, 1), (2.0, 0), (1.5, 1), (2.5, 0),
      (Double.PositiveInfinity, 1), (Double.NegativeInfinity, 0),
      (Double.NaN, 1)).toDF("s", "y")
    val m = graft.train.Calibrate.isotonicFit(d, col("s"), col("y") === 1)
    val out = graft.train.Calibrate(d, col("s"), m)
    assert(out.filter(col("calibrated").isNotNull).count() === 4L)
    assert(out.count() === 7L) // non-finite rows survive with NULL
  }

  test("streaming as-of state: a non-finite purchase value passes " +
    "through un-rounded (like Spark's round) instead of crashing the " +
    "flatMapGroupsWithState function") {
    val (out, st) = graft.streaming.StreamOps.asOfGroup(1L, Vector(
      (1L, 10L, 1L, "purchase", Double.PositiveInfinity),
      (2L, 20L, 1L, "click", 0.0),
      (3L, 30L, 1L, "purchase", Double.NaN),
      (4L, 40L, 1L, "view", 0.0)), None)
    assert(out.map(_._1) === Vector(2L, 4L))
    assert(out(0)._3.contains(Double.PositiveInfinity))
    assert(out(1)._3.exists(_.isNaN))
    assert(st.exists(_.value.isNaN)) // newest purchase won the state
  }

  test("dlit renders non-finite driver-collected bounds as parseable " +
    "SQL casts — \"InfinityD\" used to resolve as a column reference") {
    assert(QueryUtil.dlit(1.5) === "1.5D")
    val r = spark.range(1).selectExpr(
      s"${QueryUtil.dlit(Double.NaN)} AS a",
      s"${QueryUtil.dlit(Double.PositiveInfinity)} AS b",
      s"${QueryUtil.dlit(Double.NegativeInfinity)} AS c").head()
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1) === Double.PositiveInfinity)
    assert(r.getDouble(2) === Double.NegativeInfinity)
  }
}
