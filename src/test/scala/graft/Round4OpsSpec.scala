package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operator specs: PMML export/import for NN (MLP) and tree
  * models, with bit-exact round-trips and score parity against MLlib's
  * own transform (which proves the weight-layout extraction, not just the
  * serialization). */
class Round4OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    val s = spark
    import s.implicits._
    (1 to 400).map { i =>
      val x1 = (i % 17).toDouble / 17.0
      val x2 = (i % 29).toDouble / 29.0
      val x3 = ((i * 7) % 13).toDouble / 13.0
      val y = if (x1 + 2 * x2 - x3 > 1.0) 1 else 0
      (x1, x2, x3, y)
    }.toDF("f1", "f2", "f3", "y")
  }

  private val feats = Seq("f1", "f2", "f3")

  test("MLP: PMML round-trip is bit-exact and the expression-tree score " +
    "matches MLlib's forward pass") {
    val df = fixture
    val t = graft.train.Train.nn(df, feats, col("y") === 1,
      hidden = Seq(5, 4), maxIter = 30)
    val mlp = graft.train.Train.toMlp(t, feats)
    assert(mlp.layers.map(_.b.length) === Seq(5, 4, 2))
    assert(mlp.layers.head.w.head.length === 3)

    // bit-exact PMML round-trip (Double.toString survives)
    val back = graft.score.Pmml.importNN(graft.score.Pmml.exportNN(mlp))
    assert(back === mlp)

    // score parity: the literal Column forward pass vs MLlib transform
    import org.apache.spark.ml.functions.vector_to_array
    val scored = t.model.transform(
        df.select(feats.map(col) :+ lit(0.0).as("label"): _*))
      .withColumn("p_mllib", vector_to_array(col("probability"))(1))
      .withColumn("p_expr", mlp.score)
      .select(max(abs(col("p_mllib") - col("p_expr"))).as("max_diff"))
      .head().getDouble(0)
    assert(scored < 1e-9, s"max |p_mllib - p_expr| = $scored")
  }

  test("DT: PMML round-trip reproduces the literal tree bit-exactly") {
    val df = fixture
    val t = graft.train.Train.decisionTree(df, feats, col("y") === 1,
      maxDepth = 4)
    val tree = graft.train.Train.toTree(t, feats)
    val xml = graft.score.Pmml.exportTree(tree, feats)
    val back = graft.score.Pmml.importTree(xml)
    assert(back === tree) // case-class structural equality: fields,
                          // thresholds, and leaf ids all survive
    // and the encoded paths from the round-tripped tree agree everywhere
    val diff = df.select(
      (graft.score.Score.encodePath(tree) =!=
        graft.score.Score.encodePath(back)).as("d"))
      .filter(col("d")).count()
    assert(diff === 0)
  }

  test("wide-and-deep: crossed wide features capture a signal the " +
    "individual columns cannot") {
    val s = spark
    import s.implicits._
    // label = XOR of two categoricals — invisible to either column alone
    // (each is independent of the label marginally), visible ONLY to the
    // crossed feature; the dense features are pure noise. A composite
    // whose wide side carries crosses must reach high AUC here.
    val rnd = new scala.util.Random(11)
    val df = (1 to 2000).map { i =>
      val a = if (rnd.nextBoolean()) "p" else "q"
      val b = if (rnd.nextBoolean()) "u" else "v"
      val y = if ((a == "p") ^ (b == "u")) 1 else 0
      (a, b, rnd.nextGaussian(), rnd.nextGaussian(), y)
    }.toDF("ca", "cb", "d1", "d2", "y")
    val t = graft.train.Train.wideAndDeep(df, Seq("ca", "cb"),
      Seq("d1", "d2"), org.apache.spark.sql.functions.col("y") === 1,
      hidden = Seq(4), hashDim = 64, maxIter = 20)
    assert(t.auc > 0.95, s"wdl auc ${t.auc} — crosses not learned")
    // scoring new rows end-to-end adds the output layer's probability
    val scored = t.score(df.limit(50))
    assert(scored.columns.contains("probability"))
    assert(scored.count() === 50)
  }

  test("wide-and-deep: NUMERIC wide columns score consistently " +
    "(train/serve hashing parity)") {
    val s = spark
    import s.implicits._
    // Int-typed wide columns: training casts them to string before
    // FeatureHasher (categorical semantics); score() must apply the same
    // cast or the hashed indices diverge and serving AUC collapses
    val rnd = new scala.util.Random(23)
    val df = (1 to 1200).map { _ =>
      val a = rnd.nextInt(2); val b = rnd.nextInt(2)
      val y = if ((a == 1) ^ (b == 1)) 1 else 0
      (a, b, rnd.nextGaussian(), y)
    }.toDF("ia", "ib", "d1", "y")
    val t = graft.train.Train.wideAndDeep(df, Seq("ia", "ib"), Seq("d1"),
      org.apache.spark.sql.functions.col("y") === 1,
      hidden = Seq(3), hashDim = 64, maxIter = 15)
    assert(t.auc > 0.95, s"fit auc ${t.auc}")
    val scored = t.score(df.withColumn("label",
      org.apache.spark.sql.functions.col("y").cast("double")))
    val servedAuc = new org.apache.spark.ml.evaluation
      .BinaryClassificationEvaluator().setLabelCol("label")
      .setRawPredictionCol("rawPrediction").evaluate(scored)
    assert(math.abs(servedAuc - t.auc) < 1e-6,
      s"served $servedAuc != fit ${t.auc} — hashing skew")
    // the output keeps the CALLER's column types (the internal string
    // cast is hasher plumbing, not a visible schema change)
    assert(scored.schema("ia").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("ITSA iterative sensitivity recovers the planted signal features") {
    val s = spark
    import s.implicits._
    // two signal features + three pure-noise features; iterative
    // mask-and-refit must keep exactly the signal pair
    val rnd = new scala.util.Random(5)
    val df = (1 to 1500).map { _ =>
      val f1 = rnd.nextGaussian(); val f2 = rnd.nextGaussian()
      val y = if (1.5 * f1 - 2.0 * f2 + 0.3 * rnd.nextGaussian() > 0) 1 else 0
      (f1, f2, rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian(), y)
    }.toDF("f1", "f2", "n1", "n2", "n3", "y")
    val kept = graft.train.Train.itsaVarsel(df,
      Seq("f1", "f2", "n1", "n2", "n3"),
      org.apache.spark.sql.functions.col("y") === 1, keepN = 2)
    assert(kept.toSet === Set("f1", "f2"), s"kept $kept")
  }

  test("autoFilter: drops high-missing and correlated-redundant columns, " +
    "keeps the KS-ranked rest") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 800).map { i =>
      val g = rnd.nextGaussian()
      val y = if (g + 0.2 * rnd.nextGaussian() > 0) "1" else "0"
      val miss: Option[Double] = if (i % 100 == 0) Some(1.0) else None
      (y, g, g * 2 + 0.001 * rnd.nextGaussian(), rnd.nextGaussian(), miss)
    }.toDF("tag", "good", "dupe", "noise", "mostly_missing")
    val spec = graft.catalog.DataSpec("tag", Set("1"), Set("0"))
    val catalog = graft.pipeline.Pipeline.stats(df, spec,
      Seq("good", "dupe", "noise", "mostly_missing"), Nil)
    val out = graft.pipeline.Pipeline.autoFilter(df, catalog, topN = 2)
    val sel = out.filter(_.finalSelect).map(_.columnName).toSet
    // corr(good, dupe) ~ 1 → exactly one survives the redundancy screen
    assert(sel.intersect(Set("good", "dupe")).size === 1, sel)
    // 99% missing → dropped by the missing-rate screen
    assert(!sel.contains("mostly_missing"), sel)
    assert(sel.contains("noise") && sel.size === 2, sel)
  }

  test("hand-built MLP scores match a by-hand forward computation") {
    val s = spark
    import s.implicits._
    // 2-2-2 net with known weights: verify the expression tree implements
    // sigmoid(W x + b) then softmax exactly
    val m = graft.score.Pmml.MlpModel(Seq("a", "b"), Seq(
      graft.score.Pmml.MlpLayer(
        Vector(Vector(0.5, -1.0), Vector(1.5, 0.25)), Vector(0.1, -0.2)),
      graft.score.Pmml.MlpLayer(
        Vector(Vector(1.0, -0.5), Vector(-1.0, 2.0)), Vector(0.0, 0.3))))
    val rows = Seq((0.2, 0.7), (1.0, -1.0), (0.0, 0.0))
    def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val want = rows.map { case (a, b) =>
      val h = Seq(sigmoid(0.5 * a - 1.0 * b + 0.1),
        sigmoid(1.5 * a + 0.25 * b - 0.2))
      val z0 = 1.0 * h(0) - 0.5 * h(1)
      val z1 = -1.0 * h(0) + 2.0 * h(1) + 0.3
      math.exp(z1) / (math.exp(z0) + math.exp(z1))
    }
    val got = rows.toDF("a", "b").select(m.score.as("p"))
      .collect().map(_.getDouble(0)).toSeq
    want.zip(got).foreach { case (w, g) =>
      assert(math.abs(w - g) < 1e-12, s"want $w got $g")
    }
  }
}
