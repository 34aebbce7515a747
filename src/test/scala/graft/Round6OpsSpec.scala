package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 fixes: hostile column names through the correlation stack
  * path, ensemble PMML round-trips. */
class Round6OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pearsonPairs survives hostile column names ('|', space, quote, " +
    "leading digit) and both physical paths agree") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1 to 400).map { _ =>
      val a = rnd.nextGaussian()
      (a, a * 0.7 + 0.3 * rnd.nextGaussian(), rnd.nextGaussian())
    }
    // "a|b" used to parse as bitwise-OR of columns a and b; "don't stop"
    // used to break the pair-label literal; "2fast" broke the identifier
    val names = Seq("a|b", "don't stop", "2fast")
    val df = rows.toDF(names: _*)
    def asMap(wideK: Int) =
      graft.ops.Correlation.pearsonPairs(df, names, wideK)
        .collect().map(r =>
          (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val stack = asMap(wideK = 99)
    val gram = asMap(wideK = 2)
    assert(stack.keySet === Set(
      ("a|b", "don't stop"), ("a|b", "2fast"), ("don't stop", "2fast")))
    assert(stack.keySet === gram.keySet)
    stack.foreach { case (k, v) => assert(v === gram(k), s"pair $k") }
    // the '|' name must NOT have been interpreted as an expression: the
    // correlation of the pair (a|b, don't stop) is the strong one we built
    assert(stack(("a|b", "don't stop")) > 0.5)
    // labeled single-field variant quotes the same way
    val labeled = graft.ops.Correlation.pearsonStack(df, names)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(labeled.keySet === Set(
      "a|b|don't stop", "a|b|2fast", "don't stop|2fast"))
  }

  test("SpecIO writes the reference's legacy STRING filterExpressions " +
    "whenever lossless; array only for expressions containing ';'") {
    val plain = graft.catalog.DataSpec("tag", Set("1"), Set("0"),
      filterExpressions = Seq("qty > 3", "price < 9"))
    val js = graft.catalog.SpecIO.toJson(plain)
    // reference RawSourceData.filterExpressions is a String — emit that
    assert(js.contains("\"filterExpressions\" : \"qty > 3;price < 9\""), js)
    assert(graft.catalog.SpecIO.fromJson(js).filterExpressions ===
      plain.filterExpressions)
    val hostile = plain.copy(filterExpressions = Seq("name != 'a;b'"))
    val js2 = graft.catalog.SpecIO.toJson(hostile)
    assert(js2.contains("[")) // array fallback, not a corrupting join
    assert(graft.catalog.SpecIO.fromJson(js2).filterExpressions ===
      hostile.filterExpressions)
  }

  test("profileCategorical carries the weighted duals, missing pct, and " +
    "per-category weighted WoE consistent with the count math") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // category 'a' rows weigh 10x, so weighted WoE must diverge from the
    // count WoE; one null row exercises the missing-last bin
    val df = Seq(
      ("a", 1, 10.0), ("a", 0, 10.0), ("a", 1, 10.0),
      ("b", 1, 1.0), ("b", 0, 1.0), ("b", 0, 1.0),
      (null, 0, 1.0)).toDF("c", "pos", "w")
    val p = graft.ops.StatsPipeline.profileCategorical(
      df, Seq("c"), col("pos") === 1, weight = col("w"))("c")
    assert(p.binning.binCategory === Vector("a", "b"))
    assert(p.binning.binCountPos === Vector(2L, 1L, 0L))
    assert(p.binning.binWeightedPos === Vector(20.0, 1.0, 0.0))
    assert(p.binning.binWeightedNeg === Vector(10.0, 2.0, 1.0))
    assert(p.stats.missingPercentage === 1.0 / 7)
    assert(p.stats.weightedKs.isDefined && p.stats.weightedIv.isDefined)
    // weighted per-bin WoE from the weighted masses, EPS convention
    val e = graft.ops.StatsMath.Eps
    val expectA = math.log((20.0 / 21 + e) / (10.0 / 13 + e))
    assert(math.abs(p.binning.binWeightedWoe(0) - expectA) < 1e-12)
    assert(p.binning.binWeightedWoe !== p.binning.binCountWoe)
  }

  test("externalTrainer shell-out: writes data + GenericModelConfig, runs " +
    "the user command, folds the returned model back into the plan") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_tf").toString
    // stand-in trainer: validates the contract (config + data exist),
    // then writes a fixed literal model — exactly what a real TF script
    // would do after fitting
    val script = java.nio.file.Paths.get(work, "fake_tf.sh")
    java.nio.file.Files.writeString(script,
      """#!/bin/sh
        |set -e
        |d="$1"
        |test -f "$d/GenericModelConfig.json"
        |test -d "$d/data"
        |grep -q '"inputnames"' "$d/GenericModelConfig.json"
        |grep -q '"algorithm" : "TENSORFLOW"' "$d/GenericModelConfig.json"
        |cat > "$d/model.json" <<'EOF'
        |[{"weights":[{"col":"f1","w":1.5},{"col":"f2","w":-0.5}],"bias":0.25}]
        |EOF
        |""".stripMargin)
    script.toFile.setExecutable(true)
    val df = Seq((1.0, 2.0, true), (0.5, 1.0, false))
      .toDF("f1", "f2", "y")
    val models = graft.train.Train.externalTrainer(df, Seq("f1", "f2"),
      col("y"), Seq(script.toString), work)
    assert(models.length === 1)
    assert(models.head.bias === 0.25)
    assert(models.head.weights.toMap === Map("f1" -> 1.5, "f2" -> -0.5))
    // the returned literal model scores as a plan expression
    val p = df.select(models.head.score.as("p")).collect().map(_.getDouble(0))
    assert(p.forall(x => x > 0 && x < 1))
    // the materialized training set carries (features, label)
    val data = spark.read.parquet(s"$work/data")
    assert(data.columns.toSeq === Seq("f1", "f2", "label"))
    assert(data.count() === 2)
    // a failing trainer surfaces loudly
    val bad = java.nio.file.Paths.get(work, "bad.sh")
    java.nio.file.Files.writeString(bad, "#!/bin/sh\nexit 3\n")
    bad.toFile.setExecutable(true)
    val ex = intercept[IllegalArgumentException] {
      graft.train.Train.externalTrainer(df, Seq("f1"), col("y"),
        Seq(bad.toString), work + "/bad")
    }
    assert(ex.getMessage.contains("exit 3"))
  }

  test("profileNumeric(full=true) survives hostile column names — the " +
    "percentile/HLL aggs never reach a SQL parser") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    // (a raw '`' in a name is rejected by Spark's own col() attribute
    // parser everywhere, so it is out of scope for every operator here)
    val names = Seq("a|b", "don't", "2 fast")
    val df = (1 to 300).map(_ =>
      (rnd.nextDouble() * 10, rnd.nextDouble(), rnd.nextGaussian()))
      .toDF(names: _*)
      .withColumn("pos", rand(7) > 0.5)
    val profiles = graft.ops.StatsPipeline.profileNumeric(
      df, names, col("pos"), full = true)
    names.foreach { n =>
      val st = profiles(n).stats
      assert(st.median.isDefined && st.p25.isDefined && st.p75.isDefined, n)
      assert(st.skewness.isDefined && st.distinctCount.isDefined, n)
      assert(st.p25.get <= st.median.get && st.median.get <= st.p75.get, n)
    }
  }

  test("unigramLogprob: capped vocab floors OOV tokens and ranks " +
    "repetitive common text above rare-token gibberish") {
    val s = spark
    import s.implicits._
    val common = Seq.fill(30)("the cat sat on the mat").mkString(" ")
    val rare = (1 to 180).map(i => s"zq$i").mkString(" ")
    val df = Seq((1L, common), (2L, rare)).toDF("doc_id", "text")
    val full = graft.text.TextOps.unigramLogprob(df, vocabCap = None)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // common tokens have high corpus probability -> higher avg logprob
    assert(full(1L) > full(2L))
    // cap of 6 keeps exactly the common vocab; every rare token floors
    val capped = graft.text.TextOps.unigramLogprob(df, vocabCap = Some(6))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(capped(1L) === full(1L), "in-vocab doc unchanged by the cap")
    val nTok = 30 * 6 + 180
    val floor = math.log10(1.0 / nTok)
    assert(math.abs(capped(2L) - math.rint(floor * 1e6) / 1e6) < 1e-9,
      s"all-OOV doc must sit exactly at the 1/total floor, got ${capped(2L)}")
    // cap ≥ vocab ⇒ the bounded top-k keeps the exact vocabulary: capped
    // scoring must equal the uncapped path bit-for-bit on every doc
    val wide = graft.text.TextOps.unigramLogprob(df, vocabCap = Some(10000))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wide === full, "cap ≥ |vocab| must reproduce exact scoring")
  }

  test("EvalSetIO round-trips generated eval-set files field-complete") {
    import graft.catalog._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genSpec = for {
      t <- Gen.alphaNumStr.map("t_" + _.take(8))
      pos <- Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(4))).map(_.toSet)
      neg <- Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(4))).map(_.toSet)
      w <- Gen.option(Gen.alphaNumStr.map("w_" + _.take(6)))
      fe <- Gen.listOf(Gen.oneOf("a > 1", "b == 'x'", "c != 'p;q'"))
      mb <- Gen.chooseNum(2, 64)
    } yield DataSpec(t, pos, neg, w, filterExpressions = fe, maxNumBin = mb)
    val genSet = for {
      n <- Gen.alphaNumStr.map("es_" + _.take(8))
      d <- Gen.alphaNumStr.map("/data/" + _.take(8))
      sp <- genSpec
      sc <- Gen.option(Gen.alphaNumStr.map("s_" + _.take(6)))
      b <- Gen.chooseNum(2, 100)
      ss <- Gen.chooseNum(1L, 100000L)
    } yield EvalSet(n, d, sp, sc, b, ss)
    val genSets = for {
      sets <- Gen.listOf(genSet)
        .map(_.distinctBy(_.name).toVector)
      cur <- if (sets.isEmpty) Gen.const(None)
             else Gen.option(Gen.oneOf(sets.map(_.name)))
    } yield EvalSets(cur, sets)
    (0 until 100).foreach { i =>
      val es = genSets.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val back = EvalSetIO.fromJson(EvalSetIO.toJson(es))
      assert(back === es, s"seed $i: eval-sets round-trip mismatch")
    }
  }

  private def trainData = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 600).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val x3 = rnd.nextGaussian()
      (x1, x2, x3, x1 + 0.5 * x2 + 0.3 * rnd.nextGaussian() > 0)
    }.toDF("f1", "f2", "f3", "y")
  }

  test("RF ensemble PMML: ONE MiningModel/Segmentation document " +
    "round-trips bit-exactly and scores like MLlib (3-tree RF)") {
    import org.apache.spark.sql.functions._
    val feats = Seq("f1", "f2", "f3")
    val df = trainData
    val t = graft.train.Train.randomForest(df, feats, col("y"),
      numTrees = 3, maxDepth = 3)
    val rf = t.model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.RandomForestClassificationModel]
    val e = graft.score.Pmml.fromRF(rf, feats)
    assert(e.trees.length === 3)
    assert(e.method === "average")
    val xml = graft.score.Pmml.exportEnsemble(e)
    assert(xml.contains("multipleModelMethod=\"average\""))
    assert(xml.split("<Segment ").length === 4) // 3 segments in 1 document
    val back = graft.score.Pmml.importEnsemble(xml)
    assert(back === e, "bit-exact ensemble round-trip")
    // the literal Column ensemble matches MLlib's transform probability
    val scored = t.model.transform(
      df.withColumn("label", col("y").cast("double")))
    val p1 = org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1)
    val maxDiff = scored.select(
      max(abs(p1 - back.score)).as("d")).head().getDouble(0)
    assert(maxDiff < 1e-12, s"RF ensemble score drift $maxDiff")
  }

  test("a 60-tree depth-5 ensemble still scores correctly as one Column " +
    "(codegen or fallback), matching a driver-side evaluation") {
    import graft.score.Pmml.{Ensemble, RLeaf, RNode, RSplit}
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val feats = Vector("g1", "g2", "g3")
    val rnd = new scala.util.Random(29)
    def genTree(depth: Int): RNode =
      if (depth == 0) RLeaf((rnd.nextInt(16) + 1) / 16.0)
      else RSplit(feats(rnd.nextInt(3)),
        math.rint(rnd.nextGaussian() * 8) / 8.0,
        genTree(depth - 1), genTree(depth - 1))
    val e = Ensemble(feats, Vector.fill(60)(genTree(5)),
      Vector.fill(60)(1.0), "average")
    def evalLocal(n: RNode, row: Map[String, Double]): Double = n match {
      case RLeaf(v) => v
      case RSplit(f, t, l, r) =>
        if (row(f) <= t) evalLocal(l, row) else evalLocal(r, row)
    }
    val rows = (1 to 2000).map { i =>
      (i, rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian())
    }
    val df = rows.toDF("id", "g1", "g2", "g3")
    val got = df.select(col("id"), e.score.as("p")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { case (i, a, b, c) =>
      val m = Map("g1" -> a, "g2" -> b, "g3" -> c)
      val want = e.trees.map(t => evalLocal(t, m)).sum / 60.0
      assert(math.abs(got(i) - want) < 1e-12, s"row $i")
    }
  }

  test("GBT ensemble PMML: weighted-sum segments + logistic link " +
    "round-trip and score like MLlib") {
    import org.apache.spark.sql.functions._
    val feats = Seq("f1", "f2", "f3")
    val df = trainData
    val t = graft.train.Train.gbt(df, feats, col("y"),
      maxIter = 3, maxDepth = 3)
    val g = t.model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.GBTClassificationModel]
    val e = graft.score.Pmml.fromGBT(g, feats)
    assert(e.trees.length === 3)
    assert(e.method === "sum")
    assert(e.weights.head === 1.0 && e.weights.forall(_ > 0))
    val xml = graft.score.Pmml.exportEnsemble(e)
    // standard representation: modelChain + final logit regression
    // segment (coefficients 2·wᵢ) — no private Extension link contract
    assert(xml.contains("multipleModelMethod=\"modelChain\""))
    assert(xml.contains("normalizationMethod=\"logit\""))
    assert(!xml.contains("<Extension"))
    val back = graft.score.Pmml.importEnsemble(xml)
    assert(back === e, "bit-exact ensemble round-trip")
    val scored = t.model.transform(
      df.withColumn("label", col("y").cast("double")))
    val p1 = org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1)
    val maxDiff = scored.select(
      max(abs(p1 - back.score)).as("d")).head().getDouble(0)
    assert(maxDiff < 1e-12, s"GBT ensemble score drift $maxDiff")
  }
}
