package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 fixes: SPDT sketch wire format, spec-file filter expressions,
  * rebin catalog consistency, correlation path agreement on nully data. */
class Round5OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Histogram kryo wire format ships only the compressed prefix " +
    "and round-trips the quantile math exactly") {
    val h = new graft.agg.Histogram(32)
    val rnd = new scala.util.Random(7)
    (1 to 10000).foreach(_ => h.add(rnd.nextGaussian()))
    // grow the scratch space past cap*4 the way a big merge does
    val h2 = new graft.agg.Histogram(32)
    (1 to 10000).foreach(_ => h2.add(rnd.nextGaussian() * 2))
    h.merge(h2)
    val kryo = new com.esotericsoftware.kryo.Kryo()
    kryo.setRegistrationRequired(false)
    kryo.setInstantiatorStrategy(
      new com.esotericsoftware.kryo.Kryo.DefaultInstantiatorStrategy(
        new org.objenesis.strategy.StdInstantiatorStrategy))
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new com.esotericsoftware.kryo.io.Output(bytes)
    kryo.writeObject(out, h)
    out.close()
    // contract: at most cap (value, weight) pairs + header on the wire.
    // The pre-fix field serialization shipped >= cap*4*2 doubles (2 KiB+).
    assert(bytes.size() <= 32 * 2 * 8 + 64,
      s"wire size ${bytes.size()}B exceeds the cap-pairs contract")
    val in = new com.esotericsoftware.kryo.io.Input(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
    val back = kryo.readObject(in, classOf[graft.agg.Histogram])
    assert(back.cap === h.cap)
    assert(back.quantileBoundaries(10).toSeq === h.quantileBoundaries(10).toSeq)
    assert(math.abs(back.totalWeight - h.totalWeight) < 1e-9)
  }

  test("SpecIO: filter expressions containing ';' round-trip unsplit; " +
    "the legacy ';'-joined string form still reads") {
    val spec = graft.catalog.DataSpec("tag", Set("1"), Set("0"),
      filterExpressions = Seq("name != 'a;b'", "qty > 3"))
    val back = graft.catalog.SpecIO.fromJson(graft.catalog.SpecIO.toJson(spec))
    assert(back.filterExpressions === Seq("name != 'a;b'", "qty > 3"))
    val legacy = """{"dataSet":{"targetColumnName":"tag",
      "posTags":["1"],"negTags":["0"],
      "filterExpressions":"qty > 3;price < 9"}}"""
    assert(graft.catalog.SpecIO.fromJson(legacy).filterExpressions ===
      Seq("qty > 3", "price < 9"))
  }

  test("autoFilter: a never-observed candidate (totalCount == 0) is " +
    "dropped by explicit policy, not by NaN comparison") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 400).map { _ =>
      val g = rnd.nextGaussian()
      (if (g > 0) "1" else "0", g, rnd.nextGaussian())
    }.toDF("tag", "good", "noise")
    val spec = graft.catalog.DataSpec("tag", Set("1"), Set("0"))
    val catalog = graft.pipeline.Pipeline.stats(df, spec,
      Seq("good", "noise"), Nil) :+
      graft.catalog.ColumnProfile(columnNum = 99, columnName = "phantom",
        kind = graft.catalog.ColumnKind.Numeric) // no stats ever ran
    val out = graft.pipeline.Pipeline.autoFilter(
      df.withColumn("phantom", lit(null).cast("double")), catalog, topN = 3)
    val sel = out.filter(_.finalSelect).map(_.columnName).toSet
    assert(!sel.contains("phantom"), sel)
    assert(sel === Set("good", "noise"), sel)
  }

  test("pearsonPairs: stack and gramian paths agree exactly on " +
    "null-free (imputed) data, and the pair is carried as two fields") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val df = (1 to 500).map { _ =>
      val a = rnd.nextGaussian()
      (a, a * 0.8 + 0.2 * rnd.nextGaussian(), rnd.nextGaussian())
    }.toDF("c1", "c2", "c3")
    def asMap(wideK: Int) =
      graft.ops.Correlation.pearsonPairs(df, Seq("c1", "c2", "c3"), wideK)
        .collect().map(r =>
          (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val stack = asMap(wideK = 99)
    val gram = asMap(wideK = 2)
    assert(stack.keySet === gram.keySet)
    // identical HALF_UP 6-decimal rounding on both physical paths
    stack.foreach { case (k, v) => assert(v === gram(k), s"pair $k") }
    assert(stack.keySet ===
      Set(("c1", "c2"), ("c1", "c3"), ("c2", "c3")))
  }

  test("stats --rebin leaves NO stale bin-derived vectors: WoE/KS/IV " +
    "recomputed against the new boundaries, binAvgScore cleared") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_r5").toString
    val rnd = new scala.util.Random(17)
    val df = (1 to 2000).map { _ =>
      val v = rnd.nextDouble() * 100
      (if (v + rnd.nextGaussian() * 20 > 50) "1" else "0", v)
    }.toDF("tag", "v")
    df.write.mode("overwrite").parquet(s"$tmp/data")
    val base = Map("data" -> s"$tmp/data", "target" -> "tag",
      "pos" -> "1", "neg" -> "0", "candidates" -> "v",
      "catalog" -> s"$tmp/ColumnConfig.json")
    Cli.run(spark, "stats", base)
    // poison binAvgScore so we can prove rebin clears it
    val poisoned = graft.catalog.CatalogIO.read(s"$tmp/ColumnConfig.json")
      .map(p => p.copy(binning =
        p.binning.copy(binAvgScore = Vector.fill(p.binning.length + 1)(0.5))))
    graft.catalog.CatalogIO.write(s"$tmp/ColumnConfig.json", poisoned)
    Cli.run(spark, "stats", base + ("rebin" -> "v"))
    val p = graft.catalog.CatalogIO.read(s"$tmp/ColumnConfig.json")
      .find(_.columnName == "v").get
    val k = p.binning.binBoundary.length + 1
    assert(p.binning.binCountWoe.length === k,
      s"binCountWoe ${p.binning.binCountWoe.length} != $k bins")
    assert(p.binning.binWeightedWoe.length === k)
    assert(p.binning.binAvgScore.isEmpty, "stale binAvgScore survived rebin")
    assert(p.stats.ks.isDefined && p.stats.iv.isDefined)
    assert(p.stats.weightedKs.isDefined)
    // WoE vector actually matches the fresh counts (spot-check one bin)
    val sumP = p.binning.binCountPos.sum.toDouble
    val sumN = p.binning.binCountNeg.sum.toDouble
    val i = p.binning.binCountPos.indexWhere(_ > 0)
    val expect = math.log(
      (p.binning.binCountPos(i) / sumP + graft.ops.StatsMath.Eps) /
      (p.binning.binCountNeg(i) / sumN + graft.ops.StatsMath.Eps))
    assert(math.abs(p.binning.binCountWoe(i) - expect) < 1e-12)
  }
}
