package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog._
import graft.ops.DynamicBinning
import graft.sources.Delimited

class CatalogIoSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("catalog JSON round trip preserves profile contents") {
    val p = ColumnProfile(
      columnNum = 3, columnName = "x", kind = ColumnKind.Numeric,
      finalSelect = true,
      stats = ColumnStats(max = Some(9.5), min = Some(-1.0), mean = Some(2.0),
        totalCount = 100, missingCount = 5, stdDev = Some(1.5),
        ks = Some(65.7), iv = Some(13.0)),
      binning = ColumnBinning(
        binBoundary = Vector(Double.NegativeInfinity, 2.0, 3.0),
        binCountNeg = Vector(8, 10, 10), binCountPos = Vector(10, 24, 16),
        binPosRate = Vector(0.5, 0.7, 0.6),
        binCountWoe = Vector(0.1, -0.2, 0.3)))
    val back = CatalogIO.fromJson(CatalogIO.toJson(Seq(p)))
    assert(back.length === 1)
    val b = back.head
    assert(b.columnName === "x")
    assert(b.kind === ColumnKind.Numeric)
    assert(b.binning.binBoundary.head.isNegInfinity)
    assert(b.binning.binBoundary === p.binning.binBoundary)
    assert(b.binning.binCountPos === p.binning.binCountPos)
    assert(b.stats.ks === Some(65.7))
  }

  test("catalog JSON round trip preserves EVERY profile field " +
    "(full ColumnStats + ColumnBinning + columnFlag)") {
    val p = ColumnProfile(
      columnNum = 7, columnName = "full", kind = ColumnKind.Hybrid,
      flag = Some(ColumnFlag.ForceSelect), finalSelect = true,
      stats = ColumnStats(
        max = Some(99.9), min = Some(-3.25), mean = Some(11.0),
        median = Some(9.5), p25 = Some(4.0), p75 = Some(20.5),
        totalCount = 1234, distinctCount = Some(321), missingCount = 34,
        validNumCount = 1200, stdDev = Some(2.75),
        missingPercentage = 0.02755, woe = Some(0.12),
        weightedWoe = Some(0.11), ks = Some(44.4), weightedKs = Some(43.3),
        iv = Some(0.9), weightedIv = Some(0.85), skewness = Some(-0.4),
        kurtosis = Some(3.1), psi = Some(0.07),
        unitStats = Vector("2023-01|0.012", "2023-02|0.034")),
      binning = ColumnBinning(
        binBoundary = Vector(Double.NegativeInfinity, 1.5, 8.25),
        binCountNeg = Vector(10, 20, 30), binCountPos = Vector(5, 25, 15),
        binPosRate = Vector(0.33, 0.55, 0.33),
        binAvgScore = Vector(0.2, 0.5, 0.8),
        binWeightedNeg = Vector(9.5, 19.5, 29.5),
        binWeightedPos = Vector(5.5, 24.5, 14.5),
        binCountWoe = Vector(0.1, -0.2, 0.3),
        binWeightedWoe = Vector(0.11, -0.21, 0.31)))
    val back = CatalogIO.fromJson(CatalogIO.toJson(Seq(p)))
    assert(back.length === 1)
    assert(back.head === p)
    // flags round-trip independently for every enum value, and None
    val flags: Seq[Option[ColumnFlag]] = Seq(None,
      Some(ColumnFlag.ForceSelect), Some(ColumnFlag.ForceRemove),
      Some(ColumnFlag.Candidate), Some(ColumnFlag.Meta),
      Some(ColumnFlag.Target), Some(ColumnFlag.Weight))
    flags.foreach { f =>
      val q = p.copy(flag = f)
      assert(CatalogIO.fromJson(CatalogIO.toJson(Seq(q))).head.flag === f)
    }
  }

  test("catalog JSON round trip holds for generated profiles " +
    "(every Option populated/empty, +/-Inf, empty vs non-empty vectors)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val finiteD = Gen.chooseNum(-1e6, 1e6)
    val edgeD = Gen.oneOf(
      Gen.const(Double.NegativeInfinity), Gen.const(Double.PositiveInfinity),
      finiteD)
    def opt[A](g: Gen[A]): Gen[Option[A]] = Gen.option(g)
    val dVec = Gen.oneOf(Gen.const(Vector.empty[Double]),
      Gen.listOfN(4, edgeD).map(_.toVector))
    val lVec = Gen.oneOf(Gen.const(Vector.empty[Long]),
      Gen.listOfN(4, Gen.chooseNum(0L, 1e9.toLong)).map(_.toVector))
    val genStats = for {
      mx <- opt(finiteD); mn <- opt(finiteD); me <- opt(finiteD)
      md <- opt(finiteD); q1 <- opt(finiteD); q3 <- opt(finiteD)
      tc <- Gen.chooseNum(0L, 1e9.toLong); dc <- opt(Gen.chooseNum(0L, 1e6.toLong))
      mc <- Gen.chooseNum(0L, 1e6.toLong); vc <- Gen.chooseNum(0L, 1e9.toLong)
      sd <- opt(finiteD); mp <- Gen.chooseNum(0.0, 1.0)
      w <- opt(finiteD); ww <- opt(finiteD); k <- opt(finiteD)
      wk <- opt(finiteD); i <- opt(finiteD); wi <- opt(finiteD)
      sk <- opt(finiteD); ku <- opt(finiteD); ps <- opt(finiteD)
      us <- Gen.oneOf(Gen.const(Vector.empty[String]),
        Gen.listOfN(3, Gen.alphaNumStr.map(_.take(6))).map(_.toVector))
    } yield ColumnStats(mx, mn, me, md, q1, q3, tc, dc, mc, vc, sd, mp,
      w, ww, k, wk, i, wi, sk, ku, ps, us)
    val genBinning = for {
      bb <- dVec; bc <- Gen.oneOf(Gen.const(Vector.empty[String]),
        Gen.listOfN(3, Gen.alphaNumStr.map(_.take(8))).map(_.toVector))
      cn <- lVec; cp <- lVec; pr <- dVec; as <- dVec
      wn <- dVec; wp <- dVec; cw <- dVec; wwv <- dVec
    } yield ColumnBinning(bb, bc, cn, cp, pr, as, wn, wp, cw, wwv)
    val genProfile = for {
      num <- Gen.chooseNum(0, 9999)
      name <- Gen.alphaNumStr.map(s => "c_" + s.take(12))
      kind <- Gen.oneOf(ColumnKind.Auto, ColumnKind.Numeric,
        ColumnKind.Categorical, ColumnKind.Hybrid)
      flag <- Gen.option(Gen.oneOf[ColumnFlag](ColumnFlag.ForceSelect,
        ColumnFlag.ForceRemove, ColumnFlag.Candidate, ColumnFlag.Meta,
        ColumnFlag.Target, ColumnFlag.Weight))
      fs <- Gen.oneOf(true, false)
      st <- genStats; bn <- genBinning
    } yield ColumnProfile(num, name, kind, flag, fs, st, bn)
    (0 until 200).foreach { i =>
      val p = genProfile.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val back = CatalogIO.fromJson(CatalogIO.toJson(Seq(p)))
      assert(back.length === 1, s"seed $i")
      assert(back.head === p, s"seed $i: round-trip mismatch")
    }
  }

  test("loads the reference's own ColumnConfig.json (labor-neg fixture)") {
    val path = "/root/reference/src/test/resources/example/labor-neg/" +
      "DataStore/DataSet1/ColumnConfig.json"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    val profiles = CatalogIO.read(path)
    assert(profiles.nonEmpty)
    val wage = profiles.find(_.columnName == "wage_increase_first_year").get
    assert(wage.kind === ColumnKind.Numeric)
    assert(wage.stats.ks === Some(65.71428571428571))
    assert(wage.binning.binBoundary.head.isNegInfinity)
    assert(wage.binning.binCountNeg === Vector(24L, 2L, 2L, 0L, 0L, 0L))
    // the reference's own machine-written fields parse field-complete:
    // median/missingPercentage and the weighted bin masses
    assert(wage.stats.median === Some(3.5))
    assert(wage.stats.missingPercentage === 0.025)
    assert(wage.binning.binWeightedNeg.length ===
      wage.binning.binCountNeg.length)
    assert(wage.binning.binWeightedPos.length ===
      wage.binning.binCountPos.length)
  }

  test("delimited read applies missing sentinels and all-string schema") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_delim").toString
    Seq("1|x|3.5", "2|?|", "3|y|9.9").toDF("v")
      .coalesce(1).write.mode("overwrite").text(tmp + "/in")
    val df = Delimited.read(spark, tmp + "/in", "|", Seq("id", "cat", "num"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.orderBy("id").collect()
    assert(rows(1).isNullAt(1)) // '?' -> null
    assert(rows(1).isNullAt(2)) // ''  -> null
    assert(rows(2).getString(1) === "y")
  }

  test("malformed-row guard drops bad rows and reports the observe() counter") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_guard").toString
    Seq("1|a|2.0", "2|b", "3|c|4.0|extra", "4|d|5.0").toDF("v")
      .coalesce(1).write.mode("overwrite").text(tmp + "/in")
    val s2 = spark.newSession()
    val obs = new org.apache.spark.sql.Observation("guard")
    val df = Delimited.readGuarded(s2, tmp + "/in", "|",
      Seq("id", "cat", "num"), Some(obs))
    val rows = df.collect()
    assert(rows.length === 2) // rows 2 (short) and 3 (long) dropped
    val metrics = obs.get
    assert(metrics("malformed_cnt") === 2L)
    assert(metrics("total_cnt") === 4L)
  }

  test("dynamic rebin merges small bins and respects maxBins") {
    import spark.implicits._
    // skewed data: 90% of mass at small values
    val d = ((1 to 900).map(_ => 1.0) ++ (1 to 100).map(i => i * 1.0))
      .zipWithIndex.map { case (v, i) => (v, i % 3 == 0) }
      .toDF("v", "pos")
    val bins = DynamicBinning.rebin(d, "v", col("pos"),
      fineK = 50, maxBins = 8, minShare = 0.02)
    assert(bins.length <= 8)
    val total = bins.map(_.total).sum
    assert(total === 1000L)
    // no tiny bins left (except possibly a single unavoidable one)
    assert(bins.count(_.total < 20) <= 1)
  }
}
