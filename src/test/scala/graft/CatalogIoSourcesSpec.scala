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
