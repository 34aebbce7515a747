package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CLI verb surface drives the full lifecycle on real test data. */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val data = "/root/testdata/sf0.001/lineitem.parquet"
  private val base = Map(
    "data" -> data, "target" -> "l_returnflag",
    "pos" -> "R", "neg" -> "A,N",
    "candidates" -> "l_quantity,l_extendedprice,l_discount,l_tax")

  test("run: selects columns, trains, reports AUC, writes outputs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli").toString
    val out = Cli.run(spark, "run", base +
      ("catalog" -> s"$tmp/ColumnConfig.json") + ("out" -> s"$tmp/norm"))
    assert(out.exists(_.startsWith("selected: ")))
    val auc = out.find(_.startsWith("auc: ")).get.drop(5).toDouble
    assert(auc > 0.0 && auc < 1.0)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/ColumnConfig.json")))
    assert(spark.read.parquet(s"$tmp/norm").columns.contains("tag"))
  }

  test("stats then norm: catalog round-trips through the verbs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli2").toString
    val s1 = Cli.run(spark, "stats", base +
      ("catalog" -> s"$tmp/ColumnConfig.json"))
    assert(s1.head.contains("4 columns"))
    val s2 = Cli.run(spark, "norm", base +
      ("catalog" -> s"$tmp/ColumnConfig.json") + ("out" -> s"$tmp/norm") +
      ("normtype" -> "woe"))
    assert(s2.head.startsWith("normalized: "))
    val normed = spark.read.parquet(s"$tmp/norm")
    assert(normed.columns.toSet.contains("weight"))
    assert(normed.count() > 0)
  }

  test("eval: external meta-score sweep reports AUC and writes the report") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli4").toString
    val out = Cli.run(spark, "eval", base +
      ("score" -> "l_tax") + ("weight" -> "l_quantity") +
      ("out" -> s"$tmp/report.html"))
    val auc = out.find(_.startsWith("auc: ")).get.drop(5).toDouble
    assert(auc > 0.0 && auc < 1.0)
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmp/report.html"))
    assert(html.contains("<svg") && html.contains("<th>lift</th>"))
  }

  test("export: writes a parseable PMML with the selected predictors") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cli3").toString
    val out = Cli.run(spark, "export", base + ("out" -> s"$tmp/model.pmml"))
    assert(out.head.startsWith("pmml: "))
    val xml = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmp/model.pmml"))
    val models = graft.score.Score.importPmml(xml)
    assert(models.length === 1)
    assert(models.head.weights.nonEmpty)
  }
}
