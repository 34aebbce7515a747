package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.score.Score
import graft.score.Score.LinearModel
import graft.train.Train

/** Round-3 additions: PMML model export/import and `shifu combo`
  * assembling. */
class Round3OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val models = Seq(
    LinearModel(Seq("x1" -> 0.083, "x2" -> -12.75), -1.0),
    LinearModel(Seq("x2" -> 3.0e-5), -1.25))

  test("PMML export/import round-trips weights and biases bit-exactly") {
    val xml = Score.exportPmml(models)
    assert(xml.contains("RegressionModel") &&
      xml.contains("normalizationMethod=\"logit\""))
    val back = Score.importPmml(xml)
    assert(back === models)
  }

  test("PMML round-tripped model scores identically in the plan") {
    import spark.implicits._
    val d = (1 to 200).map(i => (i * 0.37, i * -1.41)).toDF("x1", "x2")
    val back = Score.importPmml(Score.exportPmml(models))
    val a = d.select(models.head.score.as("s")).collect().map(_.getDouble(0))
    val b = d.select(back.head.score.as("s")).collect().map(_.getDouble(0))
    a.zip(b).foreach { case (x, y) => assert(x === y) } // bit-exact
  }

  test("gain-chart HTML report renders table rows and SVG curves") {
    import spark.implicits._
    val d = (1 to 200).map(i => (i.toLong, i <= 60)).toDF("id", "pos")
      .withColumn("score", col("pos").cast("double") * 100 - col("id"))
    val sweep = graft.eval.Eval.confusionSweep(d, col("score"),
      col("pos"), Seq(col("id")), 10)
    val gain = graft.eval.Eval.gainChart(sweep)
    val out = java.nio.file.Files.createTempDirectory("graft_html")
      .resolve("report.html").toString
    graft.eval.Eval.gainChartHtml(gain, out, "spec")
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(out))
    assert(html.contains("<svg") && html.contains("polyline"))
    assert(html.contains("<th>lift</th>"))
    // one table row per bucket
    assert(html.sliding(4).count(_ == "<tr>") === 11) // 1 header + 10 buckets
  }

  test("combo assembling: mean of member probabilities, sane ensemble AUC") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val d = (1 to 800).map { _ =>
      val pos = rnd.nextBoolean()
      (rnd.nextGaussian() + (if (pos) 1.3 else -1.3), rnd.nextGaussian(), pos)
    }.toDF("x1", "x2", "label")
    val members = Seq(
      Train.logistic(d, Seq("x1", "x2"), col("label")),
      Train.randomForest(d, Seq("x1", "x2"), col("label"), numTrees = 5),
      // margin-only member: exercises the sigmoid(rawPrediction) bridge
      Train.svm(d, Seq("x1", "x2"), col("label"), maxIter = 10))
    val combo = Train.comboScore(members, d)
    // combo_mean really is the mean of the member scores
    val chk = combo.select(abs(col("combo_mean") -
      (col("combo_0") + col("combo_1") + col("combo_2")) / 3).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(chk === 0.0)
    val svmScores = combo.agg(min("combo_2"), max("combo_2")).head()
    assert(svmScores.getDouble(0) >= 0.0 && svmScores.getDouble(1) <= 1.0)
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setLabelCol("label_d").setRawPredictionCol("combo_mean")
      .evaluate(combo.withColumn("label_d", col("label").cast("double")))
    assert(auc > 0.85, s"combo auc=$auc")
  }
}
