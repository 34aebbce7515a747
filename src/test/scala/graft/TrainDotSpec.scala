package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.expr.DotProduct.dot
import graft.train.Train

class TrainDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("DotProduct expression: interpreted and codegen paths agree") {
    import spark.implicits._
    val d = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val got = d.select(dot(col("a"), col("b"))).head().getDouble(0)
    assert(got === 32.0)
    // null propagation
    val n = Seq((Option.empty[Array[Double]], Option(Array(1.0))))
      .toDF("a", "b")
    assert(n.select(dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("DotProduct matches the HOF formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    val rows = (1 to 50).map { _ =>
      (Array.fill(16)(rnd.nextDouble()), Array.fill(16)(rnd.nextDouble()))
    }
    val d = rows.toDF("a", "b")
    val viaExpr = d.select(dot(col("a"), col("b")).as("d")).collect()
      .map(_.getDouble(0))
    val viaHof = d.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 AS double)," +
        " (acc, x) -> acc + x)").as("d")).collect().map(_.getDouble(0))
    viaExpr.zip(viaHof).foreach { case (x, y) => assert(x === y) } // bit-exact
  }

  test("logistic training reaches better-than-random AUC on separable data") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val d = (1 to 2000).map { _ =>
      val pos = rnd.nextBoolean()
      val x1 = rnd.nextGaussian() + (if (pos) 1.5 else -1.5)
      val x2 = rnd.nextGaussian()
      (x1, x2, pos)
    }.toDF("x1", "x2", "label")
    val t = Train.logistic(d, Seq("x1", "x2"), col("label"))
    assert(t.auc > 0.85, s"auc=${t.auc}")
  }

  test("grid search + k-fold picks a model with sane CV metric") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val d = (1 to 600).map { _ =>
      val pos = rnd.nextBoolean()
      (rnd.nextGaussian() + (if (pos) 1.2 else -1.2), rnd.nextGaussian(), pos)
    }.toDF("x1", "x2", "label")
    val (model, cvAuc) = Train.gridSearchLogistic(d, Seq("x1", "x2"),
      col("label"), regParams = Seq(0.0, 0.5), numFolds = 3)
    assert(model.stages.length === 2)
    assert(cvAuc > 0.8, s"cv auc=$cvAuc")
  }

  test("GBT and RF train and evaluate") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val d = (1 to 500).map { _ =>
      val pos = rnd.nextBoolean()
      val x1 = rnd.nextGaussian() + (if (pos) 1.0 else -1.0)
      (x1, rnd.nextGaussian(), pos)
    }.toDF("x1", "x2", "label")
    assert(Train.gbt(d, Seq("x1", "x2"), col("label"), maxIter = 3).auc > 0.7)
    assert(Train.randomForest(d, Seq("x1", "x2"), col("label"),
      numTrees = 5).auc > 0.7)
  }
}
