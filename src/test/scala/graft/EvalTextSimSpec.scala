package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.eval.Eval
import graft.sim.Similarity
import graft.text.TextOps

class EvalTextSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("confusion sweep: perfect ranking yields monotone TP and AUC ~ 1") {
    import spark.implicits._
    // scores equal to the label: all positives rank first
    val d = (1 to 100).map(i => (i.toLong, if (i <= 30) 1 else 0))
      .toDF("id", "label")
      .withColumn("score", col("label").cast("double") * 100 - col("id"))
    val sweep = Eval.confusionSweep(d, col("score"),
      col("label") === 1, Seq(col("id")), 10)
    val rows = sweep.orderBy("bucket").collect()
    assert(rows.length === 10)
    // 100 rows, 10 buckets of 10: after bucket 3 all 30 positives seen
    assert(rows(2).getAs[Long]("tp") === 30)
    assert(rows(9).getAs[Long]("tp") === 30)
    assert(rows(9).getAs[Long]("tn") === 0)
    val auc = Eval.rocAuc(sweep).head().getDouble(0)
    assert(auc > 0.95)
  }

  test("confusion sweep: remainder buckets (n % buckets != 0) match ntile") {
    import spark.implicits._
    val d = (1 to 17).map(i => (i.toLong, i % 3 == 0)).toDF("id", "pos")
    val sweep = Eval.confusionSweep(d, col("id").cast("double"),
      col("pos"), Seq(col("id")), 5)
    val rows = sweep.orderBy("bucket").collect()
    // ntile(5) over 17 rows: sizes 4,4,3,3,3 -> cumulative 4,8,11,14,17
    val counts = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp"))
    assert(counts.toSeq === Seq(4L, 8L, 11L, 14L, 17L))
  }

  test("shingles: short docs fall back to whole text") {
    import spark.implicits._
    val d = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextOps.withShingles(d)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("one two"))
    assert(got(2L) === Seq("a b c", "b c d"))
  }

  test("simhash: identical docs get identical hashes, different docs differ") {
    import spark.implicits._
    val d = Seq((1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "entirely different words here now")).toDF("doc_id", "text")
    val got = TextOps.simhash(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === got(2L))
    assert(got(1L) !== got(3L))
  }

  test("minhash: near-identical docs share most signature slots") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, base), (2L, base + " extra")).toDF("doc_id", "text")
    val rows = TextOps.minhash(d).collect()
    val a = rows.find(_.getLong(0) == 1L).get.toSeq.drop(1)
    val b = rows.find(_.getLong(0) == 2L).get.toSeq.drop(1)
    val same = a.zip(b).count { case (x, y) => x == y }
    assert(same >= 5, s"only $same/8 minhash slots matched")
  }

  test("hyperplane planes are deterministic and in range") {
    val p1 = Similarity.planes(4, 16)
    val p2 = Similarity.planes(4, 16)
    assert(p1.map(_.toSeq).toSeq === p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(w => w >= -7.5 && w <= 7.5))
  }

  test("cosine top-1 of a duplicated vector is its twin") {
    import spark.implicits._
    val v1 = Array.tabulate(8)(i => 0.1f * i)
    val v2 = Array.tabulate(8)(i => 0.1f * i)  // identical
    val v3 = Array.tabulate(8)(i => 1.0f - 0.1f * i)
    val d = Seq((0L, v1), (1L, v2), (2L, v3)).toDF("vec_id", "embedding")
    val top1 = Similarity.cosineTopK(d, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1(0L) === 1L)
    assert(top1(1L) === 0L)
  }
}
