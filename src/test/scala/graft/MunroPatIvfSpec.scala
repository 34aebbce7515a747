package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.MunroPatSketch
import graft.sim.Ivf

class MunroPatIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("MunroPat quantiles of uniform data are near exact deciles") {
    val s = MunroPatSketch(10)
    val rnd = new scala.util.Random(11)
    (1 to 100000).foreach(_ => s.add(rnd.nextDouble() * 100))
    val qs = s.quantiles()
    assert(qs.length === 9)
    qs.zipWithIndex.foreach { case (q, i) =>
      val expect = (i + 1) * 10.0
      assert(math.abs(q - expect) < 2.5, s"q$i: $q vs $expect")
    }
  }

  test("MunroPat merge approximates single-sketch result") {
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(40000)(rnd.nextGaussian())
    val whole = MunroPatSketch(10); xs.foreach(whole.add)
    val a = MunroPatSketch(10); xs.take(20000).foreach(a.add)
    val b = MunroPatSketch(10); xs.drop(20000).foreach(b.add)
    val merged = a.mergeWith(b)
    assert(merged.total === 40000)
    whole.quantiles().zip(merged.quantiles()).foreach { case (x, y) =>
      assert(math.abs(x - y) < 0.15, s"$x vs $y")
    }
  }

  test("MunroPat binBoundaries dedup + -Inf head") {
    val s = MunroPatSketch(5)
    (1 to 1000).foreach(_ => s.add(7.0)) // constant data -> all quantiles equal
    val b = s.binBoundaries()
    assert(b.head.isNegInfinity)
    assert(b.length === 2) // -Inf plus one deduped boundary
  }

  test("IVF assigns every vector and finds the duplicated twin") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val base = (0L until 60L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    // add an exact twin of vector 0
    val d = (base :+ ((60L, base.head._2.clone()))).toDF("vec_id", "embedding")
    val top = Ivf.ivfTopK(d, k = 1, nCells0 = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // twin pair must be mutual rank-1 (identical vectors share a cell)
    assert(top(0L) === 60L)
    assert(top(60L) === 0L)
  }

  test("IVF multi-probe recall: nProbe=nCells equals brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    val d = (0L until 80L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    def rank1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(org.apache.spark.sql.functions.col("rank") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val brute = rank1(graft.sim.Similarity.cosineTopK(d, 1))
    val single = rank1(Ivf.ivfTopK(d, k = 1, nCells0 = 4))
    val multi = rank1(Ivf.ivfTopK(d, k = 1, nCells0 = 4, nProbe = 4))
    def recall(got: Map[Long, Long]): Double =
      brute.count { case (q, nb) => got.get(q).contains(nb) }.toDouble /
        brute.size
    // probing every cell must recover the exact brute-force rank-1 set
    assert(recall(multi) === 1.0)
    // and the recall knob is monotone: multi-probe ≥ single-probe
    assert(recall(multi) >= recall(single))
  }
}
