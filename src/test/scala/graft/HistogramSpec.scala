package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.Histogram

class HistogramSpec extends AnyFunSuite {

  test("quantile boundaries of uniform data approximate exact quantiles") {
    val h = Histogram(10, 100)
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(100000)(rnd.nextDouble() * 100)
    xs.foreach(h.add(_))
    val bounds = h.quantileBoundaries(10)
    assert(bounds.head.isNegInfinity)
    assert(bounds.length === 10)
    // interior boundaries should be near the 10/20/.../90th percentiles
    bounds.drop(1).zipWithIndex.foreach { case (b, i) =>
      val expect = (i + 1) * 10.0
      assert(math.abs(b - expect) < 1.5, s"boundary $i: $b vs $expect")
    }
  }

  test("merge of two histograms equals one histogram over the union (approximately)") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(20000)(rnd.nextGaussian())
    val whole = Histogram(10); xs.foreach(whole.add(_))
    val a = Histogram(10); xs.take(10000).foreach(a.add(_))
    val b = Histogram(10); xs.drop(10000).foreach(b.add(_))
    val merged = a.merge(b)
    val bw = whole.quantileBoundaries(10)
    val bm = merged.quantileBoundaries(10)
    assert(bw.length === bm.length)
    bw.zip(bm).drop(1).foreach { case (x, y) =>
      assert(math.abs(x - y) < 0.1, s"$x vs $y")
    }
  }

  test("weighted histogram doubles counts like duplicated points") {
    val xs = (1 to 1000).map(_.toDouble)
    val h1 = Histogram(5); xs.foreach(v => h1.add(v, 2.0))
    val h2 = Histogram(5); xs.foreach { v => h2.add(v); h2.add(v) }
    val b1 = h1.quantileBoundaries(5)
    val b2 = h2.quantileBoundaries(5)
    b1.zip(b2).drop(1).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6, s"$x vs $y")
    }
    assert(h1.totalWeight === 2000.0)
  }

  test("total weight and cap respected") {
    val h = new Histogram(50)
    (1 to 10000).foreach(i => h.add(i.toDouble))
    h.compress()
    assert(h.values.length <= 50)
    assert(h.totalWeight === 10000.0)
  }

  test("sum (cumulative weight) is monotone and bounded") {
    val h = Histogram(10)
    (1 to 1000).foreach(i => h.add(i.toDouble))
    val s10 = h.sum(10)
    val s500 = h.sum(500)
    val s2000 = h.sum(2000)
    assert(s10 >= 0 && s10 <= s500 && s500 <= s2000)
    assert(s2000 === 1000.0)
  }
}
