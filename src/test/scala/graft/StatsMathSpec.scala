package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.StatsMath

/** Golden values from the reference's labor-neg fixture
  * (`example/labor-neg/DataStore/DataSet1/ColumnConfig.json`) — the exact
  * numbers Shifu's own ColumnStatsCalculator produced for that dataset. */
class StatsMathSpec extends AnyFunSuite {

  test("KS/IV matches reference golden: wage_increase_first_year") {
    val neg = Seq(24.0, 2.0, 2.0, 0.0, 0.0, 0.0)
    val pos = Seq(10.0, 6.0, 6.0, 16.0, 6.0, 6.0)
    val m = StatsMath.columnMetrics(neg, pos).get
    assert(m.ks === 65.71428571428571)
    assert(m.iv === 13.027723022810518)
  }

  test("KS/IV matches reference golden: duration") {
    val neg = Seq(8.0, 10.0, 10.0)
    val pos = Seq(10.0, 24.0, 16.0)
    val m = StatsMath.columnMetrics(neg, pos).get
    assert(m.ks === 8.57142857142857)
    assert(m.iv === 0.0709737199388362)
  }

  test("one-sided class returns None (reference returns null)") {
    assert(StatsMath.columnMetrics(Seq(1.0, 2.0), Seq(0.0, 0.0)).isEmpty)
    assert(StatsMath.columnMetrics(Seq(0.0, 0.0), Seq(1.0, 2.0)).isEmpty)
  }

  test("stdDev from sums matches direct computation") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val n = xs.length.toLong
    val mean = xs.sum / n
    val direct = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    val viaSums = StatsMath.stdDevFromSums(n, xs.sum, xs.map(x => x * x).sum)
    assert(math.abs(direct - viaSums) < 1e-12)
  }

  test("skewness/kurtosis of symmetric data") {
    val xs = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
    val n = xs.length.toLong
    val sum = xs.sum
    val s2 = xs.map(x => x * x).sum
    val s3 = xs.map(x => x * x * x).sum
    val s4 = xs.map(x => x * x * x * x).sum
    val mean = sum / n
    val std = StatsMath.stdDevFromSums(n, sum, s2)
    assert(math.abs(StatsMath.skewness(n, mean, std, sum, s2, s3)) < 1e-12)
    assert(StatsMath.kurtosis(n, mean, std, sum, s2, s3, s4) > 0)
  }

  test("PSI of identical distributions is zero; shifted is positive") {
    val a = Seq(0.25, 0.25, 0.25, 0.25)
    assert(StatsMath.psi(a, a) === 0.0)
    assert(StatsMath.psi(Seq(0.4, 0.3, 0.2, 0.1), a) > 0.0)
  }
}
