package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 fixes: hostile column names through the correlation stack
  * path, ensemble PMML round-trips. */
class Round6OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pearsonPairs survives hostile column names ('|', space, quote, " +
    "leading digit) and both physical paths agree") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1 to 400).map { _ =>
      val a = rnd.nextGaussian()
      (a, a * 0.7 + 0.3 * rnd.nextGaussian(), rnd.nextGaussian())
    }
    // "a|b" used to parse as bitwise-OR of columns a and b; "don't stop"
    // used to break the pair-label literal; "2fast" broke the identifier
    val names = Seq("a|b", "don't stop", "2fast")
    val df = rows.toDF(names: _*)
    def asMap(wideK: Int) =
      graft.ops.Correlation.pearsonPairs(df, names, wideK)
        .collect().map(r =>
          (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val stack = asMap(wideK = 99)
    val gram = asMap(wideK = 2)
    assert(stack.keySet === Set(
      ("a|b", "don't stop"), ("a|b", "2fast"), ("don't stop", "2fast")))
    assert(stack.keySet === gram.keySet)
    stack.foreach { case (k, v) => assert(v === gram(k), s"pair $k") }
    // the '|' name must NOT have been interpreted as an expression: the
    // correlation of the pair (a|b, don't stop) is the strong one we built
    assert(stack(("a|b", "don't stop")) > 0.5)
    // labeled single-field variant quotes the same way
    val labeled = graft.ops.Correlation.pearsonStack(df, names)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(labeled.keySet === Set(
      "a|b|don't stop", "a|b|2fast", "don't stop|2fast"))
  }
}
