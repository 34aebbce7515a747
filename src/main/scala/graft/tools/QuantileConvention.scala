package graft.tools

import org.apache.spark.sql.functions._

/** Empirical probe: which rank convention does exact
  * `percentile_approx(v, p, MaxInt)` follow? Candidates tested against
  * many random multisets; prints the convention(s) that match ALL cases.
  * One-off evidence runner for ops.ExactQuantiles. */
object QuantileConvention {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session("8")
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    // candidate target-rank formulas (1-based rank into the sorted multiset)
    val candidates: Seq[(String, (Double, Long) => Long)] = Seq(
      ("ceil(p*n)", (p, n) => math.ceil(p * n).toLong),
      ("floor(p*n)+1", (p, n) => math.floor(p * n).toLong + 1),
      ("floor(p*(n-1))+1", (p, n) => math.floor(p * (n - 1)).toLong + 1),
      ("ceil(p*(n-1))+1", (p, n) => math.ceil(p * (n - 1)).toLong + 1),
      ("round(p*(n-1))+1", (p, n) => math.round(p * (n - 1)) + 1))
    var alive = candidates.map(_._1).toSet
    (1 to 30).foreach { trial =>
      val n = 1 + rnd.nextInt(500)
      // duplicates on purpose: convention must hold on multisets
      val vals = Array.fill(n)(rnd.nextInt(60).toDouble)
      val df = vals.toSeq.toDF("v")
      val got = df.agg(
        percentile_approx(col("v"), array(probs.map(lit): _*),
          lit(2147483647))).head().getSeq[Double](0)
      val sorted = vals.sorted
      probs.zip(got).foreach { case (p, g) =>
        candidates.foreach { case (name, f) =>
          if (alive(name)) {
            val r = math.min(math.max(f(p, n), 1L), n.toLong)
            if (sorted((r - 1).toInt) != g) {
              println(s"trial $trial: '$name' dies at p=$p n=$n " +
                s"(expected $g got ${sorted((r - 1).toInt)})")
              alive -= name
            }
          }
        }
      }
    }
    println(s"[convention] surviving: ${alive.mkString(", ")}")
    spark.stop()
  }
}
