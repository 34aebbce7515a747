package graft

import org.scalatest.funsuite.AnyFunSuite

/** Deflate-compressibility signal: ordering, determinism, edge cases. */
class CompressibilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ratios(rows: Seq[(Long, String)]): Map[Long, Long] =
    graft.text.TextOps.compressibility(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap

  test("repetitive text compresses far better than high-entropy text, " +
    "and the signal is deterministic") {
    val rnd = new scala.util.Random(7)
    val noisy = (1 to 4000).map(_ =>
      (rnd.nextInt(94) + 33).toChar).mkString
    val rows = Seq(
      (1L, "ab" * 2000),            // pure repetition
      (2L, ("the quick brown fox jumps over the lazy dog " * 90)), // phrases
      (3L, noisy))                   // near-incompressible
    val r1 = ratios(rows)
    assert(r1(1L) < r1(2L), "pure repetition beats phrase repetition")
    assert(r1(2L) < r1(3L), "any repetition beats random bytes")
    assert(r1(3L) > 700000L, "printable-ASCII noise stays near its ~6.6-bit entropy bound")
    assert(r1(1L) < 50000L, "pure repetition collapses")
    assert(ratios(rows) === r1) // bit-deterministic across runs
  }

  test("empty and null texts produce zero-byte rows, not failures") {
    val out = graft.text.TextOps.compressibility(
        Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "x"))
          .toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(3))))
      .toMap
    assert(out(1L) === ((0L, 0L)))
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L)._1 === 1L)
  }
}
