package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Box-filter resize: hand-computed pooling, brightness monotonicity,
  * corrupt-payload flagging. */
class ResizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resizeOne pools a 4x4 quadrant image into the exact 2x2 means") {
    // quadrants: 10 | 20 / 30 | 40  (2x2 blocks of a 4x4 image)
    val png = graft.media.ImageOps.pngOf(4, 4, (x, y) => {
      val v = (if (y < 2) { if (x < 2) 10 else 20 }
               else { if (x < 2) 30 else 40 })
      (v << 16) | (v << 8) | v
    })
    val Some((w, h, pooled)) = graft.media.ImageOps.resizeOne(png, 2, 2)
    assert((w, h) === (4L, 4L))
    assert(pooled.toSeq === Seq(10L, 20L, 30L, 40L))
  }

  test("a uniformly brighter image strictly raises luma_sum; corrupt " +
    "payloads are flagged not dropped") {
    val rows = Seq(
      (1L, graft.media.ImageOps.syntheticPng(6, 6, 50)),
      (2L, graft.media.ImageOps.syntheticPng(6, 6, 200)),
      (3L, Array[Byte](1, 2, 3))) // not an image
      .toDF("doc_id", "payload")
    val got = graft.media.ImageOps.resizeBox(rows, 3, 3)
      .collect().map(r => (r.getLong(0), (r.getLong(5), r.getBoolean(9))))
      .toMap
    assert(got(1L) === ((9L * 50, true)))
    assert(got(2L) === ((9L * 200, true)))
    assert(got(3L)._2 === false)
  }

  test("resize is exactly scale-consistent with the aHash pooling on an " +
    "8x8 source") {
    val png = graft.media.ImageOps.patternPng(123L)
    val Some((_, _, pooled)) = graft.media.ImageOps.resizeOne(png, 8, 8)
    // 8x8 → 8x8 box filter is the identity on the gray values
    val expected = for (y <- 0 until 8; x <- 0 until 8)
      yield ((123L * 31 + x * 7 + y * 13) % 256)
    assert(pooled.toSeq === expected.map(_.toLong))
  }
}
