package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operators: real image decode, and the round's CLI/ops additions. */
class Round7OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ImageOps decodes real PNGs: dims, per-pixel mean luma; corrupt " +
    "payloads become decode_ok=false rows; plan is a narrow map") {
    import spark.implicits._
    val solid = graft.media.ImageOps.syntheticPng(8, 5, 200)
    val grad = graft.media.ImageOps.gradientPng(8, 5)
    val bad = Array[Byte](1, 2, 3, 4)
    val df = Seq((1L, solid), (2L, grad), (3L, bad), (4L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val out = graft.media.ImageOps.decodeImages(df)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"image decode must stay a narrow map (zero shuffles):\n$plan")
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(m(1L) === ((8L, 5L, 200.0, true)), "solid gray decodes exactly")
    // gradient pixel (x,y) = (x+y)%256; mean over 8x5 = ((8-1)+(5-1))/2
    assert(m(2L) === ((8L, 5L, 5.5, true)), "per-pixel luma math is real")
    assert(m(3L) === ((0L, 0L, 0.0, false)), "garbage bytes flagged, not fatal")
    assert(m(4L) === ((0L, 0L, 0.0, false)), "empty payload flagged, not fatal")
  }
}
