package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns (faiss SQ8-style): the
  * memory-compression path a 100-TB ANN corpus needs — 4× smaller vector
  * payloads for the re-attach/scoring stages, at a bounded reconstruction
  * error (< range/256 per dimension).
  *
  * Two stages, both scale-shaped:
  *  1. [[ranges]] — per-DIMENSION min/max over the corpus. One
  *     aggregation with map-side partial combine on `dim` keys: the
  *     shuffle moves ≤ `dims` rows per partition regardless of corpus
  *     size, and the result (2·dims doubles) lands on the driver as the
  *     trained quantizer.
  *  2. [[quantizeInt8]] — codes each vector against the broadcast-literal
  *     ranges as a pure `transform` expression: a zero-shuffle narrow map
  *     (no UDF, stays inside whole-stage codegen).
  *
  * All arithmetic is IEEE-double with a fixed operation order and the
  * bucket cut is `floor` (never round — engines disagree on .5 ties), so
  * codes are engine-exact and oracle-checkable. A degenerate dimension
  * (max == min) codes to 0.
  */
object Quantize {

  /** Per-dimension (lo, hi) over the corpus; `dims` must match the
    * embedding length. Missing dimensions (never observed) default to
    * (0, 0) — degenerate, codes to 0. */
  def ranges(emb: DataFrame, dims: Int,
             embCol: String = "embedding"): (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(col(embCol)).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
      .collect() // ≤ dims rows — driver math, corpus-independent
    val lo = Array.fill(dims)(0.0)
    val hi = Array.fill(dims)(0.0)
    rows.foreach { r =>
      val d = r.getInt(0)
      if (d < dims) { lo(d) = r.getDouble(1); hi(d) = r.getDouble(2) }
    }
    (lo, hi)
  }

  /** Code expression for one vector column against literal ranges:
    * `q_d = min(floor((v_d − lo_d) / (hi_d − lo_d) · 256), 255)`, clamped
    * to [0, 255] (stored as int; the int8 byte is `q − 128`, kept
    * unsigned here so the oracle compare stays sign-free). */
  def codeExpr(embCol: Column, lo: Array[Double],
               hi: Array[Double]): Column = {
    val loLit = array(lo.map(lit(_)): _*)
    val hiLit = array(hi.map(lit(_)): _*)
    // transform's (x, i) lambda: i is the 0-based dim; element_at is
    // 1-based into the literal range arrays
    transform(embCol, (x, i) => {
      val l = element_at(loLit, i + 1)
      val h = element_at(hiLit, i + 1)
      when(h === l, lit(0L)).otherwise(
        greatest(lit(0L), least(
          floor((x.cast("double") - l) / (h - l) * lit(256.0)).cast("long"),
          lit(255L))))
    })
  }

  /** Quantize a corpus: (idCol, codes array<long>) — zero-shuffle narrow
    * map against the broadcast-literal ranges. */
  def quantizeInt8(emb: DataFrame, lo: Array[Double], hi: Array[Double],
                   idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), codeExpr(col(embCol), lo, hi).as("codes"))

  /** Dequantize codes back to doubles (bucket centers):
    * `v̂_d = lo_d + (q_d + 0.5) / 256 · (hi_d − lo_d)` — reconstruction
    * error is bounded by half a bucket, range/512. */
  def dequantExpr(codesCol: Column, lo: Array[Double],
                  hi: Array[Double]): Column = {
    val loLit = array(lo.map(lit(_)): _*)
    val hiLit = array(hi.map(lit(_)): _*)
    transform(codesCol, (q, i) => {
      val l = element_at(loLit, i + 1)
      val h = element_at(hiLit, i + 1)
      l + (q.cast("double") + lit(0.5)) / lit(256.0) * (h - l)
    })
  }
}
