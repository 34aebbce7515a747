package graft.tools

import org.apache.spark.sql.functions._

/** At-rest vector-codec probe: build the SAME ANN index twice — once
  * under the default `f64` codec, once under `f32`
  * (`spark.sql.graft.ann.vectorCodec`) — then report on-disk vector
  * bytes, compaction wall time, and query parity. The evidence run
  * behind BENCH_SCALE.md's codec row: the f32 index must be ~2× smaller
  * in vector bytes and answer float-born queries bit-identically.
  *
  * Usage: `scripts/run.sh graft.tools.CodecProbe [n] [dim] [born]`
  * — defaults 200000 vectors × 64 dims, `born` = `f32` (float-born,
  * the embeddings table's type: parity must be BIT-IDENTICAL, but
  * snappy already reclaims part of the double-stored waste, so the
  * on-disk ratio undershoots 2×) or `f64` (full-entropy double-born:
  * storage rounds half-ulp, parity is recall overlap ≥ 0.99, and the
  * on-disk ratio shows the full ~2×).
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val born = args.lift(2).getOrElse("f32")
    val spark = Harness.session()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_codec_probe").toString
    // deterministic corpus; float-born values make the f32 round-trip
    // exact, double-born keeps full mantissa entropy
    val elem =
      if (born == "f32") "cast(sin(id * 131 + d * 17) AS float)"
      else "sin(id * 131 + d * 17)"
    def emb(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("vec_id"), expr(
        s"transform(sequence(0, ${dim - 1}), d -> $elem)").as("embedding"))
    def dirBytes(d: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else f.length()
      walk(new java.io.File(d))
    }
    val cells = graft.streaming.AnnIngest.cellsFor(n)
    val half = n / 2
    val results = Seq("f64", "f32").map { codec =>
      spark.conf.set(graft.streaming.AnnIngest.VectorCodecKey, codec)
      val idx = s"$tmp/$codec"
      val t0 = System.nanoTime()
      graft.streaming.AnnIngest.ingestBatch(emb(0L, half), 0L, idx, cells)
      graft.streaming.AnnIngest.ingestBatch(emb(half, n), 1L, idx, cells)
      graft.streaming.AnnIngest.compact(spark, idx, 1L)
      val sec = (System.nanoTime() - t0) / 1e9
      val bytes = dirBytes(s"$idx/vectors")
      val top = graft.streaming.AnnIngest.queryTopK(spark, idx,
        emb(0L, 200L), k = 3, nProbe = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sorted.toSeq
      // the serving-scan claim, measured: a full-index vector scan
      // (read every e, fold it) is byte-bound — min of 3 reps
      val scanS = (1 to 3).map { _ =>
        val t1 = System.nanoTime()
        graft.streaming.AnnIngest.readIndex(spark, idx, None)
          .select(expr("sum(aggregate(e, 0.0d, (a, x) -> a + x))"))
          .collect()
        (System.nanoTime() - t1) / 1e9
      }.min
      println(f"[codec] $codec born=$born n=$n dim=$dim cells=$cells " +
        f"vector_bytes=$bytes ingest_compact_s=$sec%.1f " +
        f"full_scan_s=$scanS%.2f")
      (codec, bytes, top)
    }
    spark.conf.unset(graft.streaming.AnnIngest.VectorCodecKey)
    val Seq((_, b64, t64), (_, b32, t32)) = results
    val ok =
      if (born == "f32") {
        val parity = t64 == t32
        println(f"[codec] ratio=${b64.toDouble / b32}%.2fx " +
          s"query_parity=${if (parity) "BIT-IDENTICAL" else "MISMATCH"}")
        parity
      } else {
        // double-born storage rounds half-ulp, which can FLIP ties
        // between near-equal neighbors (a synthetic lattice is
        // tie-dense) — so judge QUALITY, not id identity: at every
        // (query, rank) the similarity achieved under f32 must match
        // f64's within rounding
        val cos64 = t64.map(t => (t._1, t._2) -> t._4).toMap
        val diffs = t32.map(t =>
          math.abs(cos64((t._1, t._2)) - t._4))
        val maxDiff = if (diffs.isEmpty) 0.0 else diffs.max
        val ids64 = t64.map(t => (t._1, t._3)).toSet
        val overlap = t32.count(t => ids64((t._1, t._3))).toDouble /
          math.max(t64.size, 1)
        println(f"[codec] ratio=${b64.toDouble / b32}%.2fx " +
          f"max_cos_diff=$maxDiff%.2e id_overlap=$overlap%.4f " +
          "(f64-born: id flips below max_cos_diff are ties, not loss)")
        maxDiff <= 1e-5
      }
    if (!ok) sys.exit(4)
    spark.stop()
  }
}
