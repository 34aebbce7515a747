package graft.tools

import org.apache.spark.sql.functions._

/** Split-vs-full retrain probe for the ANN index's self-heal
  * (streaming/AnnIngest): build two IDENTICAL drifted indexes — `n`
  * spread vectors plus a far cluster crowding one frozen cell — then
  * heal one with `compact(splitHot)` (the LOCAL split) and the other
  * with `compact(retrain = true)` (the full rebuild), and report wall
  * time, rewritten-row fraction, and the argmin contract check for
  * both. This is the measured backing for the "affordable self-heal"
  * claim: the split's write cost must track the MOVERS (hot-cell
  * share), the full rebuild's the corpus.
  *
  * Usage: runMain graft.tools.SplitProbe [nSpread] [nHot] [nCells]
  *        — defaults 40000 6000 64; run a second time at 10x those to
  * see the fractions hold while absolute costs scale.
  * Results recorded in BENCH_SCALE.md. */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val nSpread = args.headOption.map(_.toLong).getOrElse(40000L)
    val nHot = args.lift(1).map(_.toLong).getOrElse(6000L)
    val nCells = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = Harness.session()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_split_probe").toString
    // distributed synthesis (no driver-side staging at 10x):
    // spread = a sin lattice; hot = a tight cluster far outside it
    def spread(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("vec_id"), expr(
        "transform(sequence(0, 31), " +
          "d -> cast(sin(id * 131 + d * 17) AS float))").as("embedding"))
    def hot(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("vec_id"), expr(
        "transform(sequence(0, 31), " +
          "d -> cast(-7.0 + 0.01 * sin(id * 131 + d * 17) AS float))")
        .as("embedding"))
    val total = nSpread + nHot
    Seq("split", "full").foreach { mode =>
      val idx = s"$tmp/$mode"
      graft.streaming.AnnIngest.ingestBatch(
        spread(0L, nSpread), 0L, idx, nCells)
      graft.streaming.AnnIngest.ingestBatch(
        hot(nSpread, total), 1L, idx, nCells)
      graft.streaming.AnnIngest.compact(spark, idx, 1L) // one clean run
      val t0 = System.nanoTime()
      if (mode == "split")
        graft.streaming.AnnIngest.compact(spark, idx, 2L, splitHot = 3.0)
      else
        graft.streaming.AnnIngest.compact(spark, idx, 2L, retrain = true)
      val healMs = (System.nanoTime() - t0) / 1000000
      // rewritten rows = rows of runs the heal wrote (run_2_*), parsed
      // from the manifest (the tools package reads the committed JSON,
      // not the streaming-private API)
      val manifestTxt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$idx/manifest.json")), "UTF-8")
      val rewritten =
        "\\{\"name\": \"run_2_[^\"]*\", \"rows\": (\\d+)\\}".r
          .findAllMatchIn(manifestTxt).map(_.group(1).toLong).sum
      val cents = graft.streaming.AnnIngest.readCentroids(spark, idx).get
      val live = graft.streaming.AnnIngest.readIndex(spark, idx, None)
        .persist()
      val liveN = live.count()
      val expect = graft.sim.Ivf.assignCells(
        live.select("vec_id", "e", "norm"), cents)
        .select(col("vec_id"), col("cell").as("cell_x"))
      val mismatch = live.join(expect, Seq("vec_id"))
        .filter(col("cell") =!= col("cell_x")).count()
      live.unpersist(false)
      println(f"[$mode] n=$total heal_ms=$healMs " +
        f"rewritten=$rewritten (${rewritten.toDouble / total}%.3f of corpus) " +
        f"cells=${cents.length} live=$liveN argmin_mismatch=$mismatch")
    }
    spark.stop()
  }
}
