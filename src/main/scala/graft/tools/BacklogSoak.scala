package graft.tools

import org.apache.spark.sql.functions._

/** Heal-BACKLOG convergence drill for the ANN index: heals serialize
  * (at most one split-OR-fold per compaction, `AnnIngest.compactLocked`),
  * but each heal batches EVERY pending cell of its kind — so the open
  * question from the long-horizon soak is how many compactions a
  * worst-case era needs when MANY cells go hot and cold
  * SIMULTANEOUSLY, and whether the split/fold pair can oscillate
  * (a split lowers the mean a fold reads, and vice versa).
  *
  * The drill builds a `nRegions`-cell index from a uniform first
  * batch, then manufactures the worst case in one stroke: a hot wave
  * concentrates 4 batches into 4 regions while a takedown retracts
  * HALF the regions outright — leaving hot cells at ~5x mean and a
  * dozen drained cells below any fold threshold, both pending at the
  * same instant. It then runs drain compactions with BOTH triggers
  * armed until a full cycle fires no heal (quantizer pointer and live
  * width both stable), asserting live-exactly-once + argmin after
  * EVERY cycle, and prints cycles-to-converge plus per-cycle cost.
  *
  * Usage: `scripts/run.sh graft.tools.BacklogSoak [nRegions] [perRegion]`
  * — defaults 32 × 2000. Exit 6 on contract failure or
  * non-convergence within 12 cycles. Results in BENCH_SCALE.md. */
object BacklogSoak {
  def main(args: Array[String]): Unit = {
    val nRegions = args.headOption.map(_.toInt).getOrElse(32)
    val perRegion = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = Harness.session()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_backlog_soak").toString
    val idx = s"$tmp/idx"
    val dim = 32
    // region r sits at base r·3.0 on every dim (inter-region L2 =
    // 3·sqrt(dim), far beyond the 0.3 intra-region spread)
    def regionsDf(lo: Long, hi: Long, regionOf: String) =
      spark.range(lo, hi).select(col("id").as("vec_id"), expr(
        s"transform(sequence(0, ${dim - 1}), d -> " +
          s"cast(($regionOf) * 3.0 + 0.3 * sin(id * 131 + d * 17) " +
          "AS float))").as("embedding"))
    val n0 = nRegions.toLong * perRegion
    // batch 0: uniform over all regions → the frozen quantizer learns
    // ~one cell per region
    graft.streaming.AnnIngest.ingestBatch(
      regionsDf(0L, n0, s"id % $nRegions"), 0L, idx, nRegions)
    // hot wave: four batches, all into regions 0..3 (~5x mean there)
    val waveN = 4L * nRegions * perRegion / 8
    (1 to 4).foreach { b =>
      val lo = n0 + (b - 1) * waveN / 4; val hi = n0 + b * waveN / 4
      graft.streaming.AnnIngest.ingestBatch(
        regionsDf(lo, hi, "id % 4"), b.toLong, idx, nRegions)
    }
    // takedown: retract HALF the regions of batch 0 in one wave —
    // those cells drain to ~zero while the hot cells are still hot
    val coldIds = spark.range(0L, n0)
      .filter(col("id") % nRegions >= nRegions / 2)
      .select(col("id").as("vec_id"))
    val retracted = coldIds.count()
    graft.streaming.AnnIngest.delete(spark, idx, coldIds, "backlog")
    val expectN = n0 + waveN - retracted
    println(s"[backlog] regions=$nRegions perRegion=$perRegion " +
      s"ingested=${n0 + waveN} retracted=$retracted live=$expectN " +
      "(hot cells ~5x mean + half the regions drained, both pending)")

    def contracts(tag: String): Boolean = {
      val cents = graft.streaming.AnnIngest.readCentroids(spark, idx).get
      val live = graft.streaming.AnnIngest.readIndex(spark, idx, None)
        .persist()
      val n = live.count()
      val distinct = live.select("vec_id").distinct().count()
      val mismatch = live.join(
        graft.sim.Ivf.assignCells(live.select("vec_id", "e", "norm"),
          cents).select(col("vec_id"), col("cell").as("cell_x")),
        Seq("vec_id"))
        .filter(col("cell") =!= col("cell_x")).count()
      live.unpersist(false)
      val ok = n == expectN && distinct == expectN && mismatch == 0
      if (!ok) println(s"[backlog] CONTRACT VIOLATION at $tag: " +
        s"n=$n/$expectN distinct=$distinct argmin_mismatch=$mismatch")
      ok
    }

    // drain: both triggers armed every cycle; converged = a full cycle
    // that fires NO heal (quantizer pointer and live width unchanged)
    var cycles = 0
    var converged = false
    var healsSeen = List.empty[String]
    var allOk = true
    while (!converged && cycles < 12) {
      val qBefore = graft.streaming.AnnIngest.quantizerName(spark, idx)
      val wBefore = graft.streaming.AnnIngest.liveCellCount(spark, idx)
      val t0 = System.nanoTime()
      graft.streaming.AnnIngest.compact(spark, idx, (5 + cycles).toLong,
        splitHot = 2.0, foldColdBelow = 0.3)
      val ms = (System.nanoTime() - t0) / 1000000
      val qAfter = graft.streaming.AnnIngest.quantizerName(spark, idx)
      val wAfter = graft.streaming.AnnIngest.liveCellCount(spark, idx)
      cycles += 1
      val healed = qAfter != qBefore || wAfter != wBefore
      val kind =
        if (!healed) "none"
        else if (wAfter > wBefore) s"split(+${wAfter - wBefore})"
        else if (wAfter < wBefore) s"fold(-${wBefore - wAfter})"
        else "retag"
      if (healed) healsSeen ::= kind
      allOk &= contracts(s"cycle $cycles")
      println(s"[backlog] cycle=$cycles heal=$kind ms=$ms " +
        s"liveCells=$wBefore->$wAfter")
      converged = !healed
    }
    val ok = converged && allOk
    println(s"[backlog] converged=${converged} cycles=$cycles " +
      s"heals=${healsSeen.reverse.mkString(",")} " +
      s"verdict=${if (ok) "PASS" else "FAIL"}")
    if (!ok) sys.exit(6)
    spark.stop()
  }
}
