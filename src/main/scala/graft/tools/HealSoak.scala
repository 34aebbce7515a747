package graft.tools

import org.apache.spark.sql.functions._

/** Long-horizon self-heal soak for the ANN index
  * (streaming/AnnIngest): a 16+ batch feed crosses TWO distribution
  * shifts while `splitSkewAbove` and `foldColdBelow` are both armed,
  * then a takedown wave retracts the first drifted era and two more
  * compactions fold its drained cells. The claims under measurement:
  *
  *  - the LIVE quantizer width grows under drift (splits) and SHRINKS
  *    back after the drain (folds) — i.e. repeated heals do NOT grow
  *    the quantizer without bound (the round-12 "monotone growth"
  *    objection);
  *  - probe-1 query cost tracks corpus/liveCells through the whole
  *    horizon — measured after each era and after the fold;
  *  - live-exactly-once and the argmin contract hold at the end of the
  *    horizon (printed as PASS/FAIL).
  *
  * Usage: runMain graft.tools.HealSoak [batches] [perBatch] [nCells]
  *        — defaults 16 2000 16; run a second time at 10x perBatch to
  * see widths and flatness hold while absolute costs scale.
  * Results recorded in BENCH_SCALE.md. */
object HealSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(16)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(2000)
    val nCells = args.lift(2).map(_.toInt).getOrElse(16)
    require(nBatches >= 16, "the horizon needs >= 16 batches (two eras)")
    val spark = Harness.session()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_heal_soak").toString
    val idx = s"$tmp/idx"
    // distributed synthesis (no driver staging at 10x): era boundaries
    // at 6/16 and 11/16 of the horizon, mirroring the spec drill
    val eraA = nBatches * 6 / 16
    val eraB = nBatches * 11 / 16
    def batchDf(b: Int) = {
      val (base, spread) =
        if (b < eraA) (0.0, 1.0)
        else if (b < eraB) (-7.0, 0.01)
        else (9.0, 0.01)
      spark.range(b.toLong * perBatch, (b + 1).toLong * perBatch)
        .select(col("id").as("vec_id"), expr(
          s"transform(sequence(0, 31), d -> cast($base + $spread * " +
            "sin(id * 131 + d * 17) AS float))").as("embedding"))
    }
    def queryMs(tag: String): Unit = {
      // DETERMINISTIC query set — never `limit` without an order: an
      // unordered GlobalLimit is not a stable row set, and a plan that
      // embeds it twice (probe side + re-attach side of queryTopK)
      // joins two DIFFERENT 200-row subsets on multi-JVM executors,
      // nondeterministically matching zero rows. local[n] masks it
      // (single process, stable partition arrival order); the r15
      // multi-JVM soak caught it as silent empty/partial results.
      val q = spark.range(0L, 200L)
        .select(col("id").as("vec_id"), expr(
          s"transform(sequence(0, 31), d -> cast(0.0 + 1.0 * " +
            "sin(id * 131 + d * 17) AS float))").as("embedding"))
      val t0 = System.nanoTime()
      val rows = graft.streaming.AnnIngest
        .queryTopK(spark, idx, q, k = 3, nProbe = 1).count()
      println(s"query[$tag] ms=${(System.nanoTime() - t0) / 1000000} " +
        s"rows=$rows liveCells=" +
        graft.streaming.AnnIngest.liveCellCount(spark, idx))
    }
    val widths = scala.collection.mutable.ArrayBuffer.empty[Int]
    (0 until nBatches).foreach { b =>
      val t0 = System.nanoTime()
      graft.streaming.AnnIngest.ingestBatch(batchDf(b), b.toLong, idx,
        nCells)
      val compacted = (b + 1) % 2 == 0
      if (compacted) {
        // same trigger wiring as annIngestStream: last recorded skew
        val skew = graft.streaming.AnnIngest.lastSkew(spark, idx)
        val splitTrip = skew.exists(_ > 2.0)
        graft.streaming.AnnIngest.compact(spark, idx, b.toLong,
          splitHot = if (splitTrip) 2.0 else 0.0, foldColdBelow = 0.3)
        widths += graft.streaming.AnnIngest.liveCellCount(spark, idx)
      }
      println(s"batch=$b ms=${(System.nanoTime() - t0) / 1000000}" +
        (if (compacted) s" liveCells=${widths.last}" else ""))
      if (b == eraA - 1) queryMs("era1-end")
      if (b == eraB - 1) queryMs("era2-end")
    }
    queryMs("era3-end")
    val peak = widths.max
    // takedown wave: retract era 2 wholesale, fold its drained cells
    val a0 = eraA.toLong * perBatch; val a1 = eraB.toLong * perBatch
    graft.streaming.AnnIngest.delete(spark, idx,
      spark.range(a0, a1).select(col("id").as("vec_id")), "waveA")
    (0 until 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.streaming.AnnIngest.compact(spark, idx,
        (nBatches + i).toLong, foldColdBelow = 0.3)
      println(s"post-drain compaction $i ms=" +
        s"${(System.nanoTime() - t0) / 1000000} liveCells=" +
        graft.streaming.AnnIngest.liveCellCount(spark, idx))
    }
    val after = graft.streaming.AnnIngest.liveCellCount(spark, idx)
    queryMs("post-fold")
    // end-state contracts
    val cents = graft.streaming.AnnIngest.readCentroids(spark, idx).get
    val live = graft.streaming.AnnIngest.readIndex(spark, idx, None)
      .persist()
    val n = live.count()
    val distinct = live.select("vec_id").distinct().count()
    val expectN = nBatches.toLong * perBatch - (a1 - a0)
    val mismatch = live.join(
      graft.sim.Ivf.assignCells(live.select("vec_id", "e", "norm"), cents)
        .select(col("vec_id"), col("cell").as("cell_x")), Seq("vec_id"))
      .filter(col("cell") =!= col("cell_x")).count()
    live.unpersist(false)
    val ok = n == expectN && distinct == expectN && mismatch == 0 &&
      after < peak
    println(f"widths=${widths.mkString(",")} peak=$peak after=$after " +
      f"slots=${cents.length} n=$n/$expectN distinct=$distinct " +
      f"argmin_mismatch=$mismatch verdict=${if (ok) "PASS" else "FAIL"}")
    spark.stop()
  }
}
