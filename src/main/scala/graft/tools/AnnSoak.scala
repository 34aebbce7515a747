package graft.tools

/** Wall-time flatness soak for the streaming ANN index
  * (streaming/AnnIngest): drive N micro-batches of synthetic 64-dim
  * vectors through AnnIngest.ingestBatch (+ periodic compaction) and
  * print per-batch milliseconds. The claim under test is stronger than
  * the dedup gate's: ingest is APPEND-ONLY (no prior-state probe at
  * all), so per-batch cost must be flat in history by construction —
  * this soak is the measured check that nothing incidental (file
  * listing, manifest reads, partition-dir counts) re-introduces a
  * history term. A probe-1 queryTopK is timed after the first and last
  * quartile of batches to show query cost tracks corpus/nCells, not
  * delta-dir count.
  *
  * Usage: runMain graft.tools.AnnSoak [numBatches] [vecsPerBatch]
  *        [compactEvery] [nCells] — defaults 32 2000 8 16. nCells
  * `auto` = `AnnIngest.cellsFor(numBatches · vecsPerBatch)`, the
  * production geometry: the 10×/100× query-path check must scale cells
  * with √n (a fixed cell count makes per-query scan cost grow linearly
  * with the corpus — the same cliff `bitsFor` fixed for LSH).
  * Results recorded in BENCH_SCALE.md. */
object AnnSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(32)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(2000)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(8)
    val nCells = args.lift(3) match {
      case Some("auto") =>
        val c = graft.streaming.AnnIngest.cellsFor(n.toLong * perBatch)
        println(s"nCells=auto -> $c for ${n.toLong * perBatch} vectors")
        c
      case other => other.map(_.toInt).getOrElse(16)
    }
    val spark = Harness.session()
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ann_soak").toString
    def batchDf(b: Int) = (0 until perBatch).map { i =>
      val id = b.toLong * perBatch + i
      (id, Array.tabulate(64)(d =>
        math.sin((id * 131 + d * 17).toDouble).toFloat))
    }.toDF("vec_id", "embedding").repartition(8)
    def queryMs(tag: String): Unit = {
      val q = batchDf(0).limit(200)
      val t0 = System.nanoTime()
      val rows = graft.streaming.AnnIngest
        .queryTopK(spark, s"$tmp/idx", q, k = 3, nProbe = 1).count()
      println(s"query[$tag] ms=${(System.nanoTime() - t0) / 1000000} " +
        s"rows=$rows")
    }
    val times = (0 until n).map { b =>
      val df = batchDf(b)
      val t0 = System.nanoTime()
      graft.streaming.AnnIngest.ingestBatch(df, b.toLong, s"$tmp/idx",
        nCells)
      if (compactEvery > 0 && (b + 1) % compactEvery == 0)
        graft.streaming.AnnIngest.compact(spark, s"$tmp/idx", b.toLong)
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"batch=$b ms=$ms")
      if (b == n / 4) queryMs("quarter")
      ms
    }
    queryMs("end")
    val steadyFrom = if (compactEvery > 0) compactEvery else 1
    val steady = times.zipWithIndex.drop(steadyFrom)
      .filterNot { case (_, i) =>
        compactEvery > 0 && (i + 1) % compactEvery == 0 }
      .map(_._1)
    val q = steady.length / 4
    if (q > 0) {
      val first = steady.take(q).sum.toDouble / q
      val last = steady.takeRight(q).sum.toDouble / q
      println(f"first-quartile mean $first%.0f ms, last-quartile mean " +
        f"$last%.0f ms, ratio ${last / first}%.2f")
    }
    val compactions = times.zipWithIndex
      .filter { case (_, i) => compactEvery > 0 && (i + 1) % compactEvery == 0 }
    println("compaction batches: " +
      compactions.map { case (t, i) => s"$i=${t}ms" }.mkString(", "))
    spark.stop()
  }
}
