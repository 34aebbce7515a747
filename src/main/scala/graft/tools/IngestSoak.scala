package graft.tools

import org.apache.spark.sql.functions._

/** Wall-time flatness soak for the streaming ingest gate's index
  * layout (streaming/IngestIndex): drive N micro-batches of synthetic
  * documents through StreamOps.ingestBatch (+ periodic compaction) and
  * print per-batch milliseconds. The claim under test: per-batch cost
  * is INDEPENDENT of how many batches came before — the old
  * re-read-every-batch-dir layout grew linearly in history, the
  * delta+compacted-base+bloom layout must not.
  *
  * Usage: runMain graft.tools.IngestSoak [numBatches] [docsPerBatch]
  *        [compactEvery] — defaults 64 512 16. ~10% of each batch
  * duplicates earlier content so the suspect path stays exercised.
  * Output: one line per batch `batch=<id> ms=<t>`, then a summary
  * comparing mean ms of the first and last quartile of batches.
  * Results recorded in BENCH_SCALE.md. */
object IngestSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(64)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(512)
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = Harness.session()
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ingest_soak").toString
    val times = (0 until n).map { b =>
      val rows = (0 until perBatch).map { i =>
        val id = b.toLong * perBatch + i
        // ~10% duplicate a doc from an EARLIER batch (suspect path);
        // the rest are unique (bloom-clean fast path)
        val text =
          if (b > 0 && i % 10 == 0)
            s"shared corpus document number ${i / 10} body text " +
              s"with stable words ${(0 until 30).map(j => s"w${(i / 10 + j) % 97}").mkString(" ")}"
          else
            s"unique document $id " +
              (0 until 30).map(j => s"t${(id + j * 31) % 9973}").mkString(" ")
        (id, text)
      }
      val df = rows.toDF("doc_id", "text").repartition(8)
      val t0 = System.nanoTime()
      graft.streaming.StreamOps.ingestBatch(df, b.toLong,
        s"$tmp/idx", s"$tmp/out")
      if (compactEvery > 0 && (b + 1) % compactEvery == 0)
        graft.streaming.IngestIndex.compact(spark, s"$tmp/idx", b.toLong)
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"batch=$b ms=$ms")
      ms
    }
    // steady-state flatness: compare early vs late quartile means over
    // NON-compaction batches (compaction pays the O(corpus) base
    // rewrite deliberately, amortized over compactEvery batches — it
    // is reported separately, not smeared into the per-batch claim)
    // ... and over batches AFTER the first compaction: the pre-base
    // regime (tiny delta-only index) is cheaper but not representative
    // of a long-running stream, which lives in the compacted regime
    val steadyFrom = if (compactEvery > 0) compactEvery else 1
    val steady = times.zipWithIndex.drop(steadyFrom)
      .filterNot { case (_, b) =>
        compactEvery > 0 && (b + 1) % compactEvery == 0 }.map(_._1)
    val compactions = times.zipWithIndex.filter { case (_, b) =>
      compactEvery > 0 && (b + 1) % compactEvery == 0 }.map(_._1)
    val q = steady.length / 4
    val firstQ = steady.take(q).sum.toDouble / q
    val lastQ = steady.takeRight(q).sum.toDouble / q
    val total = spark.read.parquet(s"$tmp/out").count()
    val kept = spark.read.parquet(s"$tmp/out")
      .filter(col("kept")).count()
    println(f"steadyFirstQMeanMs=$firstQ%.1f steadyLastQMeanMs=$lastQ%.1f " +
      f"ratio=${lastQ / firstQ}%.2f " +
      f"compactionsMeanMs=${
        if (compactions.isEmpty) 0.0
        else compactions.sum.toDouble / compactions.length}%.1f " +
      f"decisions=$total kept=$kept")
    spark.stop()
  }
}
