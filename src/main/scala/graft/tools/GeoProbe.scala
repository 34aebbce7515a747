package graft.tools

import org.apache.spark.sql.functions._

/** 100x geometry probe: times the four PRODUCTION dedup/ANN paths
  * (`lshPairs`, `simhashPairs`, `incrementalDedup`, `annTopKAuto`) on a
  * documents/embeddings dir, so BENCH_SCALE.md's "100x geometry" section
  * can compare sec-per-input-row at sf0.1 vs the sparse 100x replica
  * (`scripts/gen_sf10.py`) — the question is whether bitsFor / dfCap /
  * maxBucket keep in-bucket work flat for another decade of n, with the
  * cluster-SIZE dimension deliberately held constant (that axis is the
  * 10x duplicate-dense soak's job).
  *
  * `scripts/run.sh graft.tools.GeoProbe <dir> [reps]` — prints one line
  * per (op, rep) plus a steady line (min of reps 2+; rep 1 carries plan
  * compilation).
  */
object GeoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    // optional 3rd arg: comma-separated path tags to probe (isolated
    // re-measures when adjudicating one path's window variance)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = Harness.session()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nDocs = docs.count()
    val nVecs = emb.count()
    println(s"[geoprobe] dir=$dir docs=$nDocs vecs=$nVecs " +
      s"bitsFor(vecs)=${graft.sim.Similarity.bitsFor(nVecs)}")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val ops: Seq[(String, () => Long)] = Seq(
      "lsh_pairs" -> (() => graft.text.TextOps
        .lshPairs(graft.text.TextOps.minhash(docs, respread = true))
        .count()),
      "simhash_pairs" -> (() => graft.text.TextOps
        .simhashPairs(docs, 64, maxHamming = 3, bandBits = 16,
          maxBucket = 1000).count()),
      // aggregate the verdict FLAGS, not count(): a bare count() lets
      // Catalyst eliminate the outer probe joins entirely (row count is
      // join-invariant) and times a scan instead of the operator
      "incremental_dedup" -> (() => graft.text.TextOps
        .incrementalDedup(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"))
        .agg(sum(when(col("dup_exact"), 1).otherwise(0)),
          sum(when(col("dup_near"), 1).otherwise(0)),
          sum(when(col("kept"), 1).otherwise(0)).as("kept"))
        .collect().head.getLong(2)),
      "ann_auto" -> (() => graft.sim.Similarity
        .annTopKAuto(emb, 3).count()))

    ops.filter { case (tag, _) => only.forall(_.contains(tag)) }
      .foreach { case (tag, f) =>
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        val rows = f()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[geoprobe] $tag rep$r: $sec%.3f s ($rows rows)")
        (sec, rows)
      }
      Harness.dropLeftovers(spark)
      System.gc()
      val steady =
        (if (times.length > 1) times.drop(1) else times).map(_._1).min
      println(f"[geoprobe] $tag steady: $steady%.3f s " +
        s"(${times.head._2} rows)")
    }
    spark.stop()
  }
}
