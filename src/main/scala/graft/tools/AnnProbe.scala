package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: fixed-geometry annTopK vs auto-sized annTopKAuto on an
  * embeddings dir — the evidence run behind BENCH_SCALE.md's LSH row.
  * `scripts/run.sh graft.tools.AnnProbe <dir> [k]` */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val spark = Harness.session()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[annprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        s"($rows rows)")
    }
    println(s"[annprobe] n=$n bitsFor=${graft.sim.Similarity.bitsFor(n)}")
    time("warm")(spark.range(100000).count())
    time("fixed-6-bit")(graft.sim.Similarity.annTopK(emb, k).count())
    time("fixed-6-bit-rep2")(graft.sim.Similarity.annTopK(emb, k).count())
    time("auto-bits")(graft.sim.Similarity.annTopKAuto(emb, k).count())
    time("auto-bits-rep2")(graft.sim.Similarity.annTopKAuto(emb, k).count())
    spark.stop()
  }
}
