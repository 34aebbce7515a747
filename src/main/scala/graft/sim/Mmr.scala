package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.agg.TopKAgg
import graft.expr.DotProduct.dot

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the standard diversity-aware selection step of a retrieval /
  * RAG pipeline: greedily pick the item maximizing
  * `λ·rel(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s)`, so the result set
  * trades pure relevance for coverage.
  *
  * Scale shape: relevance against the single broadcast query vector is a
  * narrow map over the corpus (one codegen'd [[graft.expr.DotProduct]]
  * per row); the candidate pool is a bounded [[graft.agg.TopKAgg]]
  * global top-`nCand` (map-side partial, `tasks × nCand` rows shuffled);
  * the greedy quadratic part runs on the driver over the bounded
  * `nCand × nCand` similarity matrix — at ANY corpus size the quadratic
  * work is `O(nCand²)`, never `O(n²)`. This is the same
  * candidates-then-exact contract as the ANN family.
  */
object Mmr {

  /** Top-`k` MMR selection from the `nCand` most query-relevant vectors.
    * Deterministic: cosine ties break on ascending vec_id at every step.
    * Returns (rank, vec_id, rel_r, mmr_r). */
  def mmrTopK(emb: DataFrame, queryId: Long = 0L, nCand: Int = 20,
              k: Int = 5, lambda: Double = 0.7): DataFrame = {
    require(k <= nCand, s"k=$k must be <= nCand=$nCand")
    val spark = emb.sparkSession
    import spark.implicits._
    val v = Similarity.prep(emb)
    val qRow = v.filter(col("vec_id") === queryId)
      .select(col("e"), col("norm")).head()
    val qe = qRow.getSeq[Double](0)
    val qn = qRow.getDouble(1)
    val qCol = array(qe.map(lit): _*)
    val rel = v.filter(col("vec_id") =!= queryId)
      .withColumn("rel", Similarity.cosine(dot(col("e"), qCol), col("norm"), lit(qn)))
    // bounded global top-nCand candidate pool, then re-attach vectors
    val cand = rel.groupBy()
      .agg(TopKAgg.topK(nCand)(col("rel"), col("vec_id")).as("c"))
      .select(explode(col("c")).as("c"))
      .select(col("c._2").as("vec_id"), col("c._1").as("rel"))
    val cv = cand.join(v, "vec_id")
      .select(col("vec_id"), col("rel"), col("e"), col("norm"))
      .collect() // bounded: nCand rows x dim doubles
    val ids = cv.map(_.getLong(0))
    val rels = cv.map(_.getDouble(1))
    val es = cv.map(_.getSeq[Double](2).toArray)
    val ns = cv.map(_.getDouble(3))
    val n = ids.length
    // ascending-index fold — same summation order as DotProduct codegen
    def dotA(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val sim = Array.tabulate(n, n)((i, j) =>
      if (i == j) 1.0
      else if (ns(i) * ns(j) > 0.0) dotA(es(i), es(j)) / (ns(i) * ns(j))
      else 0.0) // zero-norm contract — see Similarity.cosine
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Double, Double)]
    var r = 1
    while (r <= math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!selected.contains(i)) {
          // true max over selected (may be negative); 0 only when empty
          var d = Double.NegativeInfinity
          selected.foreach(s => if (sim(i)(s) > d) d = sim(i)(s))
          if (selected.isEmpty) d = 0.0
          val sc = lambda * rels(i) - (1.0 - lambda) * d
          if (sc > bestScore ||
              (sc == bestScore && best >= 0 && ids(i) < ids(best))) {
            best = i; bestScore = sc
          }
        }
        i += 1
      }
      if (best < 0) {
        // every remaining candidate scored NaN (a zero-norm query or
        // candidate embedding makes rel = 0/0) — nothing is selectable;
        // return what was picked instead of indexing ids(-1)
        r = k + 1
      } else {
        selected += best
        out += ((r, ids(best), rels(best), bestScore))
        r += 1
      }
    }
    out.toSeq.toDF("rank", "vec_id", "rel", "mmr")
      .select(col("rank"), col("vec_id"),
        round(col("rel"), 6).as("rel_r"), round(col("mmr"), 6).as("mmr_r"))
  }
}
