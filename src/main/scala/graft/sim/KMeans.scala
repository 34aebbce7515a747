package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-class distributed k-means over the embedding column — the
  * idiomatic Spark answer is MLlib's `ml.clustering.KMeans` (distributed
  * Lloyd with map-side partial centroid sums per iteration), not a
  * hand-rolled loop; the engine's OWN sampled-Lloyd quantizers
  * ([[Ivf.centroids]], [[Pq.train]]) stay for the ANN paths where a
  * bounded driver sample is the deliberate scale choice. This wrapper
  * pins seed/iters for determinism and returns assignments + centroids.
  *
  * Scale shape: each Lloyd iteration is one narrow assignment map
  * (broadcast centroids) + one treeAggregate of per-cluster sums —
  * k×dims doubles per partition on the wire, never the corpus. */
object KMeans {

  final case class Fitted(assign: DataFrame,
      centroids: Array[Array[Double]], inertia: Double)

  /** Clusterable vector: non-null with every coordinate present and
    * finite (MLlib's fit asserts finiteness; a NULL coordinate NPEs
    * the vector conversion). Callers auditing the fit should use the
    * same predicate so their row universe matches the model's. */
  def clusterable(e: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    e.isNotNull && forall(e.cast("array<double>"), x =>
      !isnan(x) && x =!= lit(Double.PositiveInfinity) &&
        x =!= lit(Double.NegativeInfinity))

  /** Fit k clusters on `emb.embedding` (Array[Float]); returns
    * (vec_id, cluster) assignments, centroid matrix, and the training
    * cost (sum of squared distances — "inertia"). */
  def fit(emb: DataFrame, k: Int, seed: Long = 7L,
      iters: Int = 10): Fitted = {
    // unembeddable rows can't be clustered ([[clusterable]]: NULL
    // vectors — fuzz gate nulls mode; NaN/±Inf coordinates — NaN
    // gate); a corpus smaller than k trains that many clusters
    // instead of crashing MLlib's init (fuzz gate: tiny mode)
    val v = emb.filter(clusterable(col("embedding")))
      .select(col("vec_id"),
        org.apache.spark.ml.functions.array_to_vector(
          col("embedding").cast("array<double>")).as("features"))
    val n = v.count()
    // empty corpus (zero rows / all-null embeddings): MLlib's fit throws
    // on zero rows even with k=1 — return the empty Fitted instead
    // (mirrors Ivf.train's empty-sample early return)
    if (n == 0L)
      return Fitted(v.select(col("vec_id"), lit(0L).as("cluster")),
        Array.empty, 0.0)
    val kEff = math.max(1, math.min(k, n.toInt))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(kEff).setSeed(seed).setMaxIter(iters)
      .setFeaturesCol("features").setPredictionCol("cluster")
    val model = km.fit(v)
    val assign = model.transform(v)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
    val cost = model.summary.trainingCost
    Fitted(assign, model.clusterCenters.map(_.toArray), cost)
  }
}
