package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.DotProduct.dot

/** IVF-style ANN: a coarse k-means quantizer partitions vectors into cells;
  * search runs brute-force only inside a query's cell (single-probe).
  *
  * Scale design: centroids are tiny (nCells × dim doubles) and BROADCAST;
  * assignment is a narrow mapPartitions pass; the only shuffle keys on
  * `cell` — the classic IVF sharding where each cell lives on one executor
  * group. Lloyd iterations are two map+groupBy rounds (per-dimension means
  * via posexplode, partial-aggregated).
  *
  * Determinism: seeds are the lowest `nCells` vec_ids, so the quantizer is
  * reproducible up to FP summation order in the means.
  */
object Ivf {

  private def toArr(r: Row, i: Int): Array[Double] =
    r.getSeq[Double](i).toArray

  /** Lloyd iterations over double-cast embeddings; returns centroids. */
  def centroids(v: DataFrame, nCells: Int,
                iters: Int = 2): Array[Array[Double]] = {
    val spark = v.sparkSession
    var cents = v.orderBy("vec_id").limit(nCells)
      .select("e").collect().map(toArr(_, 0))
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val assigned = assignCells(v, bc.value)
      val dims = assigned
        .select(col("cell"), posexplode(col("e")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      dims.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  /** Nearest-centroid assignment: broadcast centroids, narrow map. */
  def assignCells(v: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    v.select(col("vec_id"), col("e"), col("norm"))
      .as[(Long, Array[Double], Double)]
      .map { case (id, e, norm) =>
        val cs = bc.value
        var best = 0; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          val cv = cs(c)
          while (i < e.length) { val t = e(i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (id, e, norm, best)
      }
      .toDF("vec_id", "e", "norm", "cell")
  }

  /** Single-probe IVF top-k: quadratic search only within each cell. */
  def ivfTopK(emb: DataFrame, k: Int = 3, nCells: Int = 16): DataFrame = {
    val v = Similarity.prep(emb)
    val cents = centroids(v, nCells)
    val assigned = assignCells(v, cents)
    val a = assigned.select(col("cell"), col("vec_id"),
      col("e").as("ea"), col("norm").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("nb_id"),
      col("e").as("eb"), col("norm").as("nb"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("vec_id") =!= col("nb_id"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("nb_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("nb_id"),
        round(col("cos"), 6).as("cos_r"))
  }
}
