package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, 64-dim in the test tables).
  *
  * Two paths:
  *  - `cosineTopK`: exact brute-force — O(n²) pairs. Correctness baseline
  *    and fine up to ~10⁴ vectors per shard; the dot product runs inside
  *    codegen (`zip_with`+`aggregate` higher-order functions, no UDF).
  *  - `hyperplaneSig`/`annTopK`: random-hyperplane LSH (Charikar SimHash for
  *    cosine). Vectors shuffle once keyed by their 8-bit signature; the
  *    quadratic join then runs only within buckets — the scale path for
  *    10⁹ vectors, where bucket key also becomes the partitioner.
  *
  * Determinism: all float inputs are cast to double BEFORE any arithmetic,
  * folds run in array order, and the hyperplanes are derived from md5 — the
  * same plan computed by any engine agrees bit-for-bit (modulo final sum
  * rounding, handled by round-6 outputs).
  */
object Similarity {

  /** (vec_id, e: double[], norm) projection. */
  def prep(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("e"))
      .withColumn("norm", expr(
        "sqrt(aggregate(e, cast(0.0 AS double), (acc, x) -> acc + x * x))"))

  /** Exact top-k cosine neighbors per vector. */
  def cosineTopK(emb: DataFrame, k: Int = 5): DataFrame = {
    val v = prep(emb)
    val a = v.select(col("vec_id"), col("e").as("ea"), col("norm").as("na"))
    val b = v.select(col("vec_id").as("nb_id"), col("e").as("eb"),
      col("norm").as("nb"))
    val pairs = a.join(b, col("vec_id") =!= col("nb_id"))
      .withColumn("cos", expr(
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), cast(0.0 AS double)," +
          " (acc, x) -> acc + x)") / (col("na") * col("nb")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("nb_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("nb_id"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** Deterministic hyperplane weights: component c of plane h is
    * hexdigit(md5("h|c")[0]) − 7.5 ∈ {−7.5 … 7.5}. Same values computable
    * as literals in any engine's SQL. */
  def planes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (h, c) =>
      val hex = mdt.digest(s"$h|$c".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(hex.charAt(0)) - 7.5
    }
  }

  val NumTables = 8     // independent hash tables (recall knob)
  val BitsPerTable = 4  // planes per table (selectivity knob; grow with n)

  /** Multi-table hyperplane signatures: one (table, sig) bucket key per
    * table per vector. Single-table LSH has poor recall on near-orthogonal
    * data (measured ~2% rank-1 on random 64-dim vectors); `NumTables`
    * independent tables union their candidates — the standard
    * recall/efficiency trade (Indyk-Motwani E2LSH design). */
  def hyperplaneSig(emb: DataFrame, numTables: Int = NumTables,
                    bitsPerTable: Int = BitsPerTable,
                    dim: Int = 64): DataFrame = {
    val ps = planes(numTables * bitsPerTable, dim)
    val v = prep(emb)
    val tableCols = (0 until numTables).map { t =>
      val sig = (0 until bitsPerTable).map { b =>
        val h = t * bitsPerTable + b
        val lits = ps(h).map(w => s"cast($w AS double)")
          .mkString("array(", ", ", ")")
        val dot = s"aggregate(zip_with(e, $lits, (x, w) -> x * w)," +
          " cast(0.0 AS double), (acc, x) -> acc + x)"
        when(expr(dot) >= 0, lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), sig.as("sig"))
    }
    v.select(col("vec_id"), col("e"), col("norm"),
        explode(array(tableCols: _*)).as("ts"))
      .select(col("vec_id"), col("e"), col("norm"),
        col("ts.tbl").as("tbl"), col("ts.sig").as("sig"))
  }

  /** LSH-bucketed ANN: quadratic search only within each (table, signature)
    * bucket, candidates unioned across tables — shuffles on the bucket key,
    * never all-pairs. */
  def annTopK(emb: DataFrame, k: Int = 3): DataFrame = {
    val v = hyperplaneSig(emb)
    val a = v.select(col("tbl"), col("sig"), col("vec_id"),
      col("e").as("ea"), col("norm").as("na"))
    val b = v.select(col("tbl"), col("sig"), col("vec_id").as("nb_id"),
      col("e").as("eb"), col("norm").as("nb"))
    val pairs = a.join(b, Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("nb_id"))
      .select("vec_id", "nb_id", "ea", "eb", "na", "nb")
      .dropDuplicates("vec_id", "nb_id")
      .withColumn("cos", expr(
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), cast(0.0 AS double)," +
          " (acc, x) -> acc + x)") / (col("na") * col("nb")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("nb_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("nb_id"),
        round(col("cos"), 6).as("cos_r"))
  }
}
