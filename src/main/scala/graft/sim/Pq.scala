package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.agg.TopKAgg

/** Product quantization (Jégou, Douze, Schmid — TPAMI 2011): the
  * memory-compression member of the ANN family next to IVF (cells),
  * LSH (buckets), int8 (range scaling) and sign-bit binarization. Each
  * d-dim vector splits into `m` subvectors of `d/m` dims; every subspace
  * gets its own `ksub`-centroid k-means codebook; a vector is stored as
  * `m` sub-codes — 8 bytes instead of 256 at d=64/m=8. Asymmetric
  * distance computation (ADC) scores a query against codes via an
  * m × ksub lookup table of partial squared distances built ONCE per
  * query.
  *
  * Scale shape: codebooks train driver-side on the same deterministic
  * hash-stride sample the IVF quantizer uses (quality needs a sample,
  * not the corpus) and broadcast (m·ksub·dsub doubles — kilobytes);
  * encoding is one narrow map; ADC search is one narrow map over the
  * CODES (the full vectors never load) + a bounded [[TopKAgg]] — at 10⁹
  * vectors the scan touches m bytes per row.
  */
object Pq {

  /** cents(j)(c) = centroid c of subspace j (dsub doubles). */
  final case class Codebooks(m: Int, ksub: Int, dsub: Int,
                             cents: Array[Array[Array[Double]]])

  private def toArr(r: Row, i: Int): Array[Double] =
    r.getSeq[Double](i).toArray

  /** Per-subspace Lloyd on a bounded driver sample. Deterministic: seeds
    * are the first `ksub` sample subvectors in vec_id order, ties in
    * assignment break on the lower centroid index. */
  def train(v: DataFrame, m: Int = 8, ksub: Int = 16, iters: Int = 8,
            sampleCap: Int = 50000, nHint: Long = -1L): Codebooks = {
    val n = if (nHint > 0) nHint else v.count()
    val step = math.max(1L, n / sampleCap)
    val strided = v.filter(pmod(col("vec_id"), lit(step)) === 0)
      .select("vec_id", "e").collect()
      .sortBy(_.getLong(0)).map(toArr(_, 1))
    // same guard as Ivf.centroids: an id distribution that dodges the
    // modulus (all-odd ids with an even step) empties the raw stride;
    // a HASH stride breaks any id structure and stays deterministic
    val sample =
      if (strided.nonEmpty) strided
      else v.filter(pmod(xxhash64(col("vec_id")), lit(step)) === 0)
        .select("vec_id", "e").collect()
        .sortBy(_.getLong(0)).map(toArr(_, 1))
    require(sample.nonEmpty, "PQ training sample is empty")
    val d = sample(0).length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val cents = Array.tabulate(m) { j =>
      val sub = sample.map(e => java.util.Arrays.copyOfRange(
        e, j * dsub, (j + 1) * dsub))
      var cs = sub.take(ksub)
      for (_ <- 0 until iters) {
        val sums = Array.fill(cs.length)(new Array[Double](dsub))
        val cnts = new Array[Long](cs.length)
        sub.foreach { e =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cs.length) {
            var dd = 0.0; var i = 0
            val cv = cs(c)
            while (i < dsub) { val t = e(i) - cv(i); dd += t * t; i += 1 }
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          val s = sums(best); var i = 0
          while (i < dsub) { s(i) += e(i); i += 1 }
          cnts(best) += 1
        }
        cs = Array.tabulate(cs.length) { c =>
          if (cnts(c) == 0) cs(c) else sums(c).map(_ / cnts(c))
        }
      }
      cs
    }
    // EFFECTIVE ksub: a sample smaller than ksub trains that many
    // centroids per subspace — recording the nominal ksub made every
    // LUT/decode tabulate index past the codebook (fuzz gate, tiny)
    Codebooks(m, cents(0).length, dsub, cents)
  }

  /** (vec_id, codes: array<int>, err: ||e − decode(codes)||²) — one
    * narrow map over broadcast codebooks; `err` rides along so the
    * reconstruction-MSE contract costs no second pass. */
  def encode(v: DataFrame, cb: Codebooks): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    v.select(col("vec_id"), col("e"))
      .as[(Long, Array[Double])]
      .map { case (id, e) =>
        val b = bc.value
        val codes = new Array[Int](b.m)
        var err = 0.0
        var j = 0
        while (j < b.m) {
          val cs = b.cents(j)
          val off = j * b.dsub
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cs.length) {
            var dd = 0.0; var i = 0
            val cv = cs(c)
            while (i < b.dsub) {
              val t = e(off + i) - cv(i); dd += t * t; i += 1
            }
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          codes(j) = best
          err += bestD
          j += 1
        }
        (id, codes, err)
      }
      .toDF("vec_id", "codes", "err")
  }

  /** ADC top-k for one query vector: build the m × ksub partial-distance
    * table on the driver, score every OTHER vector's codes with a narrow
    * map (m adds per row), select with the bounded [[TopKAgg]] (smallest
    * distance first; ties on vec_id via the agg's id ordering). */
  def adcTopK(emb: DataFrame, queryId: Long = 0L, k: Int = 5,
              m: Int = 8, ksub: Int = 16): DataFrame = {
    val v = Similarity.prep(emb)
    val cb = train(v, m, ksub)
    val q = toArr(v.filter(col("vec_id") === queryId)
      .select("e").head(), 0)
    val lut = Array.tabulate(cb.m, cb.ksub) { (j, c) =>
      var dd = 0.0; var i = 0
      val cv = cb.cents(j)(c)
      val off = j * cb.dsub
      while (i < cb.dsub) { val t = q(off + i) - cv(i); dd += t * t; i += 1 }
      dd
    }
    val spark = emb.sparkSession
    val bl = spark.sparkContext.broadcast(lut)
    import spark.implicits._
    val scored = encode(v.filter(col("vec_id") =!= queryId), cb)
      .select(col("vec_id"), col("codes"))
      .as[(Long, Array[Int])]
      .map { case (id, codes) =>
        val l = bl.value
        var s = 0.0; var j = 0
        while (j < codes.length) { s += l(j)(codes(j)); j += 1 }
        (id, s)
      }
      .toDF("vec_id", "adc_dist")
    scored.groupBy()
      .agg(TopKAgg.topK(k)(-col("adc_dist"), col("vec_id")).as("nn"))
      .select(posexplode(col("nn")).as(Seq("p", "nb")))
      .select((col("p") + 1).cast("int").as("rank"),
        col("nb._2").as("vec_id"), round(-col("nb._1"), 6).as("adc_r"))
  }

  /** IVFADC (the FAISS-default billion-scale index): IVF coarse cells +
    * PQ over the RESIDUAL (vector − its cell centroid), searched with
    * per-cell ADC tables. The coarse quantizer prunes the corpus to the
    * probed cells; the residual PQ makes what remains m bytes/vector.
    * Scale: both quantizers train on the bounded driver sample and
    * broadcast; the index at rest is (cell, m codes) per vector; a query
    * scans only `nProbe` cells' code lists with m adds per row + the
    * bounded [[TopKAgg]]. Residual quantization is what makes the shared
    * codebook work across cells (residuals are centered near 0
    * regardless of which cell a vector lives in — Jégou §IV.B). */
  def ivfadcTopK(emb: DataFrame, queryId: Long = 0L, k: Int = 5,
                 nCells0: Int = 0, nProbe: Int = 2,
                 m: Int = 8, ksub: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = Similarity.prep(emb)
    val n = emb.count()
    val nCells = if (nCells0 > 0) nCells0
      else math.min(256, math.max(4, (n / 96L).toInt))
    val coarse = Ivf.centroids(v, nCells, nHint = n)
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    // residual table keeps the (vec_id, e, cell) shape train/encode need
    val resid = Ivf.assignCells(v, coarse)
      .select(col("vec_id"), col("e"), col("cell"))
      .as[(Long, Array[Double], Int)]
      .map { case (id, e, cell) =>
        val c = bcCoarse.value(cell)
        val r = new Array[Double](e.length)
        var i = 0
        while (i < e.length) { r(i) = e(i) - c(i); i += 1 }
        (id, r, cell)
      }
      .toDF("vec_id", "e", "cell")
    resid.cache() // reused by codebook training, encoding and the re-join
    val cb = train(resid, m, ksub, nHint = n)
    val index = encode(resid, cb)
      .join(resid.select("vec_id", "cell"), "vec_id")
      .select("vec_id", "codes", "cell")
    // query side: nProbe nearest cells, one residual LUT per probed cell
    val q = toArr(v.filter(col("vec_id") === queryId).select("e").head(), 0)
    val probed = coarse.zipWithIndex.map { case (c, cell) =>
      var dd = 0.0; var i = 0
      while (i < q.length) { val t = q(i) - c(i); dd += t * t; i += 1 }
      (dd, cell)
    }.sortBy { case (d, cell) => (d, cell) }.take(nProbe).map(_._2)
    val luts: Map[Int, Array[Array[Double]]] = probed.map { cell =>
      val c = coarse(cell)
      val qr = Array.tabulate(q.length)(i => q(i) - c(i))
      cell -> Array.tabulate(cb.m, cb.ksub) { (j, cc) =>
        var dd = 0.0; var i = 0
        val cv = cb.cents(j)(cc)
        val off = j * cb.dsub
        while (i < cb.dsub) {
          val t = qr(off + i) - cv(i); dd += t * t; i += 1
        }
        dd
      }
    }.toMap
    val bl = spark.sparkContext.broadcast(luts)
    val scored = index
      .filter(col("cell").isin(probed.toSeq: _*) &&
        col("vec_id") =!= queryId)
      .select(col("vec_id"), col("codes"), col("cell"))
      .as[(Long, Array[Int], Int)]
      .map { case (id, codes, cell) =>
        val l = bl.value(cell)
        var s = 0.0; var j = 0
        while (j < codes.length) { s += l(j)(codes(j)); j += 1 }
        (id, s)
      }
      .toDF("vec_id", "adc_dist")
    val plan = scored.groupBy()
      .agg(TopKAgg.topK(k)(-col("adc_dist"), col("vec_id")).as("nn"))
      .select(posexplode(col("nn")).as(Seq("p", "nb")))
      .select((col("p") + 1).cast("int").as("rank"),
        col("nb._2").as("vec_id"), round(-col("nb._1"), 6).as("adc_r"))
    // materialize the k-row answer, then RELEASE the O(n x dim)
    // residual cache — returning the lazy plan would pin it in storage
    // memory until the caller's action, with no path ever unpersisting
    val rows = plan.collect().toIndexedSeq
    resid.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), plan.schema)
  }
}
