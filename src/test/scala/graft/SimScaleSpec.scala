package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** LSH geometry scale knobs (round-9 soak finding: fixed 6-bit tables
  * made q_ann_lsh quadratic at 10x corpus density — bits must grow with
  * log2(n), and one pathological bucket needs a hard cap). */
class SimScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randEmb(n: Int, seed: Int = 7) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("bitsFor grows with log2(n) and floors at the contract default") {
    assert(Similarity.bitsFor(100) === Similarity.BitsPerTable)
    assert(Similarity.bitsFor(2000) === Similarity.BitsPerTable)
    assert(Similarity.bitsFor(20000) === 10) // ceil(log2(20000/32))
    assert(Similarity.bitsFor(200000) > Similarity.bitsFor(20000))
    // monotone in n
    val bs = Seq(1L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(Similarity.bitsFor(_))
    assert(bs === bs.sorted)
    // bounded so the Long signature can never overflow (an Int 1<<b
    // wrapped at b ≥ 32 and collided planes — the ADVICE-found hazard;
    // the widest reachable width is 58 bits at n = Long.MaxValue, and
    // the formula additionally clamps at 62)
    assert(Similarity.bitsFor(Long.MaxValue) <= 62)
  }

  test("annTopKAuto matches annTopK when the auto bits equal the " +
    "default, and emits well-formed ranks") {
    val emb = randEmb(300) // bitsFor(300) == default 6
    assert(Similarity.bitsFor(300) === Similarity.BitsPerTable)
    val auto = Similarity.annTopKAuto(emb, k = 3)
    val fixed = Similarity.annTopK(emb, k = 3)
    val a = auto.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val f = fixed.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === f)
    // ranks per query are 1..m with m <= k
    val byQ = a.groupBy(_._1)
    assert(byQ.values.forall(rs =>
      rs.map(_._2).toSeq.sorted === (1 to rs.size)))
    assert(byQ.values.forall(_.size <= 3))
  }

  test("maxBucket caps a pathological bucket: identical vectors share " +
    "every table's signature and would emit g^2 pairs uncapped") {
    val s = spark
    import s.implicits._
    val one = Array.fill(64)(0.5f)
    val clones = (1 to 50).map(i => (i.toLong, one)).toDF("vec_id", "embedding")
    val uncapped = Similarity.annTopK(clones, k = 3)
    assert(uncapped.count() === 50L * 3) // every clone fills its top-3
    val capped = Similarity.annTopK(clones, k = 3, maxBucket = Some(10))
    assert(capped.count() === 0L) // the 50-clone bucket is over cap
    // a mixed corpus: the hot clone cluster is suppressed, genuinely
    // distinct vectors still pair through their own buckets
    val mixed = clones.unionByName(randEmb(200, seed = 11)
      .withColumn("vec_id", col("vec_id") + 1000))
    val mixedCapped = Similarity.annTopK(mixed, k = 3, maxBucket = Some(40))
    val ids = mixedCapped.select("vec_id").distinct()
      .collect().map(_.getLong(0))
    assert(ids.forall(_ > 1000)) // only the distinct population emits
    assert(ids.length > 0)
  }
}
