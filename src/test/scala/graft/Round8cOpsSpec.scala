package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 third batch: mergeable HLL distinct sketch (the incremental
  * catalog's last non-additive stat), z-order layout, OOF target
  * encoding. */
class Round8cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL: estimate within 3 sigma at small/medium cardinality and " +
    "exact in the linear-counting regime") {
    import spark.implicits._
    // linear-counting regime: 100 distinct among 16384 registers
    val small = (1L to 1000L).map(i => i % 100).toDF("v")
    val sSmall = graft.agg.Hll.sketch(small, "v")
    val eSmall = graft.agg.Hll.estimate(sSmall)
    assert(math.abs(eSmall - 100.0) <= 2.0, s"small est $eSmall")
    // raw-estimate regime: 200k distinct, std err 0.81% at p=14
    val big = (1L to 200000L).toDF("v")
    val eBig = graft.agg.Hll.estimate(graft.agg.Hll.sketch(big, "v"))
    assert(math.abs(eBig / 200000.0 - 1.0) <= 0.03, s"big est $eBig")
  }

  test("HLL: merge of disjoint-split sketches is BIT-IDENTICAL to the " +
    "whole-corpus sketch, and serde round-trips") {
    import spark.implicits._
    val d = (1L to 50000L).map(i => s"tok_${i % 7919}").toDF("v")
    val whole = graft.agg.Hll.sketch(d, "v", p = 12)
    val a = graft.agg.Hll.sketch(d.filter(crc32(col("v")) % 2 === 0), "v", p = 12)
    val b = graft.agg.Hll.sketch(d.filter(crc32(col("v")) % 2 =!= 0), "v", p = 12)
    val merged = graft.agg.Hll.merge(a, b)
    assert(java.util.Arrays.equals(merged, whole),
      "merge(sketch(A), sketch(B)) must equal sketch(A union B) bit-exact")
    val rt = graft.agg.Hll.deserialize(graft.agg.Hll.serialize(merged))
    assert(java.util.Arrays.equals(rt, merged), "serde round-trip")
    assert(graft.agg.Hll.estimate(merged) > 0)
  }

  test("HLL: mergeWithSketches recovers distinctCount where StatsMerge " +
    "alone surrenders it") {
    import spark.implicits._
    val rows = (1L to 4000L).map { i =>
      (i, (i % 997).toDouble, i % 5 == 0)
    }.toDF("id", "v", "y")
    val half1 = rows.filter(col("id") % 2 === 0)
    val half2 = rows.filter(col("id") % 2 =!= 0)
    val bounds: Map[String, Seq[Double]] =
      Map("v" -> Seq(Double.NegativeInfinity, 250.0, 500.0, 750.0))
    def prof(df: org.apache.spark.sql.DataFrame) =
      graft.ops.StatsPipeline.profileNumeric(
        df, Seq("v"), col("y"), full = true,
        boundsOverride = Some(bounds))("v")
    val (p1, p2) = (prof(half1), prof(half2))
    val s1 = graft.agg.Hll.sketch(half1, "v")
    val s2 = graft.agg.Hll.sketch(half2, "v")
    val plain = graft.ops.StatsMerge.merge(p1, p2)
    assert(plain.stats.distinctCount.isEmpty,
      "plain merge cannot carry distinctCount")
    val (withD, regs) = graft.agg.Hll.mergeWithSketches(p1, p2, s1, s2)
    val est = withD.stats.distinctCount.get
    assert(math.abs(est - 997L) <= 30, s"recovered distinct $est vs 997")
    // chain stays incremental: merged regs == whole-table sketch
    assert(java.util.Arrays.equals(regs, graft.agg.Hll.sketch(rows, "v")))
  }

  test("TargetEncode.oofMean: a row's own fold contributes ZERO target " +
    "mass to its encoding; thin categories shrink to the prior") {
    import spark.implicits._
    val df = (1L to 2000L).map { i =>
      (i, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "c",
        if (i % 7 == 0) 1 else 0)
    }.toDF("id", "cat", "y")
    val enc = graft.ops.TargetEncode.oofMean(
      df, col("cat"), col("y"), col("id"), folds = 4, smoothing = 10.0)
      .select("id", "cat", "y", "fold", "enc")
    // recompute the exclusion by hand from the raw rows
    val rows = enc.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    val prior = rows.map(_._3).sum.toDouble / rows.length
    val byCatFold = rows.groupBy(r => (r._2, r._4))
      .map { case (k, v) => k -> (v.map(_._3).sum.toLong, v.length.toLong) }
    val byCat = rows.groupBy(_._2)
      .map { case (k, v) => k -> (v.map(_._3).sum.toLong, v.length.toLong) }
    rows.take(500).foreach { case (_, cat, _, fold, e) =>
      val (ap, an) = byCat(cat)
      val (fp, fn) = byCatFold((cat, fold))
      val expect = (ap - fp + prior * 10.0) / (an - fn + 10.0)
      assert(math.abs(e - expect) < 1e-12,
        s"cat=$cat fold=$fold got $e expect $expect")
    }
    // leakage check: flipping every target IN ONE FOLD must not change
    // that fold's own encodings' dependence — i.e. encoding of fold 0
    // uses only folds 1..3 mass. Verify directly: recompute enc for
    // fold 0 from folds 1..3 only.
    val f0 = rows.filter(_._4 == 0L)
    f0.take(100).foreach { case (_, cat, _, _, e) =>
      val others = rows.filter(r => r._2 == cat && r._4 != 0L)
      val expect = (others.map(_._3).sum + prior * 10.0) /
        (others.length + 10.0)
      assert(math.abs(e - expect) < 1e-12)
    }
    // unseen category at apply time → prior (left join + coalesce)
    val applied = graft.ops.TargetEncode.oofMean(
      df.union(Seq((9999L, "zzz_unseen", 0)).toDF("id", "cat", "y")),
      col("cat"), col("y"), col("id"), folds = 4, smoothing = 10.0)
    val z = applied.filter(col("cat") === "zzz_unseen").select("enc").head()
    // a singleton category: own fold holds its only row, so exclusion
    // leaves pure prior
    val newPrior = (rows.map(_._3).sum + 0).toDouble / (rows.length + 1)
    assert(math.abs(z.getDouble(0) - newPrior) < 1e-12)
  }
}
