package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property invariants for the round-8 operator family (fixed-seed
  * ScalaCheck generators, the PropertySpec pattern). */
class Round8PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).toSeq)

  test("avgRanks: rank sum is n(n+1)/2 and ranks are monotone in value") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-1000, 1000))
    samples(gen, 8).foreach { xs =>
      val df = xs.map(_.toDouble).toDF("x").repartition(3)
      val ranked = graft.ops.Rank.avgRanks(df, "x")
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
        .sortBy(_._1)
      val counts = xs.groupBy(_.toDouble).view.mapValues(_.size).toMap
      // Σ over values of cnt·avg_rank = Σ of 1..n
      val total = ranked.map { case (v, r) => counts(v) * r }.sum
      val n = xs.size.toLong
      assert(math.abs(total - n * (n + 1) / 2.0) < 1e-6)
      assert(ranked.map(_._2).sameElements(ranked.map(_._2).sorted))
    }
  }

  test("CountMin: estimate >= exact for every key, any data") {
    val gen = Gen.nonEmptyListOf(Gen.choose(0, 50))
    samples(gen, 6).foreach { xs =>
      val df = xs.map(i => s"k$i").toDF("t").repartition(4)
      val agg = graft.agg.CountMin.sketchAgg(4, 64)
      val sk = df.agg(agg(col("t"))).head().getAs[Seq[Long]](0).toArray
      xs.distinct.foreach { i =>
        val exact = xs.count(_ == i).toLong
        assert(graft.agg.CountMin.estimate(sk, 4, 64, s"k$i") >= exact)
      }
    }
  }

  test("scd2: intervals tile each key's timeline with one current row") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 4L),
      Gen.choose(0L, 1000L)))
    samples(gen, 8).foreach { xs =>
      val log = xs.distinct.zipWithIndex
        .map { case ((k, ms), i) => (k, ms, s"s$i") }
        .toDF("k", "ms", "status")
      val rows = graft.ops.Snapshot.scd2(log, "k", col("ms"),
          Seq(col("ms").asc, col("status").asc), Seq("status"),
          openEnd = 99999L)
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("valid_from"),
          r.getAs[Long]("valid_to"), r.getAs[Long]("is_current")))
      rows.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._2)
        // exactly one open interval, and it is the last
        assert(rs.count(_._4 == 1L) === 1)
        assert(sorted.last._4 === 1L && sorted.last._3 === 99999L)
        // each interval ends where the next begins (timeline tiles)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3 === b._2)
          case _ =>
        }
      }
    }
  }

  test("Validate ppm metrics are within [0, 1e6] and ok implies " +
    "threshold") {
    import graft.ops.Validate._
    val gen = Gen.nonEmptyListOf(Gen.option(Gen.choose(-100.0, 100.0)))
    samples(gen, 8).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val out = graft.ops.Validate.run(df,
          Seq(NotNull("v", 0.5), InRange("v", -50, 50, 0.3)))
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      out.foreach { case (_, ppm, ok) =>
        assert(ppm >= 0L && ppm <= 1000000L)
      }
      val nn = out.find(_._1 == "not_null").get
      val exact = math.floor(
        1e6 * xs.count(_.isDefined) / xs.size).toLong
      assert(nn._2 === exact)
      assert((nn._3 == 1L) === (nn._2 >= 500000L))
    }
  }

  test("upsert is idempotent and right-biased: applying the same delta " +
    "twice equals once") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 20L),
      Gen.alphaStr.map(_.take(4))))
    samples(gen, 6).foreach { xs =>
      val base = xs.distinctBy(_._1).toDF("k", "v")
      val delta = xs.distinctBy(_._1).map { case (k, v) => (k, v + "!") }
        .take(5).toDF("k", "v")
      def snap(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "v").collect().map(r =>
          (r.getLong(0), r.getString(1))).toSet
      val once = graft.ops.Snapshot.upsert(base, delta, "k", Seq("v"))
      val twice = graft.ops.Snapshot.upsert(
        once.select("k", "v"), delta, "k", Seq("v"))
      assert(snap(once) === snap(twice))
    }
  }
}
