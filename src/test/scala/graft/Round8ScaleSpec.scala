package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scale-up invariance for the round-8 operator family (the
  * ScaleSmokeSpec pattern: duplicate the corpus 10×, repartition wider,
  * and require EXACT linear scaling / volume-invariance — partials,
  * prefix sums, and cell math must not care about volume or
  * partitioning). */
class Round8ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val e1 = Tables.load(spark, "/root/testdata/sf0.01", "events")
    .select(col("user_id"), col("event_id"), col("event_type"),
      col("value"), expr("ts div 1000000").as("ms"))
  private lazy val li1 =
    Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  test("rank counts are volume-invariant in rank STRUCTURE: 10x data " +
    "scales n_below and cnt exactly 10x") {
    val d1 = li1.select(col("l_extendedprice").as("v"))
    val d10 = (1 to 10).map(_ => d1).reduce(_ unionAll _).repartition(64)
    val r1 = graft.ops.Rank.rankCounts(d1, "v")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val r10 = graft.ops.Rank.rankCounts(d10, "v")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(r10 === r1.map { case (v, b, c) => (v, b * 10, c * 10) })
  }

  test("spearman is exactly duplication-invariant") {
    // duplicating every row leaves all average ranks scaled consistently
    // → rho unchanged (rank correlation is a function of the joint
    // distribution only)
    val d2 = (1 to 2).map(_ => li1).reduce(_ unionAll _).repartition(32)
    val rho1 = graft.ops.Rank
      .spearman(li1, "l_quantity", "l_extendedprice").head().getDouble(0)
    val rho2 = graft.ops.Rank
      .spearman(d2, "l_quantity", "l_extendedprice").head().getDouble(0)
    assert(rho1 === rho2)
  }

  test("chi-square statistic scales exactly linearly with volume") {
    val c = Tables.load(spark, "/root/testdata/sf0.01", "customer")
    val c5 = (1 to 5).map(_ => c).reduce(_ unionAll _).repartition(32)
    val r1 = graft.ops.Assoc.chiSquare(c, "c_mktsegment", "c_nationkey")
      .head()
    val r5 = graft.ops.Assoc.chiSquare(c5, "c_mktsegment", "c_nationkey")
      .head()
    // chi2(5x data) = 5 * chi2(x); V and dof unchanged
    assert(math.abs(r5.getDouble(0) - 5 * r1.getDouble(0)) < 1e-3)
    assert(math.abs(r5.getDouble(1) - r1.getDouble(1)) < 1e-6)
    assert(r5.getLong(2) === r1.getLong(2))
  }

  test("funnel stage counts are partitioning-invariant") {
    def stages(d: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      d.withColumn("v",
          min(when(col("event_type") === "view", col("ms"))).over(w))
        .withColumn("c",
          min(when(col("event_type") === "click" && col("ms") >= col("v"),
            col("ms"))).over(w))
        .groupBy("user_id").agg(first("v").as("v"), first("c").as("c"))
        .agg(count(lit(1)).as("u"), count("v").as("nv"),
          count("c").as("nc"))
        .collect().map(r => Map("u" -> r.getLong(0), "nv" -> r.getLong(1),
          "nc" -> r.getLong(2))).head
    }
    assert(stages(e1.repartition(2)) === stages(e1.repartition(64)))
  }

  test("count-min sketch is bit-identical across partitionings") {
    val toks = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val agg = graft.agg.CountMin.sketchAgg(4, 512)
    def sk(parts: Int) = toks.repartition(parts)
      .agg(agg(col("t"))).head().getAs[Seq[Long]](0).toArray
    assert(java.util.Arrays.equals(sk(2), sk(48)))
  }
}
