package graft

import org.apache.spark.sql.functions._

import graft.ops.{Binning, Normalize, StatsPipeline}

/** Mass-based binning methods (EqualPositive / WeightEqual*) and the
  * remaining normalize variants as oracle-checked queries
  * (SURVEY §2.4 BinningMethod enum, §2.8). */
object QueriesBinning2 {
  import QueryUtil._

  // ---- §2.4 EqualPositive: equal-population bins over POSITIVE mass only ---

  private val equalPosBins: Q = Q(
    fn = (s, dir) => {
      val qs = (1 until 10).map(_ / 10.0)
      li(s, dir).filter(isPos)
        .select(percentile_approx(col("l_extendedprice"),
          array(qs.map(lit): _*), lit(Int.MaxValue)).as("bounds"))
        .select(posexplode(col("bounds")).as(Seq("q_idx", "b")))
        .select((col("q_idx") + 1).as("q_idx"), round(col("b"), 6).as("bound"))
    },
    oracle = Some {
      (1 until 10).map(i =>
        s"SELECT $i AS q_idx, round(quantile_disc(l_extendedprice, ${i / 10.0}), 6)" +
          s" AS bound FROM lineitem WHERE $posCond").mkString("\nUNION ALL ") + "\n"
    })

  // ---- §2.4 WeightEqual: boundaries by cumulative integer weight -----------

  private val weightEqualBins: Q = Q(
    fn = (s, dir) => {
      val bounds = Binning.weightedEqualBounds(
        li(s, dir), "l_extendedprice", col("l_quantity"), binK)
      import s.implicits._
      bounds.toDF("j", "bound")
    },
    oracle = Some(
      s"""WITH g AS (SELECT l_extendedprice AS v,
         |             sum(CAST(l_quantity AS BIGINT)) AS wv
         |           FROM lineitem GROUP BY v),
         |c AS (SELECT v, sum(wv) OVER (ORDER BY v) AS cw FROM g),
         |t AS (SELECT sum(wv) AS tot FROM g),
         |j AS (SELECT unnest(generate_series(1, ${binK - 1})) AS jn)
         |SELECT jn AS j, min(v) AS bound
         |FROM c, t, j WHERE cw * $binK >= jn * tot GROUP BY jn
         |""".stripMargin))

  // ---- §2.8 DISCRETE_ZSCORE + ASIS_PR (exact-arithmetic variants) ----------

  /** l_quantity is integer-valued → its moment sums are exact in FP, so
    * mean/std and the z of the bin lower boundary are bit-identical across
    * engines; ASIS_PR's category pos-rates are single divisions of exact
    * counts. */
  private val normVariants: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val Array(mn, mx) = d.agg(min("l_quantity"), max("l_quantity")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val bounds = Binning.equalInterval(mn, mx, binK)
      val st = StatsPipeline.numericStats(d, Seq("l_quantity"))("l_quantity")
      val cat = StatsPipeline.profileCategorical(d, Seq("l_returnflag"), isPos)
      val p = cat("l_returnflag")
      val pr = p.binning.binPosRate
      d.select(col("l_orderkey"), col("l_linenumber"),
        round(Normalize.discreteZScore(col("l_quantity"), bounds,
          st.mean, st.stdDev), 6).as("dz"),
        round(Normalize.forProfile(col("l_returnflag"), p,
          graft.catalog.NormType.AsIsPr), 6).as("asis_pr"))
    },
    oracle = Some {
      val lowerArms = (1 until binK).reverse
        .map(i => s"WHEN l_quantity >= mn + (mx - mn) * $i / $binK " +
          s"THEN mn + (mx - mn) * $i / $binK")
        .mkString("\n      ")
      s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
         |            FROM lineitem),
         |a AS (SELECT count(l_quantity) AS cnt, sum(l_quantity) AS s1,
         |             sum(l_quantity * l_quantity) AS s2 FROM lineitem),
         |st AS (SELECT s1 / cnt AS mean,
         |         sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)) AS std FROM a),
         |pr AS (SELECT l_returnflag,
         |         sum(CASE WHEN $posCond THEN 1 ELSE 0 END)::DOUBLE
         |           / count(*) AS rate
         |       FROM lineitem GROUP BY l_returnflag),
         |lo AS (SELECT l_orderkey, l_linenumber, l_returnflag,
         |         CASE WHEN l_quantity IS NULL THEN mean
         |      $lowerArms
         |         ELSE mean END AS lower_b
         |       FROM lineitem, mm, st)
         |SELECT l_orderkey, l_linenumber,
         |  round(least(greatest((lower_b - mean) / std, -6.0), 6.0), 6) AS dz,
         |  round(rate, 6) AS asis_pr
         |FROM lo JOIN pr USING (l_returnflag) CROSS JOIN st
         |""".stripMargin
    })

  val all: Map[String, Q] = Map(
    "q_equal_pos_bins"   -> equalPosBins,
    "q_weight_equal_bins" -> weightEqualBins,
    "q_norm_variants"    -> normVariants,
  )
}
