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
      // exact ranks via the dispatched quantile path (ExactQuantiles:
      // prefix sums past the crossover, in-agg sketch below it) — same
      // values as percentile_approx(MaxInt), linear at any scale
      val qs = (1 until 10).map(_ / 10.0)
      val bounds = graft.ops.ExactQuantiles.quantilesAuto(
        li(s, dir).filter(isPos), Seq("l_extendedprice"), qs)(
        "l_extendedprice")
      import s.implicits._
      bounds.zipWithIndex
        .map { case (b, i) => (i + 1, math.rint(b * 1e6) / 1e6) }
        .toDF("q_idx", "bound")
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
         |             sum(${QueryUtil.longWeightSql("l_quantity")}) AS wv
         |           FROM lineitem
         |           WHERE l_extendedprice IS NOT NULL GROUP BY v),
         |c AS (SELECT v, sum(wv) OVER (ORDER BY v) AS cw FROM g),
         |t AS (SELECT sum(wv) AS tot FROM g),
         |j AS (SELECT unnest(generate_series(1, ${binK - 1})) AS jn)
         |SELECT jn AS j, min(v) AS bound
         |FROM c, t, j WHERE tot > 0 AND cw * $binK >= jn * tot GROUP BY jn
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
         |  round(CASE WHEN isnan(std) OR isinf(std) OR std = 0
         |      OR isnan(mean) OR isinf(mean) THEN 0.0
         |    ELSE least(greatest((lower_b - mean) / std, -6.0), 6.0)
         |    END, 6) AS dz,
         |  round(rate, 6) AS asis_pr
         |FROM lo
         |JOIN pr ON lo.l_returnflag IS NOT DISTINCT FROM pr.l_returnflag
         |CROSS JOIN st
         |""".stripMargin
    })

  // ---- §2.4 skewness / kurtosis from raw moment sums -----------------------

  /** Population skew/kurtosis from Σx, Σx², Σx³, Σx⁴ exactly as the
    * reference accumulates them (`BinningInfoWritable.java:48-68`,
    * formulas `ColumnStatsCalculator.java:185-213`); l_quantity's integer
    * values keep every sum exact, so both engines agree bit-for-bit. */
  private val skewKurtosis: Q = Q(
    fn = (s, dir) => {
      val v = col("l_quantity")
      val r = li(s, dir).agg(
        count(v).as("cnt"), sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4")).head()
      val (n, s1, s2, s3, s4) = (r.getLong(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val mean = s1 / n
      val std = graft.ops.StatsMath.stdDevFromSums(n, s1, s2)
      import s.implicits._
      Seq((
        math.rint(graft.ops.StatsMath.skewness(n, mean, std, s1, s2, s3) * 1e6) / 1e6,
        math.rint(graft.ops.StatsMath.kurtosis(n, mean, std, s1, s2, s3, s4) * 1e6) / 1e6
      )).toDF("skewness", "kurtosis")
    },
    oracle = Some(
      // identical expression structure as StatsMath.skewness/kurtosis
      // (the reference ColumnStatsCalculator formulas): sample σ from
      // (Σx² − (Σx)²/n)/(n−1), moments expanded about the mean
      """WITH a AS (
        |  SELECT count(l_quantity)::DOUBLE AS n, sum(l_quantity) AS s1,
        |    sum(l_quantity * l_quantity) AS s2,
        |    sum(l_quantity * l_quantity * l_quantity) AS s3,
        |    sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
        |  FROM lineitem),
        |m AS (SELECT n, s1, s2, s3, s4, s1 / n AS mu,
        |        sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd FROM a)
        |SELECT
        |  round((s3 - 3 * s2 * mu + 3 * mu * mu * s1 - n * mu * mu * mu)
        |    / (n * sd * sd * sd), 6) AS skewness,
        |  round((s4 - 4 * s3 * mu + 6 * s2 * mu * mu
        |    - 4 * s1 * mu * mu * mu + n * mu * mu * mu * mu)
        |    / (n * sd * sd * sd * sd), 6) AS kurtosis
        |FROM m
        |""".stripMargin))

  // ---- §2.9 skew salting (AddColumnNumUDF's 300-way salt, done right) ------

  /** The reference salts every grouped key with rand()%300
    * (`AddColumnNumUDF.java:146`). Spark's partial aggregation already
    * combines map-side, but for pathological single-key skew an explicit
    * two-phase salt still helps: groupBy(key, salt) partials → final
    * groupBy(key). Results are EXACTLY the integer sums of the one-phase
    * plan — same oracle as q_bin_counts. */
  private val binCountsSalted: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      val bounds = quantityBounds(d, binK)
      val salt = pmod(crc32(concat(col("l_orderkey").cast("string"), lit("#"),
        col("l_linenumber").cast("string")).cast("binary")), lit(32))
      d.groupBy(Binning.binIndex(col("l_quantity"), bounds).as("bin_id"),
          salt.as("salt"))
        .agg(sum(when(isPos, 1L).otherwise(0L)).as("p"),
          sum(when(isPos, 0L).otherwise(1L)).as("n"))
        .groupBy("bin_id")
        .agg(sum("p").as("cnt_pos"), sum("n").as("cnt_neg"))
    },
    oracle = Some(
      s"""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem),
         |b AS (
         |  SELECT ${binCaseSql(binK)} AS bin_id,
         |    CASE WHEN $posCond THEN 1 ELSE 0 END AS pos
         |  FROM lineitem, mm)
         |SELECT bin_id, sum(pos)::BIGINT AS cnt_pos,
         |  (count(*) - sum(pos))::BIGINT AS cnt_neg
         |FROM b GROUP BY bin_id
         |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_equal_pos_bins"   -> equalPosBins,
    "q_weight_equal_bins" -> weightEqualBins,
    "q_norm_variants"    -> normVariants,
    "q_skew_kurtosis"    -> skewKurtosis,
    "q_bin_counts_salted" -> binCountsSalted,
  )
}
