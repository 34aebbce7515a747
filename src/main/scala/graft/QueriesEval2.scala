package graft

import org.apache.spark.sql.functions._

import graft.ops.{Normalize, StatsPipeline}
import graft.score.Score

/** Second eval/normalize batch: quartiles, eval-set normalization with
  * train-time stats, multi-class confusion, precision cast, tag cleaning
  * (SURVEY §2.4, §2.7, §2.8). */
object QueriesEval2 {
  import QueryUtil._

  // ---- §2.4 median / quartiles ---------------------------------------------

  private val quartiles: Q = Q(
    fn = (s, dir) => {
      // exact quartiles via the distributed prefix-sum path — same
      // values as percentile_approx(MaxInt), linear at any cardinality
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val q = graft.ops.ExactQuantiles.quantilesAuto(li(s, dir), cols,
        Seq(0.25, 0.5, 0.75))
      import s.implicits._
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      cols.map(c => (c, r6(q(c)(0)), r6(q(c)(1)), r6(q(c)(2))))
        .toDF("col_name", "p25", "median", "p75")
    },
    oracle = Some {
      val union = Seq("l_quantity", "l_extendedprice", "l_discount")
        .map(c => s"SELECT '$c' AS col_name, $c AS v FROM lineitem")
        .mkString("\nUNION ALL ")
      s"""WITH u AS ($union)
         |SELECT col_name,
         |  round(quantile_disc(v, 0.25), 6) AS p25,
         |  round(quantile_disc(v, 0.5), 6) AS median,
         |  round(quantile_disc(v, 0.75), 6) AS p75
         |FROM u GROUP BY col_name
         |""".stripMargin
    })

  // ---- §2.7 eval normalization (train-time stats applied to eval set) ------

  private val evalNorm: Q = Q(
    fn = (s, dir) => {
      val d = li(s, dir)
      // "train" = shipped before 1995-07; eval = the rest. Stats come from
      // TRAIN only and are applied, frozen, to the EVAL rows — the strict
      // schema/stats reuse of udf/EvalNormUDF.java:246-396.
      val train = d.filter(col("l_shipdate") < lit("1995-07-01").cast("timestamp_ntz"))
      val eval_ = d.filter(col("l_shipdate") >= lit("1995-07-01").cast("timestamp_ntz"))
      val st = StatsPipeline.numericStats(train, Seq("l_extendedprice"))("l_extendedprice")
      eval_.select(col("l_orderkey"), col("l_linenumber"),
        round(Normalize.zscore(col("l_extendedprice"), st.mean, st.stdDev), 3)
          .as("z_eval"))
    },
    oracle = Some(
      """WITH tr AS (
        |  SELECT count(l_extendedprice) AS cnt, sum(l_extendedprice) AS s1,
        |         sum(l_extendedprice * l_extendedprice) AS s2
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-07-01')
        |SELECT l_orderkey, l_linenumber,
        |  round(CASE WHEN l_extendedprice IS NULL THEN 0.0
        |    WHEN isnan(sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)))
        |      OR isinf(sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)))
        |      OR sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)) = 0
        |      OR isinf(s1 / cnt) THEN 0.0
        |    ELSE least(greatest(
        |      (l_extendedprice - s1 / cnt)
        |        / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), -6.0), 6.0)
        |    END, 3) + 0 AS z_eval
        |FROM lineitem, tr
        |WHERE l_shipdate >= TIMESTAMP '1995-07-01'
        |""".stripMargin))

  // ---- §2.7 multi-class confusion matrix -----------------------------------

  private val multiclassTree: Score.TreeNode = Score.Split("l_quantity", 17.0,
    Score.Leaf(0),
    Score.Split("l_quantity", 34.0, Score.Leaf(1), Score.Leaf(2)))

  private val multiclassConfusion: Q = Q(
    fn = (s, dir) => {
      // actual = 3-class returnflag; predicted = quantity-threshold tree
      val predName = when(Score.encodeLeaf(multiclassTree) === 0, "A")
        .when(Score.encodeLeaf(multiclassTree) === 1, "N")
        .otherwise("R")
      li(s, dir)
        .groupBy(col("l_returnflag").as("actual"), predName.as("predicted"))
        .agg(count(lit(1)).as("n"))
    },
    oracle = Some(
      s"""SELECT l_returnflag AS actual,
         |  CASE WHEN (${Score.leafSql(multiclassTree)}) = 0 THEN 'A'
         |       WHEN (${Score.leafSql(multiclassTree)}) = 1 THEN 'N'
         |       ELSE 'R' END AS predicted,
         |  count(*) AS n
         |FROM lineitem GROUP BY 1, 2
         |""".stripMargin))

  // ---- §2.8 precision cast (FLOAT7/16/32/DOUBLE64 output rounding) ---------

  private val precisionCast: Q = Q(
    fn = (s, dir) => li(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      // FLOAT32: round-trip through float32 (NormalizeUDF FLOAT32 mode)
      col("l_extendedprice").cast("float").cast("double").as("f32"),
      // FLOAT7: 7 decimal digits (reference's default text precision).
      // + 0.0 normalizes NEGATIVE ZERO (neg price x zero discount-factor
      // = -0.0): Spark's round collapses it to +0.0, DuckDB's preserves
      // the sign bit, and the driver hash tells them apart (r16 fuzz)
      (round(col("l_extendedprice") * (lit(1) - col("l_discount")), 7)
        + lit(0.0)).as("f7")),
    oracle = Some(
      // the float32 cast is IEEE: a double beyond float range
      // SATURATES to +-Inf in Spark, while DuckDB's ::REAL errors —
      // the CASE encodes the IEEE behavior portably (cutover at the
      // max-float/2^128 midpoint, ties-to-even -> Inf)
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_extendedprice >= 3.4028235677973366e38
        |         THEN 'Infinity'::DOUBLE
        |       WHEN l_extendedprice <= -3.4028235677973366e38
        |         THEN '-Infinity'::DOUBLE
        |       ELSE l_extendedprice::REAL::DOUBLE END AS f32,
        |  round(l_extendedprice * (1 - l_discount), 7) + 0.0 AS f7
        |FROM lineitem
        |""".stripMargin))

  // ---- §2.8 tag trim / clean (CommonUtils.trimTag) -------------------------

  private val tagClean: Q = Q(
    fn = (s, dir) => {
      // simulate messy tags then clean: trim + lower, the reference's
      // tag normalization before posTags/negTags matching
      val messy = concat(lit("  "), col("l_returnflag"), lit(" "))
      li(s, dir)
        .groupBy(trim(lower(messy)).as("tag"))
        .agg(count(lit(1)).as("n"))
    },
    oracle = Some(
      """SELECT trim(lower('  ' || l_returnflag || ' ')) AS tag,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_quartiles"       -> quartiles,
    "q_eval_norm"       -> evalNorm,
    "q_multiclass_conf" -> multiclassConfusion,
    "q_precision_cast"  -> precisionCast,
    "q_tag_clean"       -> tagClean,
  )
}
