package graft

import org.apache.spark.sql.functions._

/** Data-quality gate operators: declarative validation suite, per-key
  * gap-fill resampling, count-min point-frequency sketch, and the salted
  * skew join. */
object QueriesValidate {
  import QueryUtil.docs

  // ---- declarative validation suite ----------------------------------------

  /** Five-constraint suite over orders in effectively two jobs (one
    * aggregate for every row-local + uniqueness metric, one anti-join
    * for the FK). Metrics are floor-ppm integers — engine-exact. The
    * in_range constraint is deliberately partial (threshold 0.95) so
    * the ppm value itself is load-bearing, not just the flag. */
  private val validation: Q = Q(
    fn = (s, dir) => {
      import graft.ops.Validate._
      run(Tables.load(s, dir, "orders"), Seq(
        NotNull("o_orderpriority"),
        InRange("o_totalprice", 1000.0, 400000.0, minRate = 0.95),
        InSet("o_orderstatus", Seq("O", "F", "P")),
        Unique(Seq("o_orderkey")),
        ForeignKey("o_custkey", Tables.load(s, dir, "customer"),
          "c_custkey")))
    },
    oracle = Some(
      """WITH n AS (SELECT count(*)::BIGINT AS n FROM orders)
        |SELECT 'not_null' AS check, 'o_orderpriority' AS target,
        |  CAST(floor(1e6 * count(o_orderpriority) / any_value(n.n)) AS BIGINT)
        |    AS metric_ppm,
        |  CASE WHEN floor(1e6 * count(o_orderpriority) / any_value(n.n))
        |    >= 1000000 THEN 1 ELSE 0 END::BIGINT AS ok
        |FROM orders CROSS JOIN n
        |UNION ALL
        |SELECT 'in_range', 'o_totalprice',
        |  CAST(floor(1e6 * sum(CASE WHEN o_totalprice IS NOT NULL
        |      AND o_totalprice >= 1000.0 AND o_totalprice <= 400000.0
        |      THEN 1 ELSE 0 END) / any_value(n.n)) AS BIGINT),
        |  CASE WHEN floor(1e6 * sum(CASE WHEN o_totalprice IS NOT NULL
        |      AND o_totalprice >= 1000.0 AND o_totalprice <= 400000.0
        |      THEN 1 ELSE 0 END) / any_value(n.n)) >= 950000
        |    THEN 1 ELSE 0 END::BIGINT
        |FROM orders CROSS JOIN n
        |UNION ALL
        |SELECT 'in_set', 'o_orderstatus',
        |  CAST(floor(1e6 * sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
        |      THEN 1 ELSE 0 END) / any_value(n.n)) AS BIGINT),
        |  CASE WHEN floor(1e6 * sum(CASE WHEN o_orderstatus IN ('O','F','P')
        |      THEN 1 ELSE 0 END) / any_value(n.n)) >= 1000000
        |    THEN 1 ELSE 0 END::BIGINT
        |FROM orders CROSS JOIN n
        |UNION ALL
        |SELECT 'unique', 'o_orderkey',
        |  CAST(floor(1e6 * count(DISTINCT o_orderkey) / any_value(n.n))
        |    AS BIGINT),
        |  CASE WHEN count(DISTINCT o_orderkey) = any_value(n.n)
        |    THEN 1 ELSE 0 END::BIGINT
        |FROM orders CROSS JOIN n
        |UNION ALL
        |SELECT 'foreign_key', 'o_custkey',
        |  CAST(floor(1e6 * sum(CASE WHEN NOT EXISTS (SELECT 1 FROM customer
        |      WHERE c_custkey = o_custkey) THEN 1 ELSE 0 END)
        |    / any_value(n.n)) AS BIGINT),
        |  CASE WHEN sum(CASE WHEN NOT EXISTS (SELECT 1 FROM customer
        |      WHERE c_custkey = o_custkey) THEN 1 ELSE 0 END) = 0
        |    THEN 1 ELSE 0 END::BIGINT
        |FROM orders CROSS JOIN n
        |""".stripMargin))

  // ---- gap-fill resampling -------------------------------------------------

  /** Per-user daily activity series with missing days zero-filled
    * between each user's first and last active day (time-series
    * regularization before any rolling/lag feature). The span table is
    * one groupBy; `sequence` + explode generates days NARROWLY from the
    * bounded span row — no calendar cross join with the corpus; the
    * left join back is co-partitioned on (user, day). */
  private val gapFill: Q = Q(
    fn = (s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("(ts div 1000000) div 86400000").as("day"))
      val span = e.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val days = span.select(col("user_id"),
        explode(expr("sequence(d0, d1)")).as("day"))
      val counts = e.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"))
      days.join(counts, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
    },
    oracle = Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day
        |           FROM events),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |         FROM e GROUP BY 1),
        |days AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
        |         FROM span),
        |c AS (SELECT user_id, day, count(*)::BIGINT AS n
        |      FROM e GROUP BY 1, 2)
        |SELECT days.user_id, days.day, coalesce(c.n, 0)::BIGINT AS n
        |FROM days LEFT JOIN c USING (user_id, day)
        |""".stripMargin))

  // ---- count-min sketch ----------------------------------------------------

  /** CMS contract over document tokens: for the exact top-10 tokens
    * (count-desc, token-asc — deterministic), the sketch estimate must
    * (a) never undercount and (b) overshoot at most 3·(e/w)·N; and the
    * sketch over a crc32-parity split must merge BIT-IDENTICAL to the
    * whole-corpus sketch (elementwise-add mergeability — what makes the
    * sketch maintainable per ingest batch / micro-batch). Exact counts
    * and the corpus token total are value-checked cross-engine; the
    * sketch properties live in the ok flags. */
  private val countMin: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val d = 4; val w = 2048
      val toks = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "")
      toks.cache()
      try {
        val agg = graft.agg.CountMin.sketchAgg(d, w)
        val whole = toks.agg(agg(col("t"))).head().getAs[Seq[Long]](0).toArray
        val n = toks.count()
        // harness-only: exact-truth dual (bounded TakeOrdered top-10) for
        // the Count-Min overshoot contract
        val top = toks.groupBy("t").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("t").asc).limit(10)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val margin = 3.0 * math.E / w * n
        val tokenRows = top.map { case (t, exact) =>
          val est = graft.agg.CountMin.estimate(whole, d, w, t)
          (t, exact,
            if (est >= exact) 1L else 0L,
            if (est <= exact + margin) 1L else 0L)
        }
        def half(parity: Int) =
          toks.filter(crc32(col("t")) % 2 === parity)
            .agg(agg(col("t"))).head().getAs[Seq[Long]](0).toArray
        val merged = graft.agg.CountMin.merge(half(0), half(1))
        val mergeOk =
          if (java.util.Arrays.equals(merged, whole)) 1L else 0L
        (tokenRows.toSeq :+ (("__merge_bitexact", n, mergeOk, 1L)))
          .toDF("token", "exact_n", "ok_lower", "ok_upper")
      } finally toks.unpersist(false)
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT t FROM (SELECT unnest(string_split(text, ' ')) AS t
        |                 FROM documents) WHERE t <> '')
        |SELECT * FROM (
        |  SELECT t AS token, count(*)::BIGINT AS exact_n,
        |    1::BIGINT AS ok_lower, 1::BIGINT AS ok_upper
        |  FROM toks GROUP BY t
        |  ORDER BY count(*) DESC, t ASC LIMIT 10)
        |UNION ALL
        |SELECT '__merge_bitexact', count(*)::BIGINT, 1, 1 FROM toks
        |""".stripMargin))

  // ---- salted skew join ----------------------------------------------------

  /** Salted fact⋈dim join (8-way), value-equal to the plain join: the
    * oracle is the UNSALTED SQL join, so the query proves salting
    * changes the distribution and never the result. Quantities are
    * integer-valued doubles → their sum is exact in any order. */
  private val saltedJoin: Q = Q(
    fn = (s, dir) => {
      val fact = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("s_suppkey"), col("l_quantity"))
      val dim = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      graft.ops.SkewJoin.saltedJoin(fact, dim, "s_suppkey", salt = 8)
        .groupBy("s_suppkey", "s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          // overflow-clamped: floor SATURATES in Spark, ::BIGINT errors
          // in DuckDB (fuzz gate, 1e300 quantities)
          graft.ops.Binning.longWeight(sum("l_quantity")).as("sum_qty"))
    },
    oracle = Some(
      """SELECT s_suppkey, s_nationkey, count(*)::BIGINT AS n_items,
        |  CAST(floor(CASE
        |      WHEN sum(l_quantity) > 4.611686018427387904e18
        |        THEN 4.611686018427387904e18
        |      WHEN sum(l_quantity) < -4.611686018427387904e18
        |        THEN -4.611686018427387904e18
        |      ELSE sum(l_quantity) END) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_data_validation" -> validation,
    "q_gap_fill"        -> gapFill,
    "q_countmin"        -> countMin,
    "q_salted_join"     -> saltedJoin,
  )
}
