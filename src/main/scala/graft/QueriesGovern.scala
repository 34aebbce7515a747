package graft

import org.apache.spark.sql.functions._

/** Data-governance checks (the privacy dual of the validation suite)
  * and the explicit GROUPING SETS completion of the OLAP family. */
object QueriesGovern {

  // ---- k-anonymity ---------------------------------------------------------

  /** k-anonymity audit over quasi-identifiers (nation, market segment):
    * every row's QI combination must be shared by ≥ k rows, or the
    * dataset re-identifies. ONE groupBy on the QI columns → bounded
    * equivalence-class table; the rollup emits class-size distribution
    * + the risk headcount. The classic pre-release gate before sharing
    * "anonymized" data. */
  private val kAnonymity: Q = Q(
    fn = (s, dir) => {
      val k = 5
      val classes = Tables.load(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("class_size"))
      classes.agg(
        count(lit(1)).as("n_classes"),
        min("class_size").as("min_class"),
        sum(when(col("class_size") < k, col("class_size"))
          .otherwise(0L)).as("n_rows_at_risk"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as("n_classes_at_risk"),
        max(when(col("class_size") >= k, lit(1)).otherwise(lit(0)))
          .cast("long").as("has_safe_class"))
    },
    oracle = Some(
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
        |    count(*)::BIGINT AS class_size
        |  FROM customer GROUP BY 1, 2)
        |SELECT count(*)::BIGINT AS n_classes,
        |  min(class_size) AS min_class,
        |  sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)::BIGINT
        |    AS n_rows_at_risk,
        |  sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_classes_at_risk,
        |  max(CASE WHEN class_size >= 5 THEN 1 ELSE 0 END)::BIGINT
        |    AS has_safe_class
        |FROM c
        |""".stripMargin))

  // ---- l-diversity ---------------------------------------------------------

  /** l-diversity: within each QI class, the SENSITIVE attribute (order
    * priority, standing in for a sensitive label) must take ≥ l
    * distinct values — k-anonymity alone fails when a whole class
    * shares one sensitive value. Two-phase distinct per class, bounded
    * class table, rollup of the failing classes. */
  private val lDiversity: Q = Q(
    fn = (s, dir) => {
      val l = 3
      val classes = Tables.load(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("class_size"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_sensitive_values"),
          sum("class_size").as("n_rows"))
      classes.select(col("o_orderstatus"), col("n_sensitive_values"),
        col("n_rows"),
        when(col("n_sensitive_values") >= l, 1L).otherwise(0L)
          .as("l_diverse"))
    },
    oracle = Some(
      """WITH c AS (SELECT o_orderstatus, o_orderpriority,
        |    count(*)::BIGINT AS class_size
        |  FROM orders GROUP BY 1, 2),
        |g AS (SELECT o_orderstatus,
        |    count(*)::BIGINT AS n_sensitive_values,
        |    sum(class_size)::BIGINT AS n_rows
        |  FROM c GROUP BY 1)
        |SELECT o_orderstatus, n_sensitive_values, n_rows,
        |  CASE WHEN n_sensitive_values >= 3 THEN 1 ELSE 0 END::BIGINT
        |    AS l_diverse
        |FROM g
        |""".stripMargin))

  // ---- explicit GROUPING SETS ----------------------------------------------

  /** GROUPING SETS with an explicit (non-cube) set list — (flag,
    * status), (flag), () — one aggregate pass over exactly the
    * requested levels, with GROUPING() bits distinguishing NULL-as-ALL
    * from NULL-as-value (the q_olap_cube contract, completed for
    * arbitrary set lists). */
  private val groupingSets: Q = Q(
    fn = (s, dir) => {
      QueryUtil.li(s, dir)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
          |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
          |  count(*) AS n,
          |  CAST(floor(CASE
          |    WHEN sum(l_quantity) > 4.611686018427387904e18
          |      THEN 4.611686018427387904e18
          |    WHEN sum(l_quantity) < -4.611686018427387904e18
          |      THEN -4.611686018427387904e18
          |    ELSE sum(l_quantity) END) AS BIGINT) AS sum_qty
          |FROM li_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |  (l_returnflag), ())
          |""".stripMargin)
    },
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  count(*) AS n,
        |  CAST(floor(CASE
        |    WHEN sum(l_quantity) > 4.611686018427387904e18
        |      THEN 4.611686018427387904e18
        |    WHEN sum(l_quantity) < -4.611686018427387904e18
        |      THEN -4.611686018427387904e18
        |    ELSE sum(l_quantity) END) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())
        |""".stripMargin))

  // ---- distribution distances (drift beyond PSI) ---------------------------

  /** Hellinger distance and Jensen–Shannon divergence of each source's
    * document-length distribution vs the corpus — the bounded-metric
    * drift pair (PSI explodes on near-empty bins; H ∈ [0,1] and
    * JSD ∈ [0, ln 2] stay comparable across features). One corpus scan
    * to (source, bin) cells; the zero-filled grid, both distance sums,
    * and the rollup all run on the bounded cell table. */
  private val distDistance: Q = Q(
    fn = (s, dir) => {
      val k = 10
      // unknown provenance (NULL source) is outside the per-source
      // drift report — the null-key grid rows never joined back and
      // divided by a zero src_total (fuzz gate, nulls mode)
      val d0 = Tables.load(s, dir, "documents")
        .filter(col("source").isNotNull)
      val Array(mn0, mx0) = d0.agg(min("n_chars").cast("double"),
        max("n_chars").cast("double")).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val (mn, mx) = (s"${mn0}D", s"${mx0}D")
      val arms = (1 until k).reverse
        .map(i => s"WHEN n_chars >= $mn + ($mx - $mn) * $i / $k THEN $i")
        .mkString(" ")
      val cells = d0
        .withColumn("bin", expr(s"CASE $arms ELSE 0 END"))
        .groupBy("source", "bin").agg(count(lit(1)).as("n"))
      cells.cache()
      try {
        val grid = cells.select("source").distinct()
          .crossJoin(s.range(0, k).select(col("id").cast("int").as("bin")))
          .join(cells, Seq("source", "bin"), "left")
          .withColumn("n", coalesce(col("n"), lit(0L)))
        val withTotals = grid
          .withColumn("src_total", sum("n").over(
            org.apache.spark.sql.expressions.Window.partitionBy("source")))
          .withColumn("bin_total", sum("n").over(
            org.apache.spark.sql.expressions.Window.partitionBy("bin")))
          // bounded sources×k grid; constant partition key (see
          // ops/Psi.scala) keeps the WindowExec warning count at zero
          .withColumn("all_total", sum("n").over(
            org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
          .withColumn("p", col("n") / col("src_total"))
          .withColumn("q", col("bin_total") / col("all_total"))
          .withColumn("m", (col("p") + col("q")) / 2)
        withTotals.groupBy("source")
          .agg(
            round(sqrt(sum(
              (sqrt(col("p")) - sqrt(col("q"))) *
                (sqrt(col("p")) - sqrt(col("q")))) / 2), 6)
              .as("hellinger"),
            round(sum(
              when(col("p") > 0, col("p") * log(col("p") / col("m")) / 2)
                .otherwise(0.0) +
              when(col("q") > 0, col("q") * log(col("q") / col("m")) / 2)
                .otherwise(0.0)), 6).as("jsd"))
      } finally cells.unpersist(false)
    },
    oracle = Some {
      val k = 10
      val arms = (1 until k).reverse
        .map(i => s"WHEN n_chars >= mn + (mx - mn) * $i / $k THEN $i")
        .mkString(" ")
      s"""WITH doc AS (SELECT * FROM documents WHERE source IS NOT NULL),
         |s AS (SELECT min(n_chars)::DOUBLE AS mn,
         |           max(n_chars)::DOUBLE AS mx FROM doc),
         |cells AS (SELECT source, (CASE $arms ELSE 0 END) AS bin,
         |            count(*)::BIGINT AS n
         |          FROM doc CROSS JOIN s GROUP BY 1, 2),
         |grid AS (SELECT src.source, b.bin, coalesce(cells.n, 0) AS n
         |  FROM (SELECT DISTINCT source FROM cells) src
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${k - 1})) AS bin) b
         |  LEFT JOIN cells ON cells.source = src.source
         |    AND cells.bin = b.bin),
         |t AS (SELECT source, bin, n,
         |    sum(n) OVER (PARTITION BY source) AS src_total,
         |    sum(n) OVER (PARTITION BY bin) AS bin_total,
         |    sum(n) OVER () AS all_total
         |  FROM grid),
         |pq AS (SELECT source,
         |    n / src_total::DOUBLE AS p,
         |    bin_total / all_total::DOUBLE AS q,
         |    (n / src_total::DOUBLE + bin_total / all_total::DOUBLE) / 2
         |      AS m
         |  FROM t)
         |SELECT source,
         |  round(sqrt(sum((sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q))) / 2),
         |    6) AS hellinger,
         |  round(sum(
         |    CASE WHEN p > 0 THEN p * ln(p / m) / 2 ELSE 0 END +
         |    CASE WHEN q > 0 THEN q * ln(q / m) / 2 ELSE 0 END), 6) AS jsd
         |FROM pq GROUP BY source
         |""".stripMargin
    })

  val all: Map[String, Q] = Map(
    "q_k_anonymity"   -> kAnonymity,
    "q_l_diversity"   -> lDiversity,
    "q_grouping_sets" -> groupingSets,
    "q_dist_distance" -> distDistance,
  )
}
