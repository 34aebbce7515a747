package graft

import org.apache.spark.sql.functions._

/** Additional TPC-H rollups widening the §2.5-2.6 OLAP surface beyond
  * Q1/Q3: the six-table snowflake join (Q5) and the selective
  * scan-aggregate (Q6) — the two canonical plan shapes (deep
  * broadcast-dim join tree; pushed-predicate single scan). */
object QueriesTpch {
  import QueryUtil._

  /** Q5: revenue per nation, customers and suppliers co-national, one
    * region, one order year. Plan shape to want at 100 TB: lineitem ⋈
    * orders co-partitioned on orderkey (the two big tables), every
    * dimension (supplier/customer/nation/region) broadcast — the fact
    * table shuffles ONCE on the l_orderkey/o_orderkey equi-key and
    * never for a dimension. */
  private val tpchQ5: Q = Q(
    fn = (s, dir) => {
      val l = li(s, dir)
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy(col("n_name"))
        .agg(round(sum(scoreCol), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    oracle = Some(
      s"""SELECT n_name, round(sum($scoreSql), 2) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |""".stripMargin))

  /** Q6: the forecast-revenue-change scan — every predicate must reach
    * the parquet scan as a pushed filter (`.explain` shows PushedFilters
    * on shipdate/discount/quantity); zero joins, one partial+final agg. */
  private val tpchQ6: Q = Q(
    fn = (s, dir) =>
      li(s, dir)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"), count(lit(1)).as("n_items")),
    oracle = Some(
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24
        |""".stripMargin))

  /** IQR outlier fences per numeric column — the data-quality signal a
    * profiler puts beside the catalog stats: exact quartiles (one
    * grouped-percentile pass over the stacked columns), fence math in
    * identical op order, outlier counts via a second stacked scan. */
  private val outlierFence: Q = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_tax")
    val stackSql = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', $c").mkString(", ") + ") AS (col_name, v)"
    Q(
      fn = (s, dir) => {
        val long = li(s, dir).selectExpr(stackSql)
        val q = long.groupBy("col_name")
          .agg(percentile_approx(col("v"), lit(0.25), lit(2147483647))
            .as("q1"),
            percentile_approx(col("v"), lit(0.75), lit(2147483647))
              .as("q3"))
          .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
          .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
        long.join(graft.ops.PlanHints.gatedBroadcast(q), Seq("col_name"))
          .groupBy("col_name")
          .agg(first("q1").as("q1"), first("q3").as("q3"),
            sum(when(col("v") < col("lo") || col("v") > col("hi"), 1L)
              .otherwise(0L)).as("n_outliers"),
            count(lit(1)).as("n"))
      },
      oracle = Some {
        val union = cols
          .map(c => s"SELECT '$c' AS col_name, $c AS v FROM lineitem")
          .mkString("\nUNION ALL ")
        s"""WITH u AS ($union),
           |q AS (SELECT col_name,
           |    quantile_disc(v, 0.25) AS q1, quantile_disc(v, 0.75) AS q3
           |  FROM u GROUP BY col_name),
           |f AS (SELECT col_name, q1, q3,
           |    q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
           |  FROM q)
           |SELECT u.col_name, any_value(f.q1) AS q1, any_value(f.q3) AS q3,
           |  sum(CASE WHEN u.v < f.lo OR u.v > f.hi THEN 1 ELSE 0 END)::BIGINT
           |    AS n_outliers,
           |  count(*) AS n
           |FROM u JOIN f USING (col_name)
           |GROUP BY u.col_name
           |""".stripMargin
      })
  }

  val all: Map[String, Q] = Map(
    "q_tpch_q5"       -> tpchQ5,
    "q_tpch_q6"       -> tpchQ6,
    "q_outlier_fence" -> outlierFence,
  )
}
