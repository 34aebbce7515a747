package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-analytics operators over the event stream and order history:
  * ordered funnels, cohort retention, SCD2 dimension builds, snapshot
  * upsert, pivot, and per-key rolling windows.
  *
  * Scale shapes: every operator here keys its ONE exchange on the entity
  * (user_id / custkey) — windows and groupBys share that partitioning, so
  * nothing serializes through a global sort or a single partition. Time
  * arithmetic is integer ms/day math end to end (ts arrives as LONG nanos
  * from [[Tables.load]]), so every value is engine-exact.
  */
object QueriesOlap {

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), expr("ts div 1000000").as("ms"))

  // ---- ordered funnel (view → click → purchase) ----------------------------

  /** Strictly-ordered funnel conversion: a user reaches stage k only with
    * an event of that type AT OR AFTER their stage-(k-1) timestamp. Three
    * chained unbounded windows + the final rollup all partition on
    * user_id — ONE hash exchange total at any scale. The driver-side
    * alternative (per-user collect_list) would OOM on a hot user; the
    * window form never materializes a user's events in one buffer. */
  private val funnel: Q = Q(
    fn = (s, dir) => {
      val w = Window.partitionBy("user_id")
      val perUser = events(s, dir)
        .withColumn("v",
          min(when(col("event_type") === "view", col("ms"))).over(w))
        .withColumn("c",
          min(when(col("event_type") === "click" && col("ms") >= col("v"),
            col("ms"))).over(w))
        .withColumn("p",
          min(when(col("event_type") === "purchase" && col("ms") >= col("c"),
            col("ms"))).over(w))
        .groupBy("user_id")
        .agg(first("v").as("v"), first("c").as("c"), first("p").as("p"))
      perUser.agg(
          count(lit(1)).as("step0_users"), count("v").as("step1_view"),
          count("c").as("step2_click"), count("p").as("step3_purchase"))
        .selectExpr(
          "stack(4, 'step0_users', step0_users, 'step1_view', step1_view, " +
            "'step2_click', step2_click, 'step3_purchase', step3_purchase) " +
            "AS (stage, n_users)")
    },
    oracle = Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
        |u1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ms END)
        |         OVER (PARTITION BY user_id) AS v FROM e),
        |u2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ms >= v
        |         THEN ms END) OVER (PARTITION BY user_id) AS c FROM u1),
        |u3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ms >= c
        |         THEN ms END) OVER (PARTITION BY user_id) AS p FROM u2),
        |pu AS (SELECT user_id, any_value(v) AS v, any_value(c) AS c,
        |         any_value(p) AS p FROM u3 GROUP BY user_id)
        |SELECT 'step0_users' AS stage, count(*)::BIGINT AS n_users FROM pu
        |UNION ALL SELECT 'step1_view', count(v)::BIGINT FROM pu
        |UNION ALL SELECT 'step2_click', count(c)::BIGINT FROM pu
        |UNION ALL SELECT 'step3_purchase', count(p)::BIGINT FROM pu
        |""".stripMargin))

  // ---- cohort retention ----------------------------------------------------

  /** Day-grain cohort retention: users bucketed by first-activity day,
    * counted distinct per (cohort_day, day_offset). Two co-keyed
    * exchanges: the first-day window on user_id, then the distinct-count
    * groupBy (Spark runs it as the standard two-phase partial distinct —
    * no per-cohort row explosion). */
  private val cohort: Q = Q(
    fn = (s, dir) =>
      events(s, dir)
        .withColumn("day", expr("ms div 86400000"))
        .withColumn("cohort_day",
          min("day").over(Window.partitionBy("user_id")))
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct("user_id").as("n_users")),
    oracle = Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day
        |           FROM events),
        |c AS (SELECT *, min(day) OVER (PARTITION BY user_id) AS cohort_day
        |      FROM e)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM c GROUP BY 1, 2
        |""".stripMargin))

  // ---- SCD2 dimension build ------------------------------------------------

  /** Type-2 slowly-changing dimension from the order change log: each
    * customer's status history becomes `[valid_from, valid_to)` intervals
    * via [[graft.ops.Snapshot.scd2]] — ONE key-partitioned lead window,
    * no self-join. Open intervals use a year-9999 sentinel so the output
    * stays pure int64 (a NULL would split the column dtype across
    * engines). */
  private val scd2Q: Q = Q(
    fn = (s, dir) => {
      // a version row without an effective date can't be sequenced
      // (null-ordering also differs across engines — fuzz gate)
      val log = Tables.load(s, dir, "orders")
        .withColumn("from_ms", expr("unix_micros(cast(o_orderdate as timestamp)) div 1000"))
        .filter(col("from_ms").isNotNull)
      graft.ops.Snapshot.scd2(log, "o_custkey", col("from_ms"),
        Seq(col("from_ms").asc, col("o_orderkey").asc),
        Seq("o_orderkey", "o_orderstatus"))
    },
    oracle = Some(
      """WITH log AS (SELECT o_custkey, o_orderkey, o_orderstatus,
        |  epoch_ms(o_orderdate) AS from_ms FROM orders
        |  WHERE o_orderdate IS NOT NULL)
        |SELECT o_custkey, o_orderkey, o_orderstatus,
        |  from_ms AS valid_from,
        |  coalesce(lead(from_ms, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY from_ms, o_orderkey), 253402300800000) AS valid_to,
        |  CASE WHEN lead(from_ms, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY from_ms, o_orderkey) IS NULL
        |    THEN 1 ELSE 0 END::BIGINT AS is_current
        |FROM log
        |""".stripMargin))

  // ---- snapshot upsert (MERGE insert-or-replace) ---------------------------

  /** Changelog upsert into the customer snapshot: the latest order per
    * customer (deterministic composite max via ONE struct-max partial
    * agg — no per-key sort) replaces the account-balance attribute;
    * customers without orders keep their base row. The full-outer join
    * co-partitions both sides on the key. Values are picked, never
    * computed — bit-exact across engines. */
  private val upsert: Q = Q(
    fn = (s, dir) => {
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("value"))
      val delta = Tables.load(s, dir, "orders")
        .withColumn("date_ms", expr("unix_micros(cast(o_orderdate as timestamp)) div 1000"))
        .groupBy(col("o_custkey").as("k"))
        .agg(max(struct(col("date_ms"), col("o_orderkey"),
          col("o_totalprice"))).as("m"))
        .select(col("k"), col("m.o_totalprice").as("value"))
      graft.ops.Snapshot.upsert(base, delta, "k", Seq("value"))
        .withColumnRenamed("__src", "src")
    },
    oracle = Some(
      """WITH d AS (
        |  SELECT o_custkey AS k, o_totalprice AS value,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY epoch_ms(o_orderdate) DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |dd AS (SELECT k, value FROM d WHERE rn = 1),
        |b AS (SELECT c_custkey AS k, c_acctbal AS value FROM customer)
        |SELECT coalesce(b.k, dd.k) AS k,
        |  CASE WHEN dd.k IS NOT NULL THEN dd.value ELSE b.value END AS value,
        |  CASE WHEN dd.k IS NOT NULL THEN 'delta' ELSE 'base' END AS src
        |FROM b FULL OUTER JOIN dd ON b.k = dd.k
        |""".stripMargin))
  // ^ presence-based (dd.k join hit), NOT per-value coalesce: the engine's
  //   MERGE semantics let a delta row with NULL attrs win whole-row, and
  //   the oracle must guard exactly that (Snapshot.upsert round-9 fix)

  // ---- pivot (wide conditional aggregation) --------------------------------

  /** Daily event-type pivot with an EXPLICIT value list — Spark skips the
    * distinct-values pre-job and plans one aggregate; an open-ended pivot
    * would add a full scan just to learn the columns. Absent cells
    * coalesce to 0 so the wide schema is dense int64. */
  private val pivotQ: Q = Q(
    fn = (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = events(s, dir)
        .withColumn("day", expr("ms div 86400000"))
        .groupBy("day").pivot("event_type", types).count()
      wide.select(col("day") +:
        types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
    },
    oracle = Some(
      """SELECT epoch_ms(ts) // 86400000 AS day,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'error') AS n_error,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'view') AS n_view
        |FROM events GROUP BY 1
        |""".stripMargin))

  // ---- per-key rolling window ----------------------------------------------

  /** Rolling 3-event sum/count of spend per user (time-series feature
    * engineering): ONE user-partitioned ordered window, frame = 2
    * PRECEDING..CURRENT. Order is total — (ms, event_id) — so the frame
    * content is deterministic; values go through floor(value*1000) int64
    * mils so the rolling sum is exact integer math in both engines. */
  private val rolling: Q = Q(
    fn = (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms").asc, col("event_id").asc)
        .rowsBetween(-2, Window.currentRow)
      events(s, dir)
        .filter(col("ms").isNotNull) // no event time -> no frame slot
        // overflow-clamped mils (fuzz: Spark floor(1e303) SATURATES to
        // Long.Max, then the window sum ANSI-overflows; DuckDB's cast
        // errors outright — both engines clamp identically instead)
        .withColumn("mils",
          graft.ops.Binning.longWeight(col("value") * 1000,
            graft.ops.Binning.MilsClamp))
        .select(col("event_id"), col("user_id"),
          sum("mils").over(w).as("roll_mils"),
          count(lit(1)).over(w).as("n_frame"))
    },
    oracle = Some(
      s"""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |  ${QueryUtil.milsSql("value")} AS mils FROM events
        |  WHERE ts IS NOT NULL)
        |SELECT event_id, user_id,
        |  CAST(sum(mils) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_mils,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_frame
        |FROM e
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_funnel"   -> funnel,
    "q_cohort"   -> cohort,
    "q_scd2"     -> scd2Q,
    "q_upsert"   -> upsert,
    "q_pivot"    -> pivotQ,
    "q_rolling"  -> rolling,
  )
}
