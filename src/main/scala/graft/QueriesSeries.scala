package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / experimentation analytics over the event stream:
  * next-event transition matrix, time-RANGE rolling windows, per-key
  * trend slopes, A/B proportion tests, and sliding-window distinct
  * counts via mergeable HLL sketches. */
object QueriesSeries {

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), expr("ts div 1000000").as("ms"))

  // ---- Markov next-event transition matrix ---------------------------------

  /** (prev_type → type) transition counts + row-normalized floor-ppm
    * probabilities: ONE user-keyed lag window (the sessionize shape)
    * then a bounded types² groupBy; the probability normalization
    * windows run over the bounded cell table. */
  private val transitions: Q = Q(
    fn = (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms").asc, col("event_id").asc)
      val cells = events(s, dir)
        .filter(col("ms").isNotNull) // no event time -> no sequence slot
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("row_n",
          sum("n").over(Window.partitionBy("prev_type")))
        .select(col("prev_type"), col("event_type"), col("n"),
          floor(lit(1e6) * col("n") / col("row_n")).as("p_ppm"))
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS prev_type
        |  FROM events WHERE ts IS NOT NULL),
        |cells AS (SELECT prev_type, event_type, count(*)::BIGINT AS n
        |          FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(floor(1e6 * n / sum(n) OVER (PARTITION BY prev_type))
        |    AS BIGINT) AS p_ppm
        |FROM cells
        |""".stripMargin))

  // ---- time-RANGE rolling window -------------------------------------------

  /** 7-day time-RANGE rolling spend per user over the DAILY aggregate
    * (RANGE 6 PRECEDING on the integer day key — frames follow event
    * TIME, not row position, so sparse days widen correctly). Daily
    * rollup first: the window then runs over users × active-days rows,
    * not raw events. */
  private val rollingTime: Q = Q(
    fn = (s, dir) => {
      val daily = events(s, dir)
        .filter(col("ms").isNotNull) // no event time -> no day bucket
        .withColumn("day", expr("ms div 86400000"))
        // overflow-clamped mils — see q_rolling; 2^40/row leaves ~8e6
        // rows of long-sum headroom per day-user group
        .withColumn("mils",
          graft.ops.Binning.longWeight(col("value") * 1000,
            graft.ops.Binning.MilsClamp))
        .groupBy("user_id", "day")
        .agg(sum("mils").as("day_mils"), count(lit(1)).as("day_n"))
      val w = Window.partitionBy("user_id").orderBy(col("day"))
        .rangeBetween(-6, Window.currentRow)
      daily.select(col("user_id"), col("day"),
        sum("day_mils").over(w).as("mils_7d"),
        sum("day_n").over(w).as("n_7d"))
    },
    oracle = Some(
      s"""WITH daily AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    sum(${QueryUtil.milsSql("value")}) AS day_mils,
        |    count(*)::BIGINT AS day_n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
        |SELECT user_id, day,
        |  CAST(sum(day_mils) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS mils_7d,
        |  CAST(sum(day_n) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM daily
        |""".stripMargin))

  // ---- per-key trend slope -------------------------------------------------

  /** OLS spend-trend slope per user (mils per day): closed-form moment
    * formula in ONE groupBy — the classic "behavioral trend feature"
    * without any per-key regression loop. Users active on a single day
    * are excluded on both sides (zero variance → undefined slope). */
  private val trendSlope: Q = Q(
    fn = (s, dir) => {
      val d = events(s, dir)
        .withColumn("x", expr("CAST(ms div 86400000 - 19700 AS DOUBLE)"))
        // clamped mils as DOUBLE: Spark floor(double) yields a
        // SATURATING long (sum(y) overflowed on 1e303), DuckDB floor
        // stays double — the shared 2^40 clamp is < 2^53 so the
        // long→double round-trip is exact and both engines agree
        .withColumn("y",
          graft.ops.Binning.longWeight(col("value") * 1000,
            graft.ops.Binning.MilsClamp).cast("double"))
      d.groupBy("user_id")
        .agg(count(lit(1)).cast("double").as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          countDistinct("x").as("nd"))
        .filter(col("nd") >= 2)
        .select(col("user_id"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("slope_mils_per_day"))
    },
    oracle = Some(
      s"""WITH d AS (SELECT user_id,
        |    CAST(epoch_ms(ts) // 86400000 - 19700 AS DOUBLE) AS x,
        |    CAST(${QueryUtil.milsSql("value")} AS DOUBLE) AS y
        |  FROM events),
        |g AS (SELECT user_id, count(*)::DOUBLE AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
        |    count(DISTINCT x) AS nd
        |  FROM d GROUP BY user_id)
        |SELECT user_id,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |    AS slope_mils_per_day
        |FROM g WHERE nd >= 2
        |""".stripMargin))

  // ---- A/B proportion test -------------------------------------------------

  /** Two-sample proportion z-test: treatment = user_id parity (a
    * deterministic stand-in assignment), metric = user-level purchase
    * conversion. Per-user flags in one groupBy, per-arm rollup on the
    * bounded 2-row table, pooled-variance z in identical op order both
    * engines. Counts are value-checked; z to 6 decimals. */
  private val abTest: Q = Q(
    fn = (s, dir) => {
      val perUser = events(s, dir)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
        .withColumn("arm", pmod(col("user_id"), lit(2)))
      val arms = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val Array((_, n0, c0), (_, n1, c1)) = arms.toArray
      val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
      val pPool = (c0 + c1).toDouble / (n0 + n1)
      val z = (p1 - p0) /
        math.sqrt(pPool * (1 - pPool) * (1.0 / n0 + 1.0 / n1))
      val spark = s
      import spark.implicits._
      Seq((n0, c0, n1, c1, math.rint(z * 1e6) / 1e6))
        .toDF("n_control", "conv_control", "n_treat", "conv_treat", "z")
    },
    oracle = Some(
      """WITH pu AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY user_id),
        |a AS (SELECT
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |    sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)::BIGINT AS c0,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)::BIGINT AS c1
        |  FROM pu)
        |SELECT n0 AS n_control, c0 AS conv_control,
        |  n1 AS n_treat, c1 AS conv_treat,
        |  round((c1 / n1::DOUBLE - c0 / n0::DOUBLE)
        |    / sqrt(((c0 + c1) / (n0 + n1)::DOUBLE)
        |         * (1 - (c0 + c1) / (n0 + n1)::DOUBLE)
        |         * (1.0 / n0 + 1.0 / n1)), 6) AS z
        |FROM a
        |""".stripMargin))

  // ---- sliding-window distinct via mergeable HLL ---------------------------

  /** 7-day sliding distinct users per day, the sketch way: ONE scan
    * builds per-day HLL registers (bounded: days × 16 KiB), the driver
    * merges each day's trailing week — no 7× data re-scan per window at
    * 100 TB, and the same registers serve any window width. The exact
    * sliding count rides a 7-way day explode (co-keyed, corpus-linear)
    * for the cross-engine value check; the sketch must land within 3%. */
  private val rollingDistinct: Q = Q(
    fn = (s, dir) => {
      import s.implicits._
      val p = 14
      // a null-timestamp event belongs to no day window (fuzz gate,
      // nulls mode — the null day group NPE'd the register merge)
      val e = events(s, dir)
        .select(col("user_id"), expr("(ms div 86400000)").as("day"))
        .filter(col("day").isNotNull)
      // exact: each (user, day) feeds the 7 windows it participates in
      val exact = e.distinct()
        .select(col("user_id"),
          explode(expr("sequence(day, day + 6)")).as("win_day"))
        .groupBy("win_day")
        .agg(countDistinct("user_id").as("n_exact"))
      val activeDays = e.select("day").distinct()
      val exactActive = exact.join(activeDays,
        exact("win_day") === activeDays("day")).drop("day")
      // sketch: per-day registers, driver-merged per trailing week
      val agg = graft.agg.Hll.sketchAgg(p)
      val regs = e.groupBy("day").agg(agg(col("user_id")).as("regs"))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
      // harness-only: exact-truth dual (bounded: one row per active day);
      // the operator under test is the mergeable per-day HLL sketch
      val estOk = exactActive.collect().map { r =>
        val (d, nExact) = (r.getLong(0), r.getLong(1))
        val merged = (d - 6 to d).flatMap(regs.get)
          .reduce(graft.agg.Hll.merge)
        val est = graft.agg.Hll.estimate(merged)
        (d, nExact, if (math.abs(est / nExact - 1.0) <= 0.03) 1L else 0L)
      }
      estOk.toSeq.toDF("win_day", "n_exact", "est_ok")
    },
    oracle = Some(
      """WITH e AS (SELECT DISTINCT user_id,
        |    epoch_ms(ts) // 86400000 AS day FROM events
        |  WHERE ts IS NOT NULL),
        |d AS (SELECT DISTINCT day FROM e),
        |win AS (SELECT d.day AS win_day, e.user_id
        |        FROM d JOIN e ON e.day BETWEEN d.day - 6 AND d.day)
        |SELECT win_day, count(DISTINCT user_id)::BIGINT AS n_exact,
        |  1::BIGINT AS est_ok
        |FROM win GROUP BY win_day
        |""".stripMargin))

  // ---- last-touch attribution (forward/tolerance as-of) --------------------

  /** Marketing-style last-touch attribution: each purchase attributes to
    * the user's LATEST prior click within 30 minutes, else stays
    * unattributed — [[graft.ops.TemporalJoin.asOfJoin]] with the
    * tolerance cut (backward direction), exercising the bounded-window
    * semantics q_asof_join leaves open. One key-partitioned window, no
    * per-row probe. */
  private val attribution: Q = Q(
    fn = (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.ops.TemporalJoin.asOfJoin(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightVals = Seq("click_id"),
          rightTie = "click_id", tolerance = Some(1800000000000L))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_click_id"), lit(-1L)).as("attributed_click"))
    },
    oracle = Some(
      """WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ns(ts) AS ts, event_id AS click_id
        |      FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  coalesce((SELECT c.click_id FROM c
        |    WHERE c.user_id = p.user_id AND c.ts <= p.ts
        |      AND c.ts >= p.ts - 1800000000000
        |    ORDER BY c.ts DESC, c.click_id DESC LIMIT 1), -1)
        |    AS attributed_click
        |FROM p
        |""".stripMargin))

  // ---- left-outer stream-stream interval join ------------------------------

  private val streamSsjoinOuter: Q = Q(
    fn = (s, dir) =>
      graft.streaming.StreamOps.purchaseContextJoinOuter(s, dir),
    oracle = Some(
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_ns(ts) AS pts
        |           FROM events
        |           WHERE event_type = 'purchase' AND ts IS NOT NULL),
        |c AS (SELECT user_id, epoch_ns(ts) AS cts FROM events
        |      WHERE event_type <> 'purchase' AND ts IS NOT NULL)
        |SELECT p.p_id, count(c.cts)::BIGINT AS n_context
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.cts >= p.pts - 1800000000000 AND c.cts <= p.pts
        |GROUP BY p.p_id
        |""".stripMargin))

  // ---- time-to-conversion (FORWARD as-of) ----------------------------------

  /** Time-to-next-purchase per event — the forward direction of the
    * as-of join (earliest right at-or-after, min-tie at a tied
    * instant): the conversion-latency feature behind "median time to
    * purchase after first click". Same one-window plan as backward. */
  private val timeToPurchase: Q = Q(
    fn = (s, dir) => {
      // null-ts events have no timeline position (fuzz gate); the
      // latency subtraction runs at ms grain BEFORE differencing so a
      // [1900, 2199] pair stays inside long range in both engines
      val ev = Tables.load(s, dir, "events")
        .filter(col("ts").isNotNull)
      val left = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("p_id"), col("ts").as("pts"))
      graft.ops.TemporalJoin.asOfJoin(left, right, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightVals = Seq("p_id", "pts"),
          rightTie = "p_id", direction = "forward")
        .select(col("event_id"),
          coalesce(col("asof_p_id"), lit(-1L)).as("next_purchase"),
          coalesce(expr("(asof_pts div 1000000) - (ts div 1000000)"),
            lit(-1L)).as("latency_ms"))
    },
    oracle = Some(
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts
        |           FROM events
        |           WHERE event_type <> 'purchase' AND ts IS NOT NULL),
        |p AS (SELECT user_id, epoch_ns(ts) AS pts, event_id AS p_id
        |      FROM events
        |      WHERE event_type = 'purchase' AND ts IS NOT NULL)
        |SELECT e.event_id,
        |  coalesce((SELECT p.p_id FROM p
        |    WHERE p.user_id = e.user_id AND p.pts >= e.ts
        |    ORDER BY p.pts ASC, p.p_id ASC LIMIT 1), -1) AS next_purchase,
        |  coalesce((SELECT (p.pts // 1000000) - (e.ts // 1000000) FROM p
        |    WHERE p.user_id = e.user_id AND p.pts >= e.ts
        |    ORDER BY p.pts ASC, p.p_id ASC LIMIT 1), -1) AS latency_ms
        |FROM e
        |""".stripMargin))

  // ---- timeout-bounded funnel ----------------------------------------------

  /** The q_funnel shape with per-stage CONVERSION WINDOWS: the click
    * must land within 7 days of the first view, the purchase within 7
    * days of that click — the form real funnel metrics use (unbounded
    * funnels overcount forever-later conversions). Same one-exchange
    * plan. */
  private val funnelWindowed: Q = Q(
    fn = (s, dir) => {
      val lim = 604800000L // 7 days in ms
      val w = Window.partitionBy("user_id")
      val perUser = events(s, dir)
        .withColumn("v",
          min(when(col("event_type") === "view", col("ms"))).over(w))
        .withColumn("c",
          min(when(col("event_type") === "click" &&
            col("ms") >= col("v") && col("ms") <= col("v") + lim,
            col("ms"))).over(w))
        .withColumn("p",
          min(when(col("event_type") === "purchase" &&
            col("ms") >= col("c") && col("ms") <= col("c") + lim,
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
        |         AND ms <= v + 604800000 THEN ms END)
        |         OVER (PARTITION BY user_id) AS c FROM u1),
        |u3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ms >= c
        |         AND ms <= c + 604800000 THEN ms END)
        |         OVER (PARTITION BY user_id) AS p FROM u2),
        |pu AS (SELECT user_id, any_value(v) AS v, any_value(c) AS c,
        |         any_value(p) AS p FROM u3 GROUP BY user_id)
        |SELECT 'step0_users' AS stage, count(*)::BIGINT AS n_users FROM pu
        |UNION ALL SELECT 'step1_view', count(v)::BIGINT FROM pu
        |UNION ALL SELECT 'step2_click', count(c)::BIGINT FROM pu
        |UNION ALL SELECT 'step3_purchase', count(p)::BIGINT FROM pu
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_transition_matrix" -> transitions,
    "q_time_to_purchase"  -> timeToPurchase,
    "q_funnel_windowed"   -> funnelWindowed,
    "q_rolling_time"      -> rollingTime,
    "q_trend_slope"       -> trendSlope,
    "q_ab_test"           -> abTest,
    "q_rolling_distinct"  -> rollingDistinct,
    "q_attribution"       -> attribution,
    "q_stream_ssjoin_outer" -> streamSsjoinOuter,
  )
}
