package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TemporalJoin
import graft.text.TextOps

/** Temporal-join operators (as-of, range) over the `events` table plus
  * corpus-analytics queries (cross-source overlap, weighted sampling) over
  * `documents` — operators Spark has no built-in for, re-expressed as
  * single-shuffle declarative plans (see [[graft.ops.TemporalJoin]]).
  */
object QueriesTemporal {

  private val HOUR_NS = 3600L * 1000 * 1000 * 1000
  private val PAD_NS  = 1800L * 1000 * 1000 * 1000 // 30 min
  private val GAP_NS  = 2 * HOUR_NS

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  // ---- as-of join: event → latest prior purchase of the same user ----------

  /** Point-in-time feature join: every non-purchase event picks up the
    * value and id of the user's most recent purchase at-or-before the
    * event timestamp — the leakage-safe feature-store lookup. Oracle is
    * the textbook formulation (correlated `ORDER BY ts DESC LIMIT 1`
    * subqueries), deliberately independent of the union+window plan. */
  /** Shared by the batch and streaming as-of queries — the streaming
    * result (one AvailableNow batch) must equal the batch join. */
  private val asofOracle =
    """WITH ok AS (
      |  SELECT * FROM events
      |  WHERE ts IS NOT NULL AND value IS NOT NULL
      |    AND event_type IS NOT NULL),
      |snap AS (
      |  SELECT user_id, epoch_ns(ts) AS ts, event_id, value
      |  FROM ok WHERE event_type = 'purchase'),
      |ev AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS ts
      |  FROM ok WHERE event_type <> 'purchase')
      |SELECT e.event_id, e.user_id,
      |  (SELECT round(s.value, 4) FROM snap s
      |   WHERE s.user_id = e.user_id AND s.ts <= e.ts
      |   ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS asof_value,
      |  (SELECT s.event_id FROM snap s
      |   WHERE s.user_id = e.user_id AND s.ts <= e.ts
      |   ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS asof_src
      |FROM ev e
      |""".stripMargin

  private val asofJoin: Q = Q(
    fn = (s, dir) => {
      // malformed rows (no ts/value/type) drop at ingest — mirrors the
      // shared asofOracle's `ok` CTE and the streaming twin
      val ev = events(s, dir).filter(col("ts").isNotNull &&
        col("value").isNotNull && col("event_type").isNotNull)
      val left = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val snap = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("src_id"), round(col("value"), 4).as("pval"))
      TemporalJoin.asOfJoin(left, snap, Seq("user_id"),
          leftTs = "ts", rightTs = "ts",
          rightVals = Seq("pval", "src_id"), rightTie = "src_id")
        .select(col("event_id"), col("user_id"),
          col("asof_pval").as("asof_value"), col("asof_src_id").as("asof_src"))
    },
    oracle = Some(asofOracle))

  /** Streaming twin of q_asof_join: `flatMapGroupsWithState` keeps only
    * the latest purchase per user (O(users) state) — same oracle. */
  private val streamAsof: Q = Q(
    fn = (s, dir) => graft.streaming.StreamOps.asOfStream(s, dir),
    oracle = Some(asofOracle))

  // ---- OLAP cube / grouping sets (§2.5 rollup family) ----------------------

  /** CUBE over (returnflag, linestatus) with grouping indicators — the
    * grouping-sets surface of the OLAP family (TPC-H Q1's dimensions, all
    * 2² aggregation levels in ONE pass: Spark expands the cube in the
    * aggregate, not via self-union re-scans). Sums stay on exact-in-double
    * quantities so the compare is hash-exact at every level. */
  private val olapCube: Q = Q(
    fn = (s, dir) => Tables.load(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_quantity") / count(lit(1)), 6).as("avg_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("g_rf"), col("g_ls"), col("n"), col("sum_qty"), col("avg_qty")),
    oracle = Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  GROUPING(l_returnflag)::BIGINT AS g_rf,
        |  GROUPING(l_linestatus)::BIGINT AS g_ls,
        |  count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_quantity) / count(*), 6) AS avg_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |""".stripMargin))

  // ---- range join: corpus activity inside padded error-burst windows -------

  /** Incident blast radius: per-user error-burst windows (2 h gap
    * sessionization, ±30 min padding), then a genuine NON-equi range join
    * counting ALL events — any user, any type — inside each window.
    * Window construction is user-partitioned (scales); the interval join
    * is the bucketed equi-join re-expression of [[TemporalJoin.rangeJoin]]
    * (1 h cells), NOT a BroadcastNestedLoop `BETWEEN`. The oracle states
    * the range join as the bare inequality join DuckDB runs via IEJoin. */
  private val rangeJoinQ: Q = Q(
    fn = (s, dir) => {
      val ev = events(s, dir).filter(col("ts").isNotNull)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val windows = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev", lag("ts", 1).over(w))
        .withColumn("f", when(col("prev").isNull ||
          col("ts") - col("prev") > GAP_NS, 1L).otherwise(0L))
        .withColumn("win_id", sum("f").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id").as("owner"), col("win_id"))
        .agg((min("ts") - PAD_NS).as("lo"), (max("ts") + PAD_NS).as("hi"))
      val points = ev.select(col("event_id").as("p_id"),
        col("user_id").as("p_user"), col("ts"))
      TemporalJoin.rangeJoin(points, "ts", windows, "lo", "hi", HOUR_NS)
        .groupBy("owner", "win_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("p_user")).as("n_users"))
    },
    oracle = Some(
      s"""WITH err AS (
         |  SELECT user_id, event_id, epoch_ns(ts) AS ts
         |  FROM events WHERE event_type = 'error' AND ts IS NOT NULL),
         |lagd AS (
         |  SELECT user_id, event_id, ts, lag(ts) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM err),
         |flags AS (
         |  SELECT user_id, event_id, ts, CASE WHEN prev IS NULL
         |    OR ts - prev > ${GAP_NS} THEN 1 ELSE 0 END AS f FROM lagd),
         |wid AS (
         |  SELECT user_id, ts, sum(f) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id)::BIGINT AS win_id FROM flags),
         |w AS (
         |  SELECT user_id AS owner, win_id,
         |    min(ts) - ${PAD_NS} AS lo, max(ts) + ${PAD_NS} AS hi
         |  FROM wid GROUP BY 1, 2),
         |e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts FROM events
         |      WHERE ts IS NOT NULL)
         |SELECT w.owner, w.win_id, count(*) AS n_events,
         |  count(DISTINCT e.user_id) AS n_users
         |FROM w JOIN e ON e.ts BETWEEN w.lo AND w.hi
         |GROUP BY 1, 2
         |""".stripMargin))

  /** Timestamp-typed range join through the CATALYST RULE
    * ([[graft.plans.RangeJoinRewrite]]): native-timestamp points BETWEEN
    * native-timestamp bounds, no equi key — exactly the shape the rule
    * rewrites (quantized via `unix_micros`, its own `bucketTs` width).
    * Unlike q_range_join (explicit [[TemporalJoin.rangeJoin]] cells over
    * long-ns), this query hands Spark the naive BETWEEN join and relies
    * on the session rule to pick the hash-keyed plan — the oracle checks
    * the rewrite's VALUES, and `tools.PlanLint` pins its SHAPE (a rule
    * regression would resurface as a flagged scan×scan BNLJ). Windows:
    * per user, ±30 min around their first purchase; points: every
    * event. */
  private val rangeJoinTsQ: Q = Q(
    fn = (s, dir) => {
      val ev = events(s, dir)
      val evTs = ev.select(col("event_id"), col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("tts"),
        col("event_type"))
      val windows = evTs.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("owner"))
        .agg(
          timestamp_micros(min(expr("unix_micros(tts)")) - 1800000000L)
            .as("lo"),
          timestamp_micros(min(expr("unix_micros(tts)")) + 1800000000L)
            .as("hi"))
      val points = evTs.select(col("event_id").as("p_id"),
        col("user_id").as("p_user"), col("tts"))
      points.join(windows,
          col("tts") >= col("lo") && col("tts") <= col("hi"))
        .groupBy("owner")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("p_user")).as("n_users"))
    },
    oracle = Some(
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
        |         event_type
        |  FROM events),
        |w AS (
        |  SELECT user_id AS owner,
        |    min(us) - 1800000000 AS lo, min(us) + 1800000000 AS hi
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT w.owner, count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM w JOIN e ON e.us BETWEEN w.lo AND w.hi
        |GROUP BY 1
        |""".stripMargin))

  // ---- cross-source overlap matrix (minhash union-signature) ---------------

  /** Estimated Jaccard overlap between every pair of corpus sources from
    * per-source union minhash signatures: a source's signature component h
    * is the min over ALL its docs' shingles — computed as min-of-per-doc-
    * mins, so the whole matrix costs one shingle scan plus a groupBy on
    * the (bounded-cardinality) source column; the pairwise comparison runs
    * on the sources×8 signature table, which is driver-trivial at any
    * corpus size. The standard "which crawls duplicate each other"
    * data-card diagnostic. */
  private val sourceOverlap: Q = Q(
    fn = (s, dir) => {
      val sigCols = (0 until 8).map { h =>
        expr(s"array_min(transform(sh, s -> md5('$h|' || s)))").as(s"m_$h")
      }
      val perDoc = docs(s, dir)
        .select(col("source"), split(col("text"), " ").as("toks"))
        .select(col("source"), TextOps.shinglesOf("toks").as("sh"))
        .select(col("source") +: sigCols: _*)
      val perSrc = perDoc.groupBy("source")
        .agg(min("m_0").as("m_0"), (1 until 8).map(h =>
          min(s"m_$h").as(s"m_$h")): _*)
      val a = perSrc.select(perSrc.columns.toIndexedSeq.map(c => col(c).as(s"a_$c")): _*)
      val b = perSrc.select(perSrc.columns.toIndexedSeq.map(c => col(c).as(s"b_$c")): _*)
      a.join(b, col("a_source") < col("b_source"))
        .select(col("a_source").as("src_a"), col("b_source").as("src_b"),
          round((0 until 8).map(h =>
            when(col(s"a_m_$h") === col(s"b_m_$h"), 1).otherwise(0))
            .reduce(_ + _) / lit(8.0), 6).as("est_jaccard"))
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT source, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT source, CASE WHEN len(toks) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |       i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |  ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
        |sig AS (SELECT source,
        |  list_min(list_transform(sh, x -> md5('0|' || x))) AS m_0,
        |  list_min(list_transform(sh, x -> md5('1|' || x))) AS m_1,
        |  list_min(list_transform(sh, x -> md5('2|' || x))) AS m_2,
        |  list_min(list_transform(sh, x -> md5('3|' || x))) AS m_3,
        |  list_min(list_transform(sh, x -> md5('4|' || x))) AS m_4,
        |  list_min(list_transform(sh, x -> md5('5|' || x))) AS m_5,
        |  list_min(list_transform(sh, x -> md5('6|' || x))) AS m_6,
        |  list_min(list_transform(sh, x -> md5('7|' || x))) AS m_7
        |  FROM s),
        |ps AS (SELECT source, min(m_0) AS m_0, min(m_1) AS m_1,
        |  min(m_2) AS m_2, min(m_3) AS m_3, min(m_4) AS m_4,
        |  min(m_5) AS m_5, min(m_6) AS m_6, min(m_7) AS m_7
        |  FROM sig GROUP BY source)
        |SELECT a.source AS src_a, b.source AS src_b, round((
        |    (CASE WHEN a.m_0 = b.m_0 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.m_1 = b.m_1 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.m_2 = b.m_2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.m_3 = b.m_3 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.m_4 = b.m_4 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.m_5 = b.m_5 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.m_6 = b.m_6 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.m_7 = b.m_7 THEN 1 ELSE 0 END)) / 8.0, 6)
        |  AS est_jaccard
        |FROM ps a JOIN ps b ON a.source < b.source
        |""".stripMargin))

  // ---- deterministic weighted sample (A-ES top-k per source) ---------------

  /** Weighted sample without replacement, 5 docs per source, weight =
    * n_chars (longer docs proportionally likelier) — Efraimidis–Spirakis
    * key u^(1/w) with u derived from md5(doc_id), so the draw is
    * reproducible and the oracle re-derives the SAME sample from the same
    * hash arithmetic. Bounded TopKAgg, no per-group window sort. */
  private val weightedSampleQ: Q = Q(
    fn = (s, dir) =>
      TemporalJoin.weightedSample(docs(s, dir), col("source"),
          col("doc_id"), col("n_chars"), k = 5)
        .select(col("grp").as("source"), col("rank"),
          col("id").as("doc_id"), col("aes_key")),
    oracle = Some(
      """WITH keyed AS (
        |  SELECT source, doc_id,
        |    CASE WHEN n_chars > 0 THEN
        |      pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
        |          / 4294967296.0, 1.0 / n_chars)
        |    ELSE 0.0 END AS k
        |  FROM documents),
        |ranked AS (
        |  SELECT source, doc_id, k, row_number() OVER (
        |    PARTITION BY source ORDER BY k DESC, doc_id ASC) AS rank
        |  FROM keyed)
        |SELECT source, rank::INT AS rank, doc_id, round(k, 6) AS aes_key
        |FROM ranked WHERE rank <= 5
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_asof_join"       -> asofJoin,
    "q_stream_asof"     -> streamAsof,
    "q_olap_cube"       -> olapCube,
    "q_range_join"      -> rangeJoinQ,
    "q_range_join_ts"   -> rangeJoinTsQ,
    "q_source_overlap"  -> sourceOverlap,
    "q_weighted_sample" -> weightedSampleQ,
  )
}
