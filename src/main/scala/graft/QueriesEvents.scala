package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the batch equivalents
  * of the Structured Streaming operators (tumbling windows, sessionization,
  * semi-structured extraction). */
object QueriesEvents {

  // ---- tumbling event-time window aggregation ------------------------------

  private val tumbling: Q = Q(
    fn = (s, dir) =>
      Tables.load(s, dir, "events")
        // ts arrives as LONG nanos (Tables.load); truncate to the hour with
        // integer math, render in session-UTC for engine-neutral compare
        .groupBy(
          date_format(timestamp_millis(
            expr("(ts div 3600000000000) * 3600000")),
            "yyyy-MM-dd HH:mm").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value")),
    oracle = Some(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2
        |""".stripMargin))

  // ---- sessionization (30-min inactivity gap) ------------------------------

  private val sessionize: Q = Q(
    fn = (s, dir) => {
      // an event with no timestamp has no place on a timeline (and the
      // engines order nulls differently: Spark ASC nulls-first, DuckDB
      // nulls-last — fuzz gate, nulls mode)
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000").as("ms"))
        .filter(col("ms").isNotNull)
        .withColumn("prev_ms", lag("ms", 1).over(
          Window.partitionBy("user_id").orderBy(col("ms").asc,
            col("event_id").asc)))
        .withColumn("new_session",
          when(col("prev_ms").isNull ||
            col("ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"),
          count(lit(1)).as("n_events"))
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS prev_ms
        |  FROM events WHERE ts IS NOT NULL)
        |SELECT user_id,
        |  sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |      THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
        |  count(*) AS n_events
        |FROM t GROUP BY user_id
        |""".stripMargin))

  // ---- semi-structured JSON-ish extraction ---------------------------------

  private val propsExtract: Q = Q(
    fn = (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("""try_cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS long)""")
            .as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k")),
    oracle = Some(
      """WITH t AS (
        |  SELECT event_type,
        |    TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(k) AS n_k, sum(k)::BIGINT AS sum_k
        |FROM t GROUP BY event_type
        |""".stripMargin))

  val all: Map[String, Q] = Map(
    "q_events_window" -> tumbling,
    "q_sessionize"    -> sessionize,
    "q_props_extract" -> propsExtract,
  )
}
