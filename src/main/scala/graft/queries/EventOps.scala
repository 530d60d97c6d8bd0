package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream operators over the `events` table, expressed with the same
  * window primitives Structured Streaming uses (`window`, `session_window`)
  * so the batch results here are exactly what the streaming queries in
  * graft.streaming produce (see EventStreamingSpec for the readStream
  * equivalence test).
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour windows per event type: count + exact cents sum. */
  private val tumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      // timestamp_ntz: every other timestamp in the dataset is NTZ and so
      // are DuckDB results — keep the output schema uniform (values are
      // identical under the UTC session zone).
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), col("value_cents"))

  /** Session windows (30-minute gap) per user via session_window; output
    * min/max/count (gap-closure end is engine-specific, min/max are not).
    */
  private val sessions: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"), col("n"))

  /** JSON property extraction + sliding 2h/1h windows. */
  private val enriched: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), col("k_sum"))

  val queries: Map[String, Q] = Map(
    "ev_tumbling" -> tumbling,
    "ev_sessions" -> sessions,
    "ev_enriched" -> enriched,
  )

  val oracle: Map[String, String] = Map(
    "ev_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ev_sessions" ->
      """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR CAST(ts AS TIMESTAMP) - CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS TIMESTAMP)
        |            >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM x)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM s GROUP BY user_id, sess""".stripMargin,
    "ev_enriched" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
        |w AS (SELECT ts, event_type, k,
        |    time_bucket(INTERVAL '1 hour', ts) AS h FROM e),
        |x AS (SELECT h AS w_start, event_type, k FROM w
        |      UNION ALL
        |      SELECT h - INTERVAL '1 hour' AS w_start, event_type, k FROM w)
        |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS k_sum
        |FROM x GROUP BY 1, 2""".stripMargin,
  )
}
