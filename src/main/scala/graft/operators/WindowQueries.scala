package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** KSQL windowed aggregation (SURVEY.md §2.4) in batch-verifiable form.
  *
  * The same `window()` / `session_window()` expressions power the streaming
  * path (graft.streaming) with watermarks; here they run over the parquet
  * `events` table so the driver's DuckDB oracle can hash-compare. Window
  * bounds are emitted as epoch-millis BIGINTs — engine-neutral, no
  * timestamp-encoding skew in the compare.
  *
  * Scale: window assignment is a per-row projection (no shuffle); the only
  * shuffle is the groupBy on (window, key) — map-side partial agg applies.
  * Hopping windows fan out rows size/slide× before the shuffle, exactly like
  * KSQL/Flink's pane replication.
  */
object WindowQueries {

  def entries: Map[String, Q] = Map(
    // WINDOW TUMBLING (SIZE 1 HOUR)
    "q_window_tumbling" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(
          unix_millis(col("window.start")).as("ws"),
          unix_millis(col("window.end")).as("we"),
          col("event_type"), col("cnt"), col("sum_value")),
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS ws,
        |  (epoch_ms(ts) // 3600000) * 3600000 + 3600000 AS we,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin),

    // OHLC bars per (hour, type): open/close via min_by/max_by on a
    // (ts, event_id) struct — the event_id tie-break makes same-ts
    // opens deterministic on any partitioning — ONE hash aggregate
    // (map-side partial), never a per-window sort
    "q_window_ohlc" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("o"),
          max(col("value")).as("h"), min(col("value")).as("l"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("c"),
          count(lit(1)).as("n_trades"))
        .select(unix_millis(col("window.start")).as("ws"), col("event_type"),
          round(col("o"), 2).as("open"), round(col("h"), 2).as("high"),
          round(col("l"), 2).as("low"), round(col("c"), 2).as("close"),
          col("n_trades")),
      """WITH e AS (
        |  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS ws, event_type, value,
        |    row_number() OVER (
        |      PARTITION BY (epoch_ms(ts) // 3600000), event_type
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (
        |      PARTITION BY (epoch_ms(ts) // 3600000), event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events
        |)
        |SELECT ws, event_type,
        |  round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
        |  round(max(value), 2) AS high, round(min(value), 2) AS low,
        |  round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
        |  count(*) AS n_trades
        |FROM e GROUP BY ws, event_type""".stripMargin),

    // windowed LATEST_BY_OFFSET: the per-window TABLE materialization —
    // latest value per (user, hour window) by offset, ONE max_by hash
    // agg (map-side partial), no window sort of the events
    "q_window_latest" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(max_by(col("value"), col("event_id")).as("latest_value"),
          max(col("event_id")).as("last_offset"))
        .select(unix_millis(col("window.start")).as("ws"), col("user_id"),
          round(col("latest_value"), 2).as("latest_value"),
          col("last_offset")),
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS ws, user_id,
        |  round(max_by(value, event_id), 2) AS latest_value,
        |  max(event_id) AS last_offset
        |FROM events GROUP BY 1, 2""".stripMargin),

    // windowed distinct cardinality: unique users per (hour, event_type)
    "q_window_distinct" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count_distinct(col("user_id")).as("n_users"),
          count(lit(1)).as("cnt"))
        .select(unix_millis(col("window.start")).as("ws"),
          col("event_type"), col("n_users"), col("cnt")),
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS ws,
        |  event_type, count(DISTINCT user_id) AS n_users, count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin),

    // WINDOW HOPPING (SIZE 1 HOUR, ADVANCE BY 30 MINUTES) — each row lands
    // in size/slide = 2 windows.
    "q_window_hopping" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(
          unix_millis(col("window.start")).as("ws"),
          col("event_type"), col("cnt"), col("sum_value")),
      """WITH hops AS (
        |  SELECT (epoch_ms(ts) // 1800000) * 1800000 - i * 1800000 AS ws,
        |         event_type, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
        |)
        |SELECT ws, event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM hops GROUP BY 1, 2""".stripMargin),

    // WINDOW SESSION (6 HOURS gap) per user — Spark-native session_window;
    // oracle is the classic gaps-and-islands formulation. A new session
    // starts when the gap since the previous event is >= the 6h gap
    // (session windows are half-open [start, last+gap)).
    "q_window_session" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(
          unix_millis(col("session_window.start")).as("session_start"),
          unix_millis(col("session_window.end")).as("session_end"),
          col("user_id"), col("cnt"), col("sum_value")),
      """WITH o AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 21600000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), g AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT min(epoch_ms(ts)) AS session_start,
        |  max(epoch_ms(ts)) + 21600000 AS session_end,
        |  user_id, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin)
  )
}
