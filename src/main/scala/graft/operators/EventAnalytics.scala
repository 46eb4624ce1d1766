package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** Event-stream analytics: sessionization, funnels, cohort retention,
  * SCD type-2 version intervals. These are the batch forms of the
  * stream-processing patterns a KSQL user builds over event topics
  * (cf. reference README's clickstream/session examples); the batch
  * form is driver-oracle-checked, the streaming forms live in
  * graft.streaming (session_window, transformWithState).
  *
  * Scale posture: every query is one window-function pass or one
  * partial→final aggregation over the events fact — no self-joins, no
  * collects. The sessionize/scd2 sorts are per-user-key within shuffle
  * partitions (Spark's window exec sorts per partition after hash
  * exchange on the partition key), so they scale with executor count.
  */
object EventAnalytics {

  private val SessionGapMs = 1800000L // 30 min

  /** MATCH_RECOGNIZE-style variable-length pattern `view click* purchase`
    * over each user's (ts, event_id)-ordered stream — see the
    * q_event_pattern entry for the segment-leader construction. */
  def sequencePattern(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val e = events
      .withColumn("rn", row_number().over(w))
      .withColumn("nc", sum(when(col("event_type") =!= "click", 1L)
        .otherwise(0L)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // leaders renames every carried column: e and leaders share a
    // lineage, and Spark's self-join ambiguity check rejects a bare
    // user_id on both sides
    val leaders = e.filter(col("event_type") =!= "click")
      .select(col("user_id").as("luser"), col("nc").as("lnc"),
        col("event_type").as("lead_type"),
        col("event_id").as("start_event_id"),
        unix_millis(col("ts")).as("start_ms"), col("rn").as("lead_rn"))
    e.filter(col("event_type") === "purchase")
      .join(leaders,
        col("luser") === col("user_id") && col("lnc") === col("nc") - 1)
      .filter(col("lead_type") === "view")
      .select(col("user_id"), col("start_event_id"),
        col("event_id").as("end_event_id"),
        (col("rn") - col("lead_rn") - 1).cast("int").as("n_clicks"),
        (unix_millis(col("ts")) - col("start_ms")).as("span_ms"))
  }

  /** Per-ms decay constant for a 1-hour half-life; embedded VERBATIM in
    * both engines' expressions so the weight math starts from identical
    * doubles. */
  private val decayLambda: Double = math.log(2) / 3600000.0

  def entries: Map[String, Q] = Map(
    // time-decayed value sum (exponential decay, 1-hour half-life):
    // each user's events weighted by exp(-λ·(t_last − t_j)) and summed
    // at the user's LAST event time — the recency-weighted engagement
    // score behind feature stores and trending rankers. Closed form is
    // ORDER-FREE (a window max anchors t_last, then one map-side
    // partial-aggregated sum — no sequential scan, no per-row state);
    // the exp argument is bounded by the per-user time span, so no
    // overflow normalization. The streaming recurrence
    // s ← s·exp(-λΔt) + x in StreamingPatterns.decayedSum folds to the
    // same value (parity spec'd).
    "q_decayed_sum" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
        Tables.events(s, d)
          .select(col("user_id"), unix_millis(col("ts")).as("tms"), col("value"))
          .withColumn("t_last", max(col("tms")).over(w))
          .groupBy(col("user_id"), col("t_last"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value") *
              exp(lit(-decayLambda) * (col("t_last") - col("tms")))), 4)
              .as("decayed"))
      },
      s"""WITH e AS (
         |  SELECT user_id, epoch_ms(ts) AS tms, value FROM events
         |), m AS (
         |  SELECT user_id, tms, value,
         |    max(tms) OVER (PARTITION BY user_id) AS t_last
         |  FROM e
         |)
         |SELECT user_id, t_last, CAST(count(*) AS BIGINT) AS n_events,
         |  round(sum(value * exp(-(${java.lang.Double.toString(decayLambda)})
         |    * (t_last - tms))), 4) AS decayed
         |FROM m GROUP BY 1, 2""".stripMargin),
    // event-type transition matrix (first-order Markov counts): per-user
    // event order is the (ts, event_id) total order, so lead() is
    // deterministic on any partitioning; ONE window pass shuffled by
    // user_id, then a plain partial→final count per (from, to) pair
    "q_event_transitions" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
      },
      """SELECT from_type, to_type, count(*) AS n
        |FROM (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events
        |)
        |WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type""".stripMargin),

    // gaps-and-islands sessionization: a new session starts when the
    // per-user gap exceeds 30 min; session_seq = running count of
    // session starts. One window pass, no join.
    "q_sessionize" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("new_sess",
            when(col("ms") - lag(col("ms"), 1).over(w) > SessionGapMs
              || lag(col("ms"), 1).over(w).isNull, 1L).otherwise(0L))
          .select(col("event_id"), col("user_id"),
            sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).as("session_seq"))
      },
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |           OR lag(epoch_ms(ts)) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_id, user_id,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM g""".stripMargin),

    // last-touch attribution: each purchase credits the most recent
    // preceding view/click by the same user within a 7-day lookback —
    // the conversion-credit model every marketing warehouse runs. ONE
    // window pass per user ((ts, event_id) total order): the carrier is
    // last_value(... IGNORE NULLS) over rows-preceding, where the
    // touch's type and time are two aligned IGNORE-NULLS columns (both
    // null on exactly the same rows, so they come from the same touch
    // row without a struct). Credited revenue then rolls up per channel
    // in a plain partial→final aggregate. Integer epoch-millis keep the
    // lookback comparison exact in both engines.
    "q_attribution" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val isTouch = col("event_type").isin("view", "click")
        Tables.events(s, d)
          .withColumn("touch_type",
            last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
          .withColumn("touch_ms",
            last(when(isTouch, unix_millis(col("ts"))), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("value"),
            when(col("touch_ms") >= unix_millis(col("ts")) - lit(7L * 86400000L),
              col("touch_type")).otherwise(lit("direct")).as("channel"))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            round(sum(col("value")), 4).as("credited_value"))
      },
      """WITH t AS (
        |  SELECT event_id, event_type, value, epoch_ms(ts) AS ms,
        |    last_value(CASE WHEN event_type IN ('view','click')
        |        THEN event_type END IGNORE NULLS)
        |      OVER w AS touch_type,
        |    last_value(CASE WHEN event_type IN ('view','click')
        |        THEN epoch_ms(ts) END IGNORE NULLS)
        |      OVER w AS touch_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT CASE WHEN touch_ms >= ms - 604800000 THEN touch_type
        |            ELSE 'direct' END AS channel,
        |  count(*) AS n_purchases,
        |  round(sum(value), 4) AS credited_value
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin),

    // ordered funnel view→click→purchase: stage times collapse to one
    // min-aggregate per user (partial→final, no window), then one
    // global conditional count. Integer epoch-millis comparisons keep
    // both engines exact.
    "q_funnel" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", unix_millis(col("ts")))).as("t_view"),
          min(when(col("event_type") === "click", unix_millis(col("ts")))).as("t_click"),
          min(when(col("event_type") === "purchase", unix_millis(col("ts")))).as("t_purchase"))
        .agg(
          count(when(col("t_view").isNotNull, 1)).as("n_view"),
          count(when(col("t_view").isNotNull && col("t_click") > col("t_view"), 1))
            .as("n_view_click"),
          count(when(col("t_view").isNotNull && col("t_click") > col("t_view")
            && col("t_purchase") > col("t_click"), 1)).as("n_full_funnel")),
      """WITH m AS (
        |  SELECT user_id,
        |    min(epoch_ms(ts)) FILTER (event_type = 'view') AS t_view,
        |    min(epoch_ms(ts)) FILTER (event_type = 'click') AS t_click,
        |    min(epoch_ms(ts)) FILTER (event_type = 'purchase') AS t_purchase
        |  FROM events GROUP BY user_id
        |)
        |SELECT
        |  CAST(count(*) FILTER (t_view IS NOT NULL) AS BIGINT) AS n_view,
        |  CAST(count(*) FILTER (t_view IS NOT NULL AND t_click > t_view)
        |    AS BIGINT) AS n_view_click,
        |  CAST(count(*) FILTER (t_view IS NOT NULL AND t_click > t_view
        |    AND t_purchase > t_click) AS BIGINT) AS n_full_funnel
        |FROM m""".stripMargin),

    // variable-length sequence pattern (MATCH_RECOGNIZE-style
    // `view click* purchase`, adjacent events per user): the
    // segment-leader trick makes the unbounded B* matchable with ONE
    // window pass + one equi-join — nc = running count of non-click
    // events, so a purchase's nearest preceding non-click event is the
    // leader at nc − 1, and everything between them is click BY
    // CONSTRUCTION; the match test collapses to leader.type = 'view'.
    // No per-row regex state machine, no self-join explosion: the join
    // is keyed (user_id, nc) — shuffle equi-join, linear at any scale.
    // Overlaps are impossible for this pattern (a match's interior is
    // all clicks), so AFTER MATCH SKIP PAST LAST ROW is free.
    "q_event_pattern" -> Q(
      (s, d) => sequencePattern(Tables.events(s, d)),
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    row_number() OVER w AS rn,
        |    sum(CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS nc
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), l AS (
        |  SELECT user_id, nc, event_type AS lead_type,
        |    event_id AS start_event_id, epoch_ms(ts) AS start_ms, rn AS lead_rn
        |  FROM e WHERE event_type <> 'click'
        |)
        |SELECT e.user_id, l.start_event_id, e.event_id AS end_event_id,
        |  CAST(e.rn - l.lead_rn - 1 AS INT) AS n_clicks,
        |  CAST(epoch_ms(e.ts) - l.start_ms AS BIGINT) AS span_ms
        |FROM e JOIN l ON l.user_id = e.user_id AND l.nc = e.nc - 1
        |WHERE e.event_type = 'purchase' AND l.lead_type = 'view'""".stripMargin),

    // cohort retention: cohort = first active UTC day per user; count
    // distinct users per (cohort_day, day_offset). Day numbers are
    // integer epoch-millis div — engine-independent. The users-per-day
    // frame joins back on user_id only (bigint key), never on text.
    "q_retention" -> Q(
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"), (unix_millis(col("ts")) / 86400000L)
            .cast("long").as("day")).distinct()
        val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        days.join(cohort, "user_id")
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
          .agg(count_distinct(col("user_id")).as("users"))
      },
      """WITH d AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events
        |), c AS (
        |  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
        |)
        |SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
        |  CAST(d.day - c.cohort_day AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT d.user_id) AS BIGINT) AS users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin),

    // SCD type-2 build: each order is a version row of its customer's
    // history — valid_from = its date, valid_to = the next version's
    // date (NULL ⇒ current). One lead() pass per customer partition.
    "q_scd2" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("valid_from_ms"),
          unix_millis(lead(col("o_orderdate"), 1).over(w).cast("timestamp"))
            .as("valid_to_ms"),
          lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"))
      },
      """SELECT o_custkey, o_orderkey,
        |  epoch_ms(o_orderdate) AS valid_from_ms,
        |  epoch_ms(lead(o_orderdate) OVER w) AS valid_to_ms,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""
        .stripMargin),

    // table upsert (stream/table duality): apply a keyed changelog batch
    // to a snapshot — delta rows win per key, snapshot rows survive
    // untouched keys. The KSQL TABLE materialization step as a batch op:
    // two partial→final latest-by-offset aggs + one full-outer merge on
    // the key (both sides shuffle once on user_id; at scale snapshot and
    // delta co-partition, so the merge is local).
    "q_table_upsert" -> Q(
      (s, d) => {
        val latest = (df: org.apache.spark.sql.DataFrame) => df
          .groupBy(col("user_id"))
          .agg(max_by(col("value"), col("event_id")).as("value"),
            max(col("event_id")).as("last_event_id"))
        val ev = Tables.events(s, d)
        val snap = latest(ev.filter(col("event_id") < 5000))
          .withColumnsRenamed(Map("value" -> "sv", "last_event_id" -> "se"))
        val delta = latest(ev.filter(col("event_id") >= 5000))
          .withColumnsRenamed(Map("value" -> "dv", "last_event_id" -> "de"))
        snap.join(delta, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("dv"), col("sv")).as("value"),
            coalesce(col("de"), col("se")).as("last_event_id"))
      },
      """WITH s AS (
        |  SELECT user_id, max_by(value, event_id) AS sv,
        |    max(event_id) AS se
        |  FROM events WHERE event_id < 5000 GROUP BY user_id
        |), d AS (
        |  SELECT user_id, max_by(value, event_id) AS dv,
        |    max(event_id) AS de
        |  FROM events WHERE event_id >= 5000 GROUP BY user_id
        |)
        |SELECT COALESCE(s.user_id, d.user_id) AS user_id,
        |  COALESCE(d.dv, s.sv) AS value,
        |  COALESCE(d.de, s.se) AS last_event_id
        |FROM s FULL JOIN d ON s.user_id = d.user_id""".stripMargin),

    // CDC snapshot diff: given two keyed snapshots (event windows),
    // emit the changelog between them — insert / update / delete per
    // key. One full-outer merge on the key; at scale both snapshots
    // co-partition on user_id so the diff is shuffle-local. This is the
    // inverse of q_table_upsert (table → changelog; upsert applies
    // changelog → table).
    "q_cdc_diff" -> Q(
      (s, d) => {
        val latest = (lo: Long, hi: Long) => Tables.events(s, d)
          .filter(col("event_id") >= lo && col("event_id") < hi)
          .groupBy(col("user_id"))
          .agg(max_by(col("value"), col("event_id")).as("v"))
        val v1 = latest(0L, 300L).withColumnRenamed("v", "old_value")
        val v2 = latest(150L, 450L).withColumnRenamed("v", "new_value")
        v1.join(v2, Seq("user_id"), "full_outer")
          .withColumn("op",
            when(col("old_value").isNull, "I")
              .when(col("new_value").isNull, "D")
              .when(col("old_value") =!= col("new_value"), "U")
              .otherwise("N"))
          .filter(col("op") =!= "N")
          .select(col("user_id"), col("op"), col("old_value"), col("new_value"))
      },
      """WITH v1 AS (
        |  SELECT user_id, max_by(value, event_id) AS old_value
        |  FROM events WHERE event_id >= 0 AND event_id < 300 GROUP BY user_id
        |), v2 AS (
        |  SELECT user_id, max_by(value, event_id) AS new_value
        |  FROM events WHERE event_id >= 150 AND event_id < 450 GROUP BY user_id
        |), j AS (
        |  SELECT COALESCE(v1.user_id, v2.user_id) AS user_id,
        |    old_value, new_value,
        |    CASE WHEN old_value IS NULL THEN 'I'
        |         WHEN new_value IS NULL THEN 'D'
        |         WHEN old_value <> new_value THEN 'U'
        |         ELSE 'N' END AS op
        |  FROM v1 FULL JOIN v2 ON v1.user_id = v2.user_id
        |)
        |SELECT user_id, op, old_value, new_value FROM j WHERE op <> 'N'"""
        .stripMargin),

    // per-user modal event type (KSQL-style "most frequent value"):
    // count per (user, type) partial-aggregates map-side, then ONE
    // row_number window picks the argmax with a deterministic
    // lexicographic tiebreak — mode() builtins differ between engines
    // on ties, the explicit rank does not.
    "q_mode" -> Q(
      (s, d) => {
        val cnt = Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("cnt").desc, col("event_type").asc)
        cnt.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("mode_type"), col("cnt"))
      },
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
        |  FROM c
        |)
        |SELECT user_id, event_type AS mode_type, cnt FROM r WHERE rn = 1"""
        .stripMargin),

    // per-group z-score normalization (feature scaling): one stats agg
    // broadcast back onto the stream of rows — two scans fused by the
    // join, no window sort. Rounded to 4 decimals for engine parity.
    // sigma is guarded: a constant-valued group has stddev_samp = 0 and
    // under Spark 4's ANSI mode an unguarded division would abort the
    // job (DuckDB would return inf) — both sides emit NULL instead.
    "q_zscore" -> Q(
      (s, d) => {
        val stats = Tables.events(s, d).groupBy(col("event_type"))
          .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
        Tables.events(s, d)
          .join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"),
            when(col("sigma").isNull || col("sigma") === 0, lit(null).cast("double"))
              .otherwise(round((col("value") - col("mu")) / col("sigma"), 4)).as("z"))
      },
      """WITH st AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_id, e.event_type,
        |  CASE WHEN sigma IS NULL OR sigma = 0 THEN NULL
        |       ELSE round((value - mu) / sigma, 4) END AS z
        |FROM events e JOIN st ON e.event_type = st.event_type"""
        .stripMargin),

    // top session paths (round 10): the clickstream "what do users do"
    // query — sessionize (same 30-min-gap construction as
    // q_sessionize), collapse each session to its first-5 event-type
    // path, count path frequencies. ONE user-key window pass feeds ONE
    // (user, session) aggregate; the path is built inside the
    // aggregate (sort_array of (ts, event_id, type) structs → slice →
    // concat) so no second ordering pass exists, and the final count
    // is a plain partial→final over path strings.
    "q_event_paths" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("new_sess",
            when(col("ms") - lag(col("ms"), 1).over(w) > SessionGapMs
              || lag(col("ms"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("session_seq",
            sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy(col("user_id"), col("session_seq"))
          .agg(concat_ws(">", slice(transform(
            sort_array(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), 1, 5)).as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .filter(col("n_sessions") >= 5)
      },
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |           OR lag(epoch_ms(ts)) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), se AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM g
        |), paths AS (
        |  SELECT user_id, session_seq,
        |    array_to_string(
        |      (list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
        |  FROM se GROUP BY user_id, session_seq
        |)
        |SELECT path, count(*) AS n_sessions
        |FROM paths GROUP BY path HAVING count(*) >= 5""".stripMargin),

    // chi-square independence test (event_type × value band): the
    // contingency table is ONE partial→final count aggregate; margins
    // and the statistic fold in a SECOND tiny aggregate over the
    // |types|×|bands| cell table — no window, no broadcast-back, the
    // whole test is two linear passes. The workhorse drift/association
    // test next to q_psi_drift's distribution comparison.
    "q_chi_square" -> Q(
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type"),
            when(col("value") < 25, "lo")
              .when(col("value") < 75, "mid").otherwise("hi").as("band"))
          .groupBy(col("event_type"), col("band"))
          .agg(count(lit(1)).as("obs"))
        val wT = Window.partitionBy(col("event_type"))
        val wB = Window.partitionBy(col("band"))
        // margins via two bounded windows over the CELL table (cells =
        // |types|·|bands| rows, corpus-size-independent)
        cells
          .withColumn("row_tot", sum(col("obs")).over(wT))
          .withColumn("col_tot", sum(col("obs")).over(wB))
          .crossJoin(broadcast(cells.agg(sum(col("obs")).as("n"))))
          .withColumn("exp", col("row_tot") * col("col_tot") / col("n"))
          .agg(
            round(sum((col("obs") - col("exp")) * (col("obs") - col("exp"))
              / col("exp")), 6).as("chi2"),
            ((countDistinct(col("event_type")) - 1) *
              (countDistinct(col("band")) - 1)).as("dof"),
            max(col("n")).cast("long").as("n"))
      },
      """WITH cells AS (
        |  SELECT event_type,
        |    CASE WHEN value < 25 THEN 'lo'
        |         WHEN value < 75 THEN 'mid' ELSE 'hi' END AS band,
        |    count(*) AS obs
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT *,
        |    sum(obs) OVER (PARTITION BY event_type) AS row_tot,
        |    sum(obs) OVER (PARTITION BY band) AS col_tot,
        |    (SELECT sum(obs) FROM cells) AS n
        |  FROM cells
        |)
        |SELECT
        |  round(sum((obs - row_tot * col_tot / n)
        |    * (obs - row_tot * col_tot / n) / (row_tot * col_tot / n)), 6)
        |    AS chi2,
        |  (count(DISTINCT event_type) - 1) * (count(DISTINCT band) - 1) AS dof,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM m""".stripMargin),

    // two-sample Kolmogorov-Smirnov statistic (click vs view value
    // distributions): per-VALUE conditional counts collapse the corpus
    // to the value grid (one partial→final aggregate), then the ECDF
    // difference is a running sum over that BOUNDED grid — the same
    // constant-frame window class as q_pack_sequences' bucket totals
    // (allowlisted in the global plan guard; at 100 TB continuous
    // values get quantile-bucketed to a fixed grid first, exactly like
    // q_psi_drift's deciles, so the frame stays corpus-independent).
    "q_ks_test" -> Q(
      (s, d) => {
        val per = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .groupBy(col("value"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("b"))
        val w = Window.orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        per
          .withColumn("ca", sum(col("a")).over(w))
          .withColumn("cb", sum(col("b")).over(w))
          .crossJoin(broadcast(per.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))))
          .agg(round(max(abs(col("ca") / col("na") - col("cb") / col("nb"))), 6)
            .as("ks_d"),
            max(col("na")).cast("long").as("n_click"),
            max(col("nb")).cast("long").as("n_view"))
      },
      """WITH per AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY value
        |), c AS (
        |  SELECT value,
        |    sum(a) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS ca,
        |    sum(b) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cb,
        |    (SELECT sum(a) FROM per) AS na,
        |    (SELECT sum(b) FROM per) AS nb
        |  FROM per
        |)
        |SELECT round(max(abs(ca / na - cb / nb)), 6) AS ks_d,
        |  CAST(max(na) AS BIGINT) AS n_click,
        |  CAST(max(nb) AS BIGINT) AS n_view
        |FROM c""".stripMargin),

    // theta-sketch audience overlap: |purchasers|, |clickers|, and the
    // intersection/difference/union estimates — all from two KB-sized
    // per-partition-built sketches (see functions.ThetaSketches). HLL
    // can't intersect; an exact distinct-join at 100 TB shuffles both
    // user sets. Engine-specific estimates → rows-only driver check;
    // the spec bounds every estimate against exact set ops.
    "q_theta_overlap" -> Q(
      (s, d) => {
        import graft.functions.ThetaSketches
        val ev = Tables.events(s, d)
        val a = ThetaSketches.sketchOf(
          ev.filter(col("event_type") === "purchase"), "user_id")
        val b = ThetaSketches.sketchOf(
          ev.filter(col("event_type") === "click"), "user_id")
        import s.implicits._
        Seq(
          ("purchase", a.getEstimate.round),
          ("click", b.getEstimate.round),
          ("both", ThetaSketches.intersection(a, b).getEstimate.round),
          ("purchase_only", ThetaSketches.aNotB(a, b).getEstimate.round),
          ("either", ThetaSketches.union(a, b).getEstimate.round)
        ).toDF("audience", "users_est")
      },
      None),

    // KLL quantile-sketch roll-up: per-priority deciles of order value
    // from per-(partition, group) KB-sized sketches merged on the
    // driver (see functions.KllSketches) — the mergeable alternative to
    // a percentile sort at 100 TB, with a proven ~1.65% rank-error
    // bound. Engine-specific estimates → rows-only driver check; the
    // spec bounds every estimate's TRUE rank against the asked rank.
    "q_kll_quantiles" -> Q(
      (s, d) => {
        import graft.functions.KllSketches
        import s.implicits._
        val sks = KllSketches.sketchesByGroup(
          Tables.orders(s, d), "o_orderpriority", "o_totalprice")
        val rows = for {
          (g, sk) <- sks.toSeq.sortBy(_._1)
          q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)
        } yield (g, q, math.round(sk.getQuantile(q) * 100) / 100.0)
        rows.toDF("o_orderpriority", "q", "est")
      },
      None)
  )
}
