package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round

/** Incremental view maintenance — the KSQL TABLE semantic (a persistent
  * query's output is an incrementally-maintained materialization, never a
  * recompute) expressed as batch ops over an explicit state artifact.
  *
  * This is THE 100 TB pattern the whole reference exists for: a KSQL
  * `CREATE TABLE AS SELECT … GROUP BY` never rescans its topic — it folds
  * each new record into per-key state. At batch scale the same algebra
  * applies: a nightly pipeline that maintains `V = agg(base)` must answer
  * `agg(base ∪ Δ)` touching only `|state| + |Δ|` rows, not `|base|`.
  * Each query below demonstrates one class of that algebra, and each
  * oracle is the FULL recompute — so the gate proves the incremental
  * answer is indistinguishable from the rescan:
  *
  *   - `q_incr_agg` — distributive/algebraic aggregates (count, sum, max,
  *     avg) via mergeable partial state. State stores EXACT integer
  *     cents (a double partial re-summed in a different order drifts in
  *     the last ulp; an incremental state must be lossless, so money
  *     lives as BIGINT cents and converts to decimal only at the edge).
  *   - `q_incr_join` — delta-join maintenance of a materialized join
  *     view: `V' = V ∪ (ΔA ⋈ B)` (dim side broadcast; at 100 TB only the
  *     delta shuffles — the materialized view is append-only).
  *   - `q_incr_topk` — bounded-state maintenance: per-group top-k is
  *     mergeable (`topk(S ∪ Δ) = topk(topk(S) ∪ topk(Δ))`), so the state
  *     holds k rows per group, never the group's history.
  *   - `q_incr_delete` — retraction, the hard case: counts and sums
  *     subtract, but MAX is not retractable — a group whose stored argmax
  *     row was deleted recomputes from surviving base rows, restricted by
  *     a broadcast semi-join to exactly the touched groups (with state
  *     partitioned by key, that scan prunes to the touched partitions;
  *     untouched groups never rescan).
  *
  * The state artifacts are write-once per sf-dir (Bench times them as
  * separate `prepare_*` phases; Verify builds them lazily on first call),
  * mirroring the bucketed-join layout pattern.
  */
object Incremental {

  /** Orders at-or-after this instant are "the delta" — the increment an
    * incremental pipeline run processes. Everything before is "base",
    * folded into the materialized state by the prepare step. */
  private val Cutoff = "2001-01-01"

  /** The events table's delta cutoff (its timeline is 2024-01, disjoint
    * from the orders calendar). */
  private val EventCutoff = "2024-01-25"

  /** Windowed-view cutoff, deliberately MID-window (noon of a daily
    * window): the Jan-25 window holds base rows AND delta rows, so the
    * maintenance step must genuinely merge partials inside one window —
    * a cutoff on the window boundary would make base and delta windows
    * disjoint and the "merge" a mere append. */
  private val WindowCutoff = "2024-01-25 12:00:00"

  /** Exact integer cents: floor(x*100 + 0.5) — the same primitive-IEEE
    * half-up recipe as [[graft.Rounding]], kept as BIGINT so partial
    * states merge exactly (long addition is associative; double is not). */
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * lit(100.0) + lit(0.5)).cast("long")
  private def centsSql(e: String) =
    s"CAST(floor(($e) * 100.0 + 0.5) AS BIGINT)"

  def entries: Map[String, Q] = Map(
    // ───────────────────────────────────────────────────────────────────
    // Mergeable-partial-state aggregate maintenance: the per-custkey
    // order rollup answered from (state ⊎ partial(Δ)) — the orders scan
    // in this plan carries a pushed o_orderdate >= cutoff filter
    // (PlanAuditSpec), so base rows are never read back.
    "q_incr_agg" -> Q(
      (s, d) => {
        Incremental.aggStatePrepare(s, d)
        val state = s.read.parquet(Incremental.aggStateDir(d))
        val delta = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(Cutoff).cast("timestamp"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("o_totalprice"))).as("sum_cents"),
            max(cents(col("o_totalprice"))).as("max_cents"))
        state.unionByName(delta)
          .groupBy(col("o_custkey"))
          .agg(sum(col("cnt")).as("n_orders"),
            sum(col("sum_cents")).as("sc"),
            max(col("max_cents")).as("mc"))
          .select(col("o_custkey"), col("n_orders"),
            (col("sc") / lit(100.0)).as("sum_price"),
            (col("mc") / lit(100.0)).as("max_price"),
            round(col("sc") / lit(100.0) / col("n_orders"), 4)
              .as("avg_price"))
      },
      s"""WITH c AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sc,
        |    max(${centsSql("o_totalprice")}) AS mc
        |  FROM orders GROUP BY 1
        |)
        |SELECT o_custkey, n_orders, sc / 100.0 AS sum_price,
        |  mc / 100.0 AS max_price,
        |  round(sc / 100.0 / n_orders, 4) AS avg_price
        |FROM c""".stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // Delta-join view maintenance: V' = V ∪ (Δorders ⋈ customer). The
    // materialized view is an append-only union branch; only the delta
    // (date-pushed scan) joins, with the dim side broadcast.
    "q_incr_join" -> Q(
      (s, d) => {
        Incremental.joinViewPrepare(s, d)
        val view = s.read.parquet(Incremental.joinViewDir(d))
        val deltaJoined = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(Cutoff).cast("timestamp"))
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_custkey"),
            col("c_mktsegment"), col("o_totalprice"))
        view.unionByName(deltaJoined)
      },
      """SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // Bounded-state top-k maintenance: the state holds ONLY k rows per
    // group (top-k is mergeable), so maintaining a 100 TB leaderboard
    // costs k·|groups| state rows. Delta rows pre-rank group-locally
    // before the merge re-rank — the second window sorts ≤ 2k rows per
    // group, never the history. Ordering is total ((price DESC, orderkey)
    // tie-break), so the row set is deterministic across engines.
    // NOTE on sharding: the demo groups by `o_custkey % 10` purely to
    // keep the gated output small (30 rows). The 10 shards are NOT the
    // parallelism ceiling — WindowGroupLimit prunes to k rows per shard
    // map-side before the exchange — but a production leaderboard state
    // shards by the real group key (o_custkey itself), giving |groups|-way
    // parallelism with the identical merge algebra.
    "q_incr_topk" -> Q(
      (s, d) => {
        Incremental.topkStatePrepare(s, d)
        val k = 3
        val state = s.read.parquet(Incremental.topkStateDir(d))
        val w = Window.partitionBy(col("shard"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val delta = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(Cutoff).cast("timestamp"))
          .select((col("o_custkey") % 10).as("shard"),
            col("o_orderkey"), col("o_totalprice"))
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
          .drop("rk")
        state.unionByName(delta)
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
          .select(col("shard"), col("rk"), col("o_orderkey"),
            col("o_totalprice"))
      },
      """WITH ranked AS (
        |  SELECT o_custkey % 10 AS shard, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey % 10
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        |  FROM orders
        |)
        |SELECT shard, rk, o_orderkey, o_totalprice
        |FROM ranked WHERE rk <= 3""".stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // Incremental SCD TYPE-2 maintenance — the warehouse dimension-load
    // pattern: the versioned state never rewrites history, a delta only
    // (a) CLOSES each touched key's current version (valid_to = the
    // key's first delta timestamp, via a broadcast join of the tiny
    // per-key first-delta frame) and (b) APPENDS the delta's own version
    // chain (one window pass over the DELTA only — the state is never
    // window-sorted again). Time-cutoff deltas make this exact: every
    // delta row for a key orders after all its base rows, so
    // close+append ≡ the full rebuild (the oracle, identical to
    // q_scd2's).
    "q_incr_scd2" -> Q(
      (s, d) => {
        Incremental.scd2StatePrepare(s, d)
        val state = s.read.parquet(Incremental.scd2StateDir(d))
        val delta = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(Cutoff).cast("timestamp"))
        val wD = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val deltaV = delta.select(
          col("o_custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp"))
            .as("valid_from_ms"),
          unix_millis(lead(col("o_orderdate"), 1).over(wD).cast("timestamp"))
            .as("valid_to_ms"),
          lead(col("o_orderdate"), 1).over(wD).isNull.as("is_current"))
        val firstDelta = delta.groupBy(col("o_custkey"))
          .agg(min(unix_millis(col("o_orderdate").cast("timestamp")))
            .as("fd_ms"))
        val patched = state
          .join(broadcast(firstDelta), Seq("o_custkey"), "left")
          .select(col("o_custkey"), col("o_orderkey"), col("valid_from_ms"),
            when(col("is_current") && col("fd_ms").isNotNull, col("fd_ms"))
              .otherwise(col("valid_to_ms")).as("valid_to_ms"),
            (col("is_current") && col("fd_ms").isNull).as("is_current"))
        patched.unionByName(deltaV)
      },
      """SELECT o_custkey, o_orderkey,
        |  epoch_ms(o_orderdate) AS valid_from_ms,
        |  epoch_ms(lead(o_orderdate) OVER w) AS valid_to_ms,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""
        .stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // Incremental EXACT distinct counting: the state is the distinct
    // (group, key) pair set — the information-theoretic minimum for an
    // exact answer (anything smaller is a sketch; the mergeable-HLL
    // roll-up in §2.3 is that trade). Maintenance is one pair-key
    // shuffle over state ∪ distinct(Δ), with the delta pre-deduplicated
    // map-side by the partial aggregate — new pairs extend the state,
    // re-seen pairs collapse into it, and the count never replays base
    // events.
    "q_incr_distinct" -> Q(
      (s, d) => {
        Incremental.distinctStatePrepare(s, d)
        val state = s.read.parquet(Incremental.distinctStateDir(d))
        val delta = Tables.events(s, d)
          .filter(col("ts") >= lit(EventCutoff).cast("timestamp"))
          .select(col("event_type"), col("user_id")).distinct()
        state.unionByName(delta).distinct()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"))
      },
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // Windowed-aggregate view maintenance — the KSQL
    // `CREATE TABLE … WINDOW TUMBLING` semantic: state is one partial
    // (cnt, sum_cents) row per (window, event_type); a delta touches only
    // the windows its own timestamps fall in, and the cutoff-straddling
    // Jan-25 window merges a base partial with a delta partial —
    // exactness rests on BIGINT-cents partials (a double partial
    // re-summed across the split drifts in the last ulp). At 100 TB the
    // maintained view is |windows|·|types| rows; the topic's history is
    // never re-windowed.
    "q_incr_window" -> Q(
      (s, d) => {
        Incremental.windowStatePrepare(s, d)
        val state = s.read.parquet(Incremental.windowStateDir(d))
        val delta = Tables.events(s, d)
          .filter(col("ts") >= lit(WindowCutoff).cast("timestamp"))
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("value"))).as("sum_cents"))
          .select(unix_millis(col("window.start")).as("ws"),
            col("event_type"), col("cnt"), col("sum_cents"))
        state.unionByName(delta)
          .groupBy(col("ws"), col("event_type"))
          .agg(sum(col("cnt")).as("cnt"), sum(col("sum_cents")).as("sc"))
          .select(col("ws"), (col("ws") + lit(86400000L)).as("we"),
            col("event_type"), col("cnt"),
            (col("sc") / lit(100.0)).as("sum_value"))
      },
      s"""SELECT (epoch_ms(ts) // 86400000) * 86400000 AS ws,
        |  (epoch_ms(ts) // 86400000) * 86400000 + 86400000 AS we,
        |  event_type, count(*) AS cnt,
        |  CAST(sum(${centsSql("value")}) AS BIGINT) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // Hopping-window view maintenance — the KSQL `WINDOW HOPPING (SIZE 1
    // HOUR, ADVANCE BY 30 MINUTES)` TABLE: identical algebra to the
    // tumbling case, but each delta event fans out into size/advance = 2
    // overlapping windows BEFORE the merge (the same pane replication
    // KSQL/Flink do). State is one (ws, event_type) partial per pane;
    // the mid-window cutoff makes the [11:30, 12:30) pane hold a base
    // partial AND a delta partial, so the merge is exercised inside one
    // window, not just appended. At 100 TB the replication factor
    // multiplies the DELTA only — history is never re-windowed.
    "q_incr_hopping" -> Q(
      (s, d) => {
        Incremental.hoppingStatePrepare(s, d)
        val state = s.read.parquet(Incremental.hoppingStateDir(d))
        val delta = Tables.events(s, d)
          .filter(col("ts") >= lit(WindowCutoff).cast("timestamp"))
          .groupBy(window(col("ts"), "1 hour", "30 minutes"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("value"))).as("sum_cents"))
          .select(unix_millis(col("window.start")).as("ws"),
            col("event_type"), col("cnt"), col("sum_cents"))
        state.unionByName(delta)
          .groupBy(col("ws"), col("event_type"))
          .agg(sum(col("cnt")).as("cnt"), sum(col("sum_cents")).as("sc"))
          .select(col("ws"), (col("ws") + lit(3600000L)).as("we"),
            col("event_type"), col("cnt"),
            (col("sc") / lit(100.0)).as("sum_value"))
      },
      s"""WITH hops AS (
        |  SELECT (epoch_ms(ts) // 1800000) * 1800000 - i * 1800000 AS ws,
        |         event_type, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
        |)
        |SELECT ws, ws + 3600000 AS we, event_type, count(*) AS cnt,
        |  CAST(sum(${centsSql("value")}) AS BIGINT) / 100.0 AS sum_value
        |FROM hops GROUP BY 1, 2, 3""".stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // SESSION-window view maintenance — the hard window case. The delta
    // here is LATE-ARRIVING data (arrival-keyed `event_id % 13`, NOT a
    // time suffix): a late event can land in the gap BETWEEN two
    // materialized sessions and — if it is within the gap of both —
    // MERGE them, so state repair must touch neighbors. The state stores
    // one interval record per session (first_ms, last_ms, cnt,
    // sum_cents); maintenance sessionizes the delta alone, then runs a
    // gaps-and-islands merge at the SESSION level (sort by first_ms,
    // break when first_ms − running-max(last_ms) ≥ gap) — provably
    // equivalent to re-sessionizing the raw events, because every
    // event-level gap < g is witnessed by interval adjacency. The merge
    // pass is pruned by a broadcast semi-join to users present in the
    // delta: untouched users' sessions stream through with NO window
    // sort, so at 100 TB the repair cost is |touched-user sessions| +
    // |Δ|, never |state|.
    "q_incr_session" -> Q(
      (s, d) => {
        Incremental.sessionStatePrepare(s, d)
        val gapMs = 21600000L // 6 hours, same as q_window_session
        val state = s.read.parquet(Incremental.sessionStateDir(d))
        val delta = Tables.events(s, d)
          .filter(col("event_id") % 13 === 0)
          .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
          .agg(min(unix_millis(col("ts"))).as("first_ms"),
            max(unix_millis(col("ts"))).as("last_ms"),
            count(lit(1)).as("cnt"),
            sum(cents(col("value"))).as("sum_cents"))
          .select(col("user_id"), col("first_ms"), col("last_ms"),
            col("cnt"), col("sum_cents"))
        // Scale note (round-12 verdict): the broadcast semi/anti pair
        // below assumes the DELTA'S DISTINCT-USER SET fits broadcast
        // (tens of MB — millions of user ids), which holds for the
        // late-arrival regime this models: a late batch touches a tiny
        // user fraction. A delta touching MOST users makes repair cost
        // |state| anyway, and the right spelling is to DROP the two
        // broadcast hints — Spark then plans a shuffle semi/anti join on
        // user_id and AQE picks broadcast back when the delta side turns
        // out small. Same algebra, same oracle; only the join strategy
        // hint changes.
        val touched = delta.select(col("user_id")).distinct()
        val stTouched = state
          .join(broadcast(touched), Seq("user_id"), "left_semi")
        val stUntouched = state
          .join(broadcast(touched), Seq("user_id"), "left_anti")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("first_ms"), col("last_ms"))
        val merged = stTouched.unionByName(delta)
          .withColumn("pmax", max(col("last_ms"))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("brk",
            when(col("pmax").isNull ||
              col("first_ms") - col("pmax") > gapMs, 1L).otherwise(0L))
          .withColumn("sid", sum(col("brk"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("first_ms")).as("first_ms"),
            max(col("last_ms")).as("last_ms"),
            sum(col("cnt")).as("cnt"),
            sum(col("sum_cents")).as("sum_cents"))
          .drop("sid")
        stUntouched.unionByName(merged)
          .select(col("first_ms").as("session_start"),
            (col("last_ms") + lit(gapMs)).as("session_end"),
            col("user_id"), col("cnt"),
            (col("sum_cents") / lit(100.0)).as("sum_value"))
      },
      s"""WITH o AS (
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
        |  user_id, count(*) AS cnt,
        |  CAST(sum(${centsSql("value")}) AS BIGINT) / 100.0 AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // Retraction with non-retractable-aggregate repair: a deterministic
    // delete set (l_orderkey ≡ 0 mod 97) retracts from the per-supplier
    // state — counts/sums subtract exactly (BIGINT cents), and ONLY the
    // groups whose stored argmax row was deleted (delete-partial max ==
    // state max) recompute MAX from surviving rows, pruned to those
    // groups by a broadcast left-semi join. Groups retracted to zero
    // rows leave the view. The oracle is the full recompute over the
    // surviving rows — the gate proves subtract+repair ≡ rescan.
    "q_incr_delete" -> Q(
      (s, d) => {
        Incremental.deleteStatePrepare(s, d)
        val li = Tables.lineitem(s, d)
        val state = s.read.parquet(Incremental.deleteStateDir(d))
        val dels = li.filter(col("l_orderkey") % 97 === 0)
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("d_cnt"),
            sum(cents(col("l_extendedprice"))).as("d_sum"),
            max(cents(col("l_extendedprice"))).as("d_max"))
        val merged = state
          .join(dels, Seq("l_suppkey"), "left")
          .withColumn("n_items", col("cnt") - coalesce(col("d_cnt"), lit(0L)))
          .withColumn("sc", col("sum_cents") - coalesce(col("d_sum"), lit(0L)))
        val touched = merged
          .filter(col("d_max") === col("max_cents"))
          .select(col("l_suppkey"))
        val recomputed = li.filter(col("l_orderkey") % 97 =!= 0)
          .join(broadcast(touched), Seq("l_suppkey"), "left_semi")
          .groupBy(col("l_suppkey"))
          .agg(max(cents(col("l_extendedprice"))).as("r_max"))
        merged.filter(col("n_items") > 0)
          .join(recomputed, Seq("l_suppkey"), "left")
          .select(col("l_suppkey"), col("n_items"),
            (col("sc") / lit(100.0)).as("sum_price"),
            (coalesce(col("r_max"), col("max_cents")) / lit(100.0))
              .as("max_price"))
      },
      s"""SELECT l_suppkey, count(*) AS n_items,
        |  CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) / 100.0
        |    AS sum_price,
        |  max(${centsSql("l_extendedprice")}) / 100.0 AS max_price
        |FROM lineitem WHERE l_orderkey % 97 <> 0
        |GROUP BY 1""".stripMargin),

    // ───────────────────────────────────────────────────────────────────
    // Automatic materialized-view rewrite (graft.plans.MaterializedViews):
    // the query below is the PLAIN full-history rollup — no state read, no
    // cutoff, nothing the other §2.15 queries write by hand. The injected
    // optimizer rule recognizes it against the registered view and serves
    // merge(state ∪ partial(Δ)) instead: the orders scan in the executed
    // plan carries the pushed o_orderdate >= cutoff filter and the state
    // parquet appears as a second leaf (MaterializedViewSpec audits both).
    // The oracle is the full recompute, so the gate proves the substituted
    // plan is indistinguishable from the rescan it replaced.
    "q_mv_rewrite" -> Q(
      (s, d) => {
        Incremental.mvPrepare(s, d)
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_price_cents"),
            max(cents(col("o_totalprice"))).as("max_price_cents"))
      },
      s"""SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT)
        |    AS sum_price_cents,
        |  max(${centsSql("o_totalprice")}) AS max_price_cents
        |FROM orders GROUP BY 1""".stripMargin),

    // The pull-query shape: a group-key predicate BELOW the aggregate.
    // The rewrite applies it to BOTH serving branches under their
    // aggregates, so it reaches the state AND delta parquet scans as a
    // PushedFilters entry (LessThanOrEqual is parquet-pushable) — at
    // scale a keyed lookup touches |matching state rows| + |matching
    // delta|, never the full view. The output list is also a strict
    // subset of the registered aggregates (no MAX), exercising
    // subset/reorder mapping.
    "q_mv_pull" -> Q(
      (s, d) => {
        Incremental.mvPrepare(s, d)
        Tables.orders(s, d)
          .filter(col("o_custkey") <= 300)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_price_cents"))
      },
      s"""SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT)
        |    AS sum_price_cents
        |FROM orders WHERE o_custkey <= 300 GROUP BY 1""".stripMargin),

    // AVG by reconstruction: avg is not a mergeable partial (the ratio
    // of two sums), so the rule serves the user's avg(cents) as
    // sum_partials / count_partials above the merge — bit-exact on both
    // engines because the sums are exact BIGINTs and the division is a
    // single double op (the oracle spells the same sum/count division;
    // the unserved plan is identical too, since double-accumulating
    // integers below 2^53 is exact).
    "q_mv_avg" -> Q(
      (s, d) => {
        Incremental.mvPrepare(s, d)
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(avg(cents(col("o_totalprice"))).as("avg_price_cents"),
            count(lit(1)).as("n_orders"))
      },
      s"""SELECT o_custkey,
        |  CAST(sum(${centsSql("o_totalprice")}) AS DOUBLE)
        |    / CAST(count(${centsSql("o_totalprice")}) AS DOUBLE)
        |    AS avg_price_cents,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin),

    // The WINDOWED materialized view — the classic time-series rollup
    // served from pane state: the user writes the plain
    // `groupBy(window(ts, '1 day'), event_type)` (plus a projection to
    // epoch millis for the gate) and the rule substitutes pane-state ∪
    // ts-pushed delta, re-windowing NOTHING from history. The group key
    // is an EXPRESSION (the window struct), and the analyzer's implicit
    // isnotnull(ts) under the window is part of the matched signature.
    "q_mv_window" -> Q(
      (s, d) => {
        Incremental.mvWindowPrepare(s, d)
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("value"))).as("sum_cents"))
          .select(unix_millis(col("window.start")).as("ws"),
            unix_millis(col("window.end")).as("we"),
            col("event_type"), col("cnt"), col("sum_cents"))
      },
      s"""SELECT (epoch_ms(ts) // 86400000) * 86400000 AS ws,
        |  (epoch_ms(ts) // 86400000) * 86400000 + 86400000 AS we,
        |  event_type, count(*) AS cnt,
        |  CAST(sum(${centsSql("value")}) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2, 3""".stripMargin),

    // The HOPPING windowed MV: sliding panes plan through an Expand
    // (each event fans into size/advance = 2 panes), so the serving
    // match must recognize the Expand's structure — the rule keys on
    // each projection row's window-struct expressions (pruning-
    // insensitive) and re-expresses everything above the Expand over
    // name placeholders. The user writes the plain hopping rollup; the
    // oracle re-windows ALL events with the two-pane unnest.
    "q_mv_hopping" -> Q(
      (s, d) => {
        Incremental.mvHoppingPrepare(s, d)
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("value"))).as("sum_cents"))
          .select(unix_millis(col("window.start")).as("ws"),
            col("event_type"), col("cnt"), col("sum_cents"))
      },
      s"""WITH hops AS (
        |  SELECT (epoch_ms(ts) // 1800000) * 1800000 - i * 1800000 AS ws,
        |         event_type, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
        |)
        |SELECT ws, event_type, count(*) AS cnt,
        |  CAST(sum(${centsSql("value")}) AS BIGINT) AS sum_cents
        |FROM hops GROUP BY 1, 2""".stripMargin),

    // WINDOWSTART-bounded HOPPING pull (round 17): the same hopping
    // rollup with a pane-range filter. The bound can NOT push below the
    // Expand (panes differ per projection row), so it reaches the
    // rewrite in the unwrap's name-marker form and is rebuilt over the
    // STORED pane column — state scan filtered on the struct, delta
    // branch's range applied above its pre-aggregate (below it the range
    // stops at the Expand, which is as far as any plan can push it).
    // Previously this shape silently fell back to a full recompute.
    // The range straddles the cutoff so both branches stay non-empty.
    "q_mv_hopping_range" -> Q(
      (s, d) => {
        Incremental.mvHoppingPrepare(s, d)
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("value"))).as("sum_cents"))
          .filter(unix_millis(col("window.start")) >= lit(1706054400000L) &&
            unix_millis(col("window.start")) < lit(1706270400000L))
          .select(unix_millis(col("window.start")).as("ws"),
            col("event_type"), col("cnt"), col("sum_cents"))
      },
      s"""WITH hops AS (
        |  SELECT (epoch_ms(ts) // 1800000) * 1800000 - i * 1800000 AS ws,
        |         event_type, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
        |)
        |SELECT ws, event_type, count(*) AS cnt,
        |  CAST(sum(${centsSql("value")}) AS BIGINT) AS sum_cents
        |FROM hops
        |WHERE ws >= 1706054400000 AND ws < 1706270400000
        |GROUP BY 1, 2""".stripMargin),

    // The GLOBAL (no-key) aggregate served by RE-AGGREGATING the view —
    // the most common dashboard query ("total orders, total revenue"):
    // the user writes the plain keyless rollup and the rule substitutes
    // a second one-row aggregate ABOVE merge(state ∪ partial(Δ)) —
    // COUNT/SUM re-aggregate by summing the merged partials (count
    // coalesced to 0 for the empty case), MAX by itself, AVG as
    // total-sum/total-count. |state| rows reduce to 1; history is never
    // rescanned. The oracle is the full keyless recompute.
    "q_mv_global" -> Q(
      (s, d) => {
        Incremental.mvPrepare(s, d)
        Tables.orders(s, d)
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_price_cents"),
            max(cents(col("o_totalprice"))).as("max_price_cents"),
            avg(cents(col("o_totalprice"))).as("avg_price_cents"))
      },
      s"""SELECT count(*) AS n_orders,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT)
        |    AS sum_price_cents,
        |  max(${centsSql("o_totalprice")}) AS max_price_cents,
        |  CAST(sum(${centsSql("o_totalprice")}) AS DOUBLE)
        |    / CAST(count(${centsSql("o_totalprice")}) AS DOUBLE)
        |    AS avg_price_cents
        |FROM orders""".stripMargin),

    // COUNT(DISTINCT) materialized-view serving — the q_incr_distinct
    // pair-set algebra behind the TRANSPARENT rewrite: the user writes
    // the plain `countDistinct(user_id)` rollup with no knowledge of any
    // view, and the rule serves distinct(pair-state ∪ distinct(Δ-pairs))
    // re-counted per group. The state is the distinct (event_type,
    // user_id) pair set — the information-theoretic minimum for an exact
    // answer — and the delta pre-deduplicates map-side, so maintenance
    // is one pair-key shuffle over |state| + |distinct Δ| at any scale.
    "q_mv_distinct" -> Q(
      (s, d) => {
        Incremental.mvDistinctPrepare(s, d)
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin),

    // GROUPING-SETS serving — ROLLUP over a registered two-key view: the
    // user writes the plain `rollup(status, priority).agg(...)` (Spark
    // plans it as one Aggregate over an Expand with a grouping-id) and
    // the rule serves it as a UNION of per-set re-aggregations of
    // merge(state ∪ Δ): the finest set re-aggregates singleton groups,
    // the status subtotal collapses priorities, the grand total drops
    // every key — 3 × |state| rows reduced, history never rescanned
    // (identical delta exchanges dedupe at runtime via reuse). AVG
    // reconstructs per set from the sum/count partials. The oracle is
    // DuckDB's own GROUP BY ROLLUP over the full recompute.
    "q_mv_rollup" -> Q(
      (s, d) => {
        Incremental.mvRollupPrepare(s, d)
        Tables.orders(s, d)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_cents"),
            max(cents(col("o_totalprice"))).as("max_cents"),
            avg(cents(col("o_totalprice"))).as("avg_cents"))
      },
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sum_cents,
        |  max(${centsSql("o_totalprice")}) AS max_cents,
        |  CAST(sum(${centsSql("o_totalprice")}) AS DOUBLE)
        |    / CAST(count(${centsSql("o_totalprice")}) AS DOUBLE)
        |    AS avg_cents
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin),

    // JOIN-VIEW materialized serving — the dashboard rollup over a
    // fact ⋈ dim join (revenue by nation), served without rescanning
    // fact history: the view registers over the JOINED base (orders ⋈
    // customer on custkey), the rule's unwrap crosses the inner
    // equi-join (its condition becomes a structural shape key — two
    // views over the same path pair with different join conditions can
    // never cross-match), and serving is merge(state ∪ partial(Δorders
    // ⋈ customer)) — the delta branch's orders scan carries the pushed
    // date cutoff and the dim side broadcasts (Calcite/BigQuery-class
    // multi-table MV substitution, expressed through the same rule).
    // The user writes the PLAIN join-rollup; the oracle recomputes it.
    "q_mv_join" -> Q(
      (s, d) => {
        Incremental.mvJoinPrepare(s, d)
        Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_cents"),
            max(cents(col("o_totalprice"))).as("max_cents"))
      },
      s"""SELECT c_nationkey, count(*) AS n_orders,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sum_cents,
        |  max(${centsSql("o_totalprice")}) AS max_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin),

    // STAR-CHAIN join view — fact ⋈ dim ⋈ dim (orders ⋈ customer ⋈
    // nation, revenue by nation NAME): joins below joins compose
    // through the same unwrap, the NESTED shape key encoding the whole
    // join tree (registration canonicalizes it from the OPTIMIZED
    // definition child, so optimizer join-tree normalization matches on
    // both sides). Serving re-joins ONLY the date-pushed orders delta
    // against the two broadcast dims — the classic warehouse dashboard
    // query served without rescanning fact history.
    "q_mv_join_star" -> Q(
      (s, d) => {
        Incremental.mvJoinStarPrepare(s, d)
        Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, d),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_cents"))
      },
      s"""SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sum_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin),

    // WINDOWED JOIN VIEW — the time-series rollup over a fact ⋈ dim
    // (30-day revenue by market segment): the window EXPRESSION key and
    // the crossed join compose through the same unwrap — the analyzer's
    // isnotnull(o_orderdate) under the window joins the conjunct set,
    // the join condition is the structural shape key, and serving is
    // pane-state ∪ (date-pushed Δorders ⋈ broadcast customer)
    // re-windowing NOTHING from history. The cutoff (2001-01-01) sits
    // mid-pane on the 30-day epoch grid, so the straddling pane merges
    // a state partial with a delta partial.
    "q_mv_window_join" -> Q(
      (s, d) => {
        Incremental.mvWindowJoinPrepare(s, d)
        Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(window(col("o_orderdate"), "30 days"),
            col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("o_totalprice"))).as("sum_cents"))
          .select(unix_millis(col("window.start").cast("timestamp"))
            .as("ws"), col("c_mktsegment"), col("cnt"), col("sum_cents"))
      },
      s"""SELECT (epoch_ms(o_orderdate) // 2592000000) * 2592000000 AS ws,
        |  c_mktsegment, count(*) AS cnt,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2""".stripMargin),

    // HOPPING JOIN VIEW — sliding panes over a fact ⋈ dim: the Expand
    // (each order fans into 60d/30d = 2 panes) sits ABOVE the crossed
    // join, and the nested shape key carries BOTH structures —
    // Seq(join[...], expand(...)) — so the sliding-pane dashboard
    // rollup over the join serves from pane state ∪ (date-pushed
    // Δorders ⋈ broadcast customer), fanning out the DELTA only,
    // never re-expanding history.
    "q_mv_hopping_join" -> Q(
      (s, d) => {
        Incremental.mvHoppingJoinPrepare(s, d)
        Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(window(col("o_orderdate"), "60 days", "30 days"),
            col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("o_totalprice"))).as("sum_cents"))
          .select(unix_millis(col("window.start").cast("timestamp"))
            .as("ws"), col("c_mktsegment"), col("cnt"), col("sum_cents"))
      },
      s"""WITH hops AS (
        |  SELECT (epoch_ms(o_orderdate) // 2592000000) * 2592000000
        |           - i * 2592000000 AS ws,
        |         c_mktsegment, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  CROSS JOIN (SELECT unnest([0, 1]) AS i)
        |)
        |SELECT ws, c_mktsegment, count(*) AS cnt,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sum_cents
        |FROM hops GROUP BY 1, 2""".stripMargin),

    // COUNT(DISTINCT) retraction — the multiplicity-carrying pair-set
    // (round-13 verdict item 3): the state stores (group, value, count)
    // instead of the bare pair, so upstream CDC deletes subtract
    // EXACTLY — one union of state, moved(+1), deletes(−1) summed in a
    // single pair-key shuffle, pairs reaching zero leave the view, no
    // join and no repair pass (a pair set has no extremum to rescan
    // for). 2× pair-state cost, opt-in at registration
    // (countedPairs=true). The user writes the plain countDistinct
    // rollup; the oracle recomputes over the surviving rows, so the
    // gate proves subtract ≡ rescan-minus-deleted — including pairs
    // whose LAST event was deleted (the emptied regime).
    "q_mv_distinct_delete" -> Q(
      (s, d) => {
        Incremental.mvDistinctDeletePrepare(s, d)
        Tables.events(s, d)
          .groupBy(col("event_type"), (col("user_id") % 2).as("upar"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      """SELECT event_type, user_id % 2 AS upar,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE NOT ((user_id % 7 = 0 OR event_id % 89 = 0)
        |           AND ts < TIMESTAMP '2024-01-28')
        |GROUP BY 1, 2""".stripMargin),

    // MV refresh under DELETES — the CDC retraction inside the refresh
    // fold: upstream retracted a deterministic row set (o_orderkey ≡ 0
    // mod 97, dated before the new cutoff), and refreshWithDeletes folds
    // the cutoff advance AND the retraction into one new state artifact —
    // COUNT/SUM subtract exactly (BIGINT cents), and ONLY the groups
    // whose stored extremum was deleted recompute MIN/MAX from surviving
    // rows (broadcast-semi-join-pruned before the aggregate). The user
    // query is the PLAIN rollup; the oracle is the full recompute over
    // the surviving rows, so the gate proves subtract+repair ≡
    // rescan-minus-deleted.
    "q_mv_refresh_delete" -> Q(
      (s, d) => {
        Incremental.mvDeletePrepare(s, d)
        Tables.orders(s, d)
          .groupBy((col("o_custkey") % 1000).as("cust_mod"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_cents"),
            max(cents(col("o_totalprice"))).as("max_cents"),
            min(cents(col("o_totalprice"))).as("min_cents"))
      },
      s"""SELECT o_custkey % 1000 AS cust_mod, count(*) AS n_orders,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS sum_cents,
        |  max(${centsSql("o_totalprice")}) AS max_cents,
        |  min(${centsSql("o_totalprice")}) AS min_cents
        |FROM orders
        |WHERE NOT (o_orderkey % 97 = 0
        |           AND o_orderdate < TIMESTAMP '2001-06-01')
        |GROUP BY 1""".stripMargin),

    // The MV LIFECYCLE: refresh folds the accumulated delta into a new
    // state artifact (merge(state ∪ partial(moved)) — the same algebra
    // the serving plan runs) and advances the cutoff, swapping the
    // registration atomically. The user query is IDENTICAL to
    // q_mv_rewrite's — what changed is behind the rule: the serving
    // plan now reads the refreshed state and a five-month-smaller
    // delta. The oracle is still the full recompute, so the gate
    // proves refresh preserved the view exactly.
    "q_mv_refresh" -> Q(
      (s, d) => {
        Incremental.mvRefresh(s, d)
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_price_cents"),
            max(cents(col("o_totalprice"))).as("max_price_cents"))
      },
      s"""SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT)
        |    AS sum_price_cents,
        |  max(${centsSql("o_totalprice")}) AS max_price_cents
        |FROM orders GROUP BY 1""".stripMargin)
  )

  /** Bench's separately-timed prepare phases for the state artifacts. */
  def prepares: Map[String, (SparkSession, String) => Unit] = Map(
    "q_incr_agg" -> ((s, d) => aggStatePrepare(s, d)),
    "q_incr_join" -> ((s, d) => joinViewPrepare(s, d)),
    "q_incr_topk" -> ((s, d) => topkStatePrepare(s, d)),
    "q_incr_delete" -> ((s, d) => deleteStatePrepare(s, d)),
    "q_incr_distinct" -> ((s, d) => distinctStatePrepare(s, d)),
    "q_incr_scd2" -> ((s, d) => scd2StatePrepare(s, d)),
    "q_incr_window" -> ((s, d) => windowStatePrepare(s, d)),
    "q_incr_hopping" -> ((s, d) => hoppingStatePrepare(s, d)),
    "q_incr_session" -> ((s, d) => sessionStatePrepare(s, d)),
    "q_mv_rewrite" -> ((s, d) => mvPrepare(s, d)),
    "q_mv_pull" -> ((s, d) => mvPrepare(s, d)),
    "q_mv_avg" -> ((s, d) => mvPrepare(s, d)),
    "q_mv_global" -> ((s, d) => mvPrepare(s, d)),
    "q_mv_distinct" -> ((s, d) => mvDistinctPrepare(s, d)),
    "q_mv_distinct_delete" -> ((s, d) => mvDistinctDeletePrepare(s, d)),
    "q_mv_join" -> ((s, d) => mvJoinPrepare(s, d)),
    "q_mv_join_star" -> ((s, d) => mvJoinStarPrepare(s, d)),
    "q_mv_window_join" -> ((s, d) => mvWindowJoinPrepare(s, d)),
    "q_mv_hopping_join" -> ((s, d) => mvHoppingJoinPrepare(s, d)),
    "q_mv_rollup" -> ((s, d) => mvRollupPrepare(s, d)),
    "q_mv_window" -> ((s, d) => mvWindowPrepare(s, d)),
    "q_mv_hopping" -> ((s, d) => mvHoppingPrepare(s, d)),
    "q_mv_hopping_range" -> ((s, d) => mvHoppingPrepare(s, d)),
    "q_mv_refresh" -> ((s, d) => mvRefresh(s, d)),
    "q_mv_refresh_delete" -> ((s, d) => mvDeletePrepare(s, d)))

  // ─── write-once state artifacts (per sf-dir, idempotent, lock-guarded:
  //     bench's 8-way pool may race two queries into the first call) ────
  private val stateDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def materialize(key: String)(build: String => Unit): String =
    stateDirs.computeIfAbsent(key, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory(key.replaceAll("[^A-Za-z0-9]", "_")).toString
      build(dir); dir
    })

  private def baseOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(Cutoff).cast("timestamp"))

  private[graft] def aggStateDir(d: String): String =
    stateDirs.get(s"incr_agg_$d")
  private[graft] def aggStatePrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_agg_$d") { dir =>
      baseOrders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("o_totalprice"))).as("sum_cents"),
          max(cents(col("o_totalprice"))).as("max_cents"))
        .write.mode("overwrite").parquet(dir)
    }

  private[operators] def joinViewDir(d: String): String =
    stateDirs.get(s"incr_join_$d")
  private[operators] def joinViewPrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_join_$d") { dir =>
      baseOrders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("c_mktsegment"), col("o_totalprice"))
        .write.mode("overwrite").parquet(dir)
    }

  private[operators] def topkStateDir(d: String): String =
    stateDirs.get(s"incr_topk_$d")
  private[operators] def topkStatePrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_topk_$d") { dir =>
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      baseOrders(s, d)
        .select((col("o_custkey") % 10).as("shard"),
          col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .drop("rk")
        .write.mode("overwrite").parquet(dir)
    }

  private[graft] def scd2StateDir(d: String): String =
    stateDirs.get(s"incr_scd2_$d")
  private[graft] def scd2StatePrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_scd2_$d") { dir =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      baseOrders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("valid_from_ms"),
        unix_millis(lead(col("o_orderdate"), 1).over(w).cast("timestamp"))
          .as("valid_to_ms"),
        lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"))
        .write.mode("overwrite").parquet(dir)
    }

  private[graft] def distinctStateDir(d: String): String =
    stateDirs.get(s"incr_dist_$d")
  private[graft] def distinctStatePrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_dist_$d") { dir =>
      Tables.events(s, d)
        .filter(col("ts") < lit(EventCutoff).cast("timestamp"))
        .select(col("event_type"), col("user_id")).distinct()
        .write.mode("overwrite").parquet(dir)
    }

  private[graft] def windowStateDir(d: String): String =
    stateDirs.get(s"incr_win_$d")
  private[graft] def windowStatePrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_win_$d") { dir =>
      Tables.events(s, d)
        .filter(col("ts") < lit(WindowCutoff).cast("timestamp"))
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("value"))).as("sum_cents"))
        .select(unix_millis(col("window.start")).as("ws"),
          col("event_type"), col("cnt"), col("sum_cents"))
        .write.mode("overwrite").parquet(dir)
    }

  private[graft] def hoppingStateDir(d: String): String =
    stateDirs.get(s"incr_hop_$d")
  private[graft] def hoppingStatePrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_hop_$d") { dir =>
      Tables.events(s, d)
        .filter(col("ts") < lit(WindowCutoff).cast("timestamp"))
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("value"))).as("sum_cents"))
        .select(unix_millis(col("window.start")).as("ws"),
          col("event_type"), col("cnt"), col("sum_cents"))
        .write.mode("overwrite").parquet(dir)
    }

  private[graft] def sessionStateDir(d: String): String =
    stateDirs.get(s"incr_sess_$d")
  private[graft] def sessionStatePrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_sess_$d") { dir =>
      Tables.events(s, d)
        .filter(col("event_id") % 13 =!= 0)
        .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
        .agg(min(unix_millis(col("ts"))).as("first_ms"),
          max(unix_millis(col("ts"))).as("last_ms"),
          count(lit(1)).as("cnt"),
          sum(cents(col("value"))).as("sum_cents"))
        .select(col("user_id"), col("first_ms"), col("last_ms"),
          col("cnt"), col("sum_cents"))
        .write.mode("overwrite").parquet(dir)
    }

  /** The registered MV definition: the orders rollup by custkey, with
    * COUNT/SUM/MAX partials in BIGINT cents. Written once — the
    * registration, the state build, and the user queries above must
    * agree on the exact expression trees for the semantic match. */
  private def mvAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_orders"),
    sum(cents(col("o_totalprice"))).as("sum_price_cents"),
    max(cents(col("o_totalprice"))).as("max_price_cents"),
    // the non-null count of the cents expression itself: together with
    // sum_price_cents it lets the rule serve a user's avg(cents) as
    // sum/count with exact null semantics (count(1) could not — it
    // counts rows, avg ignores nulls)
    count(cents(col("o_totalprice"))).as("n_priced"))

  private[graft] def mvStateDir(d: String): String =
    stateDirs.get(s"mv_orders_$d")

  /** Build the MV state artifact (pre-cutoff partials), register the view
    * with [[graft.plans.MaterializedViews]], and install the rewrite rule
    * into the session. The cutoff literal is cast to o_orderdate's OWN
    * type: the serving plan is substituted after the main optimizer
    * batches, so nobody unwraps a column-side cast for us — a mistyped
    * literal would silently cost the parquet pushdown at 100 TB. The
    * state filter is the literal complement of the delta predicate
    * (o_orderdate is non-null), so coverage is exact by construction.
    * Idempotent; safe under Verify's parallel dumps. */
  private[graft] def mvPrepare(s: SparkSession, d: String): Unit = {
    val dateType =
      Tables.orders(s, d).schema("o_orderdate").dataType.catalogString
    val cutoffLit = lit(Cutoff).cast(dateType)
    materialize(s"mv_orders_$d") { dir =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") < cutoffLit)
        .groupBy(col("o_custkey"))
        .agg(mvAggs.head, mvAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"orders_rollup_$d",
      base = sp => Tables.orders(sp, d),
      stateDir = mvStateDir(d),
      deltaPred = col("o_orderdate") >= cutoffLit,
      groupCols = Seq(col("o_custkey")),
      aggCols = mvAggs)
    graft.plans.MaterializedViews.install(s)
  }

  private[graft] def mvHoppingStateDir(d: String): String =
    stateDirs.get(s"mv_events_hop_$d")

  /** Hopping MV prepare: pre-cutoff pane partials on the 1 h/30 m grid
    * (each event fans to 2 panes at prepare time, exactly once — the
    * serving delta fans the SAME way, history never re-expands). */
  private[graft] def mvHoppingPrepare(s: SparkSession, d: String): Unit = {
    materialize(s"mv_events_hop_$d") { dir =>
      Tables.events(s, d)
        .filter(col("ts") < lit(WindowCutoff).cast("timestamp"))
        .groupBy(window(col("ts"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(mvWindowAggs.head, mvWindowAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"events_hopping_$d",
      base = sp => Tables.events(sp, d),
      stateDir = mvHoppingStateDir(d),
      deltaPred = col("ts") >= lit(WindowCutoff).cast("timestamp"),
      groupCols = Seq(window(col("ts"), "1 hour", "30 minutes"),
        col("event_type")),
      aggCols = mvWindowAggs)
    graft.plans.MaterializedViews.install(s)
  }

  /** The refresh target: five months past the registration cutoff (the
    * orders calendar ends 2001-08-01, so the post-refresh delta is small
    * but non-empty — both the fold and the remaining serving branch stay
    * exercised). */
  private val RefreshCutoff = "2001-06-01"

  private[graft] def mvRefreshedStateDir(d: String): String =
    stateDirs.get(s"mv_orders_r_$d")

  /** Re-pin a registration to its FINAL (refreshed) artifact. A spec's
    * registry clear() followed by a prepare re-register would otherwise
    * leave the view at its PRE-refresh state while the refreshed
    * artifact memo exists (the refresh fold is materialize-once) —
    * values stay correct either way, but serving would silently read
    * the stale artifact with the unadvanced cutoff. */
  private def repinView(s: SparkSession, name: String, finalDir: String,
      base: SparkSession => org.apache.spark.sql.DataFrame,
      deltaPred: org.apache.spark.sql.Column,
      groupCols: Seq[org.apache.spark.sql.Column],
      aggCols: Seq[org.apache.spark.sql.Column],
      countedPairs: Boolean = false, retracted: Boolean = false): Unit =
    if (!graft.plans.MaterializedViews.view(name)
      .exists(_.stateDir == finalDir)) {
      graft.plans.MaterializedViews.drop(name)
      graft.plans.MaterializedViews.register(s, name, base, finalDir,
        deltaPred, groupCols, aggCols, countedPairs, retracted)
      graft.plans.MaterializedViews.install(s)
    }

  /** Advance the orders view's cutoff: fold [Cutoff, RefreshCutoff) into
    * a fresh state artifact and swap the registration. Idempotent (the
    * fold is materialize-once; a repeat put writes the same values). */
  private[graft] def mvRefresh(s: SparkSession, d: String): Unit = {
    mvPrepare(s, d)
    val dateType =
      Tables.orders(s, d).schema("o_orderdate").dataType.catalogString
    materialize(s"mv_orders_r_$d") { dir =>
      graft.plans.MaterializedViews.refresh(s, s"orders_rollup_$d",
        col("o_orderdate") >= lit(RefreshCutoff).cast(dateType), dir)
    }
    repinView(s, s"orders_rollup_$d", mvRefreshedStateDir(d),
      sp => Tables.orders(sp, d),
      col("o_orderdate") >= lit(RefreshCutoff).cast(dateType),
      Seq(col("o_custkey")), mvAggs)
  }

  /** The two-key rollup view (q_mv_rollup): orders by (status,
    * priority) with COUNT/SUM/MAX + the avg-constituent count. */
  private def mvRollupAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_orders"),
    sum(cents(col("o_totalprice"))).as("sum_cents"),
    max(cents(col("o_totalprice"))).as("max_cents"),
    count(cents(col("o_totalprice"))).as("n_priced"))

  private[graft] def mvRollupStateDir(d: String): String =
    stateDirs.get(s"mv_sp_$d")

  private[graft] def mvRollupPrepare(s: SparkSession, d: String): Unit = {
    val dateType =
      Tables.orders(s, d).schema("o_orderdate").dataType.catalogString
    val cutoff = lit(Cutoff).cast(dateType)
    materialize(s"mv_sp_$d") { dir =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") < cutoff)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(mvRollupAggs.head, mvRollupAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"orders_sp_$d",
      base = sp => Tables.orders(sp, d),
      stateDir = mvRollupStateDir(d),
      deltaPred = col("o_orderdate") >= cutoff,
      groupCols = Seq(col("o_orderstatus"), col("o_orderpriority")),
      aggCols = mvRollupAggs)
    graft.plans.MaterializedViews.install(s)
  }

  private[graft] def mvDistinctStateDir(d: String): String =
    stateDirs.get(s"mv_dist_$d")

  /** Pair-set DISTINCT view prepare: the distinct (event_type, user_id)
    * pairs at the standard event cutoff (the value column under the
    * reserved `__dv` name the serving plan reconstructs), registered as
    * a COUNT(DISTINCT) view. Idempotent. */
  private[graft] def mvDistinctPrepare(s: SparkSession, d: String): Unit = {
    materialize(s"mv_dist_$d") { dir =>
      Tables.events(s, d)
        .filter(col("ts") < lit(EventCutoff).cast("timestamp"))
        .select(col("event_type"), col("user_id").as("__dv")).distinct()
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"events_distinct_$d",
      base = sp => Tables.events(sp, d),
      stateDir = mvDistinctStateDir(d),
      deltaPred = col("ts") >= lit(EventCutoff).cast("timestamp"),
      groupCols = Seq(col("event_type")),
      aggCols = Seq(countDistinct(col("user_id")).as("n_users")))
    graft.plans.MaterializedViews.install(s)
  }

  /** The JOIN-VIEW definition (q_mv_join): the orders ⋈ customer
    * rollup by c_nationkey. The base factory captures the WHOLE join —
    * registration, the state build, the serving delta branch, and
    * refresh all run over it unchanged, and the rule's unwrap crosses
    * the inner equi-join on both the definition and the user plan (the
    * join condition is part of the matched shape). The dim is re-read
    * fresh at serving time; a dim-side change is a staleness event the
    * caller answers with refresh, exactly like a fact-side base change
    * (the write-once artifact discipline). */
  private def mvJoinAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_orders"),
    sum(cents(col("o_totalprice"))).as("sum_cents"),
    max(cents(col("o_totalprice"))).as("max_cents"))
  private def mvJoinBase(sp: SparkSession, d: String): DataFrame =
    Tables.orders(sp, d).join(Tables.customer(sp, d),
      col("o_custkey") === col("c_custkey"))

  private[graft] def mvJoinStateDir(d: String): String =
    stateDirs.get(s"mv_join_$d")

  private[graft] def mvJoinPrepare(s: SparkSession, d: String): Unit = {
    val dateType =
      Tables.orders(s, d).schema("o_orderdate").dataType.catalogString
    val cutoff = lit(Cutoff).cast(dateType)
    materialize(s"mv_join_$d") { dir =>
      mvJoinBase(s, d)
        .filter(col("o_orderdate") < cutoff)
        .groupBy(col("c_nationkey"))
        .agg(mvJoinAggs.head, mvJoinAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"orders_cust_$d",
      base = sp => mvJoinBase(sp, d),
      stateDir = mvJoinStateDir(d),
      deltaPred = col("o_orderdate") >= cutoff,
      groupCols = Seq(col("c_nationkey")),
      aggCols = mvJoinAggs)
    graft.plans.MaterializedViews.install(s)
  }

  /** The STAR-CHAIN view (q_mv_join_star): orders ⋈ customer ⋈ nation
    * by n_name — the join tree nests, and the registered shape key
    * (canonicalized from the optimized definition) encodes it. */
  private def mvJoinStarAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_orders"),
    sum(cents(col("o_totalprice"))).as("sum_cents"))
  private def mvJoinStarBase(sp: SparkSession, d: String): DataFrame =
    Tables.orders(sp, d)
      .join(Tables.customer(sp, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(sp, d), col("c_nationkey") === col("n_nationkey"))

  private[graft] def mvJoinStarStateDir(d: String): String =
    stateDirs.get(s"mv_jstar_$d")

  private[graft] def mvJoinStarPrepare(s: SparkSession, d: String): Unit = {
    val dateType =
      Tables.orders(s, d).schema("o_orderdate").dataType.catalogString
    val cutoff = lit(Cutoff).cast(dateType)
    materialize(s"mv_jstar_$d") { dir =>
      mvJoinStarBase(s, d)
        .filter(col("o_orderdate") < cutoff)
        .groupBy(col("n_name"))
        .agg(mvJoinStarAggs.head, mvJoinStarAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"orders_nation_$d",
      base = sp => mvJoinStarBase(sp, d),
      stateDir = mvJoinStarStateDir(d),
      deltaPred = col("o_orderdate") >= cutoff,
      groupCols = Seq(col("n_name")),
      aggCols = mvJoinStarAggs)
    graft.plans.MaterializedViews.install(s)
  }

  /** The WINDOWED JOIN view (q_mv_window_join): 30-day panes ×
    * c_mktsegment over orders ⋈ customer — the window expression key
    * and the crossed join compose in one registration. */
  private def mvWinJoinAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("cnt"),
    sum(cents(col("o_totalprice"))).as("sum_cents"))

  private[graft] def mvWindowJoinStateDir(d: String): String =
    stateDirs.get(s"mv_wjoin_$d")

  private[graft] def mvWindowJoinPrepare(s: SparkSession, d: String): Unit = {
    val dateType =
      Tables.orders(s, d).schema("o_orderdate").dataType.catalogString
    val cutoff = lit(Cutoff).cast(dateType)
    materialize(s"mv_wjoin_$d") { dir =>
      mvJoinBase(s, d)
        .filter(col("o_orderdate") < cutoff)
        .groupBy(window(col("o_orderdate"), "30 days"),
          col("c_mktsegment"))
        .agg(mvWinJoinAggs.head, mvWinJoinAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"orders_seg_30d_$d",
      base = sp => mvJoinBase(sp, d),
      stateDir = mvWindowJoinStateDir(d),
      deltaPred = col("o_orderdate") >= cutoff,
      groupCols = Seq(window(col("o_orderdate"), "30 days"),
        col("c_mktsegment")),
      aggCols = mvWinJoinAggs)
    graft.plans.MaterializedViews.install(s)
  }

  /** The HOPPING JOIN view (q_mv_hopping_join): 60d/30d sliding panes ×
    * c_mktsegment over orders ⋈ customer — the Expand above the crossed
    * join, both encoded in the nested shape key. */
  private[graft] def mvHoppingJoinStateDir(d: String): String =
    stateDirs.get(s"mv_hjoin_$d")

  private[graft] def mvHoppingJoinPrepare(s: SparkSession, d: String): Unit = {
    val dateType =
      Tables.orders(s, d).schema("o_orderdate").dataType.catalogString
    val cutoff = lit(Cutoff).cast(dateType)
    materialize(s"mv_hjoin_$d") { dir =>
      mvJoinBase(s, d)
        .filter(col("o_orderdate") < cutoff)
        .groupBy(window(col("o_orderdate"), "60 days", "30 days"),
          col("c_mktsegment"))
        .agg(mvWinJoinAggs.head, mvWinJoinAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"orders_seg_hop_$d",
      base = sp => mvJoinBase(sp, d),
      stateDir = mvHoppingJoinStateDir(d),
      deltaPred = col("o_orderdate") >= cutoff,
      groupCols = Seq(window(col("o_orderdate"), "60 days", "30 days"),
        col("c_mktsegment")),
      aggCols = mvWinJoinAggs)
    graft.plans.MaterializedViews.install(s)
  }

  /** The counted-pair retraction view (q_mv_distinct_delete): distinct
    * users per (event_type, user_id%2) with PER-PAIR multIplicity state
    * — registered countedPairs so refreshWithDeletes subtracts exactly
    * and emptied pairs leave. The two-key signature is disjoint from
    * events_distinct's single-key one: the two views' contracts diverge
    * after the retraction, so they must never match the same query. */
  private def mvDistDelGroup: Seq[org.apache.spark.sql.Column] =
    Seq(col("event_type"), (col("user_id") % 2).as("upar"))

  private[graft] def mvDistDelStateDir(d: String): String =
    stateDirs.get(s"mv_dd_$d")
  private[graft] def mvDistDelRefreshedDir(d: String): String =
    stateDirs.get(s"mv_dd_r_$d")
  /** Emptied-pair count from the retraction refresh (spec hook). */
  private[graft] val mvDistDelEmptied =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** The distinct-retraction cutoff: three days past EventCutoff, so
    * the refresh exercises all three regions (state subtraction, moved
    * fold, surviving delta). */
  private val DistDelCutoff = "2024-01-28"

  private[graft] def mvDistinctDeletePrepare(s: SparkSession,
      d: String): Unit = {
    materialize(s"mv_dd_$d") { dir =>
      Tables.events(s, d)
        .filter(col("ts") < lit(EventCutoff).cast("timestamp"))
        .groupBy(mvDistDelGroup :+ col("user_id").as("__dv"): _*)
        .agg(count(lit(1)).as("__dn"))
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"events_dd_$d",
      base = sp => Tables.events(sp, d),
      stateDir = mvDistDelStateDir(d),
      deltaPred = col("ts") >= lit(EventCutoff).cast("timestamp"),
      groupCols = mvDistDelGroup,
      aggCols = Seq(countDistinct(col("user_id")).as("n_users")),
      countedPairs = true)
    graft.plans.MaterializedViews.install(s)
    val newCutoff = lit(DistDelCutoff).cast("timestamp")
    materialize(s"mv_dd_r_$d") { dir =>
      // the delete set exercises BOTH regimes: user%7 wipes whole users
      // (their pre-cutoff pairs empty and leave the state), event%89
      // reduces other pairs' counts without emptying them
      val emptied = graft.plans.MaterializedViews.refreshWithDeletes(s,
        s"events_dd_$d",
        newDeltaPred = col("ts") >= newCutoff,
        deletePred = (col("user_id") % 7 === 0 ||
          col("event_id") % 89 === 0) && col("ts") < newCutoff,
        newStateDir = dir)
      mvDistDelEmptied.put(d, emptied)
    }
    repinView(s, s"events_dd_$d", mvDistDelRefreshedDir(d),
      sp => Tables.events(sp, d),
      col("ts") >= newCutoff, mvDistDelGroup,
      Seq(countDistinct(col("user_id")).as("n_users")),
      countedPairs = true, retracted = true)
  }

  /** The retraction-view definition: orders rolled up by the cust_mod
    * EXPRESSION key (disjoint from orders_rollup's o_custkey signature —
    * two views over the same base must never both match one query when
    * their contracts differ), with a MIN partial so both extremum-repair
    * directions exist. */
  private def mvDelAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_orders"),
    sum(cents(col("o_totalprice"))).as("sum_cents"),
    max(cents(col("o_totalprice"))).as("max_cents"),
    min(cents(col("o_totalprice"))).as("min_cents"))
  private def mvDelGroup: Seq[org.apache.spark.sql.Column] =
    Seq((col("o_custkey") % 1000).as("cust_mod"))

  private[graft] def mvDeleteStateDir(d: String): String =
    stateDirs.get(s"mv_del_$d")
  private[graft] def mvDeleteRefreshedDir(d: String): String =
    stateDirs.get(s"mv_del_r_$d")
  /** Touched-group count from the retraction refresh (spec hook). */
  private[graft] val mvDeleteTouched =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Register the cust_mod retraction view at the standard cutoff, then
    * fold the cutoff advance AND the %97 retraction into a refreshed
    * state via refreshWithDeletes. Idempotent; safe under Verify's
    * parallel dumps (each step materializes once, later callers block
    * until both completed). */
  private[graft] def mvDeletePrepare(s: SparkSession, d: String): Unit = {
    val dateType =
      Tables.orders(s, d).schema("o_orderdate").dataType.catalogString
    val cutoff = lit(Cutoff).cast(dateType)
    materialize(s"mv_del_$d") { dir =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") < cutoff)
        .groupBy(mvDelGroup: _*)
        .agg(mvDelAggs.head, mvDelAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"orders_mod_$d",
      base = sp => Tables.orders(sp, d),
      stateDir = mvDeleteStateDir(d),
      deltaPred = col("o_orderdate") >= cutoff,
      groupCols = mvDelGroup,
      aggCols = mvDelAggs)
    graft.plans.MaterializedViews.install(s)
    val newCutoff = lit(RefreshCutoff).cast(dateType)
    materialize(s"mv_del_r_$d") { dir =>
      val touched = graft.plans.MaterializedViews.refreshWithDeletes(s,
        s"orders_mod_$d",
        newDeltaPred = col("o_orderdate") >= newCutoff,
        deletePred = col("o_orderkey") % 97 === 0 &&
          col("o_orderdate") < newCutoff,
        newStateDir = dir)
      mvDeleteTouched.put(d, touched)
    }
    repinView(s, s"orders_mod_$d", mvDeleteRefreshedDir(d),
      sp => Tables.orders(sp, d),
      col("o_orderdate") >= newCutoff, mvDelGroup, mvDelAggs,
      retracted = true)
  }

  /** The windowed MV definition: daily panes × event_type, COUNT/SUM
    * partials in BIGINT cents, state written as the window STRUCT itself
    * (parquet round-trips it; unionByName and the struct group key keep
    * the serving construction uniform with the flat case). */
  private def mvWindowAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("cnt"),
    sum(cents(col("value"))).as("sum_cents"))

  private[graft] def mvWindowStateDir(d: String): String =
    stateDirs.get(s"mv_events_$d")

  /** Windowed MV prepare: pre-cutoff pane partials (the same mid-window
    * cutoff as the window-IVM family, so the Jan-25 pane genuinely holds
    * a state partial AND a delta partial), registration with the window
    * EXPRESSION as a group key, rule install. */
  private[graft] def mvWindowPrepare(s: SparkSession, d: String): Unit = {
    materialize(s"mv_events_$d") { dir =>
      Tables.events(s, d)
        .filter(col("ts") < lit(WindowCutoff).cast("timestamp"))
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(mvWindowAggs.head, mvWindowAggs.tail: _*)
        .write.mode("overwrite").parquet(dir)
    }
    graft.plans.MaterializedViews.register(s, s"events_daily_$d",
      base = sp => Tables.events(sp, d),
      stateDir = mvWindowStateDir(d),
      deltaPred = col("ts") >= lit(WindowCutoff).cast("timestamp"),
      groupCols = Seq(window(col("ts"), "1 day"), col("event_type")),
      aggCols = mvWindowAggs)
    graft.plans.MaterializedViews.install(s)
  }

  private[operators] def deleteStateDir(d: String): String =
    stateDirs.get(s"incr_del_$d")
  private[operators] def deleteStatePrepare(s: SparkSession, d: String): Unit =
    materialize(s"incr_del_$d") { dir =>
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("l_extendedprice"))).as("sum_cents"),
          max(cents(col("l_extendedprice"))).as("max_cents"))
        .write.mode("overwrite").parquet(dir)
    }
}
