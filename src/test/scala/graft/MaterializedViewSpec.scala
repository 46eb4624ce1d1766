package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Incremental
import graft.plans.MaterializedViews

/** The automatic materialized-view rewrite (graft.plans): a user's plain
  * groupBy over the base table is served from merge(state ∪ partial(Δ))
  * — asserted on the EXECUTED plan (state leaf present, exactly one
  * date-pushed base scan) and on values against the direct plan computed
  * with the rule disabled. Non-matching shapes must pass through
  * untouched: the rewrite's failure mode is a wrong answer served
  * silently, so the bail-out paths are as load-bearing as the rewrite.
  */
class MaterializedViewSpec extends SparkSpec {

  private val cents =
    floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")

  private def userRollup: DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents).as("sum_price_cents"),
        max(cents).as("max_price_cents"))

  /** Collect under a given rule-enabled setting; the flag is read at
    * optimization time, so each frame must be built AND collected inside
    * its own setting window. */
  private def collected(enabled: Boolean)(mk: => DataFrame)
      : (Set[org.apache.spark.sql.Row], String) = {
    spark.conf.set("spark.graft.mv.enabled", enabled.toString)
    try {
      val df = mk
      val plan = df.queryExecution.executedPlan.toString
      (df.collect().toSet, plan)
    } finally spark.conf.unset("spark.graft.mv.enabled")
  }

  test("mv rewrite: plain rollup is served from state + one date-pushed " +
    "delta scan, values identical to the direct plan") {
    Incremental.mvPrepare(spark, sfDir)
    val (got, plan) = collected(enabled = true)(userRollup)
    assert(plan.contains(Incremental.mvStateDir(sfDir)),
      s"serving plan must scan the state artifact\n$plan")
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 1, s"expected 1 orders scan, got $ordersScans\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"delta scan must push the cutoff filter\n$plan")
    val (want, directPlan) = collected(enabled = false)(userRollup)
    assert(!directPlan.contains(Incremental.mvStateDir(sfDir)),
      "kill switch must leave the plan untouched")
    assert(got == want)
  }

  test("mv rewrite: pull shape pushes the group-key predicate into BOTH " +
    "branch scans, subset/reorder/re-alias outputs still map") {
    Incremental.mvPrepare(spark, sfDir)
    // reordered + re-aliased + subset of the registered aggregates
    def pull: DataFrame = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") <= 300)
      .groupBy(col("o_custkey"))
      .agg(max(cents).as("top_cents"), count(lit(1)).as("cnt"))
    // the default 100-char metadata truncation can cut PushedFilters
    // mid-list — widen it so the assertion sees the whole thing
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val (got, plan) = try collected(enabled = true)(pull)
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(plan.contains(Incremental.mvStateDir(sfDir)), plan)
    // the predicate lands in PushedFilters on the state scan AND the
    // delta scan — two pushed LessThanOrEqual entries (matched on a
    // prefix: the plan printer truncates long PushedFilters lists)
    val pushed = "LessThanOrEqual\\(o_custk".r.findAllIn(plan).length
    assert(pushed >= 2,
      s"pull predicate must reach both branch scans, got $pushed\n$plan")
    val (want, _) = collected(enabled = false)(pull)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("mv rewrite bails out: unregistered aggregate, non-group filter, " +
    "different keys, distinct — all pass through unrewritten") {
    Incremental.mvPrepare(spark, sfDir)
    val state = Incremental.mvStateDir(sfDir)
    def planOf(df: DataFrame): String =
      df.queryExecution.executedPlan.toString
    val orders = Tables.orders(spark, sfDir)
    // raw-double sum was never registered (only the cents recipe)
    assert(!planOf(orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("s"))).contains(state))
    // filter on a NON-group column cannot be served from per-key state
    assert(!planOf(orders
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))).contains(state))
    // different grouping keys
    assert(!planOf(orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))).contains(state))
    // DISTINCT aggregates are not mergeable partials
    assert(!planOf(orders.groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("n"))).contains(state))
    // a GLOBAL aggregate over an UNREGISTERED expression must bail —
    // and so must a global mix where only SOME aggregates map (the
    // unmapped count(distinct) left in place would count view groups)
    assert(!planOf(orders.agg(sum(col("o_totalprice")).as("s")))
      .contains(state))
    assert(!planOf(orders.agg(count(lit(1)).as("n"),
      countDistinct(col("o_orderpriority")).as("d"))).contains(state))
  }

  test("global mv serving: a no-key rollup re-aggregates the view — " +
    "count/sum/max/avg and the keyed pull predicate all serve exactly") {
    Incremental.mvPrepare(spark, sfDir)
    // a global aggregate can be served by ANY orders view whose
    // aggregates cover it (first successful signature wins, all exact) —
    // accept the custkey rollup or the two-key status/priority view
    def anyState(plan: String): Boolean = Seq(
      Option(Incremental.mvStateDir(sfDir)),
      Option(Incremental.mvRefreshedStateDir(sfDir)),
      Option(Incremental.mvRollupStateDir(sfDir)))
      .flatten.exists(plan.contains)
    val state = Incremental.mvStateDir(sfDir)
    // count + sum + max + a derived expression over registered aggs
    def globalQ: DataFrame = Tables.orders(spark, sfDir)
      .agg(count(lit(1)).as("n"), sum(cents).as("sc"),
        max(cents).as("mx"), avg(cents).as("av"),
        (sum(cents) / lit(100.0)).as("total_price"))
    val (got, plan) = collected(enabled = true)(globalQ)
    assert(anyState(plan),
      s"global rollup must be served from a view state\n$plan")
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 1, s"expected 1 orders scan, got $ordersScans\n$plan")
    val (want, directPlan) = collected(enabled = false)(globalQ)
    assert(!directPlan.contains(state))
    assert(got == want)
    // pull shape: a group-key predicate below the global aggregate
    // reaches both branch scans, and the re-aggregate covers only the
    // matching groups
    def globalPull: DataFrame = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") <= 300)
      .agg(count(lit(1)).as("n"), sum(cents).as("sc"))
    val (gotP, planP) = collected(enabled = true)(globalPull)
    assert(anyState(planP), planP)
    val (wantP, _) = collected(enabled = false)(globalPull)
    assert(gotP == wantP)
    // empty-match pull: count must serve 0 (not NULL), sum/max NULL —
    // the exact global-aggregate-over-empty-input semantics
    def globalEmpty: DataFrame = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") <= -1)
      .agg(count(lit(1)).as("n"), sum(cents).as("sc"), max(cents).as("mx"))
    val (gotE, planE) = collected(enabled = true)(globalEmpty)
    assert(anyState(planE), planE)
    val (wantE, _) = collected(enabled = false)(globalEmpty)
    assert(gotE == wantE)
    val row = gotE.head
    assert(row.getLong(0) == 0L && row.isNullAt(1) && row.isNullAt(2), row)
  }

  test("mv rewrite: the gated queries' own frames equal their full " +
    "recomputes (the driver-oracle contract, asserted locally)") {
    val got = Incremental.entries("q_mv_rewrite").fn(spark, sfDir)
      .collect().toSet
    // the recompute must dodge the rewrite, or this compares the serving
    // plan with itself
    val (want, _) = collected(enabled = false)(userRollup)
    assert(got == want)
    val gotPull = Incremental.entries("q_mv_pull").fn(spark, sfDir)
      .collect().toSet
    val (wantPull, _) = collected(enabled = false)(
      Tables.orders(spark, sfDir)
        .filter(col("o_custkey") <= 300)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents).as("sum_price_cents")))
    assert(gotPull == wantPull)
  }

  test("mv rewrite composes: HAVING above the aggregate, and the " +
    "pure-SQL path over the same parquet both get served") {
    Incremental.mvPrepare(spark, sfDir)
    // HAVING sits ABOVE the aggregate: transformUp replaces the
    // aggregate underneath and the post-filter applies to the served
    // rows — no special-casing needed, asserted so it stays true
    def having: DataFrame = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 10)
    val (got, plan) = collected(enabled = true)(having)
    assert(plan.contains(Incremental.mvStateDir(sfDir)), plan)
    val (want, _) = collected(enabled = false)(having)
    assert(got == want)
    assert(got.nonEmpty)
    // the rule matches the LOGICAL shape, not the API that built it: a
    // pure-SQL SELECT over the same parquet path (different aliases,
    // count(1) spelling, explicit CAST) is served from the same state
    def sqlQ: DataFrame = spark.sql(
      s"""SELECT o_custkey, count(1) AS n,
         |  sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS sc
         |FROM parquet.`$sfDir/orders.parquet`
         |GROUP BY o_custkey""".stripMargin)
    val (gotSql, planSql) = collected(enabled = true)(sqlQ)
    assert(planSql.contains(Incremental.mvStateDir(sfDir)), planSql)
    val (wantSql, _) = collected(enabled = false)(sqlQ)
    assert(gotSql == wantSql)
  }

  test("mv rewrite serves avg(e) as sum/count over the merged partials " +
    "when both constituents are registered, bails when not") {
    Incremental.mvPrepare(spark, sfDir)
    def avgQ: DataFrame = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(avg(cents).as("a"), count(lit(1)).as("n"))
    val (got, plan) = collected(enabled = true)(avgQ)
    assert(plan.contains(Incremental.mvStateDir(sfDir)), plan)
    val (want, _) = collected(enabled = false)(avgQ)
    assert(got == want)
    // avg over an UNREGISTERED expression has no sum/count constituents
    val unserved = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(avg(col("o_totalprice")).as("a"))
    assert(!unserved.queryExecution.executedPlan.toString
      .contains(Incremental.mvStateDir(sfDir)))
  }

  test("a KSQL-dialect GROUP BY over orders is served from the MV state " +
    "(the pull-query-against-a-materialized-table story, end to end)") {
    import graft.ksql.Translator
    Incremental.mvPrepare(spark, sfDir)
    val catalog: Translator.Catalog = Map(
      "orders" -> Translator.Source(Tables.orders(spark, sfDir),
        "o_orderdate"))
    def ksqlDf: DataFrame = {
      val (_, Some(df)) = Translator.run(spark, catalog,
        "SELECT o_custkey, COUNT(*) AS n_orders FROM orders " +
          "GROUP BY o_custkey;"): @unchecked
      df
    }
    val (got, plan) = collected(enabled = true)(ksqlDf)
    assert(plan.contains(Incremental.mvStateDir(sfDir)),
      s"the translated aggregate must be served from state\n$plan")
    val (want, _) = collected(enabled = false)(ksqlDf)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("windowed mv: the plain daily-pane rollup is served from pane " +
    "state + ts-pushed delta, derived millis outputs map through") {
    Incremental.mvWindowPrepare(spark, sfDir)
    val evCents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    // the exact user shape — struct outputs projected to epoch millis
    // ABOVE the aggregate (CollapseProject may fold them INTO it; the
    // derived-output mapping must serve either shape)
    def daily: DataFrame = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(evCents).as("sum_cents"))
      .select(unix_millis(col("window.start")).as("ws"),
        unix_millis(col("window.end")).as("we"),
        col("event_type"), col("cnt"), col("sum_cents"))
    val (got, plan) = collected(enabled = true)(daily)
    assert(plan.contains(Incremental.mvWindowStateDir(sfDir)),
      s"windowed serving plan must scan the pane state\n$plan")
    val eventScans = "events\\.parquet".r.findAllIn(plan).length
    assert(eventScans == 1,
      s"expected 1 events scan (the delta), got $eventScans\n$plan")
    val (want, directPlan) = collected(enabled = false)(daily)
    assert(!directPlan.contains(Incremental.mvWindowStateDir(sfDir)))
    assert(got == want)
    assert(got.nonEmpty)
    // the mid-window cutoff means at least one pane merged a state
    // partial WITH a delta partial — otherwise this proved an append
    val cutoffPane = spark.sql(
      "SELECT unix_millis(date_trunc('DAY', TIMESTAMP'2024-01-25 12:00:00'))")
      .collect()(0).getLong(0)
    assert(got.exists(_.getLong(0) == cutoffPane),
      "the straddled pane must appear in the served result")
  }

  test("windowed mv bails out: a different pane size and a non-window " +
    "events rollup pass through unrewritten") {
    Incremental.mvWindowPrepare(spark, sfDir)
    val state = Incremental.mvWindowStateDir(sfDir)
    def planOf(df: DataFrame): String =
      df.queryExecution.executedPlan.toString
    // hourly panes are NOT the registered daily view
    assert(!planOf(Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))).contains(state))
    // same aggregates without the window key: different group signature
    assert(!planOf(Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))).contains(state))
  }

  test("mv registration guards: group-only delta predicate and decimal " +
    "sums are rejected") {
    intercept[IllegalArgumentException] {
      MaterializedViews.register(spark, "bad_delta_pred",
        base = sp => Tables.orders(sp, sfDir),
        stateDir = "/tmp/never-written",
        deltaPred = col("o_custkey") > 100, // group-only: would recurse
        groupCols = Seq(col("o_custkey")),
        aggCols = Seq(count(lit(1)).as("n")))
    }
    intercept[IllegalArgumentException] {
      MaterializedViews.register(spark, "bad_decimal",
        base = sp => Tables.orders(sp, sfDir),
        stateDir = "/tmp/never-written",
        deltaPred = col("o_orderdate") >= lit("2001-01-01").cast("timestamp"),
        groupCols = Seq(col("o_custkey")),
        aggCols = Seq(sum(col("o_totalprice").cast("decimal(18,2)")).as("s")))
    }
    assert(!MaterializedViews.registered.contains("bad_delta_pred"))
    assert(!MaterializedViews.registered.contains("bad_decimal"))
  }

  test("the served-rewrites counter moves when a query routes through " +
    "the view, and stays put for unserved queries") {
    Incremental.mvPrepare(spark, sfDir)
    val name = s"orders_rollup_$sfDir"
    val before = MaterializedViews.servedCounts.getOrElse(name, 0L)
    val (_, plan) = collected(enabled = true)(userRollup)
    assert(plan.contains(Incremental.mvStateDir(sfDir)))
    val after = MaterializedViews.servedCounts.getOrElse(name, 0L)
    assert(after > before, s"counter must move on a served rewrite " +
      s"($before -> $after)")
    // an unserved shape leaves the counter alone
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority")).agg(sum(col("o_totalprice")).as("s"))
      .queryExecution.executedPlan
    assert(MaterializedViews.servedCounts.getOrElse(name, 0L) == after)
  }

  test("SHOW MATERIALIZED VIEWS surfaces the MV catalog in the dialect") {
    import graft.ksql.Translator
    Incremental.mvPrepare(spark, sfDir)
    val (_, Some(df)) = Translator.run(spark, Map.empty,
      "SHOW MATERIALIZED VIEWS;"): @unchecked
    val rows = df.collect().map(r => (r.getString(0), r.getString(2)))
    assert(rows.exists { case (n, g) =>
      n == s"orders_rollup_$sfDir" && g == "o_custkey" }, rows.toSeq)
  }

  test("hopping mv: the sliding-pane rollup (an Expand plan) is served " +
    "from pane state, and the shape key separates it from the daily view") {
    Incremental.mvWindowPrepare(spark, sfDir)
    Incremental.mvHoppingPrepare(spark, sfDir)
    val evCents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    def hopping: DataFrame = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(evCents).as("sum_cents"))
      .select(unix_millis(col("window.start")).as("ws"),
        col("event_type"), col("cnt"), col("sum_cents"))
    val (got, plan) = collected(enabled = true)(hopping)
    assert(plan.contains(Incremental.mvHoppingStateDir(sfDir)),
      s"hopping serving plan must scan the hopping pane state\n$plan")
    assert(!plan.contains(Incremental.mvWindowStateDir(sfDir)),
      "the DAILY view must not serve a hopping query (shape key)")
    val eventScans = "events\\.parquet".r.findAllIn(plan).length
    assert(eventScans == 1, s"expected 1 events scan, got $eventScans\n$plan")
    val (want, _) = collected(enabled = false)(hopping)
    assert(got == want)
    assert(got.nonEmpty)
    // and the tumbling daily query still routes to the DAILY view, never
    // the hopping one — shapes are disjoint in both directions
    def daily: DataFrame = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val (_, dailyPlan) = collected(enabled = true)(daily)
    assert(dailyPlan.contains(Incremental.mvWindowStateDir(sfDir)), dailyPlan)
    assert(!dailyPlan.contains(Incremental.mvHoppingStateDir(sfDir)))
    // a DIFFERENT slide over the same size matches neither
    def otherSlide: DataFrame = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val (_, osPlan) = collected(enabled = true)(otherSlide)
    assert(!osPlan.contains(Incremental.mvHoppingStateDir(sfDir)))
  }

  test("two views over the SAME base: each query is served by the view " +
    "whose signature matches, not just the first registered") {
    Incremental.mvPrepare(spark, sfDir)
    // a second rollup over the same orders parquet, different group key
    val prioState = java.nio.file.Files
      .createTempDirectory("mv_orders_prio").toString
    val dateType =
      Tables.orders(spark, sfDir).schema("o_orderdate").dataType.catalogString
    val cutoff = lit("2001-01-01").cast(dateType)
    Tables.orders(spark, sfDir).filter(col("o_orderdate") < cutoff)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(prioState)
    MaterializedViews.register(spark, s"orders_by_prio_$sfDir",
      base = sp => Tables.orders(sp, sfDir),
      stateDir = prioState,
      deltaPred = col("o_orderdate") >= cutoff,
      groupCols = Seq(col("o_orderpriority")),
      aggCols = Seq(count(lit(1)).as("n")))
    def byPrio: DataFrame = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val (got, plan) = collected(enabled = true)(byPrio)
    assert(plan.contains(prioState),
      s"the priority view must serve its own signature\n$plan")
    val (want, _) = collected(enabled = false)(byPrio)
    assert(got == want)
    // and the custkey rollup still routes to the ORIGINAL view
    val (_, plan2) = collected(enabled = true)(userRollup)
    assert(plan2.contains(Incremental.mvStateDir(sfDir)), plan2)
    assert(!plan2.contains(prioState), plan2)
  }

  test("degenerate cutoffs: an all-delta view (empty state) and an " +
    "all-state view (empty delta) both serve the exact recompute") {
    val dateType =
      Tables.orders(spark, sfDir).schema("o_orderdate").dataType.catalogString
    def mk(name: String, cutoff: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(name).toString
      val c = lit(cutoff).cast(dateType)
      Tables.orders(spark, sfDir).filter(col("o_orderdate") < c)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(dir)
      MaterializedViews.register(spark, name,
        base = sp => Tables.orders(sp, sfDir), stateDir = dir,
        deltaPred = col("o_orderdate") >= c,
        groupCols = Seq(col("o_custkey")),
        aggCols = Seq(count(lit(1)).as("n")))
      MaterializedViews.install(spark)
      dir
    }
    def q: DataFrame = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val (want, _) = collected(enabled = false)(q)
    // isolate the registry: the main orders view would otherwise also
    // match this query and routing could serve from it instead
    MaterializedViews.clear()
    // all-delta: the cutoff predates the whole calendar — the state
    // parquet is an EMPTY (schema-only) artifact, everything streams
    // through the delta branch
    val d1 = mk("mv_all_delta", "1990-01-01")
    val (g1, p1) = collected(enabled = true)(q)
    assert(p1.contains(d1), p1)
    assert(g1 == want)
    MaterializedViews.clear()
    // all-state: the cutoff postdates the calendar — the delta scan
    // matches zero rows and the view serves purely from state
    val d2 = mk("mv_all_state", "2031-01-01")
    val (g2, p2) = collected(enabled = true)(q)
    assert(p2.contains(d2), p2)
    assert(g2 == want)
    MaterializedViews.clear()
    Incremental.mvPrepare(spark, sfDir) // restore for later tests
  }

  test("grouping-sets serving: ROLLUP/CUBE over a registered view union " +
    "per-set re-aggregates of the state; grouping_id folds per branch; " +
    "unregistered keys and distinct aggregates bail") {
    Incremental.mvRollupPrepare(spark, sfDir)
    val state = Incremental.mvRollupStateDir(sfDir)
    def rollQ: DataFrame = Tables.orders(spark, sfDir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(cents).as("sc"),
        max(cents).as("mx"), avg(cents).as("av"))
    val (got, plan) = collected(enabled = true)(rollQ)
    assert(plan.contains(state),
      s"rollup must be served from the two-key view state\n$plan")
    assert(plan.contains("Union"), plan)
    val (want, directPlan) = collected(enabled = false)(rollQ)
    assert(!directPlan.contains(state))
    assert(got == want)
    assert(got.nonEmpty)
    // identical serving branches dedupe at runtime: AQE's final plan
    // reuses the canonical-equal delta exchanges/stages, so the three
    // branch subtrees cost ONE scan execution (assert on the
    // post-execution adaptive plan — the static text can't show reuse)
    spark.conf.set("spark.graft.mv.enabled", "true")
    val finalPlan = try {
      val df = rollQ
      df.collect()
      df.queryExecution.executedPlan.toString
    } finally spark.conf.unset("spark.graft.mv.enabled")
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
    assert(finalPlan.contains("Reused") || finalPlan.contains("reused"),
      s"branch exchanges must dedupe at runtime\n$finalPlan")
    // CUBE (4 sets over 2 keys) with grouping_id() through pure SQL —
    // the gid-derived outputs fold to literals per branch
    def cubeQ: DataFrame = spark.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         |  grouping(o_orderstatus) AS g1, grouping_id() AS gid,
         |  count(1) AS n,
         |  sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS sc
         |FROM parquet.`$sfDir/orders.parquet`
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)
    val (gotC, planC) = collected(enabled = true)(cubeQ)
    assert(planC.contains(state), planC)
    val (wantC, _) = collected(enabled = false)(cubeQ)
    assert(gotC == wantC)
    // bail-outs: a rollup including an UNREGISTERED key, and a distinct
    // aggregate inside a rollup, both pass through unrewritten
    def planOf(df: DataFrame): String =
      df.queryExecution.executedPlan.toString
    assert(!planOf(Tables.orders(spark, sfDir)
      .rollup(col("o_orderstatus"), col("o_orderkey"))
      .agg(count(lit(1)).as("n"))).contains(state))
    assert(!planOf(Tables.orders(spark, sfDir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))).contains(state))
    // an aggregate over a SET-KEY copy has per-set null semantics the
    // view cannot reproduce — must bail, not serve wrong subtotals
    assert(!planOf(Tables.orders(spark, sfDir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(col("o_orderpriority")).as("n"))).contains(state))
  }

  test("pair-set DISTINCT view: a plain countDistinct rollup is served " +
    "from distinct pairs; pull predicate pushes; refresh folds pairs; " +
    "retraction and mixed registrations refuse") {
    Incremental.mvDistinctPrepare(spark, sfDir)
    val state = Incremental.mvDistinctStateDir(sfDir)
    def q: DataFrame = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val (got, plan) = collected(enabled = true)(q)
    assert(plan.contains(state),
      s"distinct rollup must serve from the pair-set state\n$plan")
    val eventScans = "events\\.parquet".r.findAllIn(plan).length
    assert(eventScans == 1, s"expected 1 events scan, got $eventScans\n$plan")
    val (want, directPlan) = collected(enabled = false)(q)
    assert(!directPlan.contains(state))
    assert(got == want)
    assert(got.nonEmpty)
    // pull predicate on the plain group column filters both branches
    def pull: DataFrame = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val (gotP, planP) = collected(enabled = true)(pull)
    assert(planP.contains(state), planP)
    val (wantP, _) = collected(enabled = false)(pull)
    assert(gotP == wantP)
    // a GLOBAL count(distinct) must NOT be served (sum of per-group
    // distincts is not the global distinct; pair-level state isn't in
    // the re-aggregate's reach)
    val globalPlan = {
      spark.conf.set("spark.graft.mv.enabled", "true")
      try Tables.events(spark, sfDir)
        .agg(countDistinct(col("user_id")).as("n"))
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(!globalPlan.contains(state), globalPlan)
    // refresh folds moved pairs and serving still matches
    val newDir = java.nio.file.Files
      .createTempDirectory("mv_dist_refresh").toString
    MaterializedViews.refresh(spark, s"events_distinct_$sfDir",
      col("ts") >= lit("2024-01-28").cast("timestamp"), newDir)
    val (got2, plan2) = collected(enabled = true)(q)
    assert(plan2.contains(newDir), plan2)
    assert(got2 == want)
    // retraction refuses with the multiplicity explanation
    val e = intercept[IllegalArgumentException] {
      MaterializedViews.refreshWithDeletes(spark, s"events_distinct_$sfDir",
        col("ts") >= lit("2024-01-28").cast("timestamp"),
        col("event_id") % 7 === 0, "/tmp/never-written-dist")
    }
    assert(e.getMessage.contains("multiplicity"), e.getMessage)
    // mixed distinct + partial aggregates refuse registration
    val e2 = intercept[IllegalArgumentException] {
      MaterializedViews.register(spark, "bad_mixed_distinct",
        base = sp => Tables.events(sp, sfDir),
        stateDir = "/tmp/never-written-mixed",
        deltaPred = col("ts") >= lit("2024-01-25").cast("timestamp"),
        groupCols = Seq(col("event_type")),
        aggCols = Seq(countDistinct(col("user_id")).as("nd"),
          count(lit(1)).as("n")))
    }
    assert(e2.getMessage.contains("pair-set"), e2.getMessage)
    // restore the standard registration for later tests / gated queries
    MaterializedViews.drop(s"events_distinct_$sfDir")
    Incremental.mvDistinctPrepare(spark, sfDir)
  }

  test("multi-view UNION serving: one query unioning two registered " +
    "rollups gets BOTH branches substituted in a single plan") {
    Incremental.mvPrepare(spark, sfDir)
    Incremental.mvWindowPrepare(spark, sfDir)
    // a UNION ALL whose two branches are plain rollups over DIFFERENT
    // registered bases — transformUp visits each Aggregate
    // independently, so both serve from their own state with no
    // UNION-specific machinery (asserted so it stays true)
    def u: DataFrame = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"))
      .unionByName(Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("cnt")))
    val (got, plan) = collected(enabled = true)(u)
    assert(plan.contains(Incremental.mvStateDir(sfDir)),
      s"the orders branch must serve from its state\n$plan")
    assert(plan.contains(Incremental.mvWindowStateDir(sfDir)),
      s"the events branch must serve from the pane state\n$plan")
    val (want, _) = collected(enabled = false)(u)
    // multiset compare too: UNION ALL keeps duplicate counts
    val gotL = u.collect().toSeq.map(_.getLong(0)).sorted
    spark.conf.set("spark.graft.mv.enabled", "false")
    val wantL = try u.collect().toSeq.map(_.getLong(0)).sorted
      finally spark.conf.unset("spark.graft.mv.enabled")
    assert(gotL == wantL)
    assert(got.nonEmpty && want.nonEmpty)
  }

  test("coverage guard: a delta predicate that NULL-evaluates on a base " +
    "row is refused at registration (the round-12 ADVICE hole)") {
    import spark.implicits._
    // a base with a NULL in the delta column: the complement-built state
    // and the delta branch would BOTH miss that row
    val dir = java.nio.file.Files.createTempDirectory("mv_nullbase").toString
    Seq((1L, Some(10L), 5.0), (2L, None, 7.0), (3L, Some(30L), 9.0))
      .toDF("k", "pos", "x").write.mode("overwrite").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      MaterializedViews.register(spark, "null_delta_base",
        base = sp => sp.read.parquet(dir),
        stateDir = "/tmp/never-written-null",
        deltaPred = col("pos") >= 20L,
        groupCols = Seq(col("k")),
        aggCols = Seq(count(lit(1)).as("n"), sum(col("pos")).as("sp")))
    }
    assert(ex.getMessage.contains("NULL"), ex.getMessage)
    assert(!MaterializedViews.registered.contains("null_delta_base"))
    // a TOTAL spelling of the same predicate over the same base is fine
    val stDir = java.nio.file.Files.createTempDirectory("mv_nullst").toString
    spark.read.parquet(dir)
      .filter(!(coalesce(col("pos"), lit(Long.MinValue)) >= 20L))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("sp"))
      .write.mode("overwrite").parquet(stDir)
    MaterializedViews.register(spark, "null_delta_total",
      base = sp => sp.read.parquet(dir),
      stateDir = stDir,
      deltaPred = coalesce(col("pos"), lit(Long.MinValue)) >= 20L,
      groupCols = Seq(col("k")),
      aggCols = Seq(count(lit(1)).as("n"), sum(col("pos")).as("sp")))
    assert(MaterializedViews.registered.contains("null_delta_total"))
  }

  test("kill switch accepts FALSE/False/0 spellings (emergency-disable " +
    "must not be case-sensitive)") {
    Incremental.mvPrepare(spark, sfDir)
    for (off <- Seq("FALSE", "False", "0", " false ")) {
      spark.conf.set("spark.graft.mv.enabled", off)
      try {
        val plan = userRollup.queryExecution.executedPlan.toString
        assert(!plan.contains(Incremental.mvStateDir(sfDir)),
          s"spelling '$off' must disable the rewrite")
      } finally spark.conf.unset("spark.graft.mv.enabled")
    }
  }

  test("CREATE MATERIALIZED VIEW through the dialect: the DDL builds the " +
    "state artifact, registers the rewrite, and a plain dialect rollup " +
    "is served (plan-pinned); DROP unregisters; re-CREATE reuses state") {
    import graft.ksql.{KsqlQueries, Translator}
    val t = KsqlQueries.mvDdlDir(spark, sfDir)
    val name = KsqlQueries.mvDdlName(sfDir)
    assert(MaterializedViews.registered.contains(name))
    def parts: Int = Option(new java.io.File(s"$t/state").listFiles())
      .toSeq.flatten.count(_.getName.startsWith("part-"))
    assert(parts > 0, "the DDL must have built the state artifact")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    def q: DataFrame = {
      val (_, Some(df)) =
        Translator.run(spark, c1, KsqlQueries.mvDdlPullQuery): @unchecked
      df
    }
    val (got, plan) = collected(enabled = true)(q)
    assert(plan.contains(s"$t/state"),
      s"the dialect pull query must be served from the DDL's state\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"the delta scan must push the DDL's cutoff\n$plan")
    val (want, _) = collected(enabled = false)(q)
    assert(got == want)
    assert(got.nonEmpty)
    // SHOW MATERIALIZED VIEWS lists the DDL-created view
    val (_, Some(shows)) = Translator.run(spark, Map.empty,
      "SHOW MATERIALIZED VIEWS;"): @unchecked
    assert(shows.collect().exists(_.getString(0) == name))
    // idempotent re-CREATE (the command-log replay posture): no error,
    // no state rebuild
    val nBefore = parts
    Translator.run(spark, c1, KsqlQueries.mvDdlStatement(sfDir, t))
    assert(parts == nBefore, "replaying the CMV must not rebuild state")
    // DROP unregisters; a second DROP without IF EXISTS errors; with
    // IF EXISTS it is quiet
    Translator.run(spark, Map.empty, s"DROP MATERIALIZED VIEW $name;")
    assert(!MaterializedViews.registered.contains(name))
    intercept[IllegalArgumentException] {
      Translator.run(spark, Map.empty, s"DROP MATERIALIZED VIEW $name;")
    }
    Translator.run(spark, Map.empty, s"DROP MATERIALIZED VIEW IF EXISTS $name;")
    // re-CREATE against the EXISTING artifact: registration only (the
    // late-joiner path — state is never rewritten), serving resumes
    Translator.run(spark, c1, KsqlQueries.mvDdlStatement(sfDir, t))
    assert(MaterializedViews.registered.contains(name))
    assert(parts == nBefore)
    val (got2, plan2) = collected(enabled = true)(q)
    assert(plan2.contains(s"$t/state"), plan2)
    assert(got2 == want)
  }

  test("CMV with a WHERE definition: the filter folds into both serving " +
    "branches, a matching user query serves, a filterless one bails; " +
    "and a GLOBAL dialect pull query re-aggregates the DDL view") {
    import graft.ksql.{KsqlQueries, Translator}
    val t = java.nio.file.Files.createTempDirectory("mv_ddl_where").toString
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW open_orders_mv WITH (
         |  STATE_DIR='$t/state',
         |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
         |SELECT o_orderpriority, COUNT(*) AS n
         |FROM orders_src WHERE o_orderstatus = 'O'
         |GROUP BY o_orderpriority""".stripMargin)
    assert(MaterializedViews.registered.contains("open_orders_mv"))
    def q(where: String): DataFrame = {
      val (_, Some(df)) = Translator.run(spark, c1,
        s"""SELECT o_orderpriority, COUNT(*) AS n
           |FROM orders_src $where GROUP BY o_orderpriority""".stripMargin)
        : @unchecked
      df
    }
    // the definition's WHERE is part of the matched signature: the same
    // filter serves, its absence bails (different semantics)
    val (got, plan) = collected(enabled = true)(q("WHERE o_orderstatus = 'O'"))
    assert(plan.contains(s"$t/state"), plan)
    val (want, _) = collected(enabled = false)(q("WHERE o_orderstatus = 'O'"))
    assert(got == want && got.nonEmpty)
    val (_, planNoWhere) = collected(enabled = true)(q(""))
    assert(!planNoWhere.contains(s"$t/state"),
      "a filterless rollup must NOT be served from the filtered view")
    // a GLOBAL dialect aggregate over the filtered base re-aggregates
    def g: DataFrame = {
      val (_, Some(df)) = Translator.run(spark, c1,
        "SELECT COUNT(*) AS n FROM orders_src WHERE o_orderstatus = 'O'")
        : @unchecked
      df
    }
    val (gotG, planG) = collected(enabled = true)(g)
    // ANY view whose signature covers the query may serve: the WHERE
    // view directly, or the two-key status/priority view with the
    // filter as a pull predicate — both exact, first match wins
    val servedFromState = planG.contains(s"$t/state") ||
      Option(Incremental.mvRollupStateDir(sfDir)).exists(planG.contains)
    assert(servedFromState,
      s"the dialect global pull must re-aggregate a view\n$planG")
    val (wantG, _) = collected(enabled = false)(g)
    assert(gotG == wantG)
    Translator.run(spark, Map.empty,
      "DROP MATERIALIZED VIEW IF EXISTS open_orders_mv;")
  }

  test("windowed CREATE MATERIALIZED VIEW: a WINDOW TUMBLING definition " +
    "registers the pane view and the dialect's windowed pull query is " +
    "served from pane state") {
    import graft.ksql.Translator
    val t = java.nio.file.Files.createTempDirectory("mv_ddl_win").toString
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM ev_src WITH (PATH='$sfDir/events.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW ev_daily_ddl WITH (
         |  STATE_DIR='$t/state',
         |  DELTA='ts >= TIMESTAMP ''2024-01-25 12:00:00''') AS
         |SELECT event_type, COUNT(*) AS cnt
         |FROM ev_src WINDOW TUMBLING (SIZE 3 HOURS)
         |GROUP BY event_type""".stripMargin)
    assert(MaterializedViews.registered.contains("ev_daily_ddl"))
    def q: DataFrame = {
      val (_, Some(df)) = Translator.run(spark, c1,
        """SELECT event_type, WINDOWSTART AS ws, COUNT(*) AS cnt
          |FROM ev_src WINDOW TUMBLING (SIZE 3 HOURS)
          |GROUP BY event_type""".stripMargin): @unchecked
      df
    }
    val (got, plan) = collected(enabled = true)(q)
    assert(plan.contains(s"$t/state"),
      s"the windowed dialect pull must serve from pane state\n$plan")
    val (want, _) = collected(enabled = false)(q)
    assert(got == want)
    assert(got.nonEmpty)
    // SESSION windows register through their own path (round 15 —
    // interval-record state, named-pull serving; SessionMvSpec covers
    // the full surface). Here: the DDL registers and the state is
    // interval records, NOT per-key partials.
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW ev_sess_ddl WITH (
         |  STATE_DIR='$t/s2', DELTA='ts >= TIMESTAMP ''2024-01-25''') AS
         |SELECT user_id, COUNT(*) AS cnt
         |FROM ev_src WINDOW SESSION (6 HOURS)
         |GROUP BY user_id""".stripMargin)
    assert(MaterializedViews.registered.contains("ev_sess_ddl"))
    assert(spark.read.parquet(s"$t/s2").columns.contains("__first_ms"))
    Translator.run(spark, Map.empty,
      "DROP MATERIALIZED VIEW IF EXISTS ev_sess_ddl;")
    Translator.run(spark, Map.empty,
      "DROP MATERIALIZED VIEW IF EXISTS ev_daily_ddl;")
  }

  test("CREATE MATERIALIZED VIEW guards: missing WITH props, self-joins, " +
    "unaliased aggregates, and no GROUP BY are refused") {
    import graft.ksql.Translator
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    def bad(stmt: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Translator.run(spark, c1, stmt)
      }
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"$stmt -> ${e.getMessage}")
    }
    bad("CREATE MATERIALIZED VIEW g1 AS SELECT o_orderstatus, COUNT(*) AS n " +
      "FROM orders_src GROUP BY o_orderstatus", "STATE_DIR")
    bad("CREATE MATERIALIZED VIEW g2 WITH (STATE_DIR='/tmp/g2') AS " +
      "SELECT o_orderstatus, COUNT(*) AS n FROM orders_src " +
      "GROUP BY o_orderstatus", "DELTA")
    bad("CREATE MATERIALIZED VIEW g3 WITH (STATE_DIR='/tmp/g3', " +
      "DELTA='o_orderkey >= 0') AS SELECT COUNT(*) AS n FROM orders_src",
      "GROUP BY")
    bad("CREATE MATERIALIZED VIEW g4 WITH (STATE_DIR='/tmp/g4', " +
      "DELTA='o_orderkey >= 0') AS SELECT o_orderstatus, COUNT(*) " +
      "FROM orders_src GROUP BY o_orderstatus", "alias")
    // INNER equi-joins over DISTINCT tables register (round 15, the
    // join-view DDL) — but a SELF-join still refuses at unwrap (shared
    // paths make name-based inlining ambiguous)
    bad("CREATE MATERIALIZED VIEW g5 WITH (STATE_DIR='/tmp/g5', " +
      "DELTA='o_orderkey >= 0') AS SELECT o_orderstatus, COUNT(*) AS n " +
      "FROM orders_src JOIN orders_src o2 ON o_orderkey = o2.o_orderkey " +
      "GROUP BY o_orderstatus", "self-join")
    assert(!MaterializedViews.registered.exists(_.startsWith("g")))
  }

  test("retraction refresh: subtract+argmax-repair equals the full " +
    "recompute over surviving rows, served from the refreshed state") {
    Incremental.mvDeletePrepare(spark, sfDir)
    val cents = floor(col("o_totalprice") * lit(100.0) + lit(0.5))
      .cast("long")
    def userQ: DataFrame = Tables.orders(spark, sfDir)
      .groupBy((col("o_custkey") % 1000).as("cust_mod"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"),
        max(cents).as("max_cents"), min(cents).as("min_cents"))
    val (got, plan) = collected(enabled = true)(userQ)
    assert(plan.contains(Incremental.mvDeleteRefreshedDir(sfDir)),
      s"must serve from the retraction-refreshed state\n$plan")
    assert(!plan.contains(Incremental.mvDeleteStateDir(sfDir)),
      "the pre-delete state artifact must have left the serving plan")
    assert(plan.contains("2001-06-01"),
      s"the delta scan must carry the ADVANCED cutoff\n$plan")
    // the oracle semantics: full recompute MINUS the retracted rows
    val want = Tables.orders(spark, sfDir)
      .filter(!(col("o_orderkey") % 97 === 0 &&
        col("o_orderdate") < lit("2001-06-01").cast("timestamp")))
      .groupBy((col("o_custkey") % 1000).as("cust_mod"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"),
        max(cents).as("max_cents"), min(cents).as("min_cents"))
      .collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
    // only argmax/argmin-touched groups recomputed — a strict subset
    val touched = Incremental.mvDeleteTouched.get(sfDir)
    assert(touched != null, "prepare must record the touched-group count")
    assert(touched < got.size,
      s"repair must be pruned: $touched touched of ${got.size} groups")
  }

  test("retraction refresh regimes: deleted max repairs, deleted min " +
    "repairs, subtract-only, emptied group leaves, untouched passthrough") {
    import spark.implicits._
    import graft.plans.{MaterializedViews => MV}
    // base: group 1 loses its MAX row; group 2 loses its MIN row;
    // group 3 loses a middle row (subtract only); group 4 loses ALL
    // pre-cutoff rows (leaves the view — it has no delta rows either);
    // group 5 untouched. pos >= 100 is the delta region; del = flag.
    val rows = Seq(
      // (k, pos, x, del)
      (1L, 1L, 100L, true), (1L, 2L, 50L, false), (1L, 3L, 10L, false),
      (2L, 1L, 5L, true), (2L, 2L, 50L, false), (2L, 3L, 90L, false),
      (3L, 1L, 40L, true), (3L, 2L, 20L, false), (3L, 3L, 80L, false),
      (4L, 1L, 70L, true), (4L, 2L, 60L, true),
      (5L, 1L, 30L, false), (5L, 2L, 35L, false),
      // delta-region rows (pos >= 100), never deleted
      (1L, 100L, 7L, false), (5L, 101L, 95L, false))
    val dir = java.nio.file.Files.createTempDirectory("mv_del_syn").toString
    rows.toDF("k", "pos", "x", "del")
      .write.mode("overwrite").parquet(dir)
    val aggs = Seq(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      max(col("x")).as("mx"), min(col("x")).as("mn"))
    val st = java.nio.file.Files.createTempDirectory("mv_del_syn_st").toString
    spark.read.parquet(dir).filter(col("pos") < 100L)
      .groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(st)
    MV.register(spark, "syn_retract",
      base = sp => sp.read.parquet(dir),
      stateDir = st, deltaPred = col("pos") >= 100L,
      groupCols = Seq(col("k")), aggCols = aggs)
    val newSt = java.nio.file.Files.createTempDirectory("mv_del_syn_r")
      .toString
    // cutoff stays (newPred == oldPred): a PURE retraction refresh
    val touched = MV.refreshWithDeletes(spark, "syn_retract",
      newDeltaPred = col("pos") >= 100L, deletePred = col("del"),
      newStateDir = newSt)
    // groups 1 (max deleted) and 2 (min deleted) recompute; 4 counts as
    // touched too (a fully-retracted group's extremum was trivially
    // deleted; its NULL repair is dropped by the count filter);
    // 3 subtracts without recompute; 5 passes through untouched
    assert(touched == 3L, s"expected exactly 3 argmax-touched groups, " +
      s"got $touched")
    val state = spark.read.parquet(newSt)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(state(1L) == ((2L, 60L, 50L, 10L)), state.get(1L).toString)
    assert(state(2L) == ((2L, 140L, 90L, 50L)), state.get(2L).toString)
    assert(state(3L) == ((2L, 100L, 80L, 20L)), state.get(3L).toString)
    assert(!state.contains(4L), "a fully-retracted group must leave")
    assert(state(5L) == ((2L, 65L, 35L, 30L)), state.get(5L).toString)
    // and the VIEW still serves the exact recompute-minus-deleted
    def q: DataFrame = spark.read.parquet(dir)
      .groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    val (got, plan) = collected(enabled = true)(q)
    assert(plan.contains(newSt), plan)
    val want = spark.read.parquet(dir).filter(!col("del"))
      .groupBy(col("k")).agg(aggs.head, aggs.tail: _*).collect().toSet
    assert(got == want)
    MaterializedViews.clear()
    Incremental.mvPrepare(spark, sfDir) // restore for later tests
  }

  test("retraction refresh guards: delta-overlapping deletes, missing " +
    "count partial, and double sums are all refused") {
    import spark.implicits._
    import graft.plans.{MaterializedViews => MV}
    val dir = java.nio.file.Files.createTempDirectory("mv_del_g").toString
    Seq((1L, 1L, 1.5, false), (1L, 150L, 2.5, true))
      .toDF("k", "pos", "x", "del").write.mode("overwrite").parquet(dir)
    def mk(name: String, aggs: Seq[org.apache.spark.sql.Column]): Unit = {
      val st = java.nio.file.Files.createTempDirectory(s"mv_del_g_$name")
        .toString
      spark.read.parquet(dir).filter(col("pos") < 100L)
        .groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(st)
      MV.register(spark, name, base = sp => sp.read.parquet(dir),
        stateDir = st, deltaPred = col("pos") >= 100L,
        groupCols = Seq(col("k")), aggCols = aggs)
    }
    // a delete inside the (unchanged) delta region: refused
    mk("g_overlap", Seq(count(lit(1)).as("n"), max(col("pos")).as("m")))
    val e1 = intercept[IllegalArgumentException] {
      MV.refreshWithDeletes(spark, "g_overlap", col("pos") >= 100L,
        col("del"), "/tmp/never-written-g1")
    }
    assert(e1.getMessage.contains("overlap"), e1.getMessage)
    // no COUNT partial: emptied groups undetectable — refused
    mk("g_nocount", Seq(max(col("pos")).as("m")))
    val e2 = intercept[IllegalArgumentException] {
      MV.refreshWithDeletes(spark, "g_nocount", col("pos") >= 100L,
        col("pos") < 0L, "/tmp/never-written-g2")
    }
    assert(e2.getMessage.contains("COUNT"), e2.getMessage)
    // double SUM partial: subtraction drifts — refused
    mk("g_double", Seq(count(lit(1)).as("n"), sum(col("x")).as("sx")))
    val e3 = intercept[IllegalArgumentException] {
      MV.refreshWithDeletes(spark, "g_double", col("pos") >= 100L,
        col("pos") < 0L, "/tmp/never-written-g3")
    }
    assert(e3.getMessage.contains("integral"), e3.getMessage)
    MaterializedViews.clear()
    Incremental.mvPrepare(spark, sfDir)
  }

  // LAST deliberately: refresh mutates the shared registration, and the
  // earlier tests assert serving from the pre-refresh state artifact
  test("mv refresh: folding the delta into a new state artifact advances " +
    "the cutoff and serving still equals the recompute") {
    Incremental.mvPrepare(spark, sfDir)
    val (before, planBefore) = collected(enabled = true)(userRollup)
    assert(planBefore.contains(Incremental.mvStateDir(sfDir)))
    Incremental.mvRefresh(spark, sfDir)
    val (after, planAfter) = collected(enabled = true)(userRollup)
    assert(planAfter.contains(Incremental.mvRefreshedStateDir(sfDir)),
      s"post-refresh serving must read the refreshed state\n$planAfter")
    assert(!planAfter.contains(Incremental.mvStateDir(sfDir)),
      "the old state artifact must have left the serving plan")
    assert(planAfter.contains("2001-06-01"),
      s"the delta scan must carry the ADVANCED cutoff\n$planAfter")
    val (want, _) = collected(enabled = false)(userRollup)
    assert(before == want)
    assert(after == want)
  }

  // ─── round 14: join views, counted pair-set retraction, dialect
  //     REFRESH, validate-before-build ─────────────────────────────────

  test("join-view mv: the plain orders ⋈ customer rollup is served from " +
    "state + ONE date-pushed orders scan; the pull predicate reaches " +
    "both branches; values equal the direct join") {
    Incremental.mvJoinPrepare(spark, sfDir)
    val state = Incremental.mvJoinStateDir(sfDir)
    def joinRollup: DataFrame = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents).as("sum_cents"),
        max(cents).as("max_cents"))
    val (got, plan) = collected(enabled = true)(joinRollup)
    assert(plan.contains(state),
      s"join rollup must serve from the view state\n$plan")
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 1,
      s"expected 1 (delta) orders scan, got $ordersScans\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"the delta's orders scan must push the cutoff\n$plan")
    // the dim joins the DELTA branch only — one customer scan
    val custScans = "customer\\.parquet".r.findAllIn(plan).length
    assert(custScans == 1, s"expected 1 customer scan, got $custScans\n$plan")
    val (want, directPlan) = collected(enabled = false)(joinRollup)
    assert(!directPlan.contains(state))
    assert(got == want)
    assert(got.nonEmpty)
    // pull predicate on the dim-side group column serves and matches
    def pull: DataFrame = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") <= 10)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"),
        max(cents).as("max_cents"))
    val (gotP, planP) = collected(enabled = true)(pull)
    assert(planP.contains(state), planP)
    val (wantP, _) = collected(enabled = false)(pull)
    assert(gotP == wantP)
    assert(gotP.nonEmpty)
  }

  test("join-view mv bail-outs: different join keys, OUTER join, " +
    "non-equi condition, non-group filter, different grouping — all " +
    "pass through unrewritten") {
    Incremental.mvJoinPrepare(spark, sfDir)
    val state = Incremental.mvJoinStateDir(sfDir)
    def planOf(df: DataFrame): String =
      df.queryExecution.executedPlan.toString
    val orders = Tables.orders(spark, sfDir)
    def cust = Tables.customer(spark, sfDir)
    def rollup(j: DataFrame): DataFrame =
      j.groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
    // a DIFFERENT join condition is a different shape — never matches
    assert(!planOf(rollup(orders.join(cust,
      col("o_custkey") === col("c_nationkey")))).contains(state))
    // outer joins refuse (null-extension breaks partial-delta algebra)
    assert(!planOf(rollup(orders.join(cust,
      col("o_custkey") === col("c_custkey"), "left"))).contains(state))
    // non-equi joins never unwrap
    assert(!planOf(rollup(orders.join(cust,
      col("o_custkey") <= col("c_custkey")))).contains(state))
    // a filter on a NON-group column cannot serve from per-key state
    assert(!planOf(rollup(orders.join(cust,
      col("o_custkey") === col("c_custkey"))
      .filter(col("c_acctbal") > 0))).contains(state))
    // different grouping keys
    assert(!planOf(orders.join(cust,
      col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n")))
      .contains(state))
  }

  test("star-chain join view: orders ⋈ customer ⋈ nation serves from " +
    "state + ONE date-pushed orders scan — the nested join shape " +
    "matches through the optimizer-canonicalized key") {
    Incremental.mvJoinStarPrepare(spark, sfDir)
    val state = Incremental.mvJoinStarStateDir(sfDir)
    def q: DataFrame = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"))
    val (got, plan) = collected(enabled = true)(q)
    assert(plan.contains(state),
      s"the star rollup must serve from the chain view's state\n$plan")
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 1,
      s"expected 1 (delta) orders scan, got $ordersScans\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
    val (want, _) = collected(enabled = false)(q)
    assert(got == want)
    assert(got.nonEmpty)
    // the 2-table prefix of the chain must not match the 3-table view
    // (it may legitimately match the 2-table view — only the star
    // state is asserted absent)
    val prefixPlan = {
      spark.conf.set("spark.graft.mv.enabled", "true")
      try Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(!prefixPlan.contains(state), prefixPlan)
  }

  test("windowed JOIN view: 30-day panes × segment over orders ⋈ " +
    "customer serve from pane state + one date-pushed fact scan — the " +
    "window key and the join cross in one unwrap") {
    Incremental.mvWindowJoinPrepare(spark, sfDir)
    val state = Incremental.mvWindowJoinStateDir(sfDir)
    def q: DataFrame = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(window(col("o_orderdate"), "30 days"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sum(cents).as("sum_cents"))
      .select(unix_millis(col("window.start").cast("timestamp")).as("ws"),
        col("c_mktsegment"), col("cnt"), col("sum_cents"))
    val (got, plan) = collected(enabled = true)(q)
    assert(plan.contains(state),
      s"the windowed join rollup must serve from pane state\n$plan")
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 1,
      s"expected 1 (delta) orders scan, got $ordersScans\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
    val (want, directPlan) = collected(enabled = false)(q)
    assert(!directPlan.contains(state))
    assert(got == want)
    assert(got.nonEmpty)
    // a different pane size over the same join must bail
    val otherPlan = {
      spark.conf.set("spark.graft.mv.enabled", "true")
      try Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(window(col("o_orderdate"), "45 days"),
          col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(!otherPlan.contains(state), otherPlan)
  }

  test("hopping JOIN view: sliding panes over orders ⋈ customer serve " +
    "from pane state — the Expand sits above the crossed join and the " +
    "nested shape key carries both structures") {
    Incremental.mvHoppingJoinPrepare(spark, sfDir)
    val state = Incremental.mvHoppingJoinStateDir(sfDir)
    def q: DataFrame = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(window(col("o_orderdate"), "60 days", "30 days"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sum(cents).as("sum_cents"))
      .select(unix_millis(col("window.start").cast("timestamp")).as("ws"),
        col("c_mktsegment"), col("cnt"), col("sum_cents"))
    val (got, plan) = collected(enabled = true)(q)
    assert(plan.contains(state),
      s"the hopping join rollup must serve from pane state\n$plan")
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).length
    assert(ordersScans == 1,
      s"expected 1 (delta) orders scan, got $ordersScans\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
    val (want, directPlan) = collected(enabled = false)(q)
    assert(!directPlan.contains(state))
    assert(got == want)
    assert(got.nonEmpty)
    // the TUMBLING 30-day join view and this hopping one route
    // disjointly over the same joined base — different Expand shapes
    val tumblingState = Incremental.mvWindowJoinStateDir(sfDir)
    if (tumblingState != null)
      assert(!plan.contains(tumblingState), plan)
  }

  test("counted pair-set retraction: countDistinct survives CDC deletes " +
    "— subtract equals rescan-minus-deleted, emptied pairs leave the " +
    "state, over-deleting fails loudly") {
    Incremental.mvDistinctDeletePrepare(spark, sfDir)
    val refreshed = Incremental.mvDistDelRefreshedDir(sfDir)
    def q: DataFrame = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), (col("user_id") % 2).as("upar"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val (got, plan) = collected(enabled = true)(q)
    assert(plan.contains(refreshed),
      s"must serve from the retraction-refreshed pair state\n$plan")
    // direct recompute over the SURVIVING rows (the view's contract)
    val cutoff = lit("2024-01-28").cast("timestamp")
    val del = (col("user_id") % 7 === 0 || col("event_id") % 89 === 0) &&
      col("ts") < cutoff
    val (want, _) = collected(enabled = false)(
      Tables.events(spark, sfDir).filter(!del)
        .groupBy(col("event_type"), (col("user_id") % 2).as("upar"))
        .agg(countDistinct(col("user_id")).as("n_users")))
    assert(got == want)
    assert(got.nonEmpty)
    // the emptied regime genuinely occurred (whole users wiped) and
    // every surviving pair carries a positive count
    val emptied = Incremental.mvDistDelEmptied.get(sfDir)
    assert(emptied != null && emptied.longValue > 0,
      s"expected emptied pairs, got $emptied")
    val st = spark.read.parquet(refreshed)
    assert(st.columns.contains("__dn"))
    assert(st.filter(col("__dn") < 1).isEmpty,
      "no zero/negative pair may survive the refresh")
    // deleting rows the state never counted (the same users again)
    // retracts below zero and fails loudly BEFORE any swap
    val e = intercept[IllegalArgumentException] {
      MaterializedViews.refreshWithDeletes(spark, s"events_dd_$sfDir",
        newDeltaPred = col("ts") >= lit("2024-01-29").cast("timestamp"),
        deletePred = col("user_id") % 7 === 0 &&
          col("ts") < lit("2024-01-28").cast("timestamp"),
        newStateDir = java.nio.file.Files
          .createTempDirectory("mv_dd_neg").toString)
    }
    assert(e.getMessage.contains("below zero"), e.getMessage)
    // the failed attempt must not have swapped the registration
    assert(MaterializedViews.view(s"events_dd_$sfDir")
      .exists(_.stateDir == refreshed))
  }

  test("a RETRACTED view never serves a GLOBAL query: retraction " +
    "redefines the view's contract, so only its own key signature " +
    "serves the delete-folded answer") {
    // the fuzz-found hole: a keyless aggregate matches ANY view of the
    // base (global serving needs no key signature), so before the fix a
    // plain `orders.agg(count)` could silently adopt orders_mod's %97
    // retraction history whenever registry iteration order favored it
    Incremental.mvPrepare(spark, sfDir)
    Incremental.mvDeletePrepare(spark, sfDir)
    assert(MaterializedViews.view(s"orders_mod_$sfDir").exists(_.retracted))
    def g: DataFrame = Tables.orders(spark, sfDir)
      .agg(count(lit(1)).as("n"), sum(cents).as("sc"))
    val (got, plan) = collected(enabled = true)(g)
    assert(!plan.contains(Incremental.mvDeleteRefreshedDir(sfDir)),
      s"a retracted view must never serve a global query\n$plan")
    val (want, _) = collected(enabled = false)(g)
    assert(got == want)
    // the retracted view still serves ITS OWN signature, delete-folded
    val (gotK, planK) = collected(enabled = true)(
      Tables.orders(spark, sfDir)
        .groupBy((col("o_custkey") % 1000).as("cust_mod"))
        .agg(count(lit(1)).as("n_orders")))
    assert(planK.contains(Incremental.mvDeleteRefreshedDir(sfDir)), planK)
    assert(gotK.nonEmpty)
  }

  test("refreshWithDeletes handles NULL group keys: a NULL-keyed " +
    "group's deletes subtract and its extremum repairs (null-safe " +
    "group joins)") {
    val name = "null_key_view"
    MaterializedViews.drop(name)
    val dateT = Tables.orders(spark, sfDir)
      .schema("o_orderdate").dataType.catalogString
    val cutoff = lit("2001-01-01").cast(dateT)
    val newCutoff = lit("2001-06-01").cast(dateT)
    // the group key NULLs out for ~1/10 of rows
    def key = when(col("o_custkey") % 10 === 3, lit(null))
      .otherwise(col("o_custkey") % 10).as("kmod")
    val aggs = Seq(count(lit(1)).as("n"), sum(cents).as("sc"),
      max(cents).as("mx"), min(cents).as("mn"))
    def del = col("o_orderkey") % 5 === 0 && col("o_orderdate") < newCutoff
    // precondition: the NULL group really has deleted state-region rows
    // (otherwise this spec can't witness the null-safe join)
    assert(!Tables.orders(spark, sfDir)
      .filter(del && col("o_custkey") % 10 === 3 &&
        col("o_orderdate") < cutoff).isEmpty,
      "test data must delete at least one NULL-group state row")
    val stateDir = java.nio.file.Files
      .createTempDirectory("mv_nullkey").toString
    Tables.orders(spark, sfDir).filter(col("o_orderdate") < cutoff)
      .groupBy(key).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(stateDir)
    MaterializedViews.register(spark, name,
      base = sp => Tables.orders(sp, sfDir),
      stateDir = stateDir,
      deltaPred = col("o_orderdate") >= cutoff,
      groupCols = Seq(key), aggCols = aggs)
    try {
      val newDir = java.nio.file.Files
        .createTempDirectory("mv_nullkey_r").toString
      MaterializedViews.refreshWithDeletes(spark, name,
        newDeltaPred = col("o_orderdate") >= newCutoff,
        deletePred = del, newStateDir = newDir)
      val gotRows = spark.read.parquet(newDir).collect().toSet
      val want = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") < newCutoff && !del)
        .groupBy(key).agg(aggs.head, aggs.tail: _*)
        .collect().toSet
      assert(gotRows == want)
      assert(gotRows.exists(_.isNullAt(0)),
        "the NULL-keyed group must survive with corrected partials")
    } finally { MaterializedViews.drop(name); () }
  }

  test("CMV validates BEFORE building: a rejected DELTA leaves no " +
    "artifact, a reused STATE_DIR under a different definition refuses, " +
    "and the recorded definition re-registers cleanly") {
    import graft.ksql.Translator
    val t = java.nio.file.Files.createTempDirectory("cmv_validate").toString
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM vsrc WITH (PATH='$sfDir/orders.parquet')")
    def parts(dir: String): Int =
      Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .count(_.getName.startsWith("part-"))
    // a group-only DELTA fails the recursion guard — and must fail
    // BEFORE the artifact build, leaving the dir untouched
    val e = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        s"""CREATE MATERIALIZED VIEW cmv_val_bad WITH (
           |  STATE_DIR='$t/s1', DELTA='o_orderstatus = ''F''') AS
           |SELECT o_orderstatus, COUNT(*) AS n
           |FROM vsrc GROUP BY o_orderstatus""".stripMargin)
    }
    assert(e.getMessage.contains("non-group"), e.getMessage)
    assert(parts(s"$t/s1") == 0,
      "a rejected definition must not have built an artifact")
    assert(!MaterializedViews.registered.contains("cmv_val_bad"))
    // the corrected DELTA re-issued against the SAME dir builds clean
    val okStmt =
      s"""CREATE MATERIALIZED VIEW cmv_val_ok WITH (
         |  STATE_DIR='$t/s1',
         |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
         |SELECT o_orderstatus, COUNT(*) AS n
         |FROM vsrc GROUP BY o_orderstatus""".stripMargin
    Translator.run(spark, c1, okStmt)
    assert(MaterializedViews.registered.contains("cmv_val_ok"))
    assert(parts(s"$t/s1") > 0)
    // a DIFFERENT definition over the now-populated dir refuses — the
    // artifact records its defining signature
    assert(MaterializedViews.drop("cmv_val_ok"))
    val e2 = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        s"""CREATE MATERIALIZED VIEW cmv_val2 WITH (
           |  STATE_DIR='$t/s1',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
           |SELECT o_orderpriority, COUNT(*) AS n
           |FROM vsrc GROUP BY o_orderpriority""".stripMargin)
    }
    assert(e2.getMessage.contains("DIFFERENT definition"), e2.getMessage)
    // the ORIGINAL definition re-registers from the artifact (replay)
    Translator.run(spark, c1, okStmt)
    assert(MaterializedViews.registered.contains("cmv_val_ok"))
    MaterializedViews.drop("cmv_val_ok")
    ()
  }

  test("dialect REFRESH MATERIALIZED VIEW: the refreshed view serves " +
    "with the ADVANCED cutoff and the new artifact; values equal the " +
    "recompute; guards refuse unknown views, missing props, reused dirs") {
    import graft.ksql.{KsqlQueries, Translator}
    val t = KsqlQueries.mvRefreshDir(spark, sfDir)
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    val (_, dfOpt) = Translator.run(spark, c1, KsqlQueries.mvRefPullQuery)
    val df = dfOpt.get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(s"$t/state2"),
      s"must serve from the REFRESHED artifact\n$plan")
    // every state-path occurrence is the refreshed dir — the pre-refresh
    // artifact has left the plan ($t/state is a prefix of $t/state2, so
    // compare occurrence counts)
    val all = java.util.regex.Pattern.quote(s"$t/state").r
      .findAllIn(plan).length
    val ref = java.util.regex.Pattern.quote(s"$t/state2").r
      .findAllIn(plan).length
    assert(all == ref, s"pre-refresh artifact still in plan\n$plan")
    assert(plan.contains("2001-06-01"),
      s"the delta scan must carry the ADVANCED cutoff\n$plan")
    val got = df.collect().toSet
    val want = {
      spark.conf.set("spark.graft.mv.enabled", "false")
      try {
        val (_, d2) = Translator.run(spark, c1, KsqlQueries.mvRefPullQuery)
        d2.get.collect().toSet
      } finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(got == want)
    assert(got.nonEmpty)
    // guards
    val e1 = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        "REFRESH MATERIALIZED VIEW no_such_view WITH (" +
          "STATE_DIR='/tmp/nope', DELTA='o_orderkey > 0')")
    }
    assert(e1.getMessage.contains("unknown materialized view"),
      e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        s"REFRESH MATERIALIZED VIEW ${KsqlQueries.mvRefName(sfDir)}")
    }
    assert(e2.getMessage.contains("needs WITH"), e2.getMessage)
    // a DIFFERENT refresh aimed at the already-populated dir refuses
    val e3 = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        s"""REFRESH MATERIALIZED VIEW ${KsqlQueries.mvRefName(sfDir)} WITH (
           |  STATE_DIR='$t/state2',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-07-01''')"""
          .stripMargin)
    }
    assert(e3.getMessage.contains("DIFFERENT refresh"), e3.getMessage)
  }

  test("dialect REFRESH composes with JOIN VIEWS: a programmatic " +
    "fact ⋈ dim registration refreshes through KSQL text — the fold " +
    "runs over the joined base, serving reads the new artifact with " +
    "the advanced cutoff") {
    import graft.ksql.Translator
    val name = "jv_refresh"
    MaterializedViews.drop(name)
    val dateT = Tables.orders(spark, sfDir)
      .schema("o_orderdate").dataType.catalogString
    val cutoff = lit("2001-01-01").cast(dateT)
    def base(sp: org.apache.spark.sql.SparkSession) =
      Tables.orders(sp, sfDir).join(Tables.customer(sp, sfDir),
        col("o_custkey") === col("c_custkey"))
    val aggs = Seq(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"))
    val stateDir = java.nio.file.Files
      .createTempDirectory("jv_refresh").toString
    // c_mktsegment key: DISJOINT from orders_cust's c_nationkey
    // signature, so this spec's serving assertion can't race the
    // gated join view for the same query
    base(spark).filter(col("o_orderdate") < cutoff)
      .groupBy(col("c_mktsegment")).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(stateDir)
    MaterializedViews.register(spark, name, base(_), stateDir,
      col("o_orderdate") >= cutoff, Seq(col("c_mktsegment")), aggs)
    try {
      val newDir = java.nio.file.Files
        .createTempDirectory("jv_refresh_new").toString
      Translator.run(spark, Map.empty,
        s"""REFRESH MATERIALIZED VIEW $name WITH (
           |  STATE_DIR='$newDir',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''')"""
          .stripMargin)
      assert(MaterializedViews.view(name).exists(_.stateDir == newDir))
      def q: DataFrame = base(spark).groupBy(col("c_mktsegment"))
        .agg(aggs.head, aggs.tail: _*)
      val (got, plan) = collected(enabled = true)(q)
      assert(plan.contains(newDir),
        s"serving must read the refreshed join-view artifact\n$plan")
      assert(plan.contains("2001-06-01"),
        s"the delta's fact scan must push the advanced cutoff\n$plan")
      val (want, _) = collected(enabled = false)(q)
      assert(got == want)
      assert(got.nonEmpty)
    } finally { MaterializedViews.drop(name); () }
  }

  test("dialect REFRESH composes with WINDOWED views: the pane-state " +
    "fold advances a tumbling CMV's cutoff through KSQL text") {
    import graft.ksql.{KsqlQueries, Translator}
    val t = KsqlQueries.mvDdlWindowDir(spark, sfDir)
    val name = KsqlQueries.mvDdlWindowName(sfDir)
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM ev_src WITH (PATH='$sfDir/events.parquet')")
    // idempotent across suite orders: an earlier run of this spec may
    // have already advanced the cutoff (state2 built + re-pinned)
    Translator.run(spark, c1,
      s"""REFRESH MATERIALIZED VIEW $name WITH (
         |  STATE_DIR='$t/state2',
         |  DELTA='ts >= TIMESTAMP ''2024-01-28 00:00:00''')""".stripMargin)
    assert(MaterializedViews.view(name).exists(_.stateDir == s"$t/state2"))
    val (_, dfOpt) = Translator.run(spark, c1, KsqlQueries.mvDdlWinPullQuery)
    val df = dfOpt.get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(s"$t/state2"),
      s"the windowed pull must serve from the refreshed pane state\n$plan")
    assert(plan.contains("2024-01-28"),
      s"the delta scan must carry the ADVANCED cutoff\n$plan")
    val got = df.collect().toSet
    val want = {
      spark.conf.set("spark.graft.mv.enabled", "false")
      try {
        val (_, d2) = Translator.run(spark, c1, KsqlQueries.mvDdlWinPullQuery)
        d2.get.collect().toSet
      } finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("dialect REFRESH with DELETED: the retraction folds through KSQL " +
    "text and the served rollup equals the surviving-row recompute") {
    import graft.ksql.{KsqlQueries, Translator}
    val t = KsqlQueries.mvRefreshDelDir(spark, sfDir)
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    val (_, dfOpt) = Translator.run(spark, c1, KsqlQueries.mvRefDelPullQuery)
    val df = dfOpt.get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(s"$t/state2"), plan)
    val got = df.collect().toSet
    // the view's contract is agg(base WHERE NOT deleted) — recompute it
    val want = Tables.orders(spark, sfDir)
      .filter(!(col("o_orderkey") % 97 === 0 &&
        col("o_orderdate") < lit("2001-06-01")
          .cast(Tables.orders(spark, sfDir)
            .schema("o_orderdate").dataType.catalogString)))
      .groupBy((col("o_custkey") % 500).as("cmod5"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"),
        max(cents).as("max_cents"))
      .collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("dialect ROLLUP: served from the per-key DDL view (state leaf in " +
    "the plan), and CUBE over an unregistered table matches the direct " +
    "plan bit for bit") {
    import graft.ksql.{KsqlQueries, Translator}
    val t = KsqlQueries.mvDdlRollupDir(spark, sfDir)
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    val (_, dfOpt) = Translator.run(spark, c1, KsqlQueries.mvDdlRollupQuery)
    val df = dfOpt.get
    val plan = df.queryExecution.executedPlan.toString
    // the programmatic (status, priority) view shares this signature —
    // first matching view wins, both serve identical values; the pin is
    // that SOME per-key view state replaced the history scan
    val servedFromView = plan.contains(s"$t/state") ||
      Option(Incremental.mvRollupStateDir(sfDir)).exists(plan.contains)
    assert(servedFromView,
      s"the ROLLUP must serve from a per-key view state\n$plan")
    val got = df.collect().toSet
    val want = {
      spark.conf.set("spark.graft.mv.enabled", "false")
      try {
        val (_, d2) = Translator.run(spark, c1, KsqlQueries.mvDdlRollupQuery)
        val directPlan = d2.get.queryExecution.executedPlan.toString
        assert(!directPlan.contains(s"$t/state"), directPlan)
        d2.get.collect().toSet
      } finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(got == want)
    assert(got.nonEmpty)
    // CUBE over customer (no registered view) — dialect vs direct Spark
    val (c2, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM cust WITH (PATH='$sfDir/customer.parquet')")
    val (_, cubeOpt) = Translator.run(spark, c2,
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt
        |FROM cust GROUP BY CUBE (c_mktsegment, c_nationkey)""".stripMargin)
    val gotCube = cubeOpt.get.collect().toSet
    val wantCube = Tables.customer(spark, sfDir)
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("cnt")).collect().toSet
    assert(gotCube == wantCube)
    assert(gotCube.nonEmpty)
    // explicit GROUPING SETS through the dialect — including the empty
    // grand-total set — served from the SAME per-key view (every set is
    // a subset of the view's keys)
    val gsQuery =
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS sum_cents,
        |  MAX(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS max_cents
        |FROM orders_src
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())""".stripMargin
    val (_, gsOpt) = Translator.run(spark, c1, gsQuery)
    val gsPlan = gsOpt.get.queryExecution.executedPlan.toString
    assert(gsPlan.contains(s"$t/state") ||
      Option(Incremental.mvRollupStateDir(sfDir)).exists(gsPlan.contains),
      s"GROUPING SETS must serve from a per-key view state\n$gsPlan")
    val gsGot = gsOpt.get.collect().toSet
    val gsWant = {
      spark.conf.set("spark.graft.mv.enabled", "false")
      try {
        val (_, d2) = Translator.run(spark, c1, gsQuery)
        d2.get.collect().toSet
      } finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(gsGot == gsWant)
    assert(gsGot.nonEmpty)
    // ROLLUP/CUBE refuses inside a CMV definition and under a WINDOW
    val e = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        s"""CREATE MATERIALIZED VIEW bad_rollup_mv WITH (
           |  STATE_DIR='/tmp/never-built-rollup',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
           |SELECT o_orderstatus, COUNT(*) AS n
           |FROM orders_src GROUP BY ROLLUP (o_orderstatus)""".stripMargin)
    }
    assert(e.getMessage.contains("ROLLUP"), e.getMessage)
  }
}
