package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Incremental

/** Randomized hardening for the materialized-view rewrite: the rule's
  * failure mode is a WRONG ANSWER SERVED SILENTLY, so beyond the
  * shape-by-shape specs the whole surface gets fuzzed — random
  * combinations of grouping shape (flat / rollup / cube / grouping
  * subsets / global), aggregate subsets with derived expressions and
  * random aliases, and optional filters (group-column pull predicates,
  * non-group filters that must force a bail-out) — asserting ONE
  * invariant on every draw: the served result equals the rule-off
  * direct plan, bit for bit. Which view serves (or whether any does) is
  * deliberately uncontrolled; value equality must hold either way, and
  * the run asserts the rewrite actually fired on a healthy fraction of
  * draws so the fuzz exercises serving, not just pass-through.
  */
class MvRewriteFuzzSpec extends SparkSpec {

  private val cents =
    floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")

  test("randomized aggregate shapes over registered orders views: served " +
    "values always equal the direct plan; a healthy fraction serves") {
    Incremental.mvPrepare(spark, sfDir)
    Incremental.mvRollupPrepare(spark, sfDir)
    val stateDirs = Seq(
      Option(Incremental.mvStateDir(sfDir)),
      Option(Incremental.mvRefreshedStateDir(sfDir)),
      Option(Incremental.mvRollupStateDir(sfDir))).flatten
    val rnd = new scala.util.Random(20260815)

    def baseAgg(i: Int): Column = i match {
      case 0 => count(lit(1))
      case 1 => sum(cents)
      case 2 => max(cents)
      case _ => avg(cents)
    }
    def derived(c: Column, i: Int): Column = i match {
      case 0 => c
      case 1 => c * lit(2)
      case _ => c + lit(1)
    }

    // serving detection via the rewrite-event counter, not a state-dir
    // list: other suites in the same JVM register MORE views over orders
    // (DDL views, the prio/cmod refresh views), any of which may win the
    // first-successful-signature race — a dir allowlist undercounts
    def servedEvents(): Long =
      graft.plans.MaterializedViews.servedCounts.values.sum
    var servedCount = 0
    for (i <- 0 until 40) {
      val nAggs = 1 + rnd.nextInt(3)
      val aggs = (0 until nAggs).map { j =>
        derived(baseAgg(rnd.nextInt(4)), rnd.nextInt(3)).as(s"a${i}_$j")
      }
      val filtered = rnd.nextInt(4) match {
        case 0 => Tables.orders(spark, sfDir)
        case 1 => Tables.orders(spark, sfDir)
          .filter(col("o_orderstatus") === "O") // plain group col (sp view)
        case 2 => Tables.orders(spark, sfDir)
          .filter(col("o_custkey") <= 500) // plain group col (custkey view)
        case _ => Tables.orders(spark, sfDir) // non-group filter: must bail
          .filter(col("o_totalprice") > 1000.0)
      }
      // pin every random draw BEFORE the q definition: q is evaluated
      // twice (rewrite on / off) and must describe the same query
      val shape = rnd.nextInt(7)
      def q: DataFrame = shape match {
        case 0 => filtered.groupBy(col("o_custkey"))
          .agg(aggs.head, aggs.tail: _*)
        case 1 => filtered.groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(aggs.head, aggs.tail: _*)
        case 2 => filtered.rollup(col("o_orderstatus"))
          .agg(aggs.head, aggs.tail: _*)
        case 3 => filtered.rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(aggs.head, aggs.tail: _*)
        case 4 => filtered.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(aggs.head, aggs.tail: _*)
        case 5 => filtered.agg(aggs.head, aggs.tail: _*)
        case _ => filtered.groupBy(col("o_orderpriority")) // no view has this
          .agg(aggs.head, aggs.tail: _*)
      }
      spark.conf.set("spark.graft.mv.enabled", "true")
      val before = servedEvents()
      val (got, plan) = try {
        val df = q
        (df.collect().toSet, df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.mv.enabled")
      val served = servedEvents() > before ||
        stateDirs.exists(plan.contains)
      if (served) servedCount += 1
      spark.conf.set("spark.graft.mv.enabled", "false")
      val want = try q.collect().toSet
        finally spark.conf.unset("spark.graft.mv.enabled")
      assert(got == want,
        s"draw $i diverged (served=$served)\n$plan")
    }
    assert(servedCount >= 10,
      s"only $servedCount/40 draws served — the fuzz stopped exercising " +
        "the rewrite")
  }

  test("randomized windowed/hopping/distinct/global shapes over the " +
    "events views: served values always equal the direct plan") {
    Incremental.mvWindowPrepare(spark, sfDir)
    Incremental.mvHoppingPrepare(spark, sfDir)
    Incremental.mvDistinctPrepare(spark, sfDir)
    val stateDirs = Seq(
      Option(Incremental.mvWindowStateDir(sfDir)),
      Option(Incremental.mvHoppingStateDir(sfDir)),
      Option(Incremental.mvDistinctStateDir(sfDir))).flatten
    val rnd = new scala.util.Random(13)
    val evCents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")

    var servedCount = 0
    for (i <- 0 until 30) {
      val aggPick = rnd.nextInt(3)
      def aggsFor(distinctShape: Boolean): Seq[Column] =
        if (distinctShape) Seq(countDistinct(col("user_id")).as(s"d$i"))
        else aggPick match {
          case 0 => Seq(count(lit(1)).as(s"c$i"))
          case 1 => Seq(count(lit(1)).as(s"c$i"), sum(evCents).as(s"s$i"))
          case _ => Seq((sum(evCents) / lit(100.0)).as(s"v$i"),
            count(lit(1)).as(s"c$i"))
        }
      val filtered = rnd.nextInt(3) match {
        case 0 => Tables.events(spark, sfDir)
        case 1 => Tables.events(spark, sfDir)
          .filter(col("event_type") === "view") // plain group col
        case _ => Tables.events(spark, sfDir)
          .filter(col("value") > 50.0) // non-group: must bail, stay equal
      }
      val shape = rnd.nextInt(6)
      def q: DataFrame = shape match {
        case 0 => filtered // the registered daily panes (struct key kept
          // in the output — Row equality covers struct values)
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(aggsFor(false).head, aggsFor(false).tail: _*)
        case 1 => filtered // registered hopping panes
          .groupBy(window(col("ts"), "1 hour", "30 minutes"),
            col("event_type"))
          .agg(aggsFor(false).head, aggsFor(false).tail: _*)
        case 2 => filtered // UNREGISTERED pane size: must bail
          .groupBy(window(col("ts"), "45 minutes"), col("event_type"))
          .agg(aggsFor(false).head, aggsFor(false).tail: _*)
        case 3 => filtered.groupBy(col("event_type"))
          .agg(aggsFor(true).head) // pair-set distinct view
        case 4 => filtered.agg(aggsFor(false).head,
          aggsFor(false).tail: _*) // global over events
        case _ => filtered.groupBy(col("user_id")) // no view: must bail
          .agg(aggsFor(false).head, aggsFor(false).tail: _*)
      }
      spark.conf.set("spark.graft.mv.enabled", "true")
      val (got, plan) = try {
        val df = q
        (df.collect().toSet, df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.mv.enabled")
      if (stateDirs.exists(plan.contains)) servedCount += 1
      spark.conf.set("spark.graft.mv.enabled", "false")
      val want = try q.collect().toSet
        finally spark.conf.unset("spark.graft.mv.enabled")
      assert(got == want,
        s"draw $i (shape $shape) diverged " +
          s"(served=${stateDirs.exists(plan.contains)})\n$plan")
    }
    assert(servedCount >= 6,
      s"only $servedCount/30 draws served — the fuzz stopped exercising " +
        "the events views")
  }

  test("randomized JOIN-VIEW shapes: served values always equal the " +
    "direct plan over fact ⋈ dim (⋈ dim) trees — wrong keys, outer " +
    "joins and non-group filters bail but stay equal") {
    Incremental.mvJoinPrepare(spark, sfDir)
    Incremental.mvJoinStarPrepare(spark, sfDir)
    Incremental.mvWindowJoinPrepare(spark, sfDir)
    Incremental.mvHoppingJoinPrepare(spark, sfDir)
    val stateDirs = Seq(
      Option(Incremental.mvJoinStateDir(sfDir)),
      Option(Incremental.mvJoinStarStateDir(sfDir)),
      Option(Incremental.mvWindowJoinStateDir(sfDir)),
      Option(Incremental.mvHoppingJoinStateDir(sfDir))).flatten
    val rnd = new scala.util.Random(1414)

    def oc = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
    def ocn = oc.join(Tables.nation(spark, sfDir),
      col("c_nationkey") === col("n_nationkey"))
    // count/sum/max registered on the 2-table view; the star view has
    // only count/sum (max must BAIL there); avg bails on both (no
    // count-of-cents constituent) — every bail must still stay equal
    def baseAgg(i: Int): Column = i match {
      case 0 => count(lit(1))
      case 1 => sum(cents)
      case 2 => max(cents)
      case _ => avg(cents)
    }
    def derived(c: Column, i: Int): Column = i match {
      case 0 => c
      case 1 => c * lit(2)
      case _ => c + lit(1)
    }

    var servedCount = 0
    for (i <- 0 until 40) {
      val nAggs = 1 + rnd.nextInt(2)
      val aggs = (0 until nAggs).map { j =>
        derived(baseAgg(rnd.nextInt(4)), rnd.nextInt(3)).as(s"j${i}_$j")
      }
      val filterPick = rnd.nextInt(3) // 0 none, 1 group col, 2 non-group
      // servable shapes (0: 2-table, 1: star, 4: global, 5: windowed
      // join, 6: hopping join) weighted 2:1 over the must-bail ones
      // (2: wrong keys, 3: outer, 7: unregistered pane size over the
      // join) so the run exercises serving AND bailing whatever the
      // seed does
      val shape = Seq(0, 0, 1, 1, 4, 4, 5, 5, 6, 6, 2, 3, 7)(
        rnd.nextInt(13))
      def q: DataFrame = shape match {
        case 0 =>
          val b = filterPick match {
            case 1 => oc.filter(col("c_nationkey") <= 12)
            case 2 => oc.filter(col("c_acctbal") > 0)
            case _ => oc
          }
          b.groupBy(col("c_nationkey")).agg(aggs.head, aggs.tail: _*)
        case 1 =>
          val b = filterPick match {
            case 1 => ocn.filter(col("n_name") > "G")
            case 2 => ocn.filter(col("o_totalprice") > 1000.0)
            case _ => ocn
          }
          b.groupBy(col("n_name")).agg(aggs.head, aggs.tail: _*)
        case 2 => // wrong join keys: a different shape, must bail
          Tables.orders(spark, sfDir)
            .join(Tables.customer(spark, sfDir),
              col("o_custkey") === col("c_nationkey"))
            .groupBy(col("c_nationkey")).agg(aggs.head, aggs.tail: _*)
        case 3 => // outer join: must bail
          Tables.orders(spark, sfDir)
            .join(Tables.customer(spark, sfDir),
              col("o_custkey") === col("c_custkey"), "left")
            .groupBy(col("c_nationkey")).agg(aggs.head, aggs.tail: _*)
        case 5 => // WINDOWED join view (30-day panes × segment); the
          // window struct stays in the output — Row equality covers it
          val b = filterPick match {
            case 1 => oc.filter(col("c_mktsegment") === "BUILDING")
            case 2 => oc.filter(col("o_totalprice") > 1000.0)
            case _ => oc
          }
          b.groupBy(window(col("o_orderdate"), "30 days"),
            col("c_mktsegment")).agg(aggs.head, aggs.tail: _*)
        case 6 => // HOPPING join view (Expand above the crossed join)
          val b = filterPick match {
            case 1 => oc.filter(col("c_mktsegment") === "BUILDING")
            case 2 => oc.filter(col("o_totalprice") > 1000.0)
            case _ => oc
          }
          b.groupBy(window(col("o_orderdate"), "60 days", "30 days"),
            col("c_mktsegment")).agg(aggs.head, aggs.tail: _*)
        case 7 => // unregistered pane size over the join: must bail
          oc.groupBy(window(col("o_orderdate"), "45 days"),
            col("c_mktsegment")).agg(aggs.head, aggs.tail: _*)
        case _ => // GLOBAL over the join: re-aggregates the view
          oc.agg(aggs.head, aggs.tail: _*)
      }
      spark.conf.set("spark.graft.mv.enabled", "true")
      val (got, plan) = try {
        val df = q
        (df.collect().toSet, df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.mv.enabled")
      if (stateDirs.exists(plan.contains)) servedCount += 1
      spark.conf.set("spark.graft.mv.enabled", "false")
      val want = try q.collect().toSet
        finally spark.conf.unset("spark.graft.mv.enabled")
      assert(got == want,
        s"draw $i (shape $shape) diverged " +
          s"(served=${stateDirs.exists(plan.contains)})\n$plan")
    }
    assert(servedCount >= 8,
      s"only $servedCount/40 draws served — the fuzz stopped exercising " +
        "the join views")
  }

  test("randomized WINDOWSTART/WINDOWEND range bounds over tumbling AND " +
    "hopping views: served values always equal the direct plan; a " +
    "healthy fraction serves") {
    Incremental.mvWindowPrepare(spark, sfDir)
    Incremental.mvHoppingPrepare(spark, sfDir)
    val stateDirs = Seq(
      Option(Incremental.mvWindowStateDir(sfDir)),
      Option(Incremental.mvHoppingStateDir(sfDir))).flatten
    val rnd = new scala.util.Random(20260817)
    val evCents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    val t0 = 1704067200000L // 2024-01-01, the events calendar start
    val span = 30L * 86400000L

    var servedCount = 0
    for (i <- 0 until 30) {
      val hopping = rnd.nextBoolean()
      val win =
        if (hopping) window(col("ts"), "1 hour", "30 minutes")
        else window(col("ts"), "1 day")
      // random range anywhere in (and slightly past) the calendar,
      // DELIBERATELY not pane-aligned on most draws — alignment is a
      // convenience, not a requirement of the range predicate
      val lo = t0 + (rnd.nextLong().abs % span)
      val hi = lo + 3600000L + (rnd.nextLong().abs % (7L * 86400000L))
      val ws = unix_millis(col("window.start"))
      val we = unix_millis(col("window.end"))
      val bound: Column = rnd.nextInt(6) match {
        case 0 => ws >= lit(lo) && ws < lit(hi)
        case 1 => ws >= lit(lo) // one-sided
        case 2 => we > lit(lo) && we <= lit(hi) // WINDOWEND flavor
        case 3 => ws >= lit(lo) && we <= lit(hi) // mixed start+end
        case 4 => ws + lit(1800000L) < lit(hi) // arithmetic over the bound
        case _ => ws >= lit(lo) && ws < lit(lo) // empty range (degenerate)
      }
      val withPull = rnd.nextBoolean() // optional plain pull predicate
      def q: DataFrame = {
        val base = Tables.events(spark, sfDir)
          .groupBy(win, col("event_type"))
          .agg(count(lit(1)).as(s"c$i"), sum(evCents).as(s"s$i"))
          .filter(bound)
        if (withPull) base.filter(col("event_type") =!= "view") else base
      }
      spark.conf.set("spark.graft.mv.enabled", "true")
      val (got, plan) = try {
        val df = q
        (df.collect().toSet, df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.mv.enabled")
      if (stateDirs.exists(plan.contains)) servedCount += 1
      spark.conf.set("spark.graft.mv.enabled", "false")
      val want = try q.collect().toSet
        finally spark.conf.unset("spark.graft.mv.enabled")
      assert(got == want,
        s"draw $i (hopping=$hopping lo=$lo hi=$hi pull=$withPull) " +
          s"diverged (served=${stateDirs.exists(plan.contains)})\n$plan")
    }
    assert(servedCount >= 20,
      s"only $servedCount/30 draws served — the fuzz stopped exercising " +
        "the range-bounded serving path")
  }

  test("randomized dialect SESSION shapes over the registered session " +
    "view: served values always equal the direct plan; a healthy " +
    "fraction serves") {
    import graft.ksql.{KsqlQueries, Translator}
    // registers the 6-hour user_id session view over sf events (cnt /
    // sum_cents / max_cents) and installs the rewrite
    KsqlQueries.mvDdlSessionDir(spark, sfDir)
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM sev_src WITH (PATH='$sfDir/events.parquet')")
    val rnd = new scala.util.Random(20260816)
    val aggPool = Seq(
      "COUNT(*) AS a",
      "SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS b",
      "MAX(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS c",
      // AVG is not a registered session partial → must bail, not err
      "AVG(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS d")
    def servedEvents(): Long =
      graft.plans.MaterializedViews.servedCounts.values.sum
    var servedCount = 0
    for (i <- 0 until 20) {
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
      // 3 HOURS never matches the registered 6-hour struct → bail
      val gap = if (rnd.nextInt(4) == 0) "3 HOURS" else "6 HOURS"
      val where = rnd.nextInt(4) match {
        case 0 => "WHERE user_id <= 100 " // pull predicate: serves
        case 1 => "WHERE value > 10 "     // non-group filter: bails
        case _ => ""
      }
      val pseudo =
        if (rnd.nextBoolean()) Seq("WINDOWSTART AS ws", "WINDOWEND AS we")
        else Nil
      val sel = (Seq("user_id") ++ pseudo ++ aggs).mkString(", ")
      val sql = s"SELECT $sel FROM sev_src $where" +
        s"WINDOW SESSION ($gap) GROUP BY user_id"
      def run(on: Boolean): Set[org.apache.spark.sql.Row] = {
        spark.conf.set("spark.graft.mv.enabled", on.toString)
        try {
          val (_, Some(df)) = Translator.run(spark, c1, sql): @unchecked
          df.collect().toSet
        } finally spark.conf.unset("spark.graft.mv.enabled")
      }
      val before = servedEvents()
      val got = run(on = true)
      if (servedEvents() > before) servedCount += 1
      val want = run(on = false)
      assert(got == want, s"draw $i diverged: $sql")
    }
    assert(servedCount >= 5,
      s"only $servedCount/20 draws served — the fuzz stopped exercising " +
        "the session view")
  }
}
