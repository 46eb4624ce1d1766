package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Union}

import graft.ksql.{KsqlQueries, Translator}

/** WINDOWSTART-bounded windowed pulls (round 16 — the round-15
  * verdict's #4): `SELECT * FROM <windowed view> WHERE WINDOWSTART >= x
  * AND WINDOWSTART < y` must still serve from the materialized view —
  * the bounds become a PANE-RANGE pull predicate on BOTH branches of
  * the pane repair — not silently fall back to a full recompute (the
  * answer was always correct; the 100 TB posture was not). */
class WindowPullRangeSpec extends SparkSpec {
  private val lo = 1704672000000L // 2024-01-08 UTC, on the 2h pane grid
  private val hi = 1704844800000L // 2024-01-10

  private def rangePull(d: String) = {
    KsqlQueries.mvDdlWindowDir(spark, d)
    val (_, Some(df)) = Translator.run(spark, Map.empty,
      s"SELECT * FROM ${KsqlQueries.mvDdlWindowName(d)} " +
        s"WHERE WINDOWSTART >= $lo AND WINDOWSTART < $hi"): @unchecked
    df
  }

  test("the range pull SERVES from the view: state scan filtered on the " +
    "stored pane struct, delta branch's range pushed into the raw scan") {
    val d = "/root/testdata/sf0.001"
    val df = rangePull(d)
    val plan = df.queryExecution.optimizedPlan
    // rewrite fired: the plan merges a state relation with a delta
    // aggregate under a Union — a refused rewrite has no Union at all
    val union = plan.collectFirst { case u: Union => u }
    assert(union.isDefined, s"rewrite did not fire:\n${plan.treeString}")
    // BOTH branches carry the range bounds
    val branchesWithRange = union.get.children.count(_.exists {
      case f: Filter =>
        val s = f.condition.sql
        s.contains(lo.toString) && s.contains(hi.toString)
      case _ => false
    })
    assert(branchesWithRange == 2,
      s"range filter on $branchesWithRange/2 branches:\n${plan.treeString}")
    // the delta branch keeps its pre-aggregation (panes merge, events
    // never cross the union raw)
    assert(union.get.children.exists(_.exists {
      case _: Aggregate => true; case _ => false }))
  }

  test("range pull ≡ the unserved recompute, and WINDOWEND bounds " +
    "serve too") {
    val d = "/root/testdata/sf0.001"
    val served = rangePull(d).collect().toSet
    val recompute = {
      spark.conf.set("spark.graft.mv.enabled", "false")
      try rangePull(d).collect().toSet
      finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(served === recompute)
    assert(served.nonEmpty)
    // WINDOWEND flavor: end = start + 2h on this grid
    KsqlQueries.mvDdlWindowDir(spark, d)
    val (_, Some(byEnd)) = Translator.run(spark, Map.empty,
      s"SELECT * FROM ${KsqlQueries.mvDdlWindowName(d)} " +
        s"WHERE WINDOWEND > $lo AND WINDOWEND <= $hi"): @unchecked
    val plan = byEnd.queryExecution.optimizedPlan
    assert(plan.collectFirst { case u: Union => u }.isDefined,
      s"WINDOWEND bound did not serve:\n${plan.treeString}")
    assert(byEnd.collect().toSet === served) // same panes
  }

  // ─── HOPPING (round 17): the bound can't push below the Expand, so it
  //     reaches the rewrite in the unwrap's name-marker form and is
  //     rebuilt over the STORED pane column ─────────────────────────────
  private val hlo = 1706054400000L // 2024-01-24 UTC, on the 90m grid
  private val hhi = 1706270400000L // 2024-01-26 12:00 (straddles cutoff)

  private def hopRangePull(d: String) = {
    KsqlQueries.mvDdlHopDir(spark, d)
    val (_, Some(df)) = Translator.run(spark, Map.empty,
      s"SELECT * FROM ${KsqlQueries.mvDdlHopName(d)} " +
        s"WHERE WINDOWSTART >= $hlo AND WINDOWSTART < $hhi"): @unchecked
    df
  }

  test("HOPPING range pull SERVES from the view: marker-form bound " +
    "rebuilt over the stored pane struct, on BOTH repair branches") {
    val d = "/root/testdata/sf0.001"
    val df = hopRangePull(d)
    val plan = df.queryExecution.optimizedPlan
    val union = plan.collectFirst { case u: Union => u }
    assert(union.isDefined, s"rewrite did not fire:\n${plan.treeString}")
    val branchesWithRange = union.get.children.count(_.exists {
      case f: Filter =>
        val s = f.condition.sql
        s.contains(hlo.toString) && s.contains(hhi.toString)
      case _ => false
    })
    assert(branchesWithRange == 2,
      s"range filter on $branchesWithRange/2 branches:\n${plan.treeString}")
    // the delta branch keeps its pane Expand below its pre-aggregate —
    // raw events fan into panes and merge before crossing the union
    import org.apache.spark.sql.catalyst.plans.logical.Expand
    assert(union.get.children.exists(_.exists {
      case a: Aggregate => a.exists { case _: Expand => true; case _ => false }
      case _ => false
    }), s"no pane Expand under the delta aggregate:\n${plan.treeString}")
  }

  test("HOPPING range pull ≡ the unserved recompute") {
    val d = "/root/testdata/sf0.001"
    val served = hopRangePull(d).collect().toSet
    val recompute = {
      spark.conf.set("spark.graft.mv.enabled", "false")
      try hopRangePull(d).collect().toSet
      finally spark.conf.unset("spark.graft.mv.enabled")
    }
    assert(served === recompute)
    assert(served.nonEmpty)
  }
}
