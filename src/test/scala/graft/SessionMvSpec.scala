package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ksql.Translator
import graft.plans.MaterializedViews

/** Live event for the session-view push continuation (MemoryStream). */
case class SessLiveRow(ts: java.sql.Timestamp, user_id: java.lang.Long,
                       points: Long)

/** SESSION materialized views (round 15): the DDL's WINDOW SESSION path
  * — interval-record state artifact, named pull serving via the
  * gaps-and-islands repair, REFRESH fold — plus the refusal surface
  * (no transparent rewrite, no LIVE push, no DELETED retraction, no
  * session_window keys on the mergeable-partial path).
  */
class SessionMvSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Synthetic corpus exercising every repair regime. Gap = 10 s.
    * Base (arr=0) sessions per user — FIVE stored intervals:
    *   alice: [0s..2s], [30s..31s], [60s..62s]   (three sessions)
    *   bob:   [0s..5s]                            (untouched by delta)
    *   NULL:  [100s..101s]                        (NULL-key session)
    * Delta (arr=1):
    *   alice 36s,40s,46s,52s — every inter-event gap < 10 s, so the
    *                        chain BRIDGES [30..31] and [60..62] into
    *                        one [30..62] session (extend + merge)
    *   carol 7s           — NEW key
    *   NULL  108s         — extends the NULL-key session to [100..108]
    */
  private def corpus(): DataFrame = {
    val rows = Seq[(Long, java.lang.Long, Long, Int)](
      // (ts_ms, user, points, arr)
      (0L, 1L, 10L, 0), (2000L, 1L, 5L, 0),
      (30000L, 1L, 7L, 0), (31000L, 1L, 1L, 0),
      (60000L, 1L, 2L, 0), (62000L, 1L, 4L, 0),
      (0L, 2L, 100L, 0), (5000L, 2L, 50L, 0),
      (100000L, null, 9L, 0), (101000L, null, 3L, 0),
      (36000L, 1L, 20L, 1), (40000L, 1L, 30L, 1),
      (46000L, 1L, 40L, 1), (52000L, 1L, 50L, 1),
      (7000L, 3L, 11L, 1),
      (108000L, null, 6L, 1))
    import spark.implicits._
    rows.toDF("ts_ms", "user_id", "points", "arr")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .select("ts", "user_id", "points", "arr")
  }

  /** Direct recompute over ALL rows: the oracle every serving path must
    * equal, expressed with Spark's own session_window. */
  private def recompute(df: DataFrame, gapMs: Long): Set[(Option[Long],
      Long, Long, Long, Long)] =
    df.filter(col("ts").isNotNull)
      .groupBy(session_window(col("ts"), s"$gapMs milliseconds"),
        col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("points")).as("pts"))
      .select(col("user_id"), col("cnt"), col("pts"),
        unix_millis(col("session_window.start")).as("windowstart"),
        unix_millis(col("session_window.end")).as("windowend"))
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  private def served(df: DataFrame): Set[(Option[Long], Long, Long, Long,
      Long)] =
    df.select(col("user_id"), col("cnt"), col("pts"),
      col("windowstart"), col("windowend"))
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  test("session CMV: pull by name repairs extend/merge/new-key/" +
    "untouched/NULL-key regimes to the exact full recompute") {
    val dir = freshDir("sess_mv")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM sess_src WITH (PATH='$dir/ev.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW sess_mv_regimes WITH (
         |  STATE_DIR='$dir/state', DELTA='arr = 1') AS
         |SELECT user_id, COUNT(*) AS cnt, SUM(points) AS pts
         |FROM sess_src WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin)
    try {
      // the artifact holds only the base (arr=0) sessions — 5 intervals
      val st = spark.read.parquet(s"$dir/state")
      assert(st.count() == 5)
      assert(st.columns.toSet ==
        Set("user_id", "__first_ms", "__last_ms", "cnt", "pts"))
      val (_, Some(df)) = Translator.run(spark, Map.empty,
        "SELECT * FROM sess_mv_regimes"): @unchecked
      val want = recompute(corpus(), 10000L)
      assert(served(df) == want)
      // spot-check the hard case: alice's bridged session [30..62] —
      // 8 events (4 stored across two intervals + 4 delta), pts
      // 7+1+2+4 + 20+30+40+50 = 154
      assert(want.contains((Some(1L), 8L, 154L, 30000L, 72000L)))
    } finally { MaterializedViews.drop("sess_mv_regimes"); () }
  }

  test("session CMV REFRESH: the fold advances the cutoff, the pull " +
    "still equals the recompute; DELETED recomputes touched keys — a " +
    "mid-session delete SPLITS, a full-key delete leaves the view") {
    val dir = freshDir("sess_ref")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM sref_src WITH (PATH='$dir/ev.parquet')")
    // start with the WHOLE delta cohort arr >= 1 (same set as arr = 1
    // here, but a refreshable shape: arr >= 1 ⊇ arr >= 2)
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW sess_mv_ref WITH (
         |  STATE_DIR='$dir/state', DELTA='arr >= 1') AS
         |SELECT user_id, COUNT(*) AS cnt, SUM(points) AS pts
         |FROM sref_src WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin)
    try {
      Translator.run(spark, c1,
        s"""REFRESH MATERIALIZED VIEW sess_mv_ref WITH (
           |  STATE_DIR='$dir/state2', DELTA='arr >= 2')""".stripMargin)
      // the fold moved every arr=1 session into the new artifact: the
      // bridged alice session must now be ONE stored interval
      val st2 = spark.read.parquet(s"$dir/state2")
      assert(MaterializedViews.view("sess_mv_ref").get.stateDir ==
        s"$dir/state2")
      assert(st2.filter(col("user_id") === 1L &&
        col("__first_ms") === 30000L && col("__last_ms") === 62000L)
        .count() == 1)
      val (_, Some(df)) = Translator.run(spark, Map.empty,
        "SELECT * FROM sess_mv_ref"): @unchecked
      assert(served(df) == recompute(corpus(), 10000L))
      // RETRACTION: delete alice's 40 s AND 46 s events (mid-chain —
      // the surviving 36→52 gap is 16 s > 10 s, so her bridged [30..62]
      // session SPLITS into [30..36] and [52..62]) and ALL of bob's
      // rows (his key leaves the view). Touched keys recompute from
      // surviving rows; carol and the NULL key take the ordinary
      // repair untouched.
      Translator.run(spark, c1,
        s"""REFRESH MATERIALIZED VIEW sess_mv_ref WITH (
           |  STATE_DIR='$dir/state3', DELTA='arr >= 2',
           |  DELETED='points = 30 OR points = 40 OR
           |    coalesce(user_id, -1) = 2')""".stripMargin)
      val (_, Some(df3)) = Translator.run(spark, Map.empty,
        "SELECT * FROM sess_mv_ref"): @unchecked
      val got3 = served(df3)
      val del = col("points") === 30L || col("points") === 40L ||
        coalesce(col("user_id"), lit(-1L)) === 2L
      val want3 = recompute(corpus().filter(!del), 10000L)
      assert(got3 == want3)
      // the split is real: alice now holds [30..36] and [52..62]
      assert(got3.exists(s => s._1 == Some(1L) && s._4 == 30000L &&
        s._5 == 46000L))
      assert(got3.exists(s => s._1 == Some(1L) && s._4 == 52000L &&
        s._5 == 72000L))
      // …and bob is gone
      assert(!got3.exists(_._1 == Some(2L)))
      // a SECOND retraction COMPOSES: the touched-key recompute excludes
      // the FIRST fold's tombstones too (deletedSoFar) — alice's 52 s
      // event leaves without resurrecting her deleted 40/46 s ones, and
      // bob (touched again via points = 50) stays gone
      Translator.run(spark, c1,
        s"""REFRESH MATERIALIZED VIEW sess_mv_ref WITH (
           |  STATE_DIR='$dir/state4', DELTA='arr >= 2',
           |  DELETED='points = 50')""".stripMargin)
      val (_, Some(df4)) = Translator.run(spark, Map.empty,
        "SELECT * FROM sess_mv_ref"): @unchecked
      val got4 = served(df4)
      val want4 = recompute(
        corpus().filter(!(del || col("points") === 50L)), 10000L)
      assert(got4 == want4)
      assert(got4.exists(s => s._1 == Some(1L) && s._4 == 60000L &&
        s._5 == 72000L))
      assert(!got4.exists(s => s._1 == Some(1L) && s._4 == 52000L))
      assert(!got4.exists(_._1 == Some(2L)))
    } finally { MaterializedViews.drop("sess_mv_ref"); () }
  }

  test("exact-gap boundary MERGES across the state/delta seam — " +
    "session_window / Kafka-Streams semantics (|Δt| <= gap joins), " +
    "pinned") {
    import spark.implicits._
    val dir = freshDir("sess_edge")
    // state session ends at 2 s; the delta event lands at EXACTLY
    // 2 s + 10 s gap — Spark's session_window (and Kafka Streams'
    // SessionWindows) merge it, so the interval repair must too
    Seq[(Long, Long, Long, Int)](
      (0L, 1L, 1L, 0), (2000L, 1L, 1L, 0), (12000L, 1L, 1L, 1))
      .toDF("ts_ms", "user_id", "points", "arr")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .select("ts", "user_id", "points", "arr")
      .write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM sedge_src WITH (PATH='$dir/ev.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW sess_edge_mv WITH (
         |  STATE_DIR='$dir/state', DELTA='arr = 1') AS
         |SELECT user_id, COUNT(*) AS cnt, SUM(points) AS pts
         |FROM sedge_src WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin)
    try {
      val (_, Some(df)) = Translator.run(spark, Map.empty,
        "SELECT * FROM sess_edge_mv"): @unchecked
      val got = served(df)
      // one merged session [0..12], windowend = 12 s + gap — and the
      // engine's own recompute agrees
      assert(got == Set((Some(1L), 3L, 3L, 0L, 22000L)), got.toString)
      assert(got == recompute(
        spark.read.parquet(s"$dir/ev.parquet"), 10000L))
    } finally { MaterializedViews.drop("sess_edge_mv"); () }
  }

  test("session CMV on sf events: pull by name equals the direct " +
    "session_window recompute (6-hour gap, arrival-keyed delta)") {
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM sev_src WITH (PATH='$sfDir/events.parquet')")
    val t = freshDir("sess_sf")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW sess_mv_sf WITH (
         |  STATE_DIR='$t/state', DELTA='event_id % 13 = 0') AS
         |SELECT user_id, COUNT(*) AS cnt,
         |  SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS pts
         |FROM sev_src WINDOW SESSION (6 HOURS)
         |GROUP BY user_id""".stripMargin)
    try {
      val (_, Some(df)) = Translator.run(spark, Map.empty,
        "SELECT * FROM sess_mv_sf"): @unchecked
      val want = recompute(Tables.events(spark, sfDir)
        .withColumn("points",
          floor(col("value") * 100.0 + 0.5).cast("long")), 21600000L)
      assert(served(df) == want)
      assert(want.nonEmpty)
    } finally { MaterializedViews.drop("sess_mv_sf"); () }
  }

  test("refusal surface: session_window keys refuse the mergeable-" +
    "partial path; unbound EMIT CHANGES, COUNT(DISTINCT), AVG, and " +
    "expression keys refuse the session path with pointers") {
    val dir = freshDir("sess_refuse")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val ev = spark.read.parquet(s"$dir/ev.parquet")
    // (1) the latent-wrong-answer class: a PROGRAMMATIC registration
    // keyed by session_window must refuse outright — struct-keyed
    // partial merge would serve wrong rows when a delta event extends
    // a stored session
    val e1 = intercept[IllegalArgumentException] {
      MaterializedViews.register(spark, "sess_bad_key", _ => ev,
        stateDir = s"$dir/bad",
        deltaPred = col("arr") === 1,
        groupCols = Seq(session_window(col("ts"), "10 seconds"),
          col("user_id")),
        aggCols = Seq(count(lit(1)).as("cnt")))
    }
    assert(e1.getMessage.contains("session_window group keys"))
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM srf_src WITH (PATH='$dir/ev.parquet')")
    def ddl(body: String, props: String = ""): String =
      s"""CREATE MATERIALIZED VIEW sess_refuse_mv WITH (
         |  STATE_DIR='$dir/state'$props, DELTA='arr = 1') AS
         |$body FROM srf_src WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin
    val e3 = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        ddl("SELECT user_id, COUNT(DISTINCT points) AS dp"))
    }
    assert(e3.getMessage.contains("DISTINCT"))
    val e4 = intercept[IllegalArgumentException] {
      Translator.run(spark, c1, ddl("SELECT user_id, AVG(points) AS ap"))
    }
    assert(e4.getMessage.contains("AVG"))
    val e5 = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        s"""CREATE MATERIALIZED VIEW sess_refuse_mv WITH (
           |  STATE_DIR='$dir/state', DELTA='arr = 1') AS
           |SELECT user_id % 2, COUNT(*) AS cnt
           |FROM srf_src WINDOW SESSION (10 SECONDS)
           |GROUP BY user_id % 2""".stripMargin)
    }
    assert(e5.getMessage.contains("plain base column"))
    // none of the refusals left an artifact or a registration behind
    assert(!new java.io.File(s"$dir/state").exists())
    assert(!MaterializedViews.registered.contains("sess_refuse_mv"))
    // (2) a session view registered WITHOUT a LIVE binding refuses the
    // push form with the binding pointer (same contract as flat views)
    Translator.run(spark, c1,
      ddl("SELECT user_id, COUNT(*) AS cnt"))
    try {
      val e6 = intercept[IllegalArgumentException] {
        Translator.run(spark, Map.empty,
          "SELECT * FROM sess_refuse_mv EMIT CHANGES")
      }
      assert(e6.getMessage.contains("no LIVE stream bound"))
    } finally { MaterializedViews.drop("sess_refuse_mv"); () }
  }

  test("session CMV signature: a reused STATE_DIR under a different " +
    "gap refuses; the identical statement re-registers idempotently") {
    val dir = freshDir("sess_sig")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM ssig_src WITH (PATH='$dir/ev.parquet')")
    def ddl(name: String, gap: String): String =
      s"""CREATE MATERIALIZED VIEW $name WITH (
         |  STATE_DIR='$dir/state', DELTA='arr = 1') AS
         |SELECT user_id, COUNT(*) AS cnt
         |FROM ssig_src WINDOW SESSION ($gap)
         |GROUP BY user_id""".stripMargin
    Translator.run(spark, c1, ddl("sess_sig_mv", "10 SECONDS"))
    try {
      // same name, same dir, DIFFERENT gap: the registration is
      // idempotent by name, so drop first to force the re-create path
      MaterializedViews.drop("sess_sig_mv")
      val e = intercept[IllegalArgumentException] {
        Translator.run(spark, c1, ddl("sess_sig_mv", "20 SECONDS"))
      }
      assert(e.getMessage.contains("DIFFERENT definition"))
      // the ORIGINAL statement re-registers from the existing artifact
      Translator.run(spark, c1, ddl("sess_sig_mv", "10 SECONDS"))
      assert(MaterializedViews.registered.contains("sess_sig_mv"))
      val (_, Some(df)) = Translator.run(spark, Map.empty,
        "SELECT * FROM sess_sig_mv"): @unchecked
      assert(df.count() > 0)
    } finally { MaterializedViews.drop("sess_sig_mv"); () }
  }

  test("session view push: EMIT CHANGES over a LIVE binding folds live " +
    "events through the interval repair — extend, bridge, new key, " +
    "NULL key; each key's max-__ver snapshot ≡ full re-sessionization") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = freshDir("sess_push")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val mem = MemoryStream[SessLiveRow](spark)
    val cat: Translator.Catalog = Map(
      "spush_src" -> Translator.Source(
        spark.read.parquet(s"$dir/ev.parquet"), "ts"),
      "spush_live" -> Translator.Source(mem.toDF(), "ts"))
    Translator.run(spark, cat,
      s"""CREATE MATERIALIZED VIEW sess_push_mv WITH (
         |  STATE_DIR='$dir/state', DELTA='arr = 1',
         |  LIVE='spush_live') AS
         |SELECT user_id, COUNT(*) AS cnt, SUM(points) AS pts
         |FROM spush_src WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin)
    try {
      val (_, Some(push)) = Translator.run(spark, cat,
        "SELECT * FROM sess_push_mv EMIT CHANGES"): @unchecked
      assert(push.isStreaming)
      assert(push.columns.toSeq ==
        Seq("user_id", "cnt", "pts", "windowstart", "windowend", "__ver"))
      val q = push.writeStream.format("memory")
        .queryName("sess_push_out").outputMode("update").start()
      def live(tsMs: Long, user: java.lang.Long, pts: Long) =
        SessLiveRow(new java.sql.Timestamp(tsMs), user, pts)
      def latest(): Map[Option[Long], Set[(Long, Long, Long, Long)]] = {
        val rows = spark.table("sess_push_out").collect()
        rows.groupBy(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
          .map { case (k, rs) =>
            val mx = rs.map(_.getLong(5)).max
            k -> rs.filter(_.getLong(5) == mx).map(r =>
              (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
              .toSet
          }
      }
      def want(liveRows: Seq[SessLiveRow])
        : Map[Option[Long], Set[(Long, Long, Long, Long)]] = {
        val liveDf = liveRows.toDF()
          .select(col("ts"), col("user_id"), col("points"),
            lit(9).as("arr"))
        recompute(corpus().unionByName(liveDf), 10000L)
          .groupBy(_._1)
          .map { case (k, ss) =>
            k -> ss.map(t => (t._2, t._3, t._4, t._5)) }
      }
      try {
        // batch 1: alice 68s EXTENDS the bridged [30..62] session to
        // [30..68]; dave is a NEW key; NULL-key event extends the
        // NULL session [100..108] to [100..115]
        val b1 = Seq(live(68000L, 1L, 7L), live(0L, 4L, 3L),
          live(115000L, null, 2L))
        mem.addData(b1: _*); q.processAllAvailable()
        val got1 = latest(); val want1 = want(b1)
        assert(got1.keySet == Set(Some(1L), Some(4L), None))
        got1.foreach { case (k, v) => assert(v == want1(k),
          s"key $k: got $v want ${want1(k)}") }
        // the seed carried batch history the stream never saw: alice's
        // emitted set includes the UNTOUCHED [0..2] session too
        assert(got1(Some(1L)).exists(_._3 == 0L))
        // batch 2: alice 11s extends [0..2]; 20s and 25s chain it into
        // a BRIDGE with [30..68] → ONE [0..68] session
        val b2 = Seq(live(11000L, 1L, 1L), live(20000L, 1L, 1L),
          live(25000L, 1L, 1L))
        mem.addData(b2: _*); q.processAllAvailable()
        val got2 = latest(); val want2 = want(b1 ++ b2)
        got2.foreach { case (k, v) => assert(v == want2(k),
          s"after batch 2, key $k: got $v want ${want2(k)}") }
        assert(got2(Some(1L)).size == 1 &&
          got2(Some(1L)).head._3 == 0L && got2(Some(1L)).head._4 == 78000L,
          s"alice must hold ONE bridged [0..68] session: ${got2(Some(1L))}")
      } finally q.stop()
    } finally { MaterializedViews.drop("sess_push_mv"); () }
  }

  test("DESCRIBE over a session view surfaces the gap, time column, " +
    "and LIVE binding") {
    val dir = freshDir("sess_desc")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM sdesc_src WITH (PATH='$dir/ev.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW sess_desc_mv WITH (
         |  STATE_DIR='$dir/state', DELTA='arr = 1',
         |  LIVE='sdesc_src') AS
         |SELECT user_id, COUNT(*) AS cnt
         |FROM sdesc_src WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin)
    try {
      val (_, Some(desc)) = Translator.run(spark, Map.empty,
        "DESCRIBE sess_desc_mv"): @unchecked
      val props = desc.collect().map(r => r.getString(0) -> r.getString(1))
        .toMap
      assert(props("(session gap ms)") == "10000")
      assert(props("(session time column)") == "ts")
      assert(props("(live source)") == "sdesc_src")
      assert(props("(aggregates)") == "cnt:count")
    } finally { MaterializedViews.drop("sess_desc_mv"); () }
  }

  test("transparent session rewrite: a plain session_window aggregate " +
    "over the base serves from the interval state (plan-pinned), a " +
    "group-key filter becomes the pull predicate, derived outputs map; " +
    "different gap / non-group filters / different keys bail") {
    val dir = freshDir("sess_rw")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM srw_src WITH (PATH='$dir/ev.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW sess_rw_mv WITH (
         |  STATE_DIR='$dir/state', DELTA='arr = 1') AS
         |SELECT user_id, COUNT(*) AS cnt, SUM(points) AS pts
         |FROM srw_src WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin)
    graft.plans.MaterializedViews.install(spark)
    val base = spark.read.parquet(s"$dir/ev.parquet")
    def collected(enabled: Boolean)(mk: => org.apache.spark.sql.DataFrame)
      : (Set[org.apache.spark.sql.Row], String) = {
      spark.conf.set("spark.graft.mv.enabled", enabled.toString)
      try {
        val df = mk
        (df.collect().toSet, df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.mv.enabled")
    }
    try {
      // (1) the user's plain session aggregate — own aliases, own
      // column order — serves from the interval artifact
      def q = base
        .groupBy(session_window(col("ts"), "10 seconds"), col("user_id"))
        .agg(count(lit(1)).as("c"), sum(col("points")).as("p"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("ws"),
          unix_millis(col("session_window.end")).as("we"),
          col("c"), col("p"))
      val (got, plan) = collected(enabled = true)(q)
      assert(plan.contains(s"$dir/state"),
        s"the session aggregate must serve from interval state\n$plan")
      val (want, offPlan) = collected(enabled = false)(q)
      assert(!offPlan.contains(s"$dir/state"))
      assert(got == want && got.nonEmpty)
      // (2) a group-key filter is the pull predicate: still served,
      // still exact
      def qf = base.filter(col("user_id") === 1L)
        .groupBy(session_window(col("ts"), "10 seconds"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      val (gotF, planF) = collected(enabled = true)(qf)
      assert(planF.contains(s"$dir/state"))
      val (wantF, _) = collected(enabled = false)(qf)
      assert(gotF == wantF && gotF.nonEmpty)
      // (3) bail-outs: a DIFFERENT gap, a non-group filter, and a
      // missing group key must pass through unrewritten
      def bails(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val (g, p) = collected(enabled = true)(mk)
        assert(!p.contains(s"$dir/state"), s"must not serve\n$p")
        val (w, _) = collected(enabled = false)(mk)
        assert(g == w)
      }
      bails(base
        .groupBy(session_window(col("ts"), "20 seconds"), col("user_id"))
        .agg(count(lit(1)).as("c")))
      bails(base.filter(col("points") > 2L)
        .groupBy(session_window(col("ts"), "10 seconds"), col("user_id"))
        .agg(count(lit(1)).as("c")))
      bails(base
        .groupBy(session_window(col("ts"), "10 seconds"))
        .agg(count(lit(1)).as("c")))
      // (4) the DIALECT session query serves too — WINDOWSTART/WINDOWEND
      // map through the rebuilt struct's subtrees
      def dq = {
        val (_, Some(df)) = Translator.run(spark, c1,
          """SELECT user_id, WINDOWSTART AS ws, WINDOWEND AS we,
            |  COUNT(*) AS cnt, SUM(points) AS pts
            |FROM srw_src WINDOW SESSION (10 SECONDS)
            |GROUP BY user_id""".stripMargin): @unchecked
        df
      }
      val (gotD, planD) = collected(enabled = true)(dq)
      assert(planD.contains(s"$dir/state"),
        s"the dialect session query must serve from interval state\n$planD")
      val (wantD, _) = collected(enabled = false)(dq)
      assert(gotD == wantD && gotD.nonEmpty)
    } finally { MaterializedViews.drop("sess_rw_mv"); () }
  }

  test("session CMV with a WHERE definition: the filter folds into " +
    "state, delta, and the matching-user-plan contract — a filterless " +
    "user query bails") {
    val dir = freshDir("sess_where")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM swh_src WITH (PATH='$dir/ev.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW sess_where_mv WITH (
         |  STATE_DIR='$dir/state', DELTA='arr = 1') AS
         |SELECT user_id, COUNT(*) AS cnt, SUM(points) AS pts
         |FROM swh_src WHERE points >= 2
         |WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin)
    graft.plans.MaterializedViews.install(spark)
    val base = spark.read.parquet(s"$dir/ev.parquet")
    try {
      // pull by name ≡ re-sessionizing the FILTERED base
      val (_, Some(pull)) = Translator.run(spark, Map.empty,
        "SELECT * FROM sess_where_mv"): @unchecked
      assert(served(pull) ==
        recompute(corpus().filter(col("points") >= 2L), 10000L))
      // a user query carrying the same WHERE serves from state
      def q(filtered: Boolean) = {
        val b = if (filtered) base.filter(col("points") >= 2L) else base
        b.groupBy(session_window(col("ts"), "10 seconds"), col("user_id"))
          .agg(count(lit(1)).as("c"), sum(col("points")).as("p"))
      }
      spark.conf.set("spark.graft.mv.enabled", "true")
      val (gotOn, planOn, gotBail, planBail) = try {
        (q(filtered = true).collect().toSet,
          q(filtered = true).queryExecution.executedPlan.toString,
          q(filtered = false).collect().toSet,
          q(filtered = false).queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.mv.enabled")
      assert(planOn.contains(s"$dir/state"), planOn)
      // …and the filterless query must NOT serve (it covers MORE rows
      // than the view) — correct either way
      assert(!planBail.contains(s"$dir/state"))
      spark.conf.set("spark.graft.mv.enabled", "false")
      try {
        assert(gotOn == q(filtered = true).collect().toSet)
        assert(gotBail == q(filtered = false).collect().toSet)
      } finally spark.conf.unset("spark.graft.mv.enabled")
    } finally { MaterializedViews.drop("sess_where_mv"); () }
  }

  test("a plain FLAT aggregate never serves from a session view — the " +
    "interval state answers session-window queries only") {
    val dir = freshDir("sess_norw")
    corpus().write.mode("overwrite").parquet(s"$dir/ev.parquet")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM snr_src WITH (PATH='$dir/ev.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW sess_norw_mv WITH (
         |  STATE_DIR='$dir/state', DELTA='arr = 1') AS
         |SELECT user_id, COUNT(*) AS cnt
         |FROM snr_src WINDOW SESSION (10 SECONDS)
         |GROUP BY user_id""".stripMargin)
    try {
      graft.plans.MaterializedViews.install(spark)
      val flat = spark.read.parquet(s"$dir/ev.parquet")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      // not served: the optimized plan still scans the base parquet,
      // never the session state artifact
      val plan = flat.queryExecution.optimizedPlan.toString
      assert(!plan.contains(s"$dir/state"))
      assert(MaterializedViews.servedCounts.getOrElse("sess_norw_mv", 0L)
        == 0L)
      assert(flat.filter(col("user_id") === 1L).collect()
        .head.getLong(1) == 10L)
    } finally { MaterializedViews.drop("sess_norw_mv"); () }
  }
}
