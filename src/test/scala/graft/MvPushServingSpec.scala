package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.json4s.JsonAST.{JArray, JInt, JObject, JString}
import org.json4s.jackson.JsonMethods

import graft.ksql.Translator
import graft.plans.MaterializedViews

/** Round-15: the ksqlDB TABLE surface over registered materialized
  * views — pull (`SELECT … FROM view`) served from merge(state ∪ Δ),
  * and push (`SELECT … FROM view EMIT CHANGES`) as the SEEDED streaming
  * continuation of the view's LIVE-bound stream: first answers come
  * from the batch-served state, increments fold live events through
  * the registered merge algebra, and the topic is never replayed.
  */
/** Live event: same columns the view's base aggregates read (top
  * level — Spark encoders refuse spec-inner case classes). */
case class MvPushLiveRow(o_orderstatus: String, o_orderkey: Long)
/** Windowed live event: (ts, event_type) — the events-table shape. */
case class MvPushWinRow(ts: java.sql.Timestamp, event_type: String)
/** Session live event — the session corpus's shape. */
case class MvPushSessRow(ts: java.sql.Timestamp, user_id: Long,
                         points: Long)

class MvPushServingSpec extends SparkSpec {
  private type LiveRow = MvPushLiveRow
  private def LiveRow(s: String, k: Long) = MvPushLiveRow(s, k)

  private def freshDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Full-recompute oracle over base ∪ live-so-far. */
  private def recompute(live: Seq[LiveRow]): Map[Option[String], (Long, Long, Long)] = {
    import spark.implicits._
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_orderkey"))
    val all = base.unionByName(live.toDF("o_orderstatus", "o_orderkey"))
    all.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sk"),
        min(col("o_orderkey")).as("mn"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("materialized view is queryable by name: pull serves the batch " +
    "answer, EMIT CHANGES folds the LIVE stream on top of the seed — " +
    "per-key latest emission ≡ full recompute over base ∪ live-so-far") {
    import spark.implicits._
    val root = freshDir("mv_push")
    val mem = MemoryStream[LiveRow](spark)
    val cat: Translator.Catalog = Map(
      "orders_src" -> Translator.Source(
        Tables.orders(spark, sfDir), "o_orderdate"),
      "orders_live" -> Translator.Source(mem.toDF(), "o_orderkey"))
    Translator.run(spark, cat,
      s"""CREATE MATERIALIZED VIEW push_mv WITH (
         |  STATE_DIR='$root/state',
         |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''',
         |  LIVE='orders_live') AS
         |SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS sk,
         |  MIN(o_orderkey) AS mn
         |FROM orders_src GROUP BY o_orderstatus""".stripMargin)
    try {
      // PULL: the view name answers the batch-served rollup, and the
      // plan reads the state artifact (the transparent rewrite fired)
      val (_, Some(pull)) = Translator.run(spark, cat,
        "SELECT * FROM push_mv"): @unchecked
      val pullPlan = pull.queryExecution.executedPlan.toString
      assert(pullPlan.contains(s"$root/state"),
        s"pull over the view name must serve from state\n$pullPlan")
      val want0 = recompute(Nil)
      val got0 = pull.collect()
        .map(r => Option(r.getString(0)) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got0 == want0)
      // PUSH: EMIT CHANGES over the view name — a streaming frame
      val (_, Some(push)) = Translator.run(spark, cat,
        "SELECT * FROM push_mv EMIT CHANGES"): @unchecked
      assert(push.isStreaming)
      val q = push.writeStream.format("memory").queryName("mv_push_out")
        .outputMode("update").start()
      try {
        // batch 1: two existing statuses + a NULL-keyed event; batch 2:
        // more of one status — count is monotone per key, so each key's
        // max-n row is its latest emission
        val b1 = Seq(LiveRow("F", 900000001L), LiveRow("O", 900000002L),
          LiveRow(null, 900000003L))
        mem.addData(b1: _*); q.processAllAvailable()
        def latest(): Map[Option[String], (Long, Long, Long)] = {
          import org.apache.spark.sql.expressions.Window
          spark.table("mv_push_out")
            .withColumn("__rn", row_number().over(Window
              .partitionBy(col("o_orderstatus"))
              .orderBy(col("n").desc)))
            .filter(col("__rn") === 1).drop("__rn")
            .collect()
            .map(r => Option(r.getString(0)) ->
              ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        }
        val want1 = recompute(b1)
        val got1 = latest()
        // emissions cover exactly the touched keys, each equal to the
        // FULL recompute — the seed carried the batch history the
        // stream never saw (no topic replay)
        assert(got1.keySet == Set(Some("F"), Some("O"), None))
        got1.foreach { case (k, v) => assert(v == want1(k),
          s"key $k: got $v want ${want1(k)}") }
        val b2 = Seq(LiveRow("F", 900000004L), LiveRow("F", 900000005L))
        mem.addData(b2: _*); q.processAllAvailable()
        val want2 = recompute(b1 ++ b2)
        val got2 = latest()
        got2.foreach { case (k, v) => assert(v == want2(k),
          s"after batch 2, key $k: got $v want ${want2(k)}") }
      } finally q.stop()
      // projection over the push frame resolves view output names
      val (_, Some(proj)) = Translator.run(spark, cat,
        "SELECT o_orderstatus, n FROM push_mv EMIT CHANGES"): @unchecked
      assert(proj.isStreaming && proj.columns.toSeq == Seq("o_orderstatus", "n"))
      // loud refusals: push without a LIVE binding; unknown live source
      val noLiveDir = freshDir("mv_push_nolive")
      Translator.run(spark, cat,
        s"""CREATE MATERIALIZED VIEW push_mv_nolive WITH (
           |  STATE_DIR='$noLiveDir/state',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''') AS
           |SELECT o_orderstatus, COUNT(*) AS n
           |FROM orders_src GROUP BY o_orderstatus""".stripMargin)
      val e1 = intercept[IllegalArgumentException] {
        Translator.run(spark, cat,
          "SELECT * FROM push_mv_nolive EMIT CHANGES")
      }
      assert(e1.getMessage.contains("LIVE"))
      val e2 = intercept[IllegalArgumentException] {
        Translator.run(spark, Map(
          "orders_src" -> cat("orders_src")),
          "SELECT * FROM push_mv EMIT CHANGES")
      }
      assert(e2.getMessage.contains("not in this catalog"))
      Translator.run(spark, Map.empty,
        "DROP MATERIALIZED VIEW push_mv_nolive;")
    } finally {
      Translator.run(spark, Map.empty,
        "DROP MATERIALIZED VIEW IF EXISTS push_mv;")
      // the push bind auto-selects the RocksDB provider; don't leak the
      // session conf into suites that pin their own
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("WINDOWED view push (tumbling + hopping): EMIT CHANGES folds " +
    "live events onto the pane-state seed on the same epoch grid — " +
    "per-(pane,key) latest emission ≡ the full re-window recompute") {
    import spark.implicits._
    val root = freshDir("mv_push_win")
    val memT = MemoryStream[MvPushWinRow](spark)
    val memH = MemoryStream[MvPushWinRow](spark)
    val cat: Translator.Catalog = Map(
      "ev_src" -> Translator.Source(Tables.events(spark, sfDir), "ts"),
      "ev_live_t" -> Translator.Source(memT.toDF(), "ts"),
      "ev_live_h" -> Translator.Source(memH.toDF(), "ts"))
    Translator.run(spark, cat,
      s"""CREATE MATERIALIZED VIEW win_push_mv WITH (
         |  STATE_DIR='$root/state',
         |  DELTA='ts >= TIMESTAMP ''2024-03-28 00:00:00''',
         |  LIVE='ev_live_t') AS
         |SELECT event_type, COUNT(*) AS cnt
         |FROM ev_src WINDOW TUMBLING (SIZE 2 HOURS)
         |GROUP BY event_type""".stripMargin)
    Translator.run(spark, cat,
      s"""CREATE MATERIALIZED VIEW hop_push_mv WITH (
         |  STATE_DIR='$root/state_h',
         |  DELTA='ts >= TIMESTAMP ''2024-03-28 00:00:00''',
         |  LIVE='ev_live_h') AS
         |SELECT event_type, COUNT(*) AS cnt
         |FROM ev_src WINDOW HOPPING (SIZE 4 HOURS, ADVANCE BY 2 HOURS)
         |GROUP BY event_type""".stripMargin)
    def recomputeWin(live: Seq[MvPushWinRow], sizeMs: Long,
                     advMs: Long): Map[(Long, String), Long] = {
      val base = Tables.events(spark, sfDir)
        .select(unix_millis(col("ts")).as("ms"), col("event_type"))
      val all = base.unionByName(live.toDF("ts", "event_type")
        .select(unix_millis(col("ts")).as("ms"), col("event_type")))
      val panes = (sizeMs / advMs).toInt
      all.withColumn("ws", explode(expr(
          s"transform(sequence(0, ${panes - 1}), i -> " +
            s"(ms div $advMs) * $advMs - i * $advMs)")))
        .groupBy(col("ws"), col("event_type")).count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
    }
    try {
      def driveOne(name: String, mem: MemoryStream[MvPushWinRow],
                   sink: String, sizeMs: Long, advMs: Long): Unit = {
        val (_, Some(push)) = Translator.run(spark, cat,
          s"SELECT * FROM $name EMIT CHANGES"): @unchecked
        assert(push.isStreaming)
        assert(push.columns.take(2).toSeq ==
          Seq("windowstart", "windowend"))
        val q = push.writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try {
          // one event extends an EXISTING pane (inside the live data's
          // region), one opens a NEW pane past the corpus
          val b1 = Seq(
            MvPushWinRow(java.sql.Timestamp.valueOf("2024-03-28 01:10:00"), "click"),
            MvPushWinRow(java.sql.Timestamp.valueOf("2024-05-01 00:30:00"), "view"))
          mem.addData(b1: _*); q.processAllAvailable()
          val b2 = Seq(
            MvPushWinRow(java.sql.Timestamp.valueOf("2024-05-01 00:45:00"), "view"))
          mem.addData(b2: _*); q.processAllAvailable()
          val want = recomputeWin(b1 ++ b2, sizeMs, advMs)
          import org.apache.spark.sql.expressions.Window
          val got = spark.table(sink)
            .withColumn("__rn", row_number().over(Window
              .partitionBy(col("windowstart"), col("event_type"))
              .orderBy(col("cnt").desc)))
            .filter(col("__rn") === 1).drop("__rn")
            .collect()
            .map(r => (r.getLong(0), r.getString(2)) ->
              (r.getLong(1), r.getLong(3)))
            .toMap
          got.foreach { case ((ws, t), (we, cnt)) =>
            assert(we == ws + sizeMs, s"windowend must be start + size")
            assert(cnt == want((ws, t)),
              s"pane ($ws, $t): got $cnt want ${want((ws, t))}")
          }
          assert(got.nonEmpty)
        } finally q.stop()
      }
      driveOne("win_push_mv", memT, "win_push_out", 7200000L, 7200000L)
      driveOne("hop_push_mv", memH, "hop_push_out", 14400000L, 7200000L)
      // windowed PULL by name surfaces the millis pseudo-columns
      val (_, Some(pull)) = Translator.run(spark, cat,
        "SELECT * FROM win_push_mv"): @unchecked
      assert(pull.columns.contains("windowstart") &&
        pull.columns.contains("windowend") && !pull.isStreaming)
      assert(pull.count() > 0)
    } finally {
      Translator.run(spark, Map.empty,
        "DROP MATERIALIZED VIEW IF EXISTS win_push_mv;")
      Translator.run(spark, Map.empty,
        "DROP MATERIALIZED VIEW IF EXISTS hop_push_mv;")
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("POST /query-stream over a LIVE-bound view: chunked emissions " +
    "are seeded (batch history included) and increment per micro-batch") {
    import spark.implicits._
    val root = freshDir("mv_push_rest")
    val mem = MemoryStream[LiveRow](spark)
    val srv = new graft.ksql.RestServer(spark, Map(
      "orders_src" -> Translator.Source(
        Tables.orders(spark, sfDir), "o_orderdate"),
      "orders_live" -> Translator.Source(mem.toDF(), "o_orderkey")),
      maxRows = 10).start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def ksql(stmt: String): Unit = {
        val body = JsonMethods.compact(JObject("ksql" -> JString(stmt)))
        val req = java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(
              s"http://127.0.0.1:${srv.boundPort}/ksql"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200, resp.body())
      }
      ksql(s"""CREATE MATERIALIZED VIEW rest_push_mv WITH (
              |  STATE_DIR='$root/state',
              |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''',
              |  LIVE='orders_live') AS
              |SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS sk,
              |  MIN(o_orderkey) AS mn
              |FROM orders_src GROUP BY o_orderstatus;""".stripMargin)
      val url = java.net.URI.create(
        s"http://127.0.0.1:${srv.boundPort}/query-stream").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setDoOutput(true); conn.setRequestMethod("POST")
      val body = JsonMethods.compact(JObject(
        "sql" -> JString("SELECT * FROM rest_push_mv EMIT CHANGES;"),
        "maxRows" -> JInt(2)))
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
      val header = reader.readLine()
      assert(header != null && header.contains("\"header\""), header)
      def nextLine(): String = {
        var l = reader.readLine()
        while (l != null && l.trim.isEmpty) l = reader.readLine()
        assert(l != null, "stream ended unexpectedly")
        l
      }
      def parseRow(line: String): (String, Long, Long, Long) = {
        val JArray(cols) =
          (JsonMethods.parse(line) \ "row" \ "columns"): @unchecked
        (cols.head.values.toString,
          BigInt(cols(1).values.toString).toLong,
          BigInt(cols(2).values.toString).toLong,
          BigInt(cols(3).values.toString).toLong)
      }
      // micro-batch 1 touches one key; its emission must include the
      // BATCH history (seeded), which this connection never streamed
      val b1 = Seq(LiveRow("F", 900000010L))
      mem.addData(b1: _*)
      val r1 = parseRow(nextLine())
      val want1 = recompute(b1)(Some("F"))
      assert(r1 == (("F", want1._1, want1._2, want1._3)), s"$r1 vs $want1")
      // micro-batch 2, same connection, increments on top
      val b2 = Seq(LiveRow("F", 900000011L))
      mem.addData(b2: _*)
      val r2 = parseRow(nextLine())
      val want2 = recompute(b1 ++ b2)(Some("F"))
      assert(r2 == (("F", want2._1, want2._2, want2._3)), s"$r2 vs $want2")
      assert(nextLine().contains("Limit Reached"))
      reader.close()
      ksql("DROP MATERIALIZED VIEW rest_push_mv;")
    } finally {
      srv.stop()
      MaterializedViews.drop("rest_push_mv")
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("POST /query-stream over a SESSION view (round-16 verdict #6): " +
    "chunked emissions carry version-stamped FULL session sets, a " +
    "bridge event retracts the subsumed sessions in the next emission, " +
    "and connection teardown stops the continuation") {
    import spark.implicits._
    val root = freshDir("mv_push_sess_rest")
    // state corpus, gap 10 s: user 1 holds session A = [0 s, 2 s]
    // (points 5, 7) and session B = [20 s, 22 s] (points 1, 2); all
    // arr = 0 (pure state, empty batch delta)
    Seq((0L, 1L, 5L, 0L), (2000L, 1L, 7L, 0L),
      (20000L, 1L, 1L, 0L), (22000L, 1L, 2L, 0L))
      .toDF("ts_ms", "user_id", "points", "arr")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .select("ts", "user_id", "points", "arr")
      .write.mode("overwrite").parquet(s"$root/ev.parquet")
    val mem = MemoryStream[MvPushSessRow](spark)
    val srv = new graft.ksql.RestServer(spark, Map(
      "sess_src" -> Translator.Source(
        spark.read.parquet(s"$root/ev.parquet"), "ts"),
      "sess_live" -> Translator.Source(mem.toDF(), "ts")),
      maxRows = 10).start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def ksql(stmt: String): Unit = {
        val body = JsonMethods.compact(JObject("ksql" -> JString(stmt)))
        val req = java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(
              s"http://127.0.0.1:${srv.boundPort}/ksql"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200, resp.body())
      }
      ksql(s"""CREATE MATERIALIZED VIEW rest_sess_mv WITH (
              |  STATE_DIR='$root/state', DELTA='arr >= 1',
              |  LIVE='sess_live') AS
              |SELECT user_id, COUNT(*) AS n, SUM(points) AS sp
              |FROM sess_src WINDOW SESSION (10 SECONDS)
              |GROUP BY user_id;""".stripMargin)
      val activeBefore = spark.streams.active.length
      val url = java.net.URI.create(
        s"http://127.0.0.1:${srv.boundPort}/query-stream").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setDoOutput(true); conn.setRequestMethod("POST")
      val body = JsonMethods.compact(JObject(
        "sql" -> JString("SELECT * FROM rest_sess_mv EMIT CHANGES;"),
        "maxRows" -> JInt(10)))
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
      val header = reader.readLine()
      assert(header != null && header.contains("\"header\""), header)
      def nextLine(): String = {
        var l = reader.readLine()
        while (l != null && l.trim.isEmpty) l = reader.readLine()
        assert(l != null, "stream ended unexpectedly")
        l
      }
      // columns: user_id, n, sp, windowstart, windowend, __ver
      def parseRow(line: String): (Long, Long, Long, Long, Long, Long) = {
        val JArray(cols) =
          (JsonMethods.parse(line) \ "row" \ "columns"): @unchecked
        def l(i: Int) = BigInt(cols(i).values.toString).toLong
        (l(0), l(1), l(2), l(3), l(4), l(5))
      }
      // micro-batch 1: a live event at 30 s EXTENDS session B to
      // [20 s, 30 s]. The emission is user 1's FULL session set —
      // session A arrives too, though untouched, under ONE version
      mem.addData(MvPushSessRow(
        new java.sql.Timestamp(30000L), 1L, 100L))
      val e1 = Set(parseRow(nextLine()), parseRow(nextLine()))
      val ver1 = e1.head._6
      assert(e1.forall(_._6 == ver1), s"mixed versions in one set: $e1")
      assert(e1.map(r => (r._1, r._2, r._3, r._4, r._5)) === Set(
        (1L, 2L, 12L, 0L, 12000L),        // session A, untouched
        (1L, 3L, 103L, 20000L, 40000L)),  // session B extended by 30 s
        s"got $e1")
      // micro-batch 2: an event at 12 s touches A (exact-gap boundary
      // merges) AND reaches B (20 − 12 ≤ gap) — the BRIDGE. The next
      // emission's full set is ONE merged session; the subsumed pair is
      // retracted by its absence under the newer version
      mem.addData(MvPushSessRow(
        new java.sql.Timestamp(12000L), 1L, 1000L))
      val e2 = parseRow(nextLine())
      assert(e2._6 > ver1, s"version did not advance: $e2 vs $ver1")
      assert((e2._1, e2._2, e2._3, e2._4, e2._5) ===
        ((1L, 6L, 1115L, 0L, 40000L)), s"got $e2")
      // teardown: closing the connection stops the continuation query
      reader.close(); conn.disconnect()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.length > activeBefore &&
        System.nanoTime() < deadline) Thread.sleep(100)
      assert(spark.streams.active.length == activeBefore,
        "continuation query still running after connection teardown")
      ksql("DROP MATERIALIZED VIEW rest_sess_mv;")
    } finally {
      srv.stop()
      MaterializedViews.drop("rest_sess_mv")
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
