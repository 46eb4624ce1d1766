package graft

import graft.ksql.{Repl, RestServer, Translator}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The KSQL REST surface end-to-end over HTTP: DDL + CSAS on /ksql
  * thread the catalog across requests, /query streams pull-query rows
  * as JSON lines with the limit guard, errors come back as
  * statement_error payloads.
  */
class RestServerSpec extends SparkSpec {

  private lazy val server =
    new RestServer(spark, Repl.preloadCatalog(spark, sfDir), maxRows = 10).start()
  private lazy val http = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    server.stop()
    super.afterAll()
  }

  private def post(path: String, sql: String): (Int, String) = {
    val body = JsonMethods.compact(JObject("ksql" -> JString(sql)))
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def get(path: String): (Int, String) = {
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}$path")).GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("healthcheck and info answer") {
    val (hc, hb) = get("/healthcheck")
    assert(hc == 200 && (JsonMethods.parse(hb) \ "isHealthy") == JBool(true))
    val (ic, ib) = get("/info")
    assert(ic == 200 &&
      (JsonMethods.parse(ib) \ "KsqlServerInfo" \ "version") == JString("graft"))
  }

  test("/metrics exposes Prometheus-format engine gauges and statement counters") {
    val (c0, b0) = get("/metrics")
    assert(c0 == 200, b0)
    assert(b0.contains("# TYPE ksql_statements_total counter"), b0)
    assert(b0.contains("ksql_catalog_sources 10"), b0) // the preloaded sf tables
    assert(b0.contains("ksql_active_queries"), b0)
    def counter(body: String, name: String): Long =
      body.linesIterator.find(l => l.startsWith(name + " "))
        .map(_.split(' ')(1).toLong).getOrElse(-1L)
    val s0 = counter(b0, "ksql_statements_total")
    val e0 = counter(b0, "ksql_statement_errors_total")
    post("/ksql", "SHOW STREAMS;")                 // counted, succeeds
    post("/ksql", "SELECT * FROM no_such_table;")  // counted, errors
    val (_, b1) = get("/metrics")                  // scrapes are NOT counted
    assert(counter(b1, "ksql_statements_total") == s0 + 2, b1)
    assert(counter(b1, "ksql_statement_errors_total") == e0 + 1, b1)
    // the MV-serving counter family is always declared (entries appear
    // per registered view as rewrites happen)
    assert(b1.contains("# TYPE ksql_mv_rewrites_total counter"), b1)
  }

  test("/ksql executes DDL + CSAS and the catalog threads to later requests") {
    val (c1, b1) = post("/ksql",
      """CREATE STREAM big_orders AS
        |SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 200000 EMIT CHANGES;""".stripMargin)
    assert(c1 == 200, b1)
    val JArray(entries) = JsonMethods.parse(b1): @unchecked
    assert(entries.size == 1)
    assert((entries.head \ "commandStatus" \ "status") == JString("SUCCESS"))
    // the CSAS result is queryable in a SEPARATE request
    val (c2, b2) = post("/query", "SELECT COUNT(*) AS n FROM big_orders;")
    assert(c2 == 200, b2)
    val lines = b2.linesIterator.toSeq
    val expected = Tables.orders(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("o_totalprice") > 200000).count()
    assert((JsonMethods.parse(lines(1)) \ "row" \ "columns") ==
      JArray(List(JInt(BigInt(expected)))))
  }

  test("/query returns header + rows and enforces the pull-query limit") {
    val (code, body) = post("/query",
      "SELECT o_orderkey FROM orders EMIT CHANGES;")
    assert(code == 200, body)
    val lines = body.linesIterator.toSeq
    val header = JsonMethods.parse(lines.head) \ "header" \ "schema"
    assert(header == JArray(List(JObject(
      "name" -> JString("o_orderkey"), "type" -> JString("bigint")))))
    // maxRows=10: 10 row lines + the limit notice
    assert(lines.count(_.contains("\"row\"")) == 10)
    assert((JsonMethods.parse(lines.last) \ "finalMessage") ==
      JString("Limit Reached"))
  }

  test("TIME values render over REST in ksqlDB's HH:mm:ss[.fff] JSON " +
    "form (whole seconds pinned — LocalTime.toString would drop :00)") {
    val (code, body) = post("/query",
      "SELECT PARSE_TIME('09:05:00', 'HH:mm:ss') AS t, " +
        "TIMEADD(MILLISECONDS, 250, PARSE_TIME('09:05:00', 'HH:mm:ss')) " +
        "AS tf FROM orders EMIT CHANGES;")
    assert(code == 200, body)
    val row = body.linesIterator.find(_.contains("\"row\"")).get
    val cols = (JsonMethods.parse(row) \ "row" \ "columns")
      .asInstanceOf[JArray].arr
    assert(cols.head == JString("09:05:00"))
    assert(cols(1) == JString("09:05:00.250"))
  }

  test("SHOW on /ksql answers with its entity listing inline") {
    val (code, body) = post("/ksql", "SHOW STREAMS;")
    assert(code == 200, body)
    val JArray(entries) = JsonMethods.parse(body): @unchecked
    assert((entries.head \ "commandStatus" \ "status") == JString("SUCCESS"))
    val JArray(cols) = (entries.head \ "columnNames"): @unchecked
    assert(cols.nonEmpty, body)
    val JArray(rows) = (entries.head \ "rows"): @unchecked
    // the preloaded catalog has 10 sources; listing is non-empty
    assert(rows.nonEmpty, body)
  }

  test("push query: EMIT CHANGES over a streaming source drains available rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    mem.addData(
      Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 5.0),
      Ev(2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "buy", 9.0),
      Ev(3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 8L, "click", 1.0))
    val srv = new RestServer(spark,
      Map("clicks" -> Translator.Source(mem.toDF(), "ts")), maxRows = 10).start()
    try {
      val body = JsonMethods.compact(JObject("ksql" -> JString(
        "SELECT event_id, event_type FROM clicks EMIT CHANGES;")))
      val req = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      val lines = resp.body().linesIterator.toSeq
      assert(lines.count(_.contains("\"row\"")) == 3, resp.body())
      // aggregation push (complete-mode fallback): current per-type state
      val aggBody = JsonMethods.compact(JObject("ksql" -> JString(
        "SELECT event_type, COUNT(*) AS n FROM clicks GROUP BY event_type EMIT CHANGES;")))
      val aggReq = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
        .POST(HttpRequest.BodyPublishers.ofString(aggBody)).build()
      val aggResp = http.send(aggReq, HttpResponse.BodyHandlers.ofString())
      assert(aggResp.statusCode() == 200, aggResp.body())
      val counts = aggResp.body().linesIterator
        .filter(_.contains("\"row\"")).map { l =>
          val JArray(cols) = (JsonMethods.parse(l) \ "row" \ "columns"): @unchecked
          (cols.head.values.toString, cols(1).values)
        }.toMap
      assert(counts == Map("click" -> BigInt(2), "buy" -> BigInt(1)), aggResp.body())
    } finally srv.stop()
  }

  test("push query is CONTINUOUS: a second POST returns only the increment") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    mem.addData(
      Ev(1L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 1L, "click", 1.0),
      Ev(2L, java.sql.Timestamp.valueOf("2024-02-01 00:01:00"), 1L, "view", 2.0))
    val srv = new RestServer(spark,
      Map("live" -> Translator.Source(mem.toDF(), "ts")), maxRows = 10).start()
    try {
      def drain(): Seq[Long] = {
        val body = JsonMethods.compact(JObject("ksql" -> JString(
          "SELECT event_id, event_type FROM live EMIT CHANGES;")))
        val req = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200, resp.body())
        resp.body().linesIterator.filter(_.contains("\"row\"")).map { l =>
          val JArray(cols) = (JsonMethods.parse(l) \ "row" \ "columns"): @unchecked
          BigInt(cols.head.values.toString).toLong
        }.toSeq
      }
      assert(drain().sorted == Seq(1L, 2L))
      // nothing new arrived -> the increment is empty, not a re-drain
      assert(drain().isEmpty)
      // new source data -> ONLY the new rows come back (append mode)
      mem.addData(
        Ev(3L, java.sql.Timestamp.valueOf("2024-02-01 00:02:00"), 2L, "buy", 3.0))
      assert(drain() == Seq(3L))
    } finally srv.stop()
  }

  test("push sink is BOUNDED: buffered rows never exceed the ring, oldest evict") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    // maxRows=10 → ring capacity 40; feed 100 rows before any drain
    val srv = new RestServer(spark,
      Map("flood" -> Translator.Source(mem.toDF(), "ts")), maxRows = 10).start()
    val stmt = "SELECT event_id, event_type FROM flood EMIT CHANGES;"
    try {
      // one addData per row: each is its own source block, so the
      // batch's partition order — and therefore the ring's arrival
      // order — is the insertion order (a single 100-row addData may
      // split across partitions in an engine-chosen order)
      (1 to 100).foreach(i => mem.addData(
        Ev(i.toLong, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
          1L, "click", 1.0)))
      def drain(): Seq[Long] = {
        val body = JsonMethods.compact(JObject("ksql" -> JString(stmt)))
        val req = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200, resp.body())
        resp.body().linesIterator.filter(_.contains("\"row\"")).map { l =>
          val JArray(cols) = (JsonMethods.parse(l) \ "row" \ "columns"): @unchecked
          BigInt(cols.head.values.toString).toLong
        }.toSeq
      }
      // 100 arrivals through a 40-slot ring: the 60 oldest evicted, the
      // drain serves the OLDEST SURVIVING page (61..70), and driver
      // state stays O(ring), not O(stream)
      assert(drain() == (61L to 70L))
      assert(srv.pushDroppedRows(stmt).contains(60L))
      assert(srv.pushBufferedRows(stmt).exists(n => n <= 40))
      // next page continues where the last drain evicted to
      assert(drain() == (71L to 80L))
    } finally srv.stop()
  }

  test("/metrics exposes push-ring and stream-connection backpressure " +
    "gauges that move under a slow consumer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val srv = new RestServer(spark,
      Map("bp" -> Translator.Source(mem.toDF(), "ts")), maxRows = 10).start()
    val stmt = "SELECT event_id, event_type FROM bp EMIT CHANGES;"
    try {
      def scrape(): String = {
        val req = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}/metrics"))
          .GET().build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200)
        resp.body()
      }
      def metric(body: String, name: String): Option[Long] =
        body.linesIterator
          .find(l => l.startsWith(name + "{") || l.startsWith(name + " "))
          .map(_.split(' ').last.toLong)
      // slow push consumer: 100 arrivals, ONE drain of 10 — the scrape
      // must show the ring's occupancy (30), capacity (40) and the 60
      // evicted rows, labeled by statement
      (1 to 100).foreach(i => mem.addData(
        Ev(i.toLong, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
          1L, "click", 1.0)))
      val body = JsonMethods.compact(JObject("ksql" -> JString(stmt)))
      val req = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      assert(http.send(req, HttpResponse.BodyHandlers.ofString())
        .statusCode() == 200)
      val m1 = scrape()
      assert(m1.contains("# TYPE ksql_push_ring_rows gauge"), m1)
      assert(metric(m1, "ksql_push_ring_rows").contains(30L), m1)
      assert(metric(m1, "ksql_push_ring_capacity").contains(40L), m1)
      assert(metric(m1, "ksql_push_ring_dropped_total").contains(60L), m1)
      assert(m1.contains("""statement="SELECT event_id"""), m1)
      // live /query-stream subscription: per-connection served counter
      val url = java.net.URI.create(
        s"http://127.0.0.1:${srv.boundPort}/query-stream").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setDoOutput(true); conn.setRequestMethod("POST")
      conn.getOutputStream.write(JsonMethods.compact(JObject(
        "sql" -> JString(stmt))).getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
      assert(reader.readLine().contains("\"header\""))
      mem.addData(
        Ev(101L, java.sql.Timestamp.valueOf("2024-03-01 00:01:00"),
          1L, "view", 1.0),
        Ev(102L, java.sql.Timestamp.valueOf("2024-03-01 00:01:01"),
          1L, "view", 1.0))
      assert(reader.readLine().contains("\"row\""))
      assert(reader.readLine().contains("\"row\""))
      // the handler bumps served just AFTER the flush the client read —
      // poll the scrape briefly instead of racing it
      val d2 = System.nanoTime() + 10_000_000_000L
      var m2 = scrape()
      while (!metric(m2, "ksql_stream_served_rows_total").contains(2L) &&
          System.nanoTime() < d2) { Thread.sleep(50); m2 = scrape() }
      assert(metric(m2, "ksql_stream_served_rows_total").contains(2L), m2)
      assert(metric(m2, "ksql_stream_ring_rows").isDefined, m2)
      assert(metric(m2, "ksql_stream_ring_dropped_total").contains(0L), m2)
      reader.close(); conn.disconnect()
      // the subscription's gauges leave with the connection. Teardown
      // needs up to TWO keep-alive cycles (~5 s apart): the first write
      // after a disconnect can land in the OS send buffer without
      // erroring, so only the second surfaces the IOException — under
      // host load that is right at 10 s, so the deadline is 30.
      val deadline = System.nanoTime() + 30_000_000_000L
      var m3 = scrape()
      while (metric(m3, "ksql_stream_served_rows_total").isDefined &&
          System.nanoTime() < deadline) { Thread.sleep(100); m3 = scrape() }
      assert(metric(m3, "ksql_stream_served_rows_total").isEmpty, m3)
    } finally srv.stop()
  }

  test("/query-stream: one chunked connection serves two increments live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val srv = new RestServer(spark,
      Map("wire" -> Translator.Source(mem.toDF(), "ts")), maxRows = 10).start()
    try {
      val url = java.net.URI.create(
        s"http://127.0.0.1:${srv.boundPort}/query-stream").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setDoOutput(true)
      conn.setRequestMethod("POST")
      val body = JsonMethods.compact(JObject(
        "sql" -> JString("SELECT event_id, event_type FROM wire EMIT CHANGES;"),
        "maxRows" -> JInt(3)))
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
      // header arrives before any data exists — the connection is live
      val header = reader.readLine()
      assert(header != null && header.contains("\"header\""), header)
      def rowId(line: String): Long = {
        val JArray(cols) = (JsonMethods.parse(line) \ "row" \ "columns"): @unchecked
        BigInt(cols.head.values.toString).toLong
      }
      // increment 1: two rows, read from the SAME open response
      mem.addData(
        Ev(1L, java.sql.Timestamp.valueOf("2024-04-01 00:00:00"), 1L, "click", 1.0),
        Ev(2L, java.sql.Timestamp.valueOf("2024-04-01 00:00:01"), 1L, "view", 2.0))
      assert(Seq(rowId(reader.readLine()), rowId(reader.readLine())).sorted
        == Seq(1L, 2L))
      // increment 2, same connection — then the maxRows cap closes it
      mem.addData(
        Ev(3L, java.sql.Timestamp.valueOf("2024-04-01 00:00:02"), 1L, "buy", 3.0))
      assert(rowId(reader.readLine()) == 3L)
      assert(reader.readLine().contains("Limit Reached"))
      assert(reader.readLine() == null) // response genuinely ended
      reader.close()
      // a STREAMING aggregation can't append per-update rows — the
      // chunked transport rejects it with guidance (snapshots live on
      // /query's complete-mode fallback)
      val aggBody = JsonMethods.compact(JObject("sql" -> JString(
        "SELECT event_type, COUNT(*) AS n FROM wire GROUP BY event_type EMIT CHANGES;")))
      val aggReq = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}/query-stream"))
        .POST(HttpRequest.BodyPublishers.ofString(aggBody)).build()
      val aggResp = http.send(aggReq, HttpResponse.BodyHandlers.ofString())
      assert(aggResp.statusCode() == 400, aggResp.body())
      assert(aggResp.body().contains("statement_error"), aggResp.body())
    } finally srv.stop()
  }

  test("/query-stream rejects aggregations and serves pull queries to completion") {
    // aggregation push: append mode is impossible → 400 with guidance
    val aggBody = JsonMethods.compact(JObject("sql" -> JString(
      "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus EMIT CHANGES;")))
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}/query-stream"))
      .POST(HttpRequest.BodyPublishers.ofString(aggBody)).build()
    // orders in the preload catalog is a BATCH frame, so this is a pull
    // query — served fully and closed (the unified-endpoint behavior)
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200, resp.body())
    assert(resp.body().linesIterator.count(_.contains("\"row\"")) >= 1)
  }

  test("SELECT on /ksql is a 400 statement_error; bad /query statements too") {
    // real ksqlDB rejects pull queries on /ksql with HTTP 400 and its
    // "use /query" guidance — not a 200 with an inline error entry
    val (c1, b1) = post("/ksql", "SELECT 1 FROM orders;")
    assert(c1 == 400, b1)
    val err = JsonMethods.parse(b1)
    assert((err \ "@type") == JString("statement_error"))
    assert((err \ "message").values.toString.contains("/query"))
    val (c2, b2) = post("/query", "SELECT nope FROM not_a_stream;")
    assert(c2 == 400, b2)
    assert((JsonMethods.parse(b2) \ "@type") == JString("statement_error"))
  }

  test("mid-batch failure answers 400 with results up to the failure point") {
    // the first statement mutates the catalog before the second fails;
    // the error payload must expose that partial application
    val (code, body) = post("/ksql",
      """CREATE STREAM batch_ok AS SELECT o_orderkey FROM orders;
        |CREATE STREAM batch_bad AS SELECT nope FROM not_a_stream;""".stripMargin)
    assert(code == 400, body)
    val err = JsonMethods.parse(body)
    assert((err \ "@type") == JString("statement_error"))
    val JArray(done) = (err \ "entities"): @unchecked
    assert(done.size == 1, body)
    assert((done.head \ "statementText").values.toString.contains("batch_ok"))
    // the catalog kept the first statement — visible to the next request
    val (c3, b3) = post("/query", "SELECT COUNT(*) AS n FROM batch_ok;")
    assert(c3 == 200, b3)
  }

  test("paths prefix-matching a context 404 instead of hitting its handler") {
    val (code, _) = post("/ksqlanything", "SHOW STREAMS;")
    assert(code == 404)
  }

  private def postTo(port: Int, path: String, sql: String,
                     authHeader: Option[String] = None): (Int, String) = {
    val body = JsonMethods.compact(JObject("ksql" -> JString(sql)))
    val b = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    authHeader.foreach(h => b.header("Authorization", h))
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("command log: DDL on server A binds on B, late joiners and restarts converge") {
    // the charm's actual deployment semantic: a ksql-server CLUSTER
    // where every node replays one shared command topic. Here the topic
    // is a file log; A appends its DDL, B replays before serving any
    // request, a server started LATER converges in start(), and a
    // restart (fresh server, same log) replays idempotently.
    val log = java.nio.file.Files.createTempFile("graft_cmdlog", ".jsonl")
    def mk() = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, commandLog = Some(log)).start()
    val srvA = mk()
    val srvB = mk()
    try {
      val (c1, b1) = postTo(srvA.boundPort, "/ksql",
        """CREATE STREAM repl_big AS
          |SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > 200000;""".stripMargin)
      assert(c1 == 200, b1)
      val expected = Tables.orders(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("o_totalprice") > 200000)
        .count()
      // B never saw the POST — it learns the stream from the log
      val (c2, b2) = postTo(srvB.boundPort, "/query",
        "SELECT COUNT(*) AS n FROM repl_big;")
      assert(c2 == 200, b2)
      assert((JsonMethods.parse(b2.linesIterator.toSeq(1)) \ "row" \ "columns")
        == JArray(List(JInt(BigInt(expected)))), b2)
      // a server started AFTER the DDL converges during start()
      val srvC = mk()
      try {
        val (c3, b3) = postTo(srvC.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM repl_big;")
        assert(c3 == 200, b3)
      } finally srvC.stop()
      // restart: stop A, bring up a replacement over the same log — the
      // replay is idempotent (same CREATE applied again on a fresh
      // catalog) and DDL posted to the replacement reaches B too
      srvA.stop()
      val srvA2 = mk()
      try {
        val (c4, b4) = postTo(srvA2.boundPort, "/ksql",
          "CREATE STREAM repl_cheap AS SELECT o_orderkey FROM orders WHERE o_totalprice < 1000;")
        assert(c4 == 200, b4)
        val (c5, b5) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM repl_cheap;")
        assert(c5 == 200, b5)
      } finally srvA2.stop()
      // the log holds exactly the two catalog-mutating statements —
      // pull queries and SHOWs never land on the command topic
      val entries = java.nio.file.Files.readAllLines(log)
      assert(entries.size == 2, entries)
      assert(entries.get(0).contains("repl_big") &&
        entries.get(1).contains("repl_cheap"), entries)
    } finally {
      srvB.stop()
      try srvA.stop() catch { case _: Throwable => () }
      java.nio.file.Files.deleteIfExists(log)
    }
  }

  test("command log: CREATE MATERIALIZED VIEW replicates — late joiners " +
    "re-register from the log against the already-built state artifact, " +
    "compaction keeps the view, DROP replicates too") {
    val log = java.nio.file.Files.createTempFile("graft_cmdlog_mv", ".jsonl")
    val t = java.nio.file.Files.createTempDirectory("rest_mv_repl").toString
    def mk() = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, commandLog = Some(log)).start()
    def stateParts: Int = Option(new java.io.File(s"$t/state").listFiles())
      .toSeq.flatten.count(_.getName.startsWith("part-"))
    val srvA = mk()
    try {
      val (c0, b0) = postTo(srvA.boundPort, "/ksql",
        s"CREATE STREAM mvrepl_src WITH (PATH='$sfDir/orders.parquet');")
      assert(c0 == 200, b0)
      val (c1, b1) = postTo(srvA.boundPort, "/ksql",
        s"""CREATE MATERIALIZED VIEW mvrepl_view WITH (
           |  STATE_DIR='$t/state',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
           |SELECT o_orderstatus, COUNT(*) AS n
           |FROM mvrepl_src GROUP BY o_orderstatus;""".stripMargin)
      assert(c1 == 200, b1)
      val partsBefore = stateParts
      assert(partsBefore > 0, "the CMV must have built the state artifact")
      // simulate a fresh process: wipe the (JVM-global) registration,
      // then start a LATE JOINER over the same log — start() replays the
      // CMV, which re-registers against the EXISTING artifact (the
      // single-writer posture: replay never rebuilds state)
      assert(graft.plans.MaterializedViews.drop("mvrepl_view"))
      val srvB = mk()
      try {
        val (c2, b2) = postTo(srvB.boundPort, "/ksql",
          "SHOW MATERIALIZED VIEWS;")
        assert(c2 == 200 && b2.contains("mvrepl_view"), b2)
        assert(stateParts == partsBefore, "replay must not rebuild state")
        // the replicated view actually SERVES on the late joiner
        val (c3, b3) = postTo(srvB.boundPort, "/query",
          "SELECT o_orderstatus, COUNT(*) AS n FROM mvrepl_src " +
            "GROUP BY o_orderstatus;")
        assert(c3 == 200, b3)
        // compaction carries the CMV (the #mv binding class): a joiner
        // that starts from the SNAPSHOT still gets the view
        srvB.compactCommandLog()
        val snap = log.resolveSibling(log.getFileName.toString + ".snapshot")
        assert(java.nio.file.Files.exists(snap))
        assert(new String(java.nio.file.Files.readAllBytes(snap))
          .contains("mvrepl_view"), "snapshot must retain the CMV")
        assert(graft.plans.MaterializedViews.drop("mvrepl_view"))
        val srvC = mk()
        try {
          val (c4, b4) = postTo(srvC.boundPort, "/ksql",
            "SHOW MATERIALIZED VIEWS;")
          assert(c4 == 200 && b4.contains("mvrepl_view"), b4)
        } finally srvC.stop()
        // DROP MATERIALIZED VIEW is cluster DDL too: it lands on the log
        val linesBefore = java.nio.file.Files.readAllLines(log).size()
        val (c5, b5) = postTo(srvA.boundPort, "/ksql",
          "DROP MATERIALIZED VIEW mvrepl_view;")
        assert(c5 == 200, b5)
        assert(java.nio.file.Files.readAllLines(log).size() ==
          linesBefore + 1, "the DROP must append to the command log")
        assert(!graft.plans.MaterializedViews.registered
          .contains("mvrepl_view"))
      } finally srvB.stop()
    } finally {
      srvA.stop()
      graft.plans.MaterializedViews.drop("mvrepl_view")
      java.nio.file.Files.deleteIfExists(log)
    }
  }

  test("command log: concurrent DDL on two servers serializes and converges") {
    // the property total ordering exists for: statements racing into
    // BOTH servers interleave whole-statement, every server ends with
    // every binding, and the log holds each statement exactly once
    val log = java.nio.file.Files.createTempFile("graft_cmdlog_conc", ".jsonl")
    def mk() = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, commandLog = Some(log)).start()
    val srvA = mk()
    val srvB = mk()
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val futures = (0 until 6).map { i =>
        val port = (if (i % 2 == 0) srvA else srvB).boundPort
        pool.submit(new java.util.concurrent.Callable[(Int, String)] {
          def call(): (Int, String) = postTo(port, "/ksql",
            s"CREATE STREAM conc_$i AS SELECT o_orderkey FROM orders WHERE o_orderkey % 6 = $i;")
        })
      }
      val results = futures.map(_.get())
      pool.shutdown()
      assert(results.forall(_._1 == 200), results.map(_._1))
      // every stream is queryable on BOTH servers (the one that ran it
      // and the one that must learn it from the log)
      for (i <- 0 until 6; srv <- Seq(srvA, srvB)) {
        val (c, b) = postTo(srv.boundPort, "/query",
          s"SELECT COUNT(*) AS n FROM conc_$i;")
        assert(c == 200, s"conc_$i on ${srv.boundPort}: $b")
      }
      // exactly one log entry per statement, no torn/duplicated lines
      import scala.jdk.CollectionConverters._
      val lines = java.nio.file.Files.readAllLines(log).asScala.toSeq
      assert(lines.size == 6, lines)
      assert((0 until 6).forall(i =>
        lines.count(_.contains(s"conc_$i")) == 1), lines)
    } finally {
      srvA.stop(); srvB.stop()
      java.nio.file.Files.deleteIfExists(log)
    }
  }

  test("command log: compaction retains (create, drop) pairs a surviving " +
    "binding depends on — late joiners bind the dependent identically, " +
    "and unrelated churn still prunes") {
    // the round-12 documented hole: CREATE A → CREATE B (depends on A) →
    // DROP A → compact. The old snapshot held only B's CSAS, whose
    // replay could never bind (unknown source A) — late joiners silently
    // lacked a stream that log-replaying servers serve.
    val log = java.nio.file.Files.createTempFile("graft_cmdlog_dep", ".jsonl")
    def mk() = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, commandLog = Some(log)).start()
    val srvA = mk()
    try {
      val (c1, b1) = postTo(srvA.boundPort, "/ksql",
        s"CREATE STREAM dep_a WITH (PATH='$sfDir/orders.parquet');")
      assert(c1 == 200, b1)
      val (c2, b2) = postTo(srvA.boundPort, "/ksql",
        "CREATE STREAM dep_b AS SELECT o_orderkey, o_totalprice " +
          "FROM dep_a WHERE o_totalprice > 200000;")
      assert(c2 == 200, b2)
      val (c3, b3) = postTo(srvA.boundPort, "/ksql", "DROP STREAM dep_a;")
      assert(c3 == 200, b3)
      srvA.compactCommandLog()
      // the snapshot carries the full pair + the dependent, in seq order
      val snap = log.resolveSibling(log.getFileName.toString + ".snapshot")
      import scala.jdk.CollectionConverters._
      val snapStmts = java.nio.file.Files.readAllLines(snap).asScala.tail
      assert(snapStmts.size == 3, snapStmts)
      assert(snapStmts(0).contains("dep_a") && snapStmts(0).contains("PATH"))
      assert(snapStmts(1).contains("dep_b"))
      assert(snapStmts(2).contains("DROP"), snapStmts)
      // a late joiner bootstraps from the snapshot ONLY (the tail is
      // empty) and must end IDENTICAL to a log-replaying server: dep_b
      // bound and queryable, dep_a dropped
      val srvB = mk()
      try {
        assert(srvB.replayedStatements.get() == 3)
        val expected = Tables.orders(spark, sfDir)
          .filter(org.apache.spark.sql.functions.col("o_totalprice") > 200000)
          .count()
        val (c4, b4) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM dep_b;")
        assert(c4 == 200, b4)
        assert((JsonMethods.parse(b4.linesIterator.toSeq(1)) \ "row" \ "columns")
          == JArray(List(JInt(BigInt(expected)))), b4)
        val (c5, _) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM dep_a;")
        assert(c5 == 400, "dep_a must be dropped on the late joiner too")
      } finally srvB.stop()
      // unrelated churn: create/drop cycles whose lifetime contains no
      // surviving creation are PRUNED — the snapshot stays bounded
      for (i <- 0 until 5) {
        postTo(srvA.boundPort, "/ksql",
          s"CREATE STREAM churn_$i AS SELECT o_orderkey FROM dep_b;")
        postTo(srvA.boundPort, "/ksql", s"DROP STREAM churn_$i;")
      }
      srvA.compactCommandLog()
      val snapStmts2 = java.nio.file.Files.readAllLines(snap).asScala.tail
      assert(snapStmts2.size == 3,
        s"churn must compact away, got ${snapStmts2.size}: $snapStmts2")
    } finally {
      srvA.stop()
      java.nio.file.Files.deleteIfExists(log)
    }
  }

  test("command log: dependency retention is TRANSITIVE — a retained " +
    "pair's create counts as a dependent, so chained drops survive " +
    "compaction to a fixpoint") {
    // the round-13 ADVICE chain: CREATE A; CREATE B FROM A; DROP A;
    // CREATE C FROM B; DROP B. One-pass retention keeps pair B (C
    // mentions it) but prunes pair A — no SURVIVING binding mentions A
    // inside its lifetime; only B's retained create does. A
    // snapshot-bootstrapped joiner then can't bind B, and so loses C.
    val log = java.nio.file.Files.createTempFile("graft_cmdlog_fix", ".jsonl")
    def mk() = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, commandLog = Some(log)).start()
    val srvA = mk()
    try {
      def post(stmt: String): Unit = {
        val (c, b) = postTo(srvA.boundPort, "/ksql", stmt)
        assert(c == 200, b)
      }
      post(s"CREATE STREAM fix_a WITH (PATH='$sfDir/orders.parquet');")
      post("CREATE STREAM fix_b AS SELECT o_orderkey, o_totalprice " +
        "FROM fix_a WHERE o_totalprice > 100000;")
      post("DROP STREAM fix_a;")
      post("CREATE STREAM fix_c AS SELECT o_orderkey FROM fix_b " +
        "WHERE o_orderkey % 2 = 0;")
      post("DROP STREAM fix_b;")
      srvA.compactCommandLog()
      val snap = log.resolveSibling(log.getFileName.toString + ".snapshot")
      import scala.jdk.CollectionConverters._
      val snapStmts = java.nio.file.Files.readAllLines(snap).asScala.tail
      assert(snapStmts.size == 5,
        s"fixpoint retention must keep the whole chain: $snapStmts")
      // a joiner bootstrapping from the snapshot alone serves fix_c and
      // has fix_a/fix_b dropped — identical to a log-replaying server
      val srvB = mk()
      try {
        assert(srvB.replayedStatements.get() == 5)
        val (c1, b1) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM fix_c;")
        assert(c1 == 200, b1)
        val expected = Tables.orders(spark, sfDir)
          .filter(org.apache.spark.sql.functions.col("o_totalprice") > 100000)
          .filter(org.apache.spark.sql.functions.col("o_orderkey") % 2 === 0)
          .count()
        assert((JsonMethods.parse(b1.linesIterator.toSeq(1)) \ "row" \ "columns")
          == JArray(List(JInt(BigInt(expected)))), b1)
        val (c2, _) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM fix_b;")
        assert(c2 == 400, "fix_b must be dropped on the joiner too")
      } finally srvB.stop()
    } finally {
      srvA.stop()
      java.nio.file.Files.deleteIfExists(log)
    }
  }

  test("command log: REFRESH MATERIALIZED VIEW replicates — the fold " +
    "runs once, late joiners re-pin against the new artifact, and " +
    "compaction keeps CREATE + latest REFRESH") {
    val log = java.nio.file.Files.createTempFile("graft_cmdlog_ref", ".jsonl")
    val t = java.nio.file.Files.createTempDirectory("rest_mv_refresh").toString
    def mk() = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, commandLog = Some(log)).start()
    def parts(dir: String): Int = Option(new java.io.File(dir).listFiles())
      .toSeq.flatten.count(_.getName.startsWith("part-"))
    val srvA = mk()
    try {
      def post(stmt: String): (Int, String) =
        postTo(srvA.boundPort, "/ksql", stmt)
      assert(post(
        s"CREATE STREAM ref_src WITH (PATH='$sfDir/orders.parquet');")._1
        == 200)
      val (c1, b1) = post(
        s"""CREATE MATERIALIZED VIEW ref_view WITH (
           |  STATE_DIR='$t/state',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
           |SELECT o_orderstatus, COUNT(*) AS n
           |FROM ref_src GROUP BY o_orderstatus;""".stripMargin)
      assert(c1 == 200, b1)
      val (c2, b2) = post(
        s"""REFRESH MATERIALIZED VIEW ref_view WITH (
           |  STATE_DIR='$t/state2',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''');"""
          .stripMargin)
      assert(c2 == 200, b2)
      assert(graft.plans.MaterializedViews.view("ref_view")
        .exists(_.stateDir == s"$t/state2"))
      val foldedParts = parts(s"$t/state2")
      assert(foldedParts > 0, "the refresh must have folded an artifact")
      // the REFRESH landed on the log (registration state changed even
      // though the name set did not)
      import scala.jdk.CollectionConverters._
      assert(java.nio.file.Files.readAllLines(log).asScala
        .count(_.contains("REFRESH MATERIALIZED")) == 1)
      // fresh process: wipe the JVM-global registration, join late —
      // replay must re-pin against state2 WITHOUT re-folding
      assert(graft.plans.MaterializedViews.drop("ref_view"))
      val srvB = mk()
      try {
        assert(graft.plans.MaterializedViews.view("ref_view")
          .exists(_.stateDir == s"$t/state2"),
          "the late joiner must serve the refreshed artifact")
        assert(parts(s"$t/state2") == foldedParts,
          "replay must never fold twice")
        // compaction keeps the CREATE and the REFRESH, in order; a
        // snapshot-bootstrapped joiner converges to the same state
        srvB.compactCommandLog()
        val snap = log.resolveSibling(log.getFileName.toString + ".snapshot")
        val snapBody = new String(java.nio.file.Files.readAllBytes(snap))
        assert(snapBody.contains("CREATE MATERIALIZED VIEW ref_view"))
        assert(snapBody.contains("REFRESH MATERIALIZED VIEW ref_view"))
        assert(graft.plans.MaterializedViews.drop("ref_view"))
        val srvC = mk()
        try {
          assert(graft.plans.MaterializedViews.view("ref_view")
            .exists(_.stateDir == s"$t/state2"),
            "snapshot bootstrap must land on the refreshed artifact")
          // and the view actually SERVES there: the plain rollup reads
          // the refreshed state with the advanced cutoff
          val (c3, b3) = postTo(srvC.boundPort, "/query",
            "SELECT o_orderstatus, COUNT(*) AS n FROM ref_src " +
              "GROUP BY o_orderstatus;")
          assert(c3 == 200, b3)
          // a SECOND refresh rebinds the same #mv:ref_view#refresh key:
          // compaction keeps CREATE + the LATEST refresh only (the
          // intermediate artifact is skipped), and a fresh joiner lands
          // directly on the newest state
          val (c4, b4) = postTo(srvC.boundPort, "/ksql",
            s"""REFRESH MATERIALIZED VIEW ref_view WITH (
               |  STATE_DIR='$t/state3',
               |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-07-01''');"""
              .stripMargin)
          assert(c4 == 200, b4)
          srvC.compactCommandLog()
          val snap2 = new String(java.nio.file.Files.readAllBytes(snap))
          assert(snap2.contains("state3") && !snap2.contains("state2'"),
            s"compaction must keep only the LATEST refresh\n$snap2")
          assert(graft.plans.MaterializedViews.drop("ref_view"))
          val srvD = mk()
          try assert(graft.plans.MaterializedViews.view("ref_view")
            .exists(_.stateDir == s"$t/state3"),
            "a fresh joiner must land on the NEWEST artifact")
          finally srvD.stop()
        } finally srvC.stop()
      } finally srvB.stop()
    } finally {
      srvA.stop()
      graft.plans.MaterializedViews.drop("ref_view")
      java.nio.file.Files.deleteIfExists(log)
    }
  }

  test("command log: compaction refuses after a loud replay skip — a " +
    "snapshot past the skipped entry would bake the loss in") {
    val log = java.nio.file.Files.createTempFile("graft_cmdlog_skip", ".jsonl")
    val tmpTable = java.nio.file.Files.createTempDirectory("graft_skip_src")
    // a source parquet that exists when server A executes the CREATE...
    spark.range(5).toDF("v").write.mode("overwrite")
      .parquet(tmpTable.resolve("t.parquet").toString)
    val catalogB = Repl.preloadCatalog(spark, sfDir) +
      ("skiptbl" -> graft.ksql.Translator.Source(
        spark.read.parquet(tmpTable.resolve("t.parquet").toString), "v"))
    val srvA = new RestServer(spark, catalogB, maxRows = 10,
      commandLog = Some(log)).start()
    try {
      val (c1, b1) = postTo(srvA.boundPort, "/ksql",
        "CREATE STREAM skip_child AS SELECT v FROM skiptbl;")
      assert(c1 == 200, b1)
      // ...but is ABSENT from server B's preload, so B's replay of the
      // CSAS loud-skips (unknown source) — the transient-failure stand-in
      val srvB = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
        maxRows = 10, commandLog = Some(log)).start()
      try {
        srvB.compactCommandLog()
        // no snapshot may exist: B refused (its replay skipped an entry)
        assert(!java.nio.file.Files.exists(
          log.resolveSibling(log.getFileName.toString + ".snapshot")),
          "compaction must refuse after a loud replay skip")
        // A replayed nothing it didn't execute — ITS compaction works
        srvA.compactCommandLog()
        assert(java.nio.file.Files.exists(
          log.resolveSibling(log.getFileName.toString + ".snapshot")))
      } finally srvB.stop()
    } finally srvA.stop()
  }

  test("command log: snapshot compaction bounds a late joiner's replay " +
    "by catalog size, not DDL history") {
    val log = java.nio.file.Files.createTempFile("graft_cmdlog_snap", ".jsonl")
    def mk() = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, commandLog = Some(log)).start()
    val srvA = mk()
    try {
      // a 7-statement DDL history whose live catalog is TWO sources:
      // drops remove their whole chain, a rebind keeps only the last
      // binding — the compaction invariant
      val history = Seq(
        "CREATE STREAM snap_a AS SELECT o_orderkey FROM orders WHERE o_totalprice > 100000;",
        "CREATE STREAM snap_b AS SELECT o_orderkey FROM orders;",
        "CREATE STREAM snap_c AS SELECT o_custkey FROM orders;",
        "DROP STREAM snap_b;",
        "CREATE OR REPLACE STREAM snap_a AS SELECT o_orderkey FROM orders WHERE o_totalprice > 200000;",
        "CREATE STREAM snap_d AS SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 5000;",
        "DROP STREAM snap_c;")
      history.foreach { s =>
        val (c, b) = postTo(srvA.boundPort, "/ksql", s)
        assert(c == 200, s"$s → $b")
      }
      srvA.compactCommandLog()
      // post-compaction tail: a late joiner replays snapshot + THIS only
      val (ct, bt) = postTo(srvA.boundPort, "/ksql",
        "CREATE STREAM snap_tail AS SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0;")
      assert(ct == 200, bt)
      // the snapshot sidecar holds the header + the 2 live statements
      val snap = java.nio.file.Files.readAllLines(
        log.resolveSibling(log.getFileName.toString + ".snapshot"))
      assert(snap.size == 3, snap)
      assert(snap.get(0).contains("upto"), snap)
      // statements appear in LAST-binding order: snap_a's rebind
      // (statement 5) precedes snap_d (statement 6)
      assert(snap.get(1).contains("snap_a") &&
        snap.get(1).contains("200000"), snap)
      assert(snap.get(2).contains("snap_d"), snap)
      // late joiner: replays 2 snapshot statements + 1 tail entry — not
      // the 8-statement history
      val srvB = mk()
      try {
        assert(srvB.replayedStatements.get() == 3,
          s"late joiner replayed ${srvB.replayedStatements.get()}")
        // converged catalog: the rebound filter, the tail stream, and
        // the dropped names' absence
        val expected = Tables.orders(spark, sfDir)
          .filter(org.apache.spark.sql.functions.col("o_totalprice") > 200000)
          .count()
        val (c2, b2) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM snap_a;")
        assert(c2 == 200, b2)
        assert((JsonMethods.parse(b2.linesIterator.toSeq(1)) \ "row" \ "columns")
          == JArray(List(JInt(BigInt(expected)))), b2)
        val (c3, _) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM snap_tail;")
        assert(c3 == 200)
        val (c4, _) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM snap_b;")
        assert(c4 == 400, "dropped stream must stay dropped")
      } finally srvB.stop()
      // restart idempotence: a SECOND late joiner over the same
      // snapshot+tail converges identically
      val srvB2 = mk()
      try {
        assert(srvB2.replayedStatements.get() == 3)
        val (c5, _) = postTo(srvB2.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM snap_d;")
        assert(c5 == 200)
      } finally srvB2.stop()
      // the main log is never rewritten — full history still there
      // (torn-tail rules untouched)
      assert(java.nio.file.Files.readAllLines(log).size == 8)
    } finally {
      srvA.stop()
      java.nio.file.Files.deleteIfExists(log)
      java.nio.file.Files.deleteIfExists(
        log.resolveSibling(log.getFileName.toString + ".snapshot"))
    }
  }

  test("command log: auto-compaction fires when the tail outgrows " +
    "k·|catalog| and keeps the late-joiner bound without manual calls") {
    val log = java.nio.file.Files.createTempFile("graft_cmdlog_auto", ".jsonl")
    def mk() = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, commandLog = Some(log), autoCompact = Some(2)).start()
    val srvA = mk()
    try {
      // tail/threshold trace (k=2, threshold = 2·max(1,|bindings|)):
      //   create ac_a → tail 1, |cat| 1, thr 2 — no
      //   create ac_b → tail 2, |cat| 2, thr 4 — no
      //   drop   ac_b → tail 3, |cat| 1, thr 2 — 3 > 2 → COMPACT
      Seq(
        "CREATE STREAM ac_a AS SELECT o_orderkey FROM orders;",
        "CREATE STREAM ac_b AS SELECT o_custkey FROM orders;",
        "DROP STREAM ac_b;"
      ).foreach { s =>
        val (c, b) = postTo(srvA.boundPort, "/ksql", s)
        assert(c == 200, s"$s → $b")
      }
      assert(srvA.autoCompactions.get() == 1,
        s"expected one auto-compaction, got ${srvA.autoCompactions.get()}")
      // snapshot = header + the single live statement
      val snap = java.nio.file.Files.readAllLines(
        log.resolveSibling(log.getFileName.toString + ".snapshot"))
      assert(snap.size == 2 && snap.get(1).contains("ac_a"), snap)
      // one more DDL: tail 1, |cat| 2, thr 4 — below threshold, no
      // second compaction yet
      val (ct, bt) = postTo(srvA.boundPort, "/ksql",
        "CREATE STREAM ac_c AS SELECT o_totalprice FROM orders;")
      assert(ct == 200, bt)
      assert(srvA.autoCompactions.get() == 1)
      // late joiner replays snapshot(1) + tail(1), not the 4-statement
      // history — the bound the policy exists to hold
      val srvB = mk()
      try {
        assert(srvB.replayedStatements.get() == 2,
          s"late joiner replayed ${srvB.replayedStatements.get()}")
        val (c2, _) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM ac_a;")
        assert(c2 == 200)
        val (c3, _) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM ac_c;")
        assert(c3 == 200)
        val (c4, _) = postTo(srvB.boundPort, "/query",
          "SELECT COUNT(*) AS n FROM ac_b;")
        assert(c4 == 400, "dropped stream must stay dropped")
      } finally srvB.stop()
      // the main log keeps the whole history — compaction never rewrites
      assert(java.nio.file.Files.readAllLines(log).size == 4)
    } finally {
      srvA.stop()
      java.nio.file.Files.deleteIfExists(log)
      java.nio.file.Files.deleteIfExists(
        log.resolveSibling(log.getFileName.toString + ".snapshot"))
    }
  }

  test("basic auth: configured credentials gate every endpoint with 401") {
    val srv = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, auth = Some(("alice", "secret"))).start()
    try {
      val good = "Basic " + java.util.Base64.getEncoder
        .encodeToString("alice:secret".getBytes("UTF-8"))
      val bad = "Basic " + java.util.Base64.getEncoder
        .encodeToString("alice:wrong".getBytes("UTF-8"))
      // every endpoint: absent header → 401 + WWW-Authenticate
      for (path <- Seq("/ksql", "/query", "/query-stream")) {
        val (code, body) = postTo(srv.boundPort, path, "SHOW STREAMS;")
        assert(code == 401, s"$path: $body")
      }
      val noAuthGet = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}/healthcheck"))
        .GET().build()
      val hcResp = http.send(noAuthGet, HttpResponse.BodyHandlers.ofString())
      assert(hcResp.statusCode() == 401)
      assert(hcResp.headers().firstValue("WWW-Authenticate").isPresent)
      // wrong password → 401; right credentials → served
      assert(postTo(srv.boundPort, "/ksql", "SHOW STREAMS;",
        Some(bad))._1 == 401)
      val (okCode, okBody) = postTo(srv.boundPort, "/ksql", "SHOW STREAMS;",
        Some(good))
      assert(okCode == 200, okBody)
      val (qCode, qBody) = postTo(srv.boundPort, "/query",
        "SELECT COUNT(*) AS n FROM orders;", Some(good))
      assert(qCode == 200, qBody)
    } finally srv.stop()
  }

  test("/query-stream writes keep-alive blanks while idle (dead-client detection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val srv = new RestServer(spark,
      Map("quiet" -> Translator.Source(mem.toDF(), "ts")), maxRows = 10).start()
    try {
      val url = java.net.URI.create(
        s"http://127.0.0.1:${srv.boundPort}/query-stream").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setDoOutput(true); conn.setRequestMethod("POST")
      conn.setReadTimeout(20000)
      conn.getOutputStream.write(JsonMethods.compact(JObject(
        "sql" -> JString("SELECT event_id FROM quiet EMIT CHANGES;")))
        .getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
      assert(reader.readLine().contains("\"header\""))
      // NO data ever arrives — the ~5 s idle probe must still write a
      // blank line, which is what lets a dead socket surface as an
      // IOException and tear the per-connection query down
      val t0 = System.nanoTime()
      val line = reader.readLine()
      val waited = (System.nanoTime() - t0) / 1e9
      assert(line != null && line.isEmpty, s"got '$line'")
      assert(waited >= 3.0 && waited < 15.0, s"keep-alive after $waited s")
      reader.close()
    } finally srv.stop()
  }

  test("TLS listener: the same endpoints serve over HTTPS, with auth composing") {
    // self-signed keypair via the JDK's own keytool — no external dep;
    // the spec builds the server-side SSLContext from it and a
    // trust-all client context (the embedded-test analogue of a client
    // configured with the server's self-signed cert)
    val dir = java.nio.file.Files.createTempDirectory("graft_tls")
    val ks = dir.resolve("server.jks")
    val proc = new ProcessBuilder("keytool", "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
      "-dname", "CN=127.0.0.1", "-ext", "SAN=ip:127.0.0.1",
      "-keystore", ks.toString,
      "-storepass", "changeit", "-keypass", "changeit")
      .redirectErrorStream(true).start()
    assert(proc.waitFor() == 0,
      new String(proc.getInputStream.readAllBytes(), "UTF-8"))
    val store = java.security.KeyStore.getInstance("JKS")
    val in = java.nio.file.Files.newInputStream(ks)
    try store.load(in, "changeit".toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "changeit".toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val srv = new RestServer(spark, Repl.preloadCatalog(spark, sfDir),
      maxRows = 10, auth = Some(("alice", "secret")),
      ssl = Some(serverCtx)).start()
    try {
      val trustAll = javax.net.ssl.SSLContext.getInstance("TLS")
      trustAll.init(null, Array[javax.net.ssl.TrustManager](
        new javax.net.ssl.X509TrustManager {
          def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
        }), new java.security.SecureRandom())
      val client = HttpClient.newBuilder().sslContext(trustAll).build()
      val good = "Basic " + java.util.Base64.getEncoder
        .encodeToString("alice:secret".getBytes("UTF-8"))
      def query(authHdr: Option[String]): (Int, String) = {
        val b = HttpRequest.newBuilder(
            URI.create(s"https://127.0.0.1:${srv.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(JsonMethods.compact(
            JObject("ksql" -> JString("SELECT COUNT(*) AS n FROM orders;")))))
        authHdr.foreach(h => b.header("Authorization", h))
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
      val (okCode, okBody) = query(Some(good))
      assert(okCode == 200, okBody)
      assert(okBody.contains("\"row\""), okBody)
      // auth composes with TLS: encrypted but unauthenticated → 401
      assert(query(None)._1 == 401)
      // plaintext HTTP against the TLS listener is refused at the
      // transport (handshake failure), never served
      intercept[java.io.IOException] {
        http.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}/healthcheck"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      }
    } finally {
      srv.stop()
      java.nio.file.Files.deleteIfExists(ks)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("command log round-trips adversarial statement content") {
    import graft.ksql.CommandLog
    val p = java.nio.file.Files.createTempFile("graft_cmdlog_fuzz", ".jsonl")
    try {
      val l = new CommandLog(p)
      // quotes, backslashes, newlines, tabs, unicode, JSON-looking
      // bodies, control chars — everything the JSON line framing must
      // survive byte-exact, in order
      val stmts = Seq(
        "CREATE STREAM a AS SELECT 'it''s \"quoted\"' FROM t;",
        "line1\nline2\r\nline3\tend",
        """{"stmt": "fake nested"}""",
        "unicode: préfixe – 日本語 ",
        "back\\slash \\n literal",
        "x" * 5000)
      var off = 0L
      stmts.foreach(s => off = l.transact(off, _ => ())(() => Some(s)))
      val seen = scala.collection.mutable.ListBuffer.empty[String]
      l.transact(0L, s => seen += s)(() => None)
      assert(seen.toSeq == stmts)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  test("command log round-trips multi-line statements and skips torn tails") {
    import graft.ksql.CommandLog
    val p = java.nio.file.Files.createTempFile("graft_cmdlog_unit", ".jsonl")
    try {
      val l = new CommandLog(p)
      val stmt = "CREATE STREAM x AS\nSELECT 'a;b' AS s\nFROM orders;"
      var off = l.transact(0L, _ => fail("nothing to replay"))(() => Some(stmt))
      // a fresh reader replays the exact statement text
      var seen = List.empty[String]
      off = l.transact(0L, s => seen ::= s)(() => None)
      assert(seen == List(stmt))
      // torn tail (writer crashed mid-append): unconsumed, never merged
      java.nio.file.Files.writeString(p, "{\"stmt\": \"GARBA",
        java.nio.file.StandardOpenOption.APPEND)
      var seen2 = List.empty[String]
      val off2 = l.transact(0L, s => seen2 ::= s)(() => Some("DROP STREAM x;"))
      var seen3 = List.empty[String]
      l.transact(0L, s => seen3 ::= s)(() => None)
      assert(seen2 == List(stmt))
      assert(seen3.reverse == List(stmt, "DROP STREAM x;"), seen3)
    } finally java.nio.file.Files.deleteIfExists(p)
  }
}
