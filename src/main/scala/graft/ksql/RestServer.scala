package graft.ksql

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** KSQL-server REST surface over the translator — the reference is
  * USED through this API (ksql CLI and clients speak REST to the
  * server), so a library-only dialect leaves its main entry point
  * uncovered. Endpoints mirror the public KSQL server API shape:
  *
  *   - `POST /ksql`  {"ksql": "stmt; stmt; ..."} → JSON array with one
  *     entry per statement: DDL/CSAS/INSERT ack as
  *     {"statementText", "commandStatus": {"status": "SUCCESS"}};
  *     bare SELECTs are rejected with the server's own guidance (use
  *     /query) — exactly the real server's split.
  *   - `POST /query` {"ksql": "SELECT ..."} → JSON-lines stream: a
  *     header line {"header": {"schema": [...]}}, then one
  *     {"row": {"columns": [...]}} per row, then {"finalMessage":
  *     "Limit Reached"} if the pull-query cap truncated the result.
  *     The cap (`maxRows`, like the server's LIMIT guard) bounds what
  *     a pull query may collect to the driver — the frame itself is
  *     never fully materialized.
  *   - `GET /info`, `GET /healthcheck` → server metadata / liveness.
  *
  * Statements thread the catalog exactly like a server session: a
  * CSAS posted now is queryable in the next request. The JDK's
  * built-in HttpServer serves with a single dispatch thread (executor
  * null), which also serializes catalog updates — a query server's
  * metadata path, not its data path, so throughput is irrelevant and
  * simplicity wins. Binds 127.0.0.1 only: this is an embedded test/
  * dev surface, not a hardened network listener.
  */
final class RestServer(spark: SparkSession, catalog0: Translator.Catalog,
                       port: Int = 0, maxRows: Int = 1000) {

  @volatile private var catalog: Translator.Catalog = catalog0

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(null) // dispatch thread == handler thread
  server.createContext("/ksql", (ex: HttpExchange) => handle(ex, ksqlEndpoint))
  server.createContext("/query", (ex: HttpExchange) => handle(ex, queryEndpoint))
  server.createContext("/info", (ex: HttpExchange) => handle(ex, _ =>
    (200, JsonMethods.compact(JObject(
      "KsqlServerInfo" -> JObject("version" -> JString("graft"),
        "kafkaClusterId" -> JString("n/a"),
        "ksqlServiceId" -> JString("graft-spark")))))))
  server.createContext("/healthcheck", (ex: HttpExchange) => handle(ex, _ =>
    (200, JsonMethods.compact(JObject("isHealthy" -> JBool(true))))))

  def start(): RestServer = { server.start(); this }
  def stop(): Unit = {
    server.stop(0)
    // terminate continuous push queries and release their sinks
    pushQueries.values.foreach { st =>
      try st.query.stop() catch { case _: Throwable => () }
      try spark.catalog.dropTempView(st.sink) catch { case _: Throwable => () }
    }
    pushQueries.clear()
  }
  def boundPort: Int = server.getAddress.getPort

  private def handle(ex: HttpExchange, f: String => (Int, String)): Unit = {
    // JDK HttpServer contexts PREFIX-match ("/ksqlanything" would land
    // here); the real server 404s any path that isn't the exact
    // endpoint, so check the full request path against the context.
    val reqPath = ex.getRequestURI.getPath
    if (reqPath != ex.getHttpContext.getPath) {
      val bytes = JsonMethods.compact(JObject(
        "message" -> JString(s"HTTP 404 Not Found: $reqPath"))).getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(404, bytes.length)
      try ex.getResponseBody.write(bytes) finally ex.close()
      return
    }
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val (code, resp) = try f(body) catch {
      case e: Throwable => (400, JsonMethods.compact(JObject(
        "@type" -> JString("statement_error"),
        "message" -> JString(String.valueOf(e.getMessage)))))
    }
    val bytes = resp.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def statementOf(body: String): Seq[String] = {
    val parsed = JsonMethods.parse(body)
    val sql = parsed \ "ksql" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("""body must carry {"ksql": "..."}""")
    }
    Translator.splitStatements(sql)
  }

  private def isPull(stmt: String): Boolean = {
    val t = stmt.trim.toUpperCase
    t.startsWith("SELECT") || t.startsWith("PRINT")
  }

  private def isIntrospection(stmt: String): Boolean = {
    val t = stmt.trim.toUpperCase
    Seq("SHOW", "LIST", "DESCRIBE", "EXPLAIN").exists(t.startsWith)
  }

  /** Statement batch, matching the real server's HTTP contract: a
    * pull query (SELECT/PRINT) on /ksql is a 400 (ksqlDB rejects the
    * whole request with its "use /query" guidance), and a failure mid
    * multi-statement batch answers 400 with the per-statement results
    * UP TO the failure point included — earlier statements have
    * already mutated the shared catalog, and hiding that partial
    * application from the client recreates the round-7 ADVICE gap. */
  private def ksqlEndpoint(body: String): (Int, String) = {
    val done = scala.collection.mutable.ListBuffer.empty[JObject]
    val stmts = statementOf(body).iterator
    // plain while, not foreach+return: a non-local return is compiled to
    // a ControlThrowable, which the inner catch-Throwable would swallow
    while (stmts.hasNext) {
      val stmt = stmts.next()
      if (isPull(stmt)) {
        val err = JObject("@type" -> JString("statement_error"),
          "statementText" -> JString(stmt),
          "message" -> JString(
            "SELECT and PRINT queries must be sent to the /query endpoint"),
          "entities" -> JArray(done.toList))
        return (400, JsonMethods.compact(err))
      }
      try {
        val (cat2, res) = Translator.run(spark, catalog, stmt)
        catalog = cat2
        // introspection statements (SHOW/LIST/DESCRIBE/EXPLAIN) answer
        // WITH their listing, like the real server's entity-list
        // responses — a bounded driver-side page, never a full frame
        val rows: List[JField] = res match {
          case Some(df) if !df.isStreaming && isIntrospection(stmt) =>
            List("columnNames" -> JArray(
              df.columns.toList.map(JString(_))),
              "rows" -> JArray(df.limit(maxRows).collect().toList.map(r =>
                JArray(r.toSeq.toList.map(jsonValue)))))
          case _ => Nil
        }
        done += JObject(("statementText" -> JString(stmt): JField) ::
          ("commandStatus" -> JObject("status" -> JString("SUCCESS"),
            "message" -> JString("Statement executed")): JField) :: rows)
      } catch {
        case scala.util.control.NonFatal(e) =>
          val err = JObject("@type" -> JString("statement_error"),
            "statementText" -> JString(stmt),
            "message" -> JString(String.valueOf(e.getMessage)),
            "entities" -> JArray(done.toList))
          return (400, JsonMethods.compact(err))
      }
    }
    (200, JsonMethods.compact(JArray(done.toList)))
  }

  private def queryEndpoint(body: String): (Int, String) = {
    val stmts = statementOf(body)
    require(stmts.size == 1, s"/query takes exactly one statement, got ${stmts.size}")
    require(isPull(stmts.head), "/query serves SELECT statements")
    val (_, res) = Translator.run(spark, catalog, stmts.head)
    val df = res.getOrElse(throw new IllegalArgumentException("statement returned no result"))
    if (!df.isStreaming) (200, renderRows(df))
    else (200, renderRows(drainPush(stmts.head, df)))
  }

  /** Push query (EMIT CHANGES over a STREAMING source): a CONTINUOUS
    * query registered once per statement text and kept running across
    * requests — the contract a KSQL push-query client relies on. Each
    * POST drains what the source has newly available and answers with:
    *   - append mode (projections, watermark-closed windows): the rows
    *     emitted SINCE THE LAST POST of the same statement — the
    *     increment, not a re-drain of history;
    *   - complete mode (the fallback for aggregations append rejects):
    *     the current state of every group, exactly what a table push
    *     query shows on (re)subscribe.
    * The memory sink accumulates an append-mode query's emitted rows
    * driver-side for the life of the continuous query (each response
    * still pages at maxRows) — the embedded-server tradeoff for
    * serving increments without a real output topic; `stop()` tears
    * every registered query down. Single dispatch thread == no
    * concurrent mutation of the registry. */
  private final case class PushState(sink: String,
      query: org.apache.spark.sql.streaming.StreamingQuery,
      mode: String, served: Int)
  private val pushQueries =
    scala.collection.mutable.Map.empty[String, PushState]

  private def drainPush(stmt: String, df: DataFrame): DataFrame = {
    val st = pushQueries.getOrElse(stmt, {
      val name = "push_" + java.util.UUID.randomUUID().toString.replace("-", "")
      def start(mode: String) = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      val (q, mode) =
        try (start("append"), "append")
        catch { case _: org.apache.spark.sql.AnalysisException =>
          (start("complete"), "complete") }
      val fresh = PushState(name, q, mode, 0)
      pushQueries(stmt) = fresh
      fresh
    })
    st.query.processAllAvailable()
    val all = spark.table(st.sink)
    if (st.mode == "complete")
      spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(
          all.limit(maxRows + 1).collect(): _*)), all.schema)
    else {
      // serve the increment: everything past what earlier POSTs took
      val fresh = all.limit(st.served + maxRows + 1).collect().drop(st.served)
      pushQueries(stmt) = st.copy(served = st.served + math.min(fresh.length, maxRows))
      spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.Arrays.asList(fresh: _*)), all.schema)
    }
  }

  private def renderRows(df: DataFrame): String = {
    val rows = df.limit(maxRows + 1).collect()
    val header = JsonMethods.compact(JObject("header" -> JObject(
      "schema" -> JArray(df.schema.fields.toList.map(fd =>
        JObject("name" -> JString(fd.name),
          "type" -> JString(fd.dataType.simpleString)))))))
    val lines = rows.take(maxRows).map { r =>
      JsonMethods.compact(JObject("row" -> JObject(
        "columns" -> JArray(r.toSeq.toList.map(jsonValue)))))
    }
    val tail = if (rows.length > maxRows)
      Seq(JsonMethods.compact(JObject("finalMessage" -> JString("Limit Reached"))))
    else Seq.empty
    ((header +: lines) ++ tail).mkString("\n")
  }

  private def jsonValue(v: Any): JValue = v match {
    case null => JNull
    case b: Boolean => JBool(b)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case s: Short => JInt(BigInt(s.toInt))
    case b: Byte => JInt(BigInt(b.toInt))
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case s: String => JString(s)
    case t: java.sql.Timestamp => JString(t.toString)
    case d: java.sql.Date => JString(d.toString)
    case a: Array[Byte] => JString(java.util.Base64.getEncoder.encodeToString(a))
    case seq: scala.collection.Seq[_] => JArray(seq.toList.map(jsonValue))
    case m: scala.collection.Map[_, _] =>
      JObject(m.toList.map { case (k, mv) => String.valueOf(k) -> jsonValue(mv) })
    case r: Row => JArray(r.toSeq.toList.map(jsonValue))
    case other => JString(String.valueOf(other))
  }
}

object RestServer {
  /** Standalone entry: serve the sf-dir tables (REPL's preload) on the
    * given port. Usage: runMain graft.ksql.RestServer [sfDir] [port] */
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(8088)
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-ksql-rest")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftExtensions.register(spark)
    val srv = new RestServer(spark, Repl.preloadCatalog(spark, sfDir), port).start()
    System.err.println(s"ksql REST surface on 127.0.0.1:${srv.boundPort}")
    Thread.currentThread().join()
  }
}
