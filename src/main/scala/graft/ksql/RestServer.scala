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
  *   - `POST /query-stream` {"sql": "SELECT ... EMIT CHANGES"} → ONE
  *     long-lived chunked response: the header line, then row lines
  *     flushed as the continuous query emits them — the real server's
  *     push transport (its newer unified endpoint), where /query's
  *     per-POST drain is the polling fallback. Each connection gets its
  *     OWN continuous query (fresh subscription, like the real server)
  *     torn down when the client disconnects, the optional "maxRows"
  *     cap is reached, or the server stops.
  *   - `GET /info`, `GET /healthcheck` → server metadata / liveness.
  *
  * Statements thread the catalog exactly like a server session: a
  * CSAS posted now is queryable in the next request. Handlers run on a
  * small cached pool (a long-lived /query-stream response must not
  * block /healthcheck), with every statement execution serialized
  * under one lock — same catalog consistency as the former
  * single-dispatch-thread design, minus the head-of-line blocking.
  * Binds 127.0.0.1 only: this is an embedded test/dev surface, not a
  * hardened network listener.
  */
final class RestServer(spark: SparkSession, catalog0: Translator.Catalog,
                       port: Int = 0, maxRows: Int = 1000,
                       commandLog: Option[java.nio.file.Path] = None,
                       auth: Option[(String, String)] = None,
                       ssl: Option[javax.net.ssl.SSLContext] = None,
                       autoCompact: Option[Int] = None) {

  @volatile private var catalog: Translator.Catalog = catalog0
  @volatile private var stopping = false
  /** Serializes translate/catalog-mutation across handler threads. */
  private val stmtLock = new Object

  /** Command-topic semantics (the reference charm's actual deployment
    * model: a ksql-server CLUSTER where every node replays one shared
    * command topic, so DDL issued anywhere binds everywhere). When
    * `commandLog` is set, every catalog-mutating statement this server
    * executes is appended to the shared file log, every request first
    * replays entries other servers appended, and `start()` replays the
    * whole log — a restarted server converges to the cluster catalog
    * before serving. All guarded by stmtLock (offset is plain state). */
  private val cmdLog = commandLog.map(new CommandLog(_))
  private var appliedOffset = 0L

  /** Per-name LAST-binding statement, in binding order — the compaction
    * input. Maintained on every applied catalog change (own statements
    * AND replayed ones): a rebound name keeps only its latest statement,
    * a dropped name vanishes along with its history, so the map is
    * bounded by catalog size whatever the DDL history length. Guarded by
    * stmtLock like the offset. */
  private var bindingSeq = 0L
  private var bindings = Map.empty[String, (Long, String)]
  /** Dropped (create, drop) statement pairs with their lifetime interval
    * [createSeq, dropSeq] — the compaction DEPENDENCY fix (the round-12
    * documented hole): a surviving binding created INSIDE a dropped
    * source's lifetime may depend on it (CREATE B AS SELECT FROM A;
    * DROP A), and a snapshot holding only B's statement can never bind
    * B on a late joiner — fixpoint retry can't conjure A. Compaction
    * therefore RETAINS every pair where some surviving binding was
    * created INSIDE the pair's lifetime AND its statement MENTIONS the
    * dropped name (dependencies in this dialect are by name — FROM /
    * JOIN / subquery references; a word-boundary match is conservative
    * for false positives, never false negatives), replayed in seq order
    * (create → dependent creates → drop), and PRUNES the rest — seqs
    * are monotonic, so a pruned pair can never become needed, and the
    * snapshot stays bounded by catalog size + |live dependencies on
    * dropped sources|. Guarded by stmtLock. */
  private var droppedPairs = Vector.empty[
    (String, Long, Long, String, String)] // (name, cSeq, dSeq, cStmt, dStmt)
  /** Spec hook: statements actually replayed (snapshot + log) since
    * construction — the late-joiner cost the compaction bounds. */
  private[graft] val replayedStatements =
    new java.util.concurrent.atomic.AtomicLong

  /** Post-snapshot tail length as THIS server observes it: log entries
    * replayed (other servers' appends + the start() tail) plus our own
    * appended DDL; reset whenever we compact. Drives the opt-in
    * `autoCompact` policy: after each appended statement, compact when
    * the tail exceeds k·max(1, |catalog bindings|) — so the late-joiner
    * replay bound (snapshot + tail ≤ (k+1)·|catalog|) holds without
    * anyone calling compactCommandLog() by hand. Another server
    * compacting concurrently only makes our trigger fire on an
    * already-short tail — the rewrite is idempotent, never destructive
    * (the main log is append-only either way). Guarded by stmtLock. */
  private var tailStatements = 0L
  /** Spec hook: auto-compactions this server performed. */
  private[graft] val autoCompactions =
    new java.util.concurrent.atomic.AtomicLong

  private def recordBindings(before: Translator.Catalog,
      after: Translator.Catalog, mvBefore: Map[String, String],
      mvAfter: Map[String, String], stmt: String): Unit =
    if (after != before || mvAfter != mvBefore) {
      bindingSeq += 1
      // Sources are reference-identical when untouched, so this finds
      // exactly the names this statement bound or rebound
      after.foreach { case (n, src) =>
        if (!before.get(n).contains(src)) bindings += n -> (bindingSeq, stmt)
      }
      def recordDrop(n: String): Unit = {
        bindings.get(n).foreach { case (cSeq, cStmt) =>
          droppedPairs :+= ((n, cSeq, bindingSeq, cStmt, stmt))
        }
        bindings -= n
      }
      (before.keySet -- after.keySet).foreach(recordDrop)
      // materialized-view DDL mutates the JVM-global MV registry, not
      // the catalog map — tracked under a reserved key space so CREATE
      // MATERIALIZED VIEW replicates (and compacts) like any binding.
      // A REFRESH (same name, new state dir) binds a SEPARATE
      // `#mv:name#refresh` key: compaction then keeps the CREATE (which
      // a fresh joiner must replay first) AND the latest refresh (whose
      // replay re-pins against the newest artifact) — keeping only the
      // refresh under the create's key would replay REFRESH without
      // CREATE and lose the view.
      (mvAfter.keySet -- mvBefore.keySet).foreach(n =>
        bindings += s"#mv:$n" -> (bindingSeq, stmt))
      (mvBefore.keySet -- mvAfter.keySet).foreach { n =>
        recordDrop(s"#mv:$n")
        if (bindings.contains(s"#mv:$n#refresh"))
          recordDrop(s"#mv:$n#refresh")
      }
      mvAfter.foreach { case (n, dir) =>
        if (mvBefore.get(n).exists(_ != dir))
          bindings += s"#mv:$n#refresh" -> (bindingSeq, stmt)
      }
    }

  /** Replay one statement; Left(error) on failure (caller decides
    * loud-skip vs fixpoint-retry). */
  private def replayEither(stmt: String): Either[String, Unit] =
    try {
      val before = catalog
      val mvBefore = graft.plans.MaterializedViews.registeredState
      val (cat2, _) = Translator.run(spark, catalog, stmt)
      catalog = cat2
      recordBindings(before, cat2, mvBefore,
        graft.plans.MaterializedViews.registeredState, stmt)
      replayedStatements.incrementAndGet()
      Right(())
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(String.valueOf(e.getMessage))
    }

  /** Replay one log entry from another server / a previous run. A
    * replay failure (e.g. its source parquet was since removed) skips
    * the entry loudly — refusing to serve at all would turn one bad
    * historical statement into a cluster-wide outage. */
  /** Log entries this server loud-skipped during replay. Non-zero makes
    * compaction REFUSE (see compactCommandLog): a snapshot written past
    * a skipped entry would erase it for every future joiner, turning a
    * transient failure (source parquet mid-rewrite) into permanent
    * cluster-wide loss — before compaction existed, every restart
    * retried the full log and recovered. Correctness over the replay
    * bound: a permanently-bad historical statement disables compaction
    * on the servers that witnessed it, which is the safe direction. */
  private var replaySkips = 0L

  private def replayStmt(stmt: String): Unit = {
    tailStatements += 1 // a log entry beyond the snapshot, pass or fail
    replayEither(stmt).left.foreach { msg =>
      replaySkips += 1
      System.err.println(s"[rest] command-log replay skipped: " +
        s"${stmt.take(120)}: $msg")
    }
  }

  /** Apply any log entries beyond our offset. Callers hold stmtLock. */
  private def syncFromLog(): Unit = cmdLog.foreach { l =>
    appliedOffset = l.transact(appliedOffset, replayStmt)(() => None)
  }

  /** Execute one statement with command-topic total ordering when a
    * log is configured: replay-new, run, append-if-catalog-changed, all
    * under the log's exclusive lock (two servers interleave whole
    * statements, never halves). Callers hold stmtLock. */
  private def runStatement(stmt: String): Option[DataFrame] = cmdLog match {
    case None =>
      val (cat2, res) = Translator.run(spark, catalog, stmt)
      catalog = cat2
      res
    case Some(l) =>
      var res: Option[DataFrame] = None
      var appended = false
      appliedOffset = l.transact(appliedOffset, replayStmt) { () =>
        val mvBefore = graft.plans.MaterializedViews.registeredState
        val (cat2, r) = Translator.run(spark, catalog, stmt)
        // Map equality with reference-equal Sources: true exactly when a
        // name was bound, rebound, or dropped — the command-topic class.
        // MV registry changes (CREATE/DROP MATERIALIZED VIEW) count too:
        // a view created on one server must serve on all, and its
        // single-writer state build makes replay cheap (registration
        // only). Pull SELECTs, SHOW/DESCRIBE, INSERT VALUES stay
        // unlogged (data and introspection, not cluster DDL — the real
        // command topic draws the same line).
        val mvAfter = graft.plans.MaterializedViews.registeredState
        val changed = cat2 != catalog || mvAfter != mvBefore
        recordBindings(catalog, cat2, mvBefore, mvAfter, stmt)
        catalog = cat2
        res = r
        if (changed) { appended = true; Some(stmt) } else None
      }
      if (appended) {
        tailStatements += 1
        autoCompact.foreach { k =>
          if (tailStatements > k.toLong * math.max(1, bindings.size)) {
            compactCommandLog()
            autoCompactions.incrementAndGet()
          }
        }
      }
      res
  }

  /** Compact the shared command log into its sidecar snapshot: the
    * per-name last-binding statements (in binding order) + the current
    * applied offset. A server that start()s after this replays
    * |catalog| statements + the post-snapshot tail instead of the whole
    * DDL history; restart idempotence and the main log's torn-tail
    * handling are untouched (the log file itself is never rewritten).
    * Replay of a snapshot is fixpoint-ordered (failed statements retry
    * after the rest bind), so dependency order among live names
    * resolves itself; under create-or-replace interleaving a dependent
    * CSAS rebinds against the final upstream version — the one
    * deliberate divergence from literal-history replay, and the catalog
    * a fresh execution of the surviving DDL would produce. */
  def compactCommandLog(): Unit = stmtLock.synchronized {
    cmdLog.foreach { l =>
      syncFromLog() // apply everything first: upto must cover bindings
      if (replaySkips > 0) {
        // a snapshot with `upto` past a loud-skipped entry would erase
        // that statement for every future joiner — keep the previous
        // snapshot (whose tail still carries it, so joiners keep
        // retrying) and leave the log uncompacted from this server
        System.err.println(s"[rest] compaction refused: $replaySkips " +
          "replay skip(s) — a snapshot here would bake the loss in")
      } else {
        // dependency fix (see droppedPairs): retain (create, drop) pairs
        // where a surviving binding created inside the pair's lifetime
        // MENTIONS the dropped name — that statement must replay BETWEEN
        // the pair's create and drop. Everything interleaves in
        // binding-seq order; (seq, stmt) dedup collapses one statement
        // binding several names. Unneeded pairs are pruned for good
        // (seqs are monotonic — no future binding can land inside a
        // past interval).
        def mentions(stmt: String, name: String): Boolean = {
          // reserved-key forms carry suffixes (`#mv:v`, `#mv:v#refresh`)
          // but statements mention the bare VIEW name — strip to it
          val bare = name.stripPrefix("#mv:").takeWhile(_ != '#')
          ("(?i)\\b" + java.util.regex.Pattern.quote(bare) + "\\b").r
            .findFirstIn(stmt).isDefined
        }
        // retention runs to a FIXPOINT: a retained pair's own create
        // statement is a dependent too. In the chain CREATE A; CREATE B
        // FROM A; DROP A; CREATE C FROM B; DROP B, pair B is retained
        // because surviving C mentions it — and that makes B's create
        // (`CREATE B … FROM A`, which sits inside A's lifetime) a
        // surviving statement, so pair A must be retained for it to
        // replay. One-pass retention would prune A and a
        // snapshot-bootstrapped joiner would silently lose B and C.
        var deps: Seq[(Long, String)] = bindings.values.toSeq
        var retained = Vector.empty[(String, Long, Long, String, String)]
        var remaining = droppedPairs
        var grew = true
        while (grew) {
          val (hit, miss) = remaining.partition { case (n, cSeq, dSeq, _, _) =>
            deps.exists { case (bSeq, bStmt) =>
              cSeq < bSeq && bSeq < dSeq && mentions(bStmt, n)
            }
          }
          grew = hit.nonEmpty
          retained ++= hit
          deps ++= hit.map { case (_, cSeq, _, cStmt, _) => (cSeq, cStmt) }
          remaining = miss
        }
        droppedPairs = retained
        val stmts = (bindings.values.toSeq ++
          retained.flatMap { case (_, cSeq, dSeq, cStmt, dStmt) =>
            Seq((cSeq, cStmt), (dSeq, dStmt)) })
          .distinct.sortBy(_._1).map(_._2)
        l.writeSnapshot(appliedOffset, stmts)
        tailStatements = 0 // the tail starts fresh behind our snapshot
      }
    }
  }

  // TLS listener config, the real server's ssl.* surface: when an
  // SSLContext is supplied the same endpoints serve over HTTPS (JDK
  // HttpsServer is an HttpServer subtype — one code path either way)
  private val server = ssl match {
    case Some(ctx) =>
      val s = com.sun.net.httpserver.HttpsServer.create(
        new InetSocketAddress("127.0.0.1", port), 0)
      s.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(ctx))
      s
    case None =>
      HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  }
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-rest"); t.setDaemon(true); t
  }))
  server.createContext("/ksql", (ex: HttpExchange) => handle(ex, ksqlEndpoint))
  server.createContext("/query", (ex: HttpExchange) => handle(ex, queryEndpoint))
  server.createContext("/query-stream",
    (ex: HttpExchange) => queryStreamEndpoint(ex))
  server.createContext("/info", (ex: HttpExchange) => handle(ex, _ =>
    (200, JsonMethods.compact(JObject(
      "KsqlServerInfo" -> JObject("version" -> JString("graft"),
        "kafkaClusterId" -> JString("n/a"),
        "ksqlServiceId" -> JString("graft-spark")))))))
  server.createContext("/healthcheck", (ex: HttpExchange) => handle(ex, _ =>
    (200, JsonMethods.compact(JObject("isHealthy" -> JBool(true))))))
  server.createContext("/metrics", (ex: HttpExchange) => metricsEndpoint(ex))

  // Request/error counters for the scrape surface. Counted in handle()
  // for the two statement-carrying endpoints only — liveness probes and
  // scrapes would otherwise dominate the counter.
  private val statementRequests = new java.util.concurrent.atomic.AtomicLong
  private val statementErrors = new java.util.concurrent.atomic.AtomicLong

  /** GET /metrics — Prometheus text exposition of the engine state the
    * real server publishes over JMX (the deployment charm wires exactly
    * this into its monitoring relation). Gauges read live engine state
    * (StreamingQueryManager + this server's own registries); per-query
    * series carry the engine's OWN progress numbers. Reads only — no
    * statement lock, so a scrape can never queue behind a long DDL. */
  private def metricsEndpoint(ex: HttpExchange): Unit = {
    if (!authorized(ex)) { deny401(ex); return }
    if (ex.getRequestURI.getPath != "/metrics") {
      ex.sendResponseHeaders(404, -1); ex.close(); return
    }
    // Prometheus exposition label escaping: backslash, quote, AND
    // newline (a raw \n inside a label corrupts the line protocol)
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n")
    val sb = new StringBuilder
    def gauge(name: String, v: Long): Unit =
      sb.append(s"# TYPE $name gauge\n$name $v\n")
    sb.append("# TYPE ksql_statements_total counter\n")
      .append(s"ksql_statements_total ${statementRequests.get}\n")
    sb.append("# TYPE ksql_statement_errors_total counter\n")
      .append(s"ksql_statement_errors_total ${statementErrors.get}\n")
    gauge("ksql_catalog_sources", catalog.size.toLong)
    gauge("ksql_active_queries", spark.streams.active.length.toLong)
    gauge("ksql_push_queries", pushQueries.size.toLong)
    gauge("ksql_stream_connections", streamQueries.size.toLong)
    // ─── push-transport backpressure (the bounded-ring tradeoff made
    // observable: occupancy says how far behind the consumer is, the
    // drop counter says what the ring already sacrificed, served says
    // what actually went down the wire). Registries are concurrent maps
    // — the scrape iterates them lock-free, same contract as above.
    sb.append("# TYPE ksql_push_ring_rows gauge\n")
    sb.append("# TYPE ksql_push_ring_capacity gauge\n")
    sb.append("# TYPE ksql_push_ring_dropped_total counter\n")
    pushQueries.forEach { (stmt, st) =>
      st.ring.foreach { r =>
        val label = s"""{statement="${esc(stmt.take(120))}"}"""
        sb.append(s"ksql_push_ring_rows$label ${r.size}\n")
        sb.append(s"ksql_push_ring_capacity$label ${r.capacity}\n")
        sb.append(s"ksql_push_ring_dropped_total$label ${r.dropped}\n")
      }
    }
    sb.append("# TYPE ksql_stream_ring_rows gauge\n")
    sb.append("# TYPE ksql_stream_ring_dropped_total counter\n")
    sb.append("# TYPE ksql_stream_served_rows_total counter\n")
    streamConns.forEach { (id, c) =>
      val label = s"""{conn="$id"}"""
      sb.append(s"ksql_stream_ring_rows$label ${c.ring.size}\n")
      sb.append(s"ksql_stream_ring_dropped_total$label ${c.ring.dropped}\n")
      sb.append(s"ksql_stream_served_rows_total$label ${c.served.get}\n")
    }
    // materialized-view serving: rewrite events per registered view —
    // the operator's evidence that the expensive rollups actually route
    // through state instead of rescanning history
    sb.append("# TYPE ksql_mv_rewrites_total counter\n")
    graft.plans.MaterializedViews.servedCounts.toSeq.sortBy(_._1).foreach {
      case (name, n) =>
        sb.append(s"""ksql_mv_rewrites_total{view="${esc(name)}"} $n\n""")
    }
    sb.append("# TYPE ksql_query_batch_id gauge\n")
    sb.append("# TYPE ksql_query_input_rows_per_sec gauge\n")
    sb.append("# TYPE ksql_query_state_rows gauge\n")
    spark.streams.active.foreach { q =>
      val label = s"""{query="${esc(Option(q.name).getOrElse(q.id.toString))}"}"""
      Option(q.lastProgress).foreach { p =>
        sb.append(s"ksql_query_batch_id$label ${p.batchId}\n")
        val rps = p.inputRowsPerSecond
        if (!rps.isNaN)
          sb.append(s"ksql_query_input_rows_per_sec$label $rps\n")
        p.stateOperators.headOption.foreach(so =>
          sb.append(s"ksql_query_state_rows$label ${so.numRowsTotal}\n"))
      }
    }
    val bytes = sb.toString.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "text/plain; version=0.0.4; charset=utf-8")
    ex.sendResponseHeaders(200, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  def start(): RestServer = {
    // converge to the cluster catalog BEFORE serving: a joining server
    // bootstraps from the compacted snapshot when one exists (catalog-
    // sized fixpoint replay, advancing the offset past the compacted
    // prefix), then replays only the log tail — without a snapshot it
    // replays the whole shared log, the way a ksql server drains the
    // command topic before opening its listener
    stmtLock.synchronized {
      cmdLog.flatMap(_.readSnapshot()).foreach { case (upto, stmts) =>
        var pending = stmts
        var progress = true
        while (pending.nonEmpty && progress) {
          val failed = pending.filter(s => replayEither(s).isLeft)
          progress = failed.size < pending.size
          pending = failed
        }
        replaySkips += pending.size // a re-compaction here would drop them
        pending.foreach(s => System.err.println(
          s"[rest] snapshot replay skipped: ${s.take(120)}"))
        appliedOffset = upto
      }
      syncFromLog()
    }
    server.start()
    this
  }
  def stop(): Unit = {
    stopping = true
    server.stop(0)
    // terminate continuous push queries and release their sinks
    pushQueries.values.forEach { st =>
      try st.query.stop() catch { case _: Throwable => () }
      st.sink.foreach(v =>
        try spark.catalog.dropTempView(v) catch { case _: Throwable => () })
    }
    pushQueries.clear()
    // per-connection /query-stream queries (their handler loops see
    // `stopping` and exit; stopping the query unblocks any drain wait)
    streamQueries.forEach(q => try q.stop() catch { case _: Throwable => () })
    streamQueries.clear()
  }
  def boundPort: Int = server.getAddress.getPort

  /** Opt-in basic auth, the real server's listener security contract:
    * when credentials are configured every endpoint (data and metadata
    * alike) answers 401 + WWW-Authenticate to a missing or wrong
    * Authorization header. Comparison is exact-header: the expected
    * value is computed once per check from the configured pair. */
  private def authorized(ex: HttpExchange): Boolean = auth.forall {
    case (user, pass) =>
      val expect = "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$user:$pass".getBytes(UTF_8))
      Option(ex.getRequestHeaders.getFirst("Authorization")).contains(expect)
  }

  private def deny401(ex: HttpExchange): Unit = {
    val bytes = JsonMethods.compact(JObject(
      "message" -> JString("HTTP 401 Unauthorized"))).getBytes(UTF_8)
    ex.getResponseHeaders.set("WWW-Authenticate", "Basic realm=\"ksql\"")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(401, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def handle(ex: HttpExchange, f: String => (Int, String)): Unit = {
    if (!authorized(ex)) { deny401(ex); return }
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
    val counted = ex.getHttpContext.getPath == "/ksql" ||
      ex.getHttpContext.getPath == "/query"
    if (counted) statementRequests.incrementAndGet()
    // one statement at a time across ALL pooled handler threads — the
    // catalog-consistency contract the old single-dispatch-thread
    // design gave for free
    val (code, resp) = try stmtLock.synchronized(f(body)) catch {
      case e: Throwable => (400, JsonMethods.compact(JObject(
        "@type" -> JString("statement_error"),
        "message" -> JString(String.valueOf(e.getMessage)))))
    }
    // count by response code, not by throw: endpoint-internal statement
    // errors (bare SELECT on /ksql, mid-batch failures) answer 400
    // without raising
    if (counted && code >= 400) statementErrors.incrementAndGet()
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
        val res = runStatement(stmt)
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
    // runStatement (not bare Translator.run): syncs the command log
    // first, so DDL another server appended is queryable HERE — the
    // cluster convergence the charm deploys servers for
    val res = runStatement(stmts.head)
    val df = res.getOrElse(throw new IllegalArgumentException("statement returned no result"))
    if (!df.isStreaming) (200, renderRows(df))
    else (200, renderRows(drainPush(stmts.head, df)))
  }

  /** Live per-connection /query-stream continuous queries, for stop(). */
  private val streamQueries = java.util.concurrent.ConcurrentHashMap
    .newKeySet[org.apache.spark.sql.streaming.StreamingQuery]()

  /** The real push transport: one chunked response per subscription,
    * rows flushed as the continuous query emits them. Not routed
    * through `handle` — that wrapper buffers exactly one response body,
    * and this endpoint's whole point is that the body never ends until
    * the client goes away (or its "maxRows" cap / server stop).
    *
    * Request: {"sql": "SELECT ... EMIT CHANGES" [, "maxRows": n]}
    * ("ksql" accepted too — the older endpoint's key). Response lines
    * are the same JSON-lines shape as /query. A pull (batch) SELECT
    * answers its rows and closes — the unified-endpoint behavior.
    *
    * Each connection starts its OWN continuous query over a fresh
    * ring: two subscribers to one statement each see the full stream
    * (the real server's semantics), unlike /query's shared per-
    * statement registry, which serves each row to whichever poller
    * gets it first. Translate+start runs under stmtLock; the serve
    * loop does not hold it (a long-lived stream must not block the
    * server). Aggregations that reject append mode 400 here: a
    * changelog transport needs per-update emission, and the embedded
    * complete-mode fallback is /query's snapshot contract. */
  private def queryStreamEndpoint(ex: HttpExchange): Unit = {
    if (!authorized(ex)) { deny401(ex); return }
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
    val setup: Either[String, (DataFrame, Long)] = try {
      val parsed = JsonMethods.parse(body)
      val sql = (parsed \ "sql") match {
        case JString(s) => s
        case _ => (parsed \ "ksql") match {
          case JString(s) => s
          case _ => throw new IllegalArgumentException(
            """body must carry {"sql": "..."}""")
        }
      }
      val cap = (parsed \ "maxRows") match {
        case JInt(n) => n.toLong
        case _ => Long.MaxValue
      }
      val stmts = Translator.splitStatements(sql)
      require(stmts.size == 1,
        s"/query-stream takes exactly one statement, got ${stmts.size}")
      require(isPull(stmts.head), "/query-stream serves SELECT statements")
      val res = stmtLock.synchronized(runStatement(stmts.head))
      val df = res.getOrElse(
        throw new IllegalArgumentException("statement returned no result"))
      Right((df, cap))
    } catch {
      case e: Throwable => Left(String.valueOf(e.getMessage))
    }
    setup match {
      case Left(msg) =>
        val bytes = JsonMethods.compact(JObject(
          "@type" -> JString("statement_error"),
          "message" -> JString(msg))).getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(400, bytes.length)
        try ex.getResponseBody.write(bytes) finally ex.close()
      case Right((df, cap)) if !df.isStreaming =>
        // pull query over the unified endpoint: rows, then done
        val bytes = renderRows(df).getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        try ex.getResponseBody.write(bytes) finally ex.close()
      case Right((df, cap)) =>
        serveChunked(ex, df, cap)
    }
  }

  /** Per-connection /query-stream state, registered for the /metrics
    * backpressure gauges: the ring (occupancy + drop counter live on it)
    * and a served-row counter the handler loop bumps. Keyed by a
    * monotone connection id; entries leave with the connection. */
  private final case class StreamConn(ring: RingBuffer,
      served: java.util.concurrent.atomic.AtomicLong)
  private val streamConnSeq = new java.util.concurrent.atomic.AtomicLong
  private val streamConns =
    new java.util.concurrent.ConcurrentHashMap[Long, StreamConn]()

  private def serveChunked(ex: HttpExchange, df: DataFrame, cap: Long): Unit = {
    val ring = new RingBuffer(4 * maxRows, df.schema)
    val q = try {
      stmtLock.synchronized {
        def start(mode: String) = df.writeStream
          .foreachBatch((b: org.apache.spark.sql.Dataset[Row], _: Long) =>
            ring.add(b.collect()))
          .outputMode(mode).start()
        try start("append")
        catch {
          // a seeded materialized-view continuation (transformWithState)
          // emits per-key UPDATES — exactly the changelog a push
          // subscriber wants, so serve it in update mode through the
          // same ring. Plain streaming aggregations keep the historical
          // contract (400 with the /query snapshot pointer): their
          // update stream re-emits whole groups per batch, which /query
          // already serves as a snapshot without a per-connection query.
          case e: org.apache.spark.sql.AnalysisException
              if df.queryExecution.logical.exists(
                _.nodeName.contains("TransformWithState")) =>
            start("update")
        }
      }
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        val bytes = JsonMethods.compact(JObject(
          "@type" -> JString("statement_error"),
          "message" -> JString("push query is not append-able here " +
            s"(aggregations snapshot via /query): ${e.getMessage}"))).getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(400, bytes.length)
        try ex.getResponseBody.write(bytes) finally ex.close()
        return
    }
    streamQueries.add(q)
    val connId = streamConnSeq.incrementAndGet()
    val conn = StreamConn(ring, new java.util.concurrent.atomic.AtomicLong)
    streamConns.put(connId, conn)
    var served = 0L
    try {
      // header send INSIDE the teardown scope: a client that disconnects
      // before the response flushes throws right here, and the finally
      // below must still stop the per-connection query and drop the
      // metrics entry — outside it, every aborted connect leaked a live
      // streaming query and a phantom /metrics gauge
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, 0) // length 0 → chunked transfer
      val out = ex.getResponseBody
      out.write((JsonMethods.compact(JObject("header" -> JObject(
        "schema" -> JArray(df.schema.fields.toList.map(fd =>
          JObject("name" -> JString(fd.name),
            "type" -> JString(fd.dataType.simpleString))))))) + "\n").getBytes(UTF_8))
      out.flush()
      var idleRounds = 0
      while (served < cap && !stopping && q.isActive) {
        val got = ring.drain(math.min(cap - served, maxRows.toLong).toInt)
        if (got.isEmpty) {
          ring.awaitData(200)
          idleRounds += 1
          // liveness probe on an idle stream (round-9 ADVICE): a client
          // that disconnects while no rows arrive never triggers a
          // write, so the handler thread and its per-connection query
          // would spin until server stop. Every ~5 s of silence, write
          // a blank keep-alive line — a dead socket surfaces as the
          // IOException below and tears the subscription down. Blank
          // lines are JSON-lines noise every framing client skips.
          if (idleRounds >= 25) {
            out.write('\n'); out.flush()
            idleRounds = 0
          }
        } else {
          idleRounds = 0
          got.foreach { r =>
            out.write((JsonMethods.compact(JObject("row" -> JObject(
              "columns" -> JArray(r.toSeq.toList.map(jsonValue))))) + "\n")
              .getBytes(UTF_8))
          }
          out.flush() // one chunk per drained increment
          served += got.length
          conn.served.set(served)
        }
      }
      if (served >= cap)
        out.write((JsonMethods.compact(JObject(
          "finalMessage" -> JString("Limit Reached"))) + "\n").getBytes(UTF_8))
    } catch {
      case _: java.io.IOException => () // client went away — normal teardown
    } finally {
      try q.stop() catch { case _: Throwable => () }
      streamQueries.remove(q)
      streamConns.remove(connId)
      try ex.close() catch { case _: Throwable => () }
    }
  }

  /** Bounded driver-side buffer between a continuous query's foreachBatch
    * sink and the HTTP responses serving it: rows append at the tail,
    * drains REMOVE from the head (drop-after-serve eviction), and when
    * arrivals outrun the client the OLDEST unserved rows fall off — ring
    * semantics. A long-lived push query therefore holds O(capacity)
    * driver state, never O(stream) (the round-8 memory-sink design
    * accumulated every emitted row for the life of the query). `dropped`
    * keeps the loss observable. Synchronized: foreachBatch lands on
    * Spark's streaming thread while drains come from handler threads. */
  private[graft] final class RingBuffer(val capacity: Int,
                                       schema0: org.apache.spark.sql.types.StructType) {
    val schema: org.apache.spark.sql.types.StructType = schema0
    private val buf = new java.util.ArrayDeque[Row]()
    private var droppedRows = 0L
    def add(rows: Array[Row]): Unit = synchronized {
      rows.foreach { r =>
        if (buf.size >= capacity) { buf.pollFirst(); droppedRows += 1 }
        buf.addLast(r)
      }
      if (rows.nonEmpty) notifyAll()
    }
    def drain(max: Int): Array[Row] = synchronized {
      val out = new Array[Row](math.min(max, buf.size))
      var i = 0
      while (i < out.length) { out(i) = buf.pollFirst(); i += 1 }
      out
    }
    /** Block until a row is buffered or `timeoutMs` passes. */
    def awaitData(timeoutMs: Long): Unit = synchronized {
      if (buf.isEmpty) wait(timeoutMs)
    }
    def size: Int = synchronized(buf.size)
    def dropped: Long = synchronized(droppedRows)
  }

  /** Push query (EMIT CHANGES over a STREAMING source): a CONTINUOUS
    * query registered once per statement text and kept running across
    * requests — the contract a KSQL push-query client relies on. Each
    * POST drains what the source has newly available and answers with:
    *   - append mode (projections, watermark-closed windows): the rows
    *     emitted SINCE THE LAST POST of the same statement — the
    *     increment, not a re-drain of history. Emitted rows land in a
    *     bounded [[RingBuffer]] via foreachBatch and drains evict what
    *     they serve, so driver state is O(4·maxRows) for the life of
    *     the query (arrivals beyond the ring while no client drains
    *     evict oldest-first — the bounded-buffer tradeoff, counted in
    *     `dropped`). This also removes the round-8 reliance on the
    *     memory sink's scan order being a stable prefix across POSTs.
    *   - complete mode (the fallback for aggregations append rejects):
    *     the current state of every group, exactly what a table push
    *     query shows on (re)subscribe — memory sink, state bounded by
    *     group cardinality, no increments to track.
    * `stop()` tears every registered query down. Registration runs
    * under `stmtLock` (handlers are pooled now), so one statement text
    * maps to exactly one continuous query. */
  private final case class PushState(
      query: org.apache.spark.sql.streaming.StreamingQuery,
      mode: String, ring: Option[RingBuffer], sink: Option[String])
  // ConcurrentHashMap so the /metrics scrape can iterate WITHOUT taking
  // stmtLock (a scrape must never queue behind a long DDL); handler
  // threads still mutate under stmtLock for statement-level atomicity
  private val pushQueries =
    new java.util.concurrent.ConcurrentHashMap[String, PushState]()

  /** Spec hooks: observable buffer size / loss for a registered push
    * statement (None when the statement isn't append-mode-registered).
    * Input is normalized through the same statement splitter the
    * endpoints use, so callers may pass the raw POSTed text. */
  private def pushKey(stmt: String): String =
    Translator.splitStatements(stmt).headOption.getOrElse(stmt)
  // stmtLock around the map lookups: handler threads mutate pushQueries
  // under the lock, and these accessors run on the caller's thread — an
  // unlocked read of the non-thread-safe mutable Map is a data race
  // (round-9 ADVICE). The ring accessors themselves are synchronized.
  private[graft] def pushBufferedRows(stmt: String): Option[Int] =
    Option(pushQueries.get(pushKey(stmt)))
      .flatMap(_.ring).map(_.size)
  private[graft] def pushDroppedRows(stmt: String): Option[Long] =
    Option(pushQueries.get(pushKey(stmt)))
      .flatMap(_.ring).map(_.dropped)

  /** Start a continuous query for `df`: append-mode into a fresh ring
    * when the plan allows it, complete-mode memory sink otherwise. */
  private def startPush(df: DataFrame): PushState = {
    try {
      val ring = new RingBuffer(4 * maxRows, df.schema)
      val q = df.writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[Row], _: Long) =>
          ring.add(b.collect()))
        .outputMode("append").start()
      PushState(q, "append", Some(ring), None)
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        val name = "push_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = df.writeStream.format("memory").queryName(name)
          .outputMode("complete").start()
        PushState(q, "complete", None, Some(name))
    }
  }

  private def drainPush(stmt: String, df: DataFrame): DataFrame = {
    // start the query OUTSIDE the map's bin lock: computeIfAbsent would
    // hold the bin for the multi-second writeStream.start(), and the
    // /metrics forEach blocks on locked bins — the exact scrape stall
    // the concurrent map exists to prevent. Callers hold stmtLock, so
    // one statement still maps to one query; the putIfAbsent loser path
    // (reachable only if a future caller skips the lock) stops its own
    // query instead of leaking it.
    val st = Option(pushQueries.get(stmt)).getOrElse {
      val fresh = startPush(df)
      Option(pushQueries.putIfAbsent(stmt, fresh)) match {
        case Some(winner) =>
          try fresh.query.stop() catch { case _: Throwable => () }
          winner
        case None => fresh
      }
    }
    st.query.processAllAvailable()
    (st.ring, st.sink) match {
      case (Some(ring), _) =>
        spark.createDataFrame(
          new java.util.ArrayList[Row](java.util.Arrays.asList(
            ring.drain(maxRows): _*)), ring.schema)
      case (None, Some(sink)) =>
        val all = spark.table(sink)
        spark.createDataFrame(
          new java.util.ArrayList[Row](java.util.Arrays.asList(
            all.limit(maxRows + 1).collect(): _*)), all.schema)
      case _ => throw new IllegalStateException(s"bad push state $st")
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
    // TIME columns (round 18): ksqlDB's JSON form is HH:mm:ss[.fff] —
    // LocalTime.toString drops ":00" seconds, so pin the whole-second
    // render (the fractional form is already canonical)
    case t: java.time.LocalTime => JString(
      if (t.getNano == 0)
        t.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))
      else t.toString)
    case d: java.time.LocalDate => JString(d.toString)
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
    * given port. Usage: runMain graft.ksql.RestServer [sfDir] [port]
    * [commandLogPath]. Env GRAFT_REST_AUTH=user:pass enables basic
    * auth. Two processes given the same commandLogPath form a
    * replicated pair (shared command topic). */
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(8088)
    val cmdLog = args.lift(2).map(java.nio.file.Paths.get(_))
    val auth = sys.env.get("GRAFT_REST_AUTH").flatMap { s =>
      s.split(":", 2) match {
        case Array(u, p) => Some((u, p))
        case _ => None
      }
    }
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-ksql-rest")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftExtensions.register(spark)
    val srv = new RestServer(spark, Repl.preloadCatalog(spark, sfDir), port,
      commandLog = cmdLog, auth = auth).start()
    System.err.println(s"ksql REST surface on 127.0.0.1:${srv.boundPort}")
    Thread.currentThread().join()
  }
}
