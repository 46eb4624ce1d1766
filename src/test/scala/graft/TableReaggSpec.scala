package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ksql.Translator
import graft.ksql.Translator.Source

/** Live-table changelog record: nullable balance so COUNT(x)/SUM skip
  * null contributions while COUNT(*) still counts the row. */
case class ReaggRow(id: Long, seg: String, bal: java.lang.Long, off: Long)

/** Retraction-aware GROUP BY over a LIVE TABLE changelog (round 18 —
  * ksqlDB's table→table aggregation, previously refused): every upsert
  * retracts the row's previous contribution and adds its new one, so a
  * key MOVING between groups decrements one aggregate and increments
  * the other; emptied groups and HAVING failures TOMBSTONE
  * (`__deleted`) instead of silently keeping their last served value.
  */
class TableReaggSpec extends SparkSpec {
  import spark.implicits._

  private val stmt =
    """CREATE TABLE seg_stats AS
      |  SELECT seg, COUNT(*) AS n, COUNT(bal) AS nb,
      |         SUM(bal) AS bal_sum, AVG(bal) AS bal_avg
      |  FROM accts GROUP BY seg;""".stripMargin

  private def withRocks[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try body finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Materialize the aggregate changelog: per group the max-__off
    * emission (monotone per group — it is the latest contributing
    * changelog offset), dropping tombstones. */
  private def materialize(table: String): Map[String, (Long, Long, Option[Long], Option[Double])] = {
    import org.apache.spark.sql.expressions.Window
    spark.table(table)
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col("seg")).orderBy(col("__off").desc)))
      .filter(col("__rn") === 1 && !col("__deleted")).drop("__rn")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
  }

  test("live re-aggregation: group moves retract-and-add, null values " +
    "skip COUNT(x)/SUM, stale replays no-op, emptied groups tombstone, " +
    "and the materialized result converges on the snapshot recompute") {
    withRocks {
      val mem = MemoryStream[ReaggRow](spark)
      val cat: Translator.Catalog = Map(
        "accts" -> Source(mem.toDF(), "off", key = Some("id"),
          isTable = true))
      val (_, Some(out)) = Translator.run(spark, cat, stmt): @unchecked
      assert(out.isStreaming, "the live form must stay a streaming frame")
      assert(out.columns.toSeq ===
        Seq("seg", "n", "nb", "bal_sum", "bal_avg", "__off", "__deleted"))
      val q = out.writeStream.format("memory").queryName("reagg_out")
        .outputMode("update").start()
      try {
        var all = Seq.empty[ReaggRow]
        def oracle(): Map[String, (Long, Long, Option[Long], Option[Double])] = {
          val latest = all.groupBy(_.id).view.mapValues(_.maxBy(_.off))
            .values.toSeq
          latest.groupBy(_.seg).view.mapValues { rows =>
            val vals = rows.flatMap(r => Option(r.bal).map(_.longValue()))
            (rows.size.toLong, vals.size.toLong,
              if (vals.isEmpty) None else Some(vals.sum),
              if (vals.isEmpty) None
              else Some(vals.sum.toDouble / vals.size))
          }.toMap
        }
        def drive(rows: ReaggRow*): Unit = {
          mem.addData(rows: _*)
          q.processAllAvailable()
          all ++= rows
          assert(materialize("reagg_out") === oracle())
        }
        // batch 1: two groups
        drive(ReaggRow(1, "a", 10L, 1), ReaggRow(2, "a", 20L, 2),
          ReaggRow(3, "b", 30L, 3))
        // batch 2: id 1 MOVES a→b (retract from a, add to b); id 4
        // arrives with a NULL balance (counts in n, not nb/sum)
        drive(ReaggRow(1, "b", 15L, 4), ReaggRow(4, "a", null, 5))
        // batch 3: a STALE replay of id 1's first image (offset below
        // the stored one) must not resurrect the old contribution
        drive(ReaggRow(1, "a", 10L, 0))
        // batch 4: id 2 moves a→c; id 4's balance materializes in c —
        // group a is now EMPTY and must be served tombstoned
        drive(ReaggRow(2, "c", 25L, 6), ReaggRow(4, "c", 40L, 7))
        val aRows = spark.table("reagg_out").filter(col("seg") === "a")
          .orderBy(col("__off").desc).collect()
        assert(aRows.nonEmpty && aRows.head.getAs[Boolean]("__deleted"),
          "an emptied group must emit a tombstone, not go silent")
        // batch 5: the same key updating IN PLACE (same group, new
        // value) adjusts the sums without touching counts
        drive(ReaggRow(4, "c", 50L, 8))
      } finally q.stop()
    }
  }

  test("HAVING is a tombstone: a group falling below the bound emits " +
    "a retraction (verbatim-aggregate and alias forms both serve)") {
    withRocks {
      val mem = MemoryStream[ReaggRow](spark)
      val cat: Translator.Catalog = Map(
        "accts" -> Source(mem.toDF(), "off", key = Some("id"),
          isTable = true))
      val (_, Some(out)) = Translator.run(spark, cat,
        """CREATE TABLE big_segs AS
          |  SELECT seg, COUNT(*) AS n FROM accts
          |  GROUP BY seg HAVING COUNT(*) >= 2;""".stripMargin)
        : @unchecked
      val q = out.writeStream.format("memory").queryName("reagg_hav")
        .outputMode("update").start()
      try {
        mem.addData(ReaggRow(1, "a", 1L, 1), ReaggRow(2, "a", 2L, 2))
        q.processAllAvailable()
        val served = spark.table("reagg_hav")
          .filter(col("seg") === "a" && !col("__deleted")).collect()
        assert(served.map(_.getLong(1)).toSeq === Seq(2L),
          "a group meeting HAVING serves")
        // id 2 moves away: a falls to 1 — HAVING now fails, and the
        // emission must be a TOMBSTONE (a filter would stay silent and
        // readers would keep serving n=2)
        mem.addData(ReaggRow(2, "b", 2L, 3))
        q.processAllAvailable()
        val aLast = spark.table("reagg_hav").filter(col("seg") === "a")
          .orderBy(col("__off").desc).collect().head
        assert(aLast.getAs[Boolean]("__deleted"),
          "falling below HAVING must tombstone")
      } finally q.stop()
    }
  }

  test("WHERE filters row images symmetrically: an update moving a row " +
    "OUT of the predicate set retracts its old, matching image") {
    withRocks {
      val mem = MemoryStream[ReaggRow](spark)
      val cat: Translator.Catalog = Map(
        "accts" -> Source(mem.toDF(), "off", key = Some("id"),
          isTable = true))
      val (_, Some(out)) = Translator.run(spark, cat,
        """CREATE TABLE rich AS
          |  SELECT seg, COUNT(*) AS n FROM accts
          |  WHERE bal >= 20 GROUP BY seg;""".stripMargin): @unchecked
      val q = out.writeStream.format("memory").queryName("reagg_where")
        .outputMode("update").start()
      try {
        mem.addData(ReaggRow(1, "a", 25L, 1), ReaggRow(2, "a", 30L, 2))
        q.processAllAvailable()
        // id 1 drops to 5: leaves the predicate set — its OLD image
        // (bal 25, passing) must still retract, n falls to 1
        mem.addData(ReaggRow(1, "a", 5L, 3))
        q.processAllAvailable()
        val aLast = spark.table("reagg_where").filter(col("seg") === "a")
          .orderBy(col("__off").desc).collect().head
        assert(!aLast.getAs[Boolean]("__deleted") && aLast.getLong(1) === 1L,
          s"expected n=1 after the update left the WHERE set, got $aLast")
      } finally q.stop()
    }
  }

  test("the live form matches the batch snapshot aggregation of the " +
    "same changelog (delta-fold ≡ recompute)") {
    withRocks {
      val rows = Seq(
        ReaggRow(1, "a", 10L, 1), ReaggRow(2, "a", 20L, 2),
        ReaggRow(3, "b", 30L, 3), ReaggRow(1, "b", 15L, 4),
        ReaggRow(4, "a", null, 5), ReaggRow(2, "c", 25L, 6))
      val mem = MemoryStream[ReaggRow](spark)
      val liveCat: Translator.Catalog = Map(
        "accts" -> Source(mem.toDF(), "off", key = Some("id"),
          isTable = true))
      val (_, Some(out)) = Translator.run(spark, liveCat, stmt): @unchecked
      val q = out.writeStream.format("memory").queryName("reagg_parity")
        .outputMode("update").start()
      try {
        mem.addData(rows: _*)
        q.processAllAvailable()
      } finally q.stop()
      import org.apache.spark.sql.expressions.Window
      val live = spark.table("reagg_parity")
        .withColumn("__rn", row_number().over(Window
          .partitionBy(col("seg")).orderBy(col("__off").desc)))
        .filter(col("__rn") === 1 && !col("__deleted"))
        .select("seg", "n", "nb", "bal_sum", "bal_avg")
      val batchCat: Translator.Catalog = Map(
        "accts" -> Source(rows.toDF(), "off", key = Some("id"),
          isTable = true))
      val (_, Some(batch)) = Translator.run(spark, batchCat, stmt.replace(
        "CREATE TABLE seg_stats AS", "CREATE TABLE seg_stats_b AS"))
        : @unchecked
      assert(live.collect().toSet === batch.collect().toSet,
        "live delta-fold and batch snapshot recompute must agree")
    }
  }

  test("CHAINED re-aggregation: a GROUP BY over another GROUP BY's " +
    "changelog honors its tombstones and offsets (__deleted/__off are " +
    "the authoritative delete/order signals of a derived table)") {
    withRocks {
      val mem = MemoryStream[ReaggRow](spark)
      val cat0: Translator.Catalog = Map(
        "accts" -> Source(mem.toDF(), "off", key = Some("id"),
          isTable = true))
      // hop 1: rows per segment; hop 2: how many segments carry each
      // row count — a seg moving between counts must decrement its old
      // count's tally, and a TOMBSTONED seg must leave the histogram
      val (cat1, _) = Translator.run(spark, cat0,
        """CREATE TABLE seg_stats AS
          |  SELECT seg, COUNT(*) AS n FROM accts GROUP BY seg;"""
          .stripMargin)
      val (_, Some(out)) = Translator.run(spark, cat1,
        """CREATE TABLE seg_sizes AS
          |  SELECT n, COUNT(*) AS segs FROM seg_stats GROUP BY n;"""
          .stripMargin): @unchecked
      assert(out.isStreaming)
      val q = out.writeStream.format("memory").queryName("reagg_chain")
        .outputMode("update").start()
      try {
        var all = Seq.empty[ReaggRow]
        def oracle(): Map[Long, Long] = {
          val latest = all.groupBy(_.id).view.mapValues(_.maxBy(_.off))
            .values.toSeq
          latest.groupBy(_.seg).view.mapValues(_.size.toLong).values
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
        }
        def materialized(): Map[Long, Long] = {
          import org.apache.spark.sql.expressions.Window
          spark.table("reagg_chain")
            .withColumn("__rn", row_number().over(Window
              .partitionBy(col("n")).orderBy(col("__off").desc)))
            .filter(col("__rn") === 1 && !col("__deleted")).drop("__rn")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        }
        def drive(rows: ReaggRow*): Unit = {
          mem.addData(rows: _*)
          q.processAllAvailable()
          all ++= rows
          assert(materialized() === oracle(),
            s"after ${all.size} records")
        }
        // a:2 b:1 → histogram {2→1, 1→1}
        drive(ReaggRow(1, "a", 1L, 1), ReaggRow(2, "a", 2L, 2),
          ReaggRow(3, "b", 3L, 3))
        // id 2 moves a→b: both segs now 1... a:1 b:2 → {1→1, 2→1}
        drive(ReaggRow(2, "b", 2L, 4))
        // id 1 moves a→c: seg a EMPTIES (hop-1 tombstone) — the
        // histogram must not keep counting it; a:gone b:2 c:1
        drive(ReaggRow(1, "c", 1L, 5))
        // pile everyone into b: b:3 c:gone... {3→1}? id1,id2,id3 all b
        drive(ReaggRow(1, "b", 1L, 6), ReaggRow(3, "b", 3L, 7))
      } finally q.stop()
    }
  }

  test("FK-join changelog feeds a re-aggregation (the two-statement " +
    "pointer): right renames MOVE groups, fk moves re-count, join " +
    "retractions leave the tally") {
    withRocks {
      val lMem = MemoryStream[DlgLeft](spark)
      val rMem = MemoryStream[DlgRight](spark)
      val cat0: Translator.Catalog = Map(
        "users_t" -> Source(lMem.toDF(), "off", key = Some("uid"),
          isTable = true),
        "depts_t" -> Source(rMem.toDF(), "roff", key = Some("dept_id"),
          isTable = true))
      val (cat1, _) = Translator.run(spark, cat0,
        """CREATE TABLE joined AS
          |  SELECT uid, dept, uname, dept_name
          |  FROM users_t JOIN depts_t ON dept = dept_id;""".stripMargin)
      val (_, Some(out)) = Translator.run(spark, cat1,
        """CREATE TABLE dept_counts AS
          |  SELECT dept_name, COUNT(*) AS members
          |  FROM joined GROUP BY dept_name;""".stripMargin): @unchecked
      val q = out.writeStream.format("memory").queryName("reagg_fk")
        .outputMode("update").start()
      try {
        var allL = Seq.empty[DlgLeft]; var allR = Seq.empty[DlgRight]
        def oracle(): Map[String, Long] = {
          val lLatest = allL.groupBy(_.uid).view.mapValues(_.maxBy(_.off))
            .values.filter(_.dept != null)
          val rLatest = allR.groupBy(_.dept_id).view
            .mapValues(_.maxBy(_.roff)).values
            .map(r => r.dept_id -> r.dept_name).toMap
          lLatest.flatMap(l => rLatest.get(l.dept.longValue()))
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
        }
        def materialized(): Map[String, Long] = {
          import org.apache.spark.sql.expressions.Window
          spark.table("reagg_fk")
            .withColumn("__rn", row_number().over(Window
              .partitionBy(col("dept_name")).orderBy(col("__off").desc)))
            .filter(col("__rn") === 1 && !col("__deleted")).drop("__rn")
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        def drive(ls: Seq[DlgLeft], rs: Seq[DlgRight]): Unit = {
          if (ls.nonEmpty) lMem.addData(ls: _*)
          if (rs.nonEmpty) rMem.addData(rs: _*)
          q.processAllAvailable()
          allL ++= ls; allR ++= rs
          assert(materialized() === oracle())
        }
        drive(
          Seq(DlgLeft(1L, 10L, null, "ann", 3),
            DlgLeft(2L, 10L, null, "bob", 4),
            DlgLeft(3L, 11L, null, "cid", 5)),
          Seq(DlgRight(10L, "eng", 1), DlgRight(11L, "ops", 2)))
        // fk move 10→11: eng falls to 1, ops rises to 2
        drive(Seq(DlgLeft(1L, 11L, 10L, "ann", 6)), Nil)
        // right RENAME 10→"platform": the subscribers' dept_name value
        // changes — the count must MOVE from eng to platform
        drive(Nil, Seq(DlgRight(10L, "platform", 7)))
        // left delete: uid 3 leaves ops
        drive(Seq(DlgLeft(3L, null, 11L, null, 8)), Nil)
      } finally q.stop()
    }
  }

  test("STRING-keyed tables re-aggregate (the previous-image store " +
    "keys on the PRIMARY KEY's string form)") {
    withRocks {
      val mem = MemoryStream[(String, String, Long, Long)](spark)
      val cat: Translator.Catalog = Map(
        "users" -> Source(
          mem.toDF().toDF("handle", "team", "score", "off"), "off",
          key = Some("handle"), isTable = true))
      val (_, Some(out)) = Translator.run(spark, cat,
        """CREATE TABLE team_sizes AS
          |  SELECT team, COUNT(*) AS n FROM users GROUP BY team;"""
          .stripMargin): @unchecked
      val q = out.writeStream.format("memory").queryName("reagg_str")
        .outputMode("update").start()
      try {
        mem.addData(("ann", "red", 1L, 1L), ("bob", "red", 2L, 2L),
          ("cid", "blue", 3L, 3L))
        q.processAllAvailable()
        mem.addData(("ann", "blue", 1L, 4L)) // move red→blue
        q.processAllAvailable()
        import org.apache.spark.sql.expressions.Window
        val m = spark.table("reagg_str")
          .withColumn("__rn", row_number().over(Window
            .partitionBy(col("team")).orderBy(col("__off").desc)))
          .filter(col("__rn") === 1 && !col("__deleted")).drop("__rn")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(m === Map("red" -> 1L, "blue" -> 2L))
      } finally q.stop()
    }
  }

  test("changelogSink materializes the aggregate table to parquet: " +
    "upserts win by offset, tombstoned groups DISAPPEAR from the " +
    "snapshot, and a move pair's tie resolves non-deleted") {
    withRocks {
      val dir = java.nio.file.Files.createTempDirectory("reagg_sink")
        .toString
      val mem = MemoryStream[ReaggRow](spark)
      val cat: Translator.Catalog = Map(
        "accts" -> Source(mem.toDF(), "off", key = Some("id"),
          isTable = true))
      val (_, Some(out)) = Translator.run(spark, cat,
        """CREATE TABLE seg_stats AS
          |  SELECT seg, COUNT(*) AS n FROM accts GROUP BY seg;"""
          .stripMargin): @unchecked
      val q = graft.streaming.KsqlTable
        .changelogSink(out, "seg", s"$dir/tab", s"$dir/cp").start()
      try {
        def snapshot(): Map[String, Long] =
          spark.read.parquet(s"$dir/tab").collect()
            .map(r => r.getAs[String]("seg") -> r.getAs[Long]("n")).toMap
        mem.addData(ReaggRow(1, "a", 1L, 1), ReaggRow(2, "a", 2L, 2),
          ReaggRow(3, "b", 3L, 3))
        q.processAllAvailable()
        assert(snapshot() === Map("a" -> 2L, "b" -> 1L))
        // empty group a across two moves: the stored 'a' row must be
        // REMOVED by the tombstone, not left at its last value
        mem.addData(ReaggRow(1, "b", 1L, 4), ReaggRow(2, "b", 2L, 5))
        q.processAllAvailable()
        assert(snapshot() === Map("b" -> 3L),
          "a tombstoned group must disappear from the materialization")
        // resurrect a with one member
        mem.addData(ReaggRow(3, "a", 3L, 6))
        q.processAllAvailable()
        assert(snapshot() === Map("a" -> 1L, "b" -> 2L))
      } finally q.stop()
    }
  }

  test("POST /query-stream serves the table re-aggregation push form " +
    "over real HTTP: chunked emissions track group moves, a tombstone " +
    "arrives as a __deleted row") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    withRocks {
      val mem = MemoryStream[ReaggRow](spark)
      val srv = new graft.ksql.RestServer(spark, Map(
        "accts" -> Source(mem.toDF(), "off", key = Some("id"),
          isTable = true)), maxRows = 10).start()
      try {
        val url = java.net.URI.create(
          s"http://127.0.0.1:${srv.boundPort}/query-stream").toURL
        val conn = url.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setDoOutput(true); conn.setRequestMethod("POST")
        val body = JsonMethods.compact(JObject(
          "sql" -> JString("SELECT seg, COUNT(*) AS n FROM accts " +
            "GROUP BY seg EMIT CHANGES;"),
          "maxRows" -> JInt(8)))
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        conn.getOutputStream.close()
        assert(conn.getResponseCode == 200)
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
        val header = reader.readLine()
        assert(header != null && header.contains("\"header\""), header)
        def rows(k: Int): Seq[(String, Long, Boolean)] = (1 to k).map { _ =>
          var l = reader.readLine()
          while (l != null && l.trim.isEmpty) l = reader.readLine()
          assert(l != null, "stream ended unexpectedly")
          val JArray(cols) =
            (JsonMethods.parse(l) \ "row" \ "columns"): @unchecked
          (cols.head.values.toString,
            BigInt(cols(1).values.toString).toLong,
            cols.last.values.toString.toBoolean)
        }
        // batch 1: both rows land in 'a' — one emission
        mem.addData(ReaggRow(1, "a", 1L, 1), ReaggRow(2, "a", 2L, 2))
        val e1 = rows(1)
        assert(e1 == Seq(("a", 2L, false)), e1.toString)
        // batch 2: id 2 moves a→b — 'a' falls to 1, 'b' appears at 1
        mem.addData(ReaggRow(2, "b", 2L, 3))
        val e2 = rows(2).toSet
        assert(e2 == Set(("a", 1L, false), ("b", 1L, false)), e2.toString)
        // batch 3: id 1 moves too — 'a' EMPTIES: its emission is a
        // tombstone row (__deleted=true, the zeroed count), not silence
        mem.addData(ReaggRow(1, "b", 1L, 4))
        val e3 = rows(2).toSet
        assert(e3 == Set(("a", 0L, true), ("b", 2L, false)), e3.toString)
        reader.close()
      } finally srv.stop()
    }
  }

  test("subtractable-only surface: the refusals ksqlDB makes on tables") {
    val mem = MemoryStream[ReaggRow](spark)
    val cat: Translator.Catalog = Map(
      "accts" -> Source(mem.toDF(), "off", key = Some("id"),
        isTable = true))
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Translator.run(spark, cat, sql)
      }
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"message '${e.getMessage}' lacks '$needle'")
    }
    refuses("CREATE TABLE x AS SELECT seg, MAX(bal) AS m FROM accts " +
      "GROUP BY seg;", "cannot subtract")
    refuses("CREATE TABLE x AS SELECT seg, COLLECT_LIST(bal) AS l " +
      "FROM accts GROUP BY seg;", "cannot subtract")
    refuses("CREATE TABLE x AS SELECT seg, COUNT(DISTINCT bal) AS d " +
      "FROM accts GROUP BY seg;", "per-value counts")
    refuses("CREATE TABLE x AS SELECT seg, SUM(bal) + 1 AS s " +
      "FROM accts GROUP BY seg;", "one undoable aggregate")
    refuses("CREATE TABLE x AS SELECT seg, COUNT(*) AS n FROM accts " +
      "WINDOW TUMBLING (SIZE 1 HOURS) GROUP BY seg;",
      "windows apply to STREAMS")
    refuses("CREATE TABLE x AS SELECT seg, COUNT(*) AS n FROM accts " +
      "GROUP BY seg ORDER BY n;", "ORDER BY / LIMIT")
    refuses("CREATE TABLE x AS SELECT seg, COUNT(*) AS n FROM accts " +
      "GROUP BY seg PARTITION BY seg;", "PARTITION BY")
    refuses("CREATE TABLE x AS SELECT seg || '!' , COUNT(*) AS n " +
      "FROM accts GROUP BY seg || '!';", "alias the grouping expression")
    refuses("CREATE TABLE x AS SELECT seg, COUNT(*) AS n FROM accts " +
      "GROUP BY seg HAVING MAX(bal) > 1;", "does not reduce")
    refuses("CREATE TABLE x AS SELECT seg, COUNT(*) AS n FROM accts " +
      "GROUP BY seg EMIT FINAL;", "EMIT FINAL")
  }
}
