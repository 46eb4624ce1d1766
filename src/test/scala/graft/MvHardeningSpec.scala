package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ksql.Translator
import graft.plans.{MaterializedViewRewrite, MaterializedViews}

/** Round-15 MV hardening: registry-size-independent rule cost, the
  * cross-relation name-collision unwrap guard, Hadoop-FS artifact
  * probes (non-`file:` scheme end to end), the definition-bound refresh
  * signature, and crash-recovery for populated-but-unsigned artifacts.
  */
class MvHardeningSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val cents =
    floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")

  // --- registry-size-independent rule cost ---------------------------

  test("MV rule cost is flat in registry size: a plan touching no " +
    "registered base path bails O(#leaves) — 200 views cost what 1 does") {
    graft.GraftExtensions.register(spark)
    // the measured plan scans ORDERS — the registered views sit on
    // documents.parquet, so the path pre-check must reject in O(leaves)
    val plan = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 1000)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(cents).as("c"))
      .queryExecution.optimizedPlan
    def ruleNanos(iters: Int): Long = {
      var i = 0
      val t0 = System.nanoTime()
      while (i < iters) { MaterializedViewRewrite.apply(plan); i += 1 }
      System.nanoTime() - t0
    }
    val docs = Tables.documents(spark, sfDir)
    val names = (1 to 200).map(i => s"__flat_probe_mv_$i")
    spark.conf.set("spark.graft.mv.coverageCheck", "false")
    try {
      // 1 registered view — warm up, then measure
      MaterializedViews.register(spark, names.head, _ => docs,
        stateDir = "/tmp/__flat_probe_absent",
        deltaPred = col("doc_id") >= 900000000L,
        groupCols = Seq(col("lang")),
        aggCols = Seq(count(lit(1)).as("n")))
      ruleNanos(200)
      val one = (1 to 3).map(_ => ruleNanos(500)).min
      names.tail.foreach { n =>
        MaterializedViews.register(spark, n, _ => docs,
          stateDir = "/tmp/__flat_probe_absent",
          deltaPred = col("doc_id") >= 900000000L,
          groupCols = Seq(col("lang")),
          aggCols = Seq(count(lit(1)).as("n")))
      }
      assert(MaterializedViews.registered.count(_.startsWith(
        "__flat_probe_mv_")) == 200)
      ruleNanos(200)
      val twoHundred = (1 to 3).map(_ => ruleNanos(500)).min
      // flat ± floor: generous 4x + 50ms headroom keeps the assertion
      // noise-proof while still failing the old O(views)-per-Aggregate
      // scan (which measured ~40x here before the index)
      assert(twoHundred <= one * 4 + 50L * 1000 * 1000,
        s"rule cost grew with registry size: 1 view ${one / 1e6}ms, " +
          s"200 views ${twoHundred / 1e6}ms per 500 applies")
    } finally {
      spark.conf.unset("spark.graft.mv.coverageCheck")
      names.foreach(MaterializedViews.drop)
    }
  }

  // --- cross-relation name collisions ---------------------------------

  test("join-view unwrap refuses when the two sides share a column " +
    "name: same-named keys on opposite sides must never cross-match") {
    val dirA = freshDir("mv_collide_a")
    val dirB = freshDir("mv_collide_b")
    import spark.implicits._
    Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("id", "name", "v")
      .write.mode("overwrite").parquet(s"$dirA/a.parquet")
    Seq((1L, "p"), (2L, "q")).toDF("id", "cat")
      .write.mode("overwrite").parquet(s"$dirB/b.parquet")
    def joined(s: org.apache.spark.sql.SparkSession): DataFrame = {
      val a = s.read.parquet(s"$dirA/a.parquet")
      val b = s.read.parquet(s"$dirB/b.parquet")
      a.join(b, a("id") === b("id"))
    }
    // registration itself must refuse: the join never unwraps, so the
    // definition can't reach a single-relation base (correct, unserved)
    val e = intercept[IllegalArgumentException] {
      MaterializedViews.register(spark, "__collide_mv", joined,
        stateDir = "/tmp/__collide_absent",
        deltaPred = col("v") >= 1000L,
        groupCols = Seq(col("name")),
        aggCols = Seq(count(lit(1)).as("n")))
    }
    assert(e.getMessage.contains("name collisions"))
    assert(!MaterializedViews.registered.contains("__collide_mv"))
  }

  // --- Hadoop-FS artifact probes (non-file: scheme) --------------------

  private def mockPath(local: String): String = s"mockfs:$local"

  private def enableMockFs(): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockfs.impl", classOf[MockFs].getName)

  test("CREATE/REFRESH MATERIALIZED VIEW work end to end through a " +
    "non-file: Hadoop scheme: probes, sidecars, state build and serving") {
    enableMockFs()
    val root = freshDir("mv_mockfs")
    val state1 = mockPath(s"$root/state")
    val state2 = mockPath(s"$root/state2")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    Translator.run(spark, c1,
      s"""CREATE MATERIALIZED VIEW mockfs_mv WITH (
         |  STATE_DIR='$state1',
         |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''') AS
         |SELECT o_orderstatus, COUNT(*) AS n
         |FROM orders_src GROUP BY o_orderstatus""".stripMargin)
    try {
      assert(MaterializedViews.registered.contains("mockfs_mv"))
      // the artifact + signature landed under the scheme'd dir
      assert(new java.io.File(s"$root/state/_graft_mv.signature").exists())
      assert(Option(new java.io.File(s"$root/state").listFiles()).toSeq
        .flatten.exists(_.getName.startsWith("part-")))
      // serving works with a mockfs state leaf
      def pull: DataFrame = {
        val (_, Some(df)) = Translator.run(spark, c1,
          "SELECT o_orderstatus, COUNT(*) AS n FROM orders_src " +
            "GROUP BY o_orderstatus"): @unchecked
        df
      }
      spark.conf.set("spark.graft.mv.enabled", "true")
      val plan = pull.queryExecution.executedPlan.toString
      assert(plan.contains(s"$root/state"),
        s"must serve from the mockfs state artifact\n$plan")
      val got = pull.collect().toSet
      spark.conf.set("spark.graft.mv.enabled", "false")
      val want = pull.collect().toSet
      spark.conf.unset("spark.graft.mv.enabled")
      assert(got == want && got.nonEmpty)
      // REFRESH folds into a second mockfs dir and re-pins
      Translator.run(spark, c1,
        s"""REFRESH MATERIALIZED VIEW mockfs_mv WITH (
           |  STATE_DIR='$state2',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-09-01''')"""
          .stripMargin)
      assert(MaterializedViews.view("mockfs_mv").exists(_.stateDir == state2))
      assert(new java.io.File(s"$root/state2/_graft_mv.signature").exists())
      spark.conf.set("spark.graft.mv.enabled", "true")
      val got2 = pull.collect().toSet
      spark.conf.unset("spark.graft.mv.enabled")
      assert(got2 == want)
      // signature-mismatch refusal is preserved across the FS port: a
      // DIFFERENT refresh pointed at the populated dir refuses
      val e = intercept[IllegalArgumentException] {
        Translator.run(spark, c1,
          s"""REFRESH MATERIALIZED VIEW mockfs_mv WITH (
             |  STATE_DIR='$state2',
             |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-12-01''')"""
            .stripMargin)
      }
      assert(e.getMessage.contains("DIFFERENT"))
    } finally {
      Translator.run(spark, Map.empty,
        "DROP MATERIALIZED VIEW IF EXISTS mockfs_mv;")
    }
  }

  // --- definition-bound refresh signature ------------------------------

  test("refresh signature binds to the view DEFINITION: after DROP + " +
    "re-CREATE with different semantics but identical column names, a " +
    "re-issued refresh against the old artifact refuses to re-pin") {
    val root = freshDir("mv_defsig")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    def create(where: String, stateDir: String): Unit = {
      Translator.run(spark, c1,
        s"""CREATE MATERIALIZED VIEW defsig_mv WITH (
           |  STATE_DIR='$stateDir',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''') AS
           |SELECT o_orderstatus, COUNT(*) AS n
           |FROM orders_src WHERE $where GROUP BY o_orderstatus"""
          .stripMargin)
      ()
    }
    val refresh =
      s"""REFRESH MATERIALIZED VIEW defsig_mv WITH (
         |  STATE_DIR='$root/state2',
         |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-09-01''')"""
        .stripMargin
    try {
      create("o_totalprice > 1000", s"$root/state")
      Translator.run(spark, c1, refresh)
      assert(MaterializedViews.view("defsig_mv")
        .exists(_.stateDir == s"$root/state2"))
      // same column names, DIFFERENT WHERE — the artifact at state2 was
      // folded from the old definition and must not serve the new one
      Translator.run(spark, Map.empty, "DROP MATERIALIZED VIEW defsig_mv;")
      create("o_totalprice > 50000", s"$root/state_b")
      val e = intercept[IllegalArgumentException] {
        Translator.run(spark, c1, refresh)
      }
      assert(e.getMessage.contains("DIFFERENT"),
        s"stale-definition re-pin must refuse: ${e.getMessage}")
      assert(MaterializedViews.view("defsig_mv")
        .exists(_.stateDir == s"$root/state_b"),
        "the refused refresh must leave the registration untouched")
      // while the SAME definition's replay (late joiner) still re-pins
      Translator.run(spark, Map.empty, "DROP MATERIALIZED VIEW defsig_mv;")
      create("o_totalprice > 1000", s"$root/state")
      Translator.run(spark, c1, refresh)
      assert(MaterializedViews.view("defsig_mv")
        .exists(_.stateDir == s"$root/state2"))
    } finally {
      Translator.run(spark, Map.empty,
        "DROP MATERIALIZED VIEW IF EXISTS defsig_mv;")
    }
  }

  // --- crash recovery: populated-but-unsigned artifacts ----------------

  test("data without a signature is an INCOMPLETE build: CREATE and " +
    "REFRESH both rebuild instead of bricking the directory") {
    val root = freshDir("mv_unsig")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    val create =
      s"""CREATE MATERIALIZED VIEW unsig_mv WITH (
         |  STATE_DIR='$root/state',
         |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''') AS
         |SELECT o_orderstatus, COUNT(*) AS n
         |FROM orders_src GROUP BY o_orderstatus""".stripMargin
    val refresh =
      s"""REFRESH MATERIALIZED VIEW unsig_mv WITH (
         |  STATE_DIR='$root/state2',
         |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-09-01''')"""
        .stripMargin
    try {
      Translator.run(spark, c1, create)
      // simulate a crash between the state build and the sidecar
      // publish: data present, signature gone; a restarted server
      // replays the identical statement
      val sig = new java.io.File(s"$root/state/_graft_mv.signature")
      assert(sig.exists()); assert(sig.delete())
      Translator.run(spark, Map.empty, "DROP MATERIALIZED VIEW unsig_mv;")
      Translator.run(spark, c1, create) // must rebuild, not refuse
      assert(sig.exists(), "the re-issued CREATE must re-sign the artifact")
      assert(MaterializedViews.registered.contains("unsig_mv"))
      // same for the refresh fold
      Translator.run(spark, c1, refresh)
      val sig2 = new java.io.File(s"$root/state2/_graft_mv.signature")
      assert(sig2.exists()); assert(sig2.delete())
      Translator.run(spark, Map.empty, "DROP MATERIALIZED VIEW unsig_mv;")
      Translator.run(spark, c1, create)
      Translator.run(spark, c1, refresh) // re-folds the unsigned dir
      assert(sig2.exists(), "the replayed REFRESH must re-sign the artifact")
      assert(MaterializedViews.view("unsig_mv")
        .exists(_.stateDir == s"$root/state2"))
    } finally {
      Translator.run(spark, Map.empty,
        "DROP MATERIALIZED VIEW IF EXISTS unsig_mv;")
    }
  }

  // --- CMV refuses pair-set shapes its state build can't write ---------

  test("CREATE MATERIALIZED VIEW refuses COUNT(DISTINCT): the DDL's " +
    "aggregate state build cannot write the pair-set artifact") {
    val root = freshDir("mv_cmv_distinct")
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    val e = intercept[IllegalArgumentException] {
      Translator.run(spark, c1,
        s"""CREATE MATERIALIZED VIEW cmv_distinct WITH (
           |  STATE_DIR='$root/state',
           |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-06-01''') AS
           |SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS d
           |FROM orders_src GROUP BY o_orderstatus""".stripMargin)
    }
    assert(e.getMessage.contains("PAIR-SET"))
    assert(!MaterializedViews.registered.contains("cmv_distinct"))
    // the refusal ran BEFORE the state build — no artifact left behind
    assert(Option(new java.io.File(s"$root/state").listFiles())
      .forall(_.isEmpty), "rejected DDL must leave STATE_DIR untouched")
  }

  // --- parser: mode keywords vs same-named columns ---------------------

  test("GROUP BY on plain columns literally named rollup/cube/grouping " +
    "still parses as a key list; ROLLUP(...) keeps its mode meaning") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 3L))
      .toDF("rollup", "cube", "grouping")
    val cat: Translator.Catalog =
      Map("t" -> Translator.Source(df, "cube"))
    val (_, Some(plain)) = Translator.run(spark, cat,
      "SELECT rollup, COUNT(*) AS n FROM t GROUP BY rollup"): @unchecked
    assert(plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("a" -> 2L, "b" -> 1L))
    val (_, Some(two)) = Translator.run(spark, cat,
      "SELECT rollup, cube, COUNT(*) AS n FROM t GROUP BY rollup, cube")
      : @unchecked
    assert(two.count() == 3)
    val (_, Some(g)) = Translator.run(spark, cat,
      "SELECT grouping, COUNT(*) AS n FROM t GROUP BY grouping"): @unchecked
    assert(g.count() == 3)
    // the mode form still rolls up: grand-total row present
    val (_, Some(rolled)) = Translator.run(spark, cat,
      "SELECT rollup, COUNT(*) AS n FROM t GROUP BY ROLLUP(rollup)")
      : @unchecked
    val rows = rolled.collect()
    assert(rows.length == 3 && rows.exists(_.isNullAt(0)))
  }

  // --- sequential retractions compose (round 15, late) -----------------

  test("a SECOND retraction's argmax repair excludes the FIRST fold's " +
    "tombstones: the recompute must not resurrect a deleted extremum") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = freshDir("mv_del2")
    // g=1: 500 (deleted in fold 1, the max), 400 (deleted in fold 2,
    // the NEXT max — its repair rescans the base), 100, 50
    Seq((1L, 97L, 500L), (1L, 98L, 400L), (1L, 1L, 100L), (1L, 2L, 50L))
      .toDF("g", "id", "v")
      .write.mode("overwrite").parquet(s"$root/t.parquet")
    val base = spark.read.parquet(s"$root/t.parquet")
    val aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s"),
      max(col("v")).as("m"))
    base.filter(!(col("id") >= 1000L)).groupBy(col("g"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(s"$root/state")
    MaterializedViews.register(spark, "mv_del2", _ => base,
      stateDir = s"$root/state", deltaPred = col("id") >= 1000L,
      groupCols = Seq(col("g")), aggCols = aggs)
    try {
      MaterializedViews.refreshWithDeletes(spark, "mv_del2",
        col("id") >= 1000L, col("id") === 97L, s"$root/state2")
      MaterializedViews.refreshWithDeletes(spark, "mv_del2",
        col("id") >= 1000L, col("id") === 98L, s"$root/state3")
      val row = spark.read.parquet(s"$root/state3").collect().head
      // without deletedSoFar the repair rescans id=97 (v=500) and
      // resurrects the fold-1 extremum; the true surviving max is 100
      assert(row.getAs[Long]("m") == 100L,
        s"second retraction resurrected a deleted extremum: $row")
      assert(row.getAs[Long]("n") == 2L && row.getAs[Long]("s") == 150L)
    } finally { MaterializedViews.drop("mv_del2"); () }
  }

  test("a cutoff that RE-COVERS retracted ground refuses on every " +
    "refresh flavor — the serving delta branch would resurrect the " +
    "deleted rows (round-16 ADVICE)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = freshDir("mv_recover")
    Seq((1L, 1L, 100L), (1L, 2L, 50L), (1L, 3L, 70L), (1L, 4L, 30L))
      .toDF("g", "id", "v")
      .write.mode("overwrite").parquet(s"$root/t.parquet")
    val base = spark.read.parquet(s"$root/t.parquet")
    val aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s"),
      max(col("v")).as("m"))
    base.filter(!(col("id") >= 3L)).groupBy(col("g"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(s"$root/state")
    MaterializedViews.register(spark, "mv_recover", _ => base,
      stateDir = s"$root/state", deltaPred = col("id") >= 3L,
      groupCols = Seq(col("g")), aggCols = aggs)
    try {
      // fold 1: retract id=2 from the state region, cutoff unchanged
      MaterializedViews.refreshWithDeletes(spark, "mv_recover",
        col("id") >= 3L, col("id") === 2L, s"$root/state2")
      // a cutoff-only refresh whose NEW delta re-covers id=2 refuses:
      // serving would rescan base WHERE id >= 2 and resurrect it
      val e1 = intercept[IllegalArgumentException] {
        MaterializedViews.refresh(spark, "mv_recover",
          col("id") >= 2L, s"$root/state3")
      }
      assert(e1.getMessage.contains("re-covers retracted rows"))
      // ...and so does a second DELETED refresh with the same re-cover
      val e2 = intercept[IllegalArgumentException] {
        MaterializedViews.refreshWithDeletes(spark, "mv_recover",
          col("id") >= 2L, col("id") === 4L, s"$root/state3")
      }
      assert(e2.getMessage.contains("re-covers retracted rows"))
      // a clean cutoff still folds (control): delta shrinks to id >= 4
      MaterializedViews.refresh(spark, "mv_recover",
        col("id") >= 4L, s"$root/state4")
      val row = spark.read.parquet(s"$root/state4").collect().head
      assert(row.getAs[Long]("n") == 2L && row.getAs[Long]("s") == 170L &&
        row.getAs[Long]("m") == 100L)
    } finally { MaterializedViews.drop("mv_recover"); () }
  }

  // --- JOIN views through the CMV DDL (round 15) -----------------------

  test("CREATE MATERIALIZED VIEW over an INNER equi-join: the DDL " +
    "registers the join view, a plain dialect join-aggregate is served " +
    "from state (plan-pinned), and outer/WITHIN/LIVE shapes refuse") {
    import graft.ksql.KsqlQueries
    val t = KsqlQueries.mvDdlJoinDir(spark, sfDir)
    val name = KsqlQueries.mvDdlJoinName(sfDir)
    assert(MaterializedViews.registered.contains(name))
    // the registered shape key carries the join condition
    assert(MaterializedViews.view(name).get.shapeKey
      .exists(_.startsWith("join[")))
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM orders_src WITH (PATH='$sfDir/orders.parquet')")
    val (c2, _) = Translator.run(spark, c1,
      s"CREATE STREAM customer_src WITH (PATH='$sfDir/customer.parquet')")
    def q: org.apache.spark.sql.DataFrame = {
      val (_, Some(df)) =
        Translator.run(spark, c2, KsqlQueries.mvDdlJoinPullQuery): @unchecked
      df
    }
    val servedDf = q
    val plan = servedDf.queryExecution.executedPlan.toString
    assert(plan.contains(s"$t/state"),
      s"the dialect join-aggregate must be served from the DDL's state\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"the delta scan must push the DDL's cutoff\n$plan")
    val got = servedDf.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    spark.conf.set("spark.graft.mv.enabled", "false")
    val want = try q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    finally spark.conf.unset("spark.graft.mv.enabled")
    assert(got == want && got.nonEmpty)
    // the TABLE surface works for join views too: pull BY NAME serves
    // the same rows from the same state
    val (_, Some(byName)) = Translator.run(spark, Map.empty,
      s"SELECT * FROM $name"): @unchecked
    assert(byName.queryExecution.executedPlan.toString
      .contains(s"$t/state"))
    assert(byName.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      == want)
    // …and DESCRIBE resolves the view as a catalog object
    val (_, Some(desc)) = Translator.run(spark, Map.empty,
      s"DESCRIBE $name"): @unchecked
    val props = desc.collect().map(r => r.getString(0) -> r.getString(1))
      .toMap
    assert(props("(materialized view)") == name)
    assert(props("(group keys)") == "c_mktsegment")
    assert(props("(aggregates)")
      == "n_orders:count, sum_cents:sum, max_cents:max")
    // refusal surface: outer join, WITHIN, LIVE on a join view
    def ddl(joinText: String, props: String = ""): String =
      s"""CREATE MATERIALIZED VIEW mvj_refuse WITH (
         |  STATE_DIR='$t/refuse'$props,
         |  DELTA='o_orderdate >= TIMESTAMP_NTZ ''2001-01-01''') AS
         |SELECT c_mktsegment, COUNT(*) AS n
         |FROM orders_src $joinText ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin
    val e1 = intercept[IllegalArgumentException] {
      Translator.run(spark, c2, ddl("LEFT JOIN customer_src"))
    }
    assert(e1.getMessage.contains("INNER"))
    val e2 = intercept[IllegalArgumentException] {
      Translator.run(spark, c2,
        ddl("JOIN customer_src WITHIN 1 HOURS"))
    }
    assert(e2.getMessage.contains("WITHIN"))
    val e3 = intercept[IllegalArgumentException] {
      Translator.run(spark, c2,
        ddl("JOIN customer_src", ", LIVE='orders_src'"))
    }
    assert(e3.getMessage.contains("JOIN view"))
    assert(!MaterializedViews.registered.contains("mvj_refuse"))
  }
}
