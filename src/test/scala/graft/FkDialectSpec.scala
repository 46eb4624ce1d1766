package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ksql.Translator
import graft.ksql.Translator.Source

/** Left changelog record for the DIALECT streaming TABLE-TABLE join:
  * `prev_dept` is the spec-pinned `prev_<fkcol>` contract column. */
case class DlgLeft(uid: Long, dept: java.lang.Long,
                   prev_dept: java.lang.Long, uname: String, off: Long)
case class DlgRight(dept_id: Long, dept_name: String, roff: Long)
/** Stream fact for the live STREAM⋈TABLE join (nullable join key). */
case class DlgFact(fid: Long, dept: java.lang.Long, amt: Long, off: Long)
/** STRING-keyed changelogs (round 18): sku is the left PRIMARY KEY,
  * cat the string fk, prev_cat the move-contract column. */
case class SkuRow(sku: String, cat: String, prev_cat: String,
                  sname: String, off: Long)
case class CatRow(cat_id: String, cat_label: String, roff: Long)

/** KSQL TABLE semantics through the dialect (round 16 — the round-15
  * verdict's #3): CREATE TABLE sources compact latest-per-key at read,
  * `CREATE TABLE … AS SELECT … FROM t1 JOIN t2 ON t1.fk = t2.pk` routes
  * to the subscription-store operator when both changelogs are LIVE,
  * and the ksqlDB join matrix refuses the forms the engine refuses. */
class FkDialectSpec extends SparkSpec {
  import spark.implicits._

  private def batchCatalog(): Translator.Catalog = {
    val users = Seq(
      // uid 1 has three changelog records — latest (off 5) wins
      (1L, 10L, "u1@v1", 1L), (1L, 11L, "u1@v2", 3L), (1L, 11L, "u1@v3", 5L),
      (2L, 10L, "u2@v1", 2L),
      (3L, 12L, "u3@v1", 4L)).toDF("uid", "dept", "uname", "off")
    val depts = Seq(
      (10L, "eng", 1L), (10L, "engineering", 4L), // latest name wins
      (11L, "ops", 2L), (12L, "sales", 3L)).toDF("dept_id", "dept_name", "roff")
    Map(
      "users_t" -> Source(users, "off", key = Some("uid"), isTable = true),
      "depts_t" -> Source(depts, "roff", key = Some("dept_id"),
        isTable = true),
      "clicks" -> Source(Seq((1L, 7L)).toDF("uid", "n"), "n"))
  }

  test("TABLE reads see the compacted snapshot (latest per key in " +
    "changelog order), streams do not") {
    val (_, Some(snap)) = Translator.run(spark, batchCatalog(),
      "SELECT uid, dept, uname FROM users_t;"): @unchecked
    assert(snap.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2))).toSet ===
      Set((1L, 11L, "u1@v3"), (2L, 10L, "u2@v1"), (3L, 12L, "u3@v1")))
  }

  test("batch TABLE-TABLE FK join through the dialect: both sides " +
    "compacted, FK on a non-key left column, right side hit on its PK") {
    val (_, Some(df)) = Translator.run(spark, batchCatalog(),
      """CREATE TABLE enriched AS
        |  SELECT uid, uname, dept_name
        |  FROM users_t JOIN depts_t ON dept = dept_id;""".stripMargin)
      : @unchecked
    assert(df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2))).toSet ===
      Set((1L, "u1@v3", "ops"), (2L, "u2@v1", "engineering"),
        (3L, "u3@v1", "sales")))
    // the small right snapshot broadcasts (the stream-table convention)
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("INSERT VALUES into a TABLE is a changelog upsert — the next " +
    "snapshot keeps the newest record per key") {
    val (cat1, _) = Translator.run(spark, batchCatalog(),
      "INSERT INTO users_t (uid, dept, uname, off) VALUES (2, 12, 'u2@v2', 9);")
    val (_, Some(snap)) = Translator.run(spark, cat1,
      "SELECT uid, dept, uname FROM users_t;"): @unchecked
    assert(snap.filter(col("uid") === 2).collect().map(r =>
      (r.getLong(1), r.getString(2))).toSeq === Seq((12L, "u2@v2")))
  }

  test("ksqlDB join-matrix + shape refusals") {
    val cat = batchCatalog()
    def refuses(stmt: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Translator.run(spark, cat, stmt)
      }
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"message '${e.getMessage}' lacks '$needle'")
    }
    // TABLE ⋈ STREAM does not exist
    refuses("SELECT * FROM users_t JOIN clicks ON uid = uid;",
      "no TABLE-STREAM join")
    // WITHIN is a stream-stream bound
    refuses("SELECT * FROM clicks JOIN depts_t WITHIN 1 HOURS " +
      "ON n = dept_id;", "stream-stream interval bound")
    // joins against a table hit its PRIMARY KEY
    refuses("SELECT * FROM users_t JOIN depts_t ON dept = dept_name;",
      "PRIMARY KEY")
    // a SELECT over a TABLE produces a TABLE — CSAS refuses
    refuses("CREATE STREAM s1 AS SELECT uid FROM users_t;",
      "use CREATE TABLE")
    // an aggregation produces a TABLE — CSAS refuses
    refuses("CREATE STREAM s2 AS SELECT n, COUNT(*) AS c FROM clicks " +
      "GROUP BY n;", "use CREATE TABLE")
    // a TABLE declaration needs its key
    refuses("CREATE TABLE nokey (a INT) WITH (TIMESTAMP='a');",
      "WITH (KEY=")
    // INSERT INTO <select> appends to streams only
    refuses("INSERT INTO users_t SELECT uid, dept, uname, off " +
      "FROM users_t;", "INSERT VALUES")
  }

  test("streaming TABLE-TABLE join through the dialect: right-update " +
    "fan-out, fk move via prev_<col>, materialized ≡ batch equivalence") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val lMem = MemoryStream[DlgLeft](spark)
    val rMem = MemoryStream[DlgRight](spark)
    val cat: Translator.Catalog = Map(
      "users_t" -> Source(lMem.toDF(), "off", key = Some("uid"),
        isTable = true),
      "depts_t" -> Source(rMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """CREATE TABLE joined AS
        |  SELECT uid, dept, uname, dept_name
        |  FROM users_t JOIN depts_t ON dept = dept_id;""".stripMargin)
      : @unchecked
    assert(out.isStreaming, "the live form must stay a streaming frame")
    assert(out.columns.toSeq ===
      Seq("uid", "dept", "uname", "dept_name", "__deleted", "__off"))
    val q = out.writeStream.format("memory").queryName("fk_dlg_out")
      .outputMode("update").start()
    try {
      var allL = Seq.empty[DlgLeft]; var allR = Seq.empty[DlgRight]
      def materialize(): Map[Long, (Long, String, String)] = {
        import org.apache.spark.sql.expressions.Window
        spark.table("fk_dlg_out")
          .withColumn("__rn", row_number().over(Window
            .partitionBy(col("uid"))
            .orderBy(col("__off").desc, col("__deleted").asc)))
          .filter(col("__rn") === 1 && !col("__deleted")).drop("__rn")
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
            r.getString(3)))).toMap
      }
      def oracle(): Map[Long, (Long, String, String)] = {
        val lLatest = allL.groupBy(_.uid).view.mapValues(_.maxBy(_.off))
          .values.filter(_.dept != null)
        val rLatest = allR.groupBy(_.dept_id).view
          .mapValues(_.maxBy(_.roff)).values
          .map(r => r.dept_id -> r.dept_name).toMap
        lLatest.flatMap(l => rLatest.get(l.dept.longValue()).map(dn =>
          l.uid -> ((l.dept.longValue(), l.uname, dn)))).toMap
      }
      def drive(ls: Seq[DlgLeft], rs: Seq[DlgRight]): Unit = {
        if (ls.nonEmpty) lMem.addData(ls: _*)
        if (rs.nonEmpty) rMem.addData(rs: _*)
        q.processAllAvailable()
        allL ++= ls; allR ++= rs
        assert(materialize() === oracle())
      }
      drive(
        Seq(DlgLeft(1L, 10L, null, "ann", 3), DlgLeft(2L, 10L, null,
          "bob", 4), DlgLeft(3L, 11L, null, "cid", 5)),
        Seq(DlgRight(10L, "eng", 1), DlgRight(11L, "ops", 2)))
      // fk move 10→11 retracts at 10; a right rename fans out to the
      // remaining subscriber only
      drive(
        Seq(DlgLeft(1L, 11L, 10L, "ann", 6)),
        Seq(DlgRight(10L, "engineering", 7)))
      // left delete (dept null) retracts
      drive(Seq(DlgLeft(3L, null, 11L, null, 8)), Nil)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("live STREAM JOIN TABLE through the dialect (round 16 — the last " +
    "refused live-join form): facts join the table state AS OF their " +
    "position, a later table update never rewrites earlier facts, LEFT " +
    "emits unmatched (NULL-key facts included), WHERE composes") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[DlgFact](spark)
    val tMem = MemoryStream[DlgRight](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "off"),
      "depts_t" -> Source(tMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """CREATE STREAM enriched AS
        |  SELECT fid, dept, amt, dept_name
        |  FROM facts LEFT JOIN depts_t ON dept = dept_id
        |  WHERE amt > 5;""".stripMargin): @unchecked
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("st_join_out")
      .outputMode("update").start()
    try {
      def rows(): Set[(Long, Option[Long], Long, Option[String])] =
        spark.table("st_join_out").collect().map(r => (
          r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          r.getLong(2), Option(r.getString(3)))).toSet
      // batch 1: table row for dept 10 arrives FIRST (off 1), then
      // facts — one matched, one to a missing dept, one NULL-keyed,
      // one filtered by WHERE
      tMem.addData(DlgRight(10L, "eng", 1))
      fMem.addData(DlgFact(100L, 10L, 50L, 2),
        DlgFact(101L, 11L, 60L, 3),
        DlgFact(102L, null, 70L, 4),
        DlgFact(103L, 10L, 1L, 5))
      q.processAllAvailable()
      assert(rows() === Set(
        (100L, Some(10L), 50L, Some("eng")),
        (101L, Some(11L), 60L, None),
        (102L, None, 70L, None)))
      // batch 2: dept 10 RENAMES and dept 11 appears — only NEW facts
      // see the new state; fact 100's earlier emission is untouched
      tMem.addData(DlgRight(10L, "engineering", 6),
        DlgRight(11L, "ops", 7))
      fMem.addData(DlgFact(104L, 10L, 80L, 8),
        DlgFact(105L, 11L, 90L, 9))
      q.processAllAvailable()
      assert(rows() === Set(
        (100L, Some(10L), 50L, Some("eng")),
        (101L, Some(11L), 60L, None),
        (102L, None, 70L, None),
        (104L, Some(10L), 80L, Some("engineering")),
        (105L, Some(11L), 90L, Some("ops"))))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("live STREAM JOIN TABLE: INNER drops unmatched facts; in-batch " +
    "offset order decides which state a fact sees") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[DlgFact](spark)
    val tMem = MemoryStream[DlgRight](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "off"),
      "depts_t" -> Source(tMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      "SELECT fid, dept_name FROM facts JOIN depts_t ON dept = dept_id;")
      : @unchecked
    val q = out.writeStream.format("memory").queryName("st_inner_out")
      .outputMode("update").start()
    try {
      def got(): Set[(Long, String)] =
        spark.table("st_inner_out").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
      // a fact arriving BEFORE any table row is DROPPED under INNER —
      // and stays dropped: the later table arrival must not resurrect
      // it (facts are immutable, nothing re-emits)
      fMem.addData(DlgFact(1L, 7L, 1L, 1))
      q.processAllAvailable()
      assert(got() === Set.empty)
      tMem.addData(DlgRight(7L, "a", 2))
      q.processAllAvailable()
      assert(got() === Set.empty, "a table arrival must not re-emit facts")
      // facts join the state as of their batch; a rename affects only
      // LATER facts
      fMem.addData(DlgFact(2L, 7L, 1L, 3))
      q.processAllAvailable()
      tMem.addData(DlgRight(7L, "b", 4))
      q.processAllAvailable()
      fMem.addData(DlgFact(3L, 7L, 1L, 5))
      q.processAllAvailable()
      assert(got() === Set((2L, "a"), (3L, "b")))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming TABLE semantics refusals: re-aggregation, non-INNER, " +
    "WHERE over the join changelog") {
    val lMem = MemoryStream[DlgLeft](spark)
    val rMem = MemoryStream[DlgRight](spark)
    val cat: Translator.Catalog = Map(
      "users_t" -> Source(lMem.toDF(), "off", key = Some("uid"),
        isTable = true),
      "depts_t" -> Source(rMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    def refuses(stmt: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Translator.run(spark, cat, stmt)
      }
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"message '${e.getMessage}' lacks '$needle'")
    }
    // GROUP BY over the live changelog RUNS since round 18 (the
    // table→table aggregation, TableReaggSpec) — the refusals left
    // here are the non-subtractable aggregate and the windowed form
    refuses("SELECT dept, MAX(off) AS m FROM users_t GROUP BY dept;",
      "cannot subtract")
    refuses("SELECT dept, COUNT(*) AS n FROM users_t " +
      "WINDOW TUMBLING (SIZE 1 HOURS) GROUP BY dept;",
      "windows apply to STREAMS")
    refuses("SELECT uid FROM users_t FULL OUTER JOIN depts_t " +
      "ON dept = dept_id;", "INNER or LEFT")
    refuses("SELECT uid FROM users_t JOIN depts_t ON dept = dept_id " +
      "WHERE uid > 1;", "retractions")
  }

  test("streaming LEFT TABLE-TABLE join through the dialect (ksqlDB " +
    "0.19): unmatched rows emit with a NULL right side, fill on right " +
    "arrival, unmatch again on right delete semantics") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val lMem = MemoryStream[DlgLeft](spark)
    val rMem = MemoryStream[DlgRight](spark)
    val cat: Translator.Catalog = Map(
      "users_t" -> Source(lMem.toDF(), "off", key = Some("uid"),
        isTable = true),
      "depts_t" -> Source(rMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """CREATE TABLE joined_l AS
        |  SELECT uid, dept, uname, dept_name
        |  FROM users_t LEFT JOIN depts_t ON dept = dept_id;"""
        .stripMargin): @unchecked
    val q = out.writeStream.format("memory").queryName("fk_dlg_left")
      .outputMode("update").start()
    try {
      def latest(): Map[Long, (Option[Long], String, Option[String])] = {
        import org.apache.spark.sql.expressions.Window
        spark.table("fk_dlg_left")
          .withColumn("__rn", row_number().over(Window
            .partitionBy(col("uid"))
            .orderBy(col("__off").desc, col("__deleted").asc)))
          .filter(col("__rn") === 1 && !col("__deleted")).drop("__rn")
          .collect()
          .map(r => r.getLong(0) -> ((
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getString(2),
            Option(r.getString(3))))).toMap
      }
      // unmatched left rows emit immediately (null right), a NULL-fk
      // row included
      lMem.addData(DlgLeft(1L, 10L, null, "ann", 1),
        DlgLeft(2L, null, null, "bob", 2))
      q.processAllAvailable()
      assert(latest() === Map(
        1L -> ((Some(10L), "ann", None)),
        2L -> ((None, "bob", None))))
      // the right side arrives: ann fills, bob stays unmatched
      rMem.addData(DlgRight(10L, "eng", 3))
      q.processAllAvailable()
      assert(latest() === Map(
        1L -> ((Some(10L), "ann", Some("eng"))),
        2L -> ((None, "bob", None))))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("STRING-keyed tables join (round 18): the subscription store " +
    "keys on the column's string form — VARCHAR ids need no CAST") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val lMem = MemoryStream[SkuRow](spark)
    val rMem = MemoryStream[CatRow](spark)
    val cat: Translator.Catalog = Map(
      "skus_t" -> Source(lMem.toDF(), "off", key = Some("sku"),
        isTable = true),
      "cats_t" -> Source(rMem.toDF(), "roff", key = Some("cat_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """CREATE TABLE labeled AS
        |  SELECT sku, sname, cat_label
        |  FROM skus_t JOIN cats_t ON cat = cat_id;""".stripMargin)
      : @unchecked
    val q = out.writeStream.format("memory").queryName("fk_str_out")
      .outputMode("update").start()
    try {
      def latest(): Map[String, (String, String)] = {
        import org.apache.spark.sql.expressions.Window
        spark.table("fk_str_out")
          .withColumn("__rn", row_number().over(Window
            .partitionBy(col("sku"))
            .orderBy(col("__off").desc, col("__deleted").asc)))
          .filter(col("__rn") === 1 && !col("__deleted")).drop("__rn")
          .collect()
          .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
          .toMap
      }
      lMem.addData(SkuRow("a-1", "tools", null, "hammer", 1),
        SkuRow("b-2", "toys", null, "block", 2))
      rMem.addData(CatRow("tools", "Hardware", 1),
        CatRow("toys", "Children", 2))
      q.processAllAvailable()
      assert(latest() === Map(
        "a-1" -> (("hammer", "Hardware")),
        "b-2" -> (("block", "Children"))))
      // a string-keyed fk MOVE via prev_<col>, and a right rename
      lMem.addData(SkuRow("a-1", "toys", "tools", "hammer", 3))
      rMem.addData(CatRow("toys", "Kids", 4))
      q.processAllAvailable()
      assert(latest() === Map(
        "a-1" -> (("hammer", "Kids")),
        "b-2" -> (("block", "Kids"))))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
