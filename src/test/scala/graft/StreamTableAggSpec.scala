package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ksql.Translator
import graft.ksql.Translator.Source

/** Stream fact with a real event-time column (windowed flavor). */
case class StAgFact(fid: Long, dept: java.lang.Long, amt: Long,
                    ts: java.sql.Timestamp)
case class StAgDept(dept_id: Long, dept_name: String, roff: Long)
/** Dept with a region FK — the snowflake middle hop for N-way joins. */
case class StAgDeptR(dept_id: Long, dept_name: String, region_fk: Long,
                     roff: Long)
case class StAgRegion(region_id: Long, region_name: String, roff2: Long)

/** Single-statement aggregation over a live STREAM ⋈ TABLE join
  * (round 17): ksqlDB's `CREATE TABLE … AS SELECT … FROM s JOIN t ON …
  * GROUP BY …` — previously refused with the two-statement CSAS
  * pointer. The translator now desugars it into that very idiom FUSED:
  * the keyed-lookup enrichment feeds the standard streaming aggregate
  * in one query (Spark chains the two stateful operators). Sound
  * because stream facts never retract — each enriched row leaves the
  * store exactly once, so the fold sees exactly what the CSAS hop
  * would publish. */
class StreamTableAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  /** Latest emission per key in an update-mode memory sink: the count
    * aggregate is monotone per key, so max-cnt is the newest row. */
  private def latest(sink: String, keyCols: Int): Map[Seq[Any], (Long, Long)] =
    spark.table(sink).collect().map { r =>
      val k = (0 until keyCols).map(r.get)
      k -> ((r.getLong(keyCols), r.getLong(keyCols + 1)))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }

  test("fused join+GROUP BY: facts aggregate under the dim value they " +
    "joined AS OF their position — a later rename opens a NEW group, " +
    "earlier contributions stay") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[StAgFact](spark)
    val tMem = MemoryStream[StAgDept](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "ts"),
      "depts_t" -> Source(tMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """SELECT dept_name, COUNT(*) AS cnt, SUM(amt) AS total
        |FROM facts JOIN depts_t ON dept = dept_id
        |GROUP BY dept_name EMIT CHANGES;""".stripMargin): @unchecked
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("st_agg_out")
      .outputMode("update").start()
    try {
      // batch 1: dept 10 = "eng" first (off 1 < fact times), then facts
      // — two join eng, one hits a missing dept (INNER drops), one is
      // NULL-keyed (INNER drops)
      tMem.addData(StAgDept(10L, "eng", 1))
      fMem.addData(StAgFact(100L, 10L, 50L, ts(2000)),
        StAgFact(101L, 11L, 60L, ts(3000)),
        StAgFact(102L, null, 70L, ts(4000)),
        StAgFact(103L, 10L, 1L, ts(5000)))
      q.processAllAvailable()
      assert(latest("st_agg_out", 1) ===
        Map(Seq("eng") -> ((2L, 51L))))
      // batch 2: dept 10 renames, dept 11 appears — only NEW facts see
      // the new state; "eng"'s earlier contributions never move
      tMem.addData(StAgDept(10L, "engineering", 6000),
        StAgDept(11L, "ops", 7000))
      fMem.addData(StAgFact(104L, 10L, 80L, ts(8000)),
        StAgFact(105L, 11L, 90L, ts(9000)))
      q.processAllAvailable()
      assert(latest("st_agg_out", 1) === Map(
        Seq("eng") -> ((2L, 51L)),
        Seq("engineering") -> ((1L, 80L)),
        Seq("ops") -> ((1L, 90L))))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("fused join+WINDOW TUMBLING GROUP BY: panes cut on the FACT's " +
    "event time, groups keyed by the as-of dim value") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[StAgFact](spark)
    val tMem = MemoryStream[StAgDept](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "ts"),
      "depts_t" -> Source(tMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """SELECT dept_name, WINDOWSTART AS ws, COUNT(*) AS cnt,
        |  SUM(amt) AS total
        |FROM facts JOIN depts_t ON dept = dept_id
        |WINDOW TUMBLING (SIZE 10 SECONDS)
        |GROUP BY dept_name EMIT CHANGES;""".stripMargin): @unchecked
    val q = out.writeStream.format("memory").queryName("st_agg_win_out")
      .outputMode("update").start()
    try {
      tMem.addData(StAgDept(10L, "eng", 1))
      // facts straddle the 10s pane boundary
      fMem.addData(StAgFact(100L, 10L, 50L, ts(2000)),
        StAgFact(101L, 10L, 7L, ts(9000)),
        StAgFact(102L, 10L, 30L, ts(12000)))
      q.processAllAvailable()
      val got = spark.table("st_agg_win_out").collect().map { r =>
        (r.getAs[String]("dept_name"), r.getAs[Long]("ws")) ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("total")))
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(got === Map(
        ("eng", 0L) -> ((2L, 57L)),
        ("eng", 10000L) -> ((1L, 30L))))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("HAVING composes with the fused form; grouping sets still refuse") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[StAgFact](spark)
    val tMem = MemoryStream[StAgDept](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "ts"),
      "depts_t" -> Source(tMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """SELECT dept_name, COUNT(*) AS cnt, SUM(amt) AS total
        |FROM facts JOIN depts_t ON dept = dept_id
        |GROUP BY dept_name HAVING COUNT(*) > 1 EMIT CHANGES;"""
        .stripMargin): @unchecked
    val q = out.writeStream.format("memory").queryName("st_agg_hav_out")
      .outputMode("update").start()
    try {
      tMem.addData(StAgDept(10L, "eng", 1), StAgDept(11L, "ops", 2))
      fMem.addData(StAgFact(100L, 10L, 50L, ts(3000)),
        StAgFact(101L, 10L, 1L, ts(4000)),
        StAgFact(102L, 11L, 90L, ts(5000)))
      q.processAllAvailable()
      // ops has one fact — HAVING filters its emission
      assert(latest("st_agg_hav_out", 1) ===
        Map(Seq("eng") -> ((2L, 51L))))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val e = intercept[IllegalArgumentException] {
      Translator.run(spark, cat,
        """SELECT dept_name, COUNT(*) AS cnt FROM facts
          |JOIN depts_t ON dept = dept_id
          |GROUP BY ROLLUP(dept_name) EMIT CHANGES;""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("rollup"))
  }

  test("EMIT FINAL over the fused windowed join: only watermark-closed " +
    "panes emit (append), keyed by the as-of dim value") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[StAgFact](spark)
    val tMem = MemoryStream[StAgDept](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "ts"),
      "depts_t" -> Source(tMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """SELECT dept_name, WINDOWSTART AS ws, COUNT(*) AS cnt
        |FROM facts JOIN depts_t ON dept = dept_id
        |WINDOW TUMBLING (SIZE 10 SECONDS, GRACE PERIOD 1 SECONDS)
        |GROUP BY dept_name EMIT FINAL;""".stripMargin): @unchecked
    val q = out.writeStream.format("memory").queryName("st_agg_final_out")
      .outputMode("append") // = Translator.outputModeFor(EMIT FINAL)
      .start()
    try {
      tMem.addData(StAgDept(10L, "eng", 1))
      fMem.addData(StAgFact(100L, 10L, 50L, ts(2000)),
        StAgFact(101L, 10L, 7L, ts(9000)))
      q.processAllAvailable()
      // pane [0, 10000) is still open — nothing emitted
      assert(spark.table("st_agg_final_out").isEmpty)
      // ts 12000 advances the watermark past 10000 + 1s grace
      fMem.addData(StAgFact(102L, 10L, 30L, ts(12500)))
      q.processAllAvailable()
      fMem.addData(StAgFact(103L, 10L, 1L, ts(13000)))
      q.processAllAvailable()
      assert(spark.table("st_agg_final_out").collect().map(r =>
        (r.getAs[String]("dept_name"), r.getAs[Long]("ws"),
          r.getAs[Long]("cnt"))).toSet === Set(("eng", 0L, 2L)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("fused join+WINDOW SESSION GROUP BY under EMIT FINAL: sessions " +
    "cut on the FACT's event time per as-of dim value, closed sessions " +
    "emit append-mode (EMIT CHANGES refuses in Spark for session aggs)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[StAgFact](spark)
    val tMem = MemoryStream[StAgDept](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "ts"),
      "depts_t" -> Source(tMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """SELECT dept_name, COUNT(*) AS cnt
        |FROM facts JOIN depts_t ON dept = dept_id
        |WINDOW SESSION (5 SECONDS, GRACE PERIOD 1 SECONDS)
        |GROUP BY dept_name EMIT FINAL;""".stripMargin): @unchecked
    val q = out.writeStream.format("memory").queryName("st_agg_sess_out")
      .outputMode("append").start()
    try {
      tMem.addData(StAgDept(10L, "eng", 1))
      // two facts 3 s apart (one session); a fact 20 s later opens a
      // new session AND advances the watermark past the first's close
      fMem.addData(StAgFact(100L, 10L, 50L, ts(2000)),
        StAgFact(101L, 10L, 7L, ts(5000)),
        StAgFact(102L, 10L, 30L, ts(25000)))
      q.processAllAvailable()
      fMem.addData(StAgFact(103L, 10L, 1L, ts(40000)))
      q.processAllAvailable()
      val got = spark.table("st_agg_sess_out").collect().map(r =>
        (r.getAs[String]("dept_name"), r.getAs[Long]("cnt"))).toSet
      assert(got === Set(("eng", 2L), ("eng", 1L)), s"got $got")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("N-WAY live enrichment in one statement: facts JOIN dept JOIN " +
    "region (snowflake — hop 2 keys on a column hop 1 contributed), " +
    "as-of at every store, INNER drops at the failing hop") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[StAgFact](spark)
    val dMem = MemoryStream[StAgDeptR](spark)
    val rMem = MemoryStream[StAgRegion](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "ts"),
      "depts_t" -> Source(dMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true),
      "regions_t" -> Source(rMem.toDF(), "roff2", key = Some("region_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """SELECT fid, amt, dept_name, region_name
        |FROM facts
        |JOIN depts_t ON dept = dept_id
        |JOIN regions_t ON region_fk = region_id
        |EMIT CHANGES;""".stripMargin): @unchecked
    val q = out.writeStream.format("memory").queryName("st_nway_out")
      .outputMode("update").start()
    try {
      // dept 10 → region 1 (named), dept 11 → region 2 (MISSING)
      dMem.addData(StAgDeptR(10L, "eng", 1L, 1),
        StAgDeptR(11L, "ops", 2L, 2))
      rMem.addData(StAgRegion(1L, "emea", 1))
      fMem.addData(StAgFact(100L, 10L, 50L, ts(2000)),
        StAgFact(101L, 11L, 60L, ts(3000)), // region 2 missing — drops
        StAgFact(102L, 12L, 70L, ts(4000))) // dept 12 missing — drops
      q.processAllAvailable()
      assert(spark.table("st_nway_out").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet === Set((100L, 50L, "eng", "emea")))
      // region 2 appears + region 1 renames — only NEW facts see it
      rMem.addData(StAgRegion(2L, "apac", 3), StAgRegion(1L, "europe", 4))
      fMem.addData(StAgFact(103L, 11L, 80L, ts(5000)),
        StAgFact(104L, 10L, 90L, ts(6000)))
      q.processAllAvailable()
      assert(spark.table("st_nway_out").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet === Set(
        (100L, 50L, "eng", "emea"),
        (103L, 80L, "ops", "apac"),
        (104L, 90L, "eng", "europe")))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("N-WAY enrichment fused with GROUP BY in the same statement") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[StAgFact](spark)
    val dMem = MemoryStream[StAgDeptR](spark)
    val rMem = MemoryStream[StAgRegion](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "ts"),
      "depts_t" -> Source(dMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true),
      "regions_t" -> Source(rMem.toDF(), "roff2", key = Some("region_id"),
        isTable = true))
    val (_, Some(out)) = Translator.run(spark, cat,
      """SELECT region_name, COUNT(*) AS cnt, SUM(amt) AS total
        |FROM facts
        |JOIN depts_t ON dept = dept_id
        |JOIN regions_t ON region_fk = region_id
        |GROUP BY region_name EMIT CHANGES;""".stripMargin): @unchecked
    val q = out.writeStream.format("memory").queryName("st_nway_agg_out")
      .outputMode("update").start()
    try {
      dMem.addData(StAgDeptR(10L, "eng", 1L, 1),
        StAgDeptR(11L, "ops", 1L, 2), StAgDeptR(12L, "hr", 2L, 3))
      rMem.addData(StAgRegion(1L, "emea", 1), StAgRegion(2L, "apac", 2))
      fMem.addData(StAgFact(100L, 10L, 50L, ts(2000)),
        StAgFact(101L, 11L, 60L, ts(3000)),
        StAgFact(102L, 12L, 70L, ts(4000)))
      q.processAllAvailable()
      assert(latest("st_nway_agg_out", 1) === Map(
        Seq("emea") -> ((2L, 110L)),
        Seq("apac") -> ((1L, 70L))))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("PARTITION BY re-keys the enriched stream (CSAS over the live " +
    "join): repartition on the new key, ROWKEY annotated; the " +
    "TABLE-TABLE changelog keeps its refusal") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val fMem = MemoryStream[StAgFact](spark)
    val tMem = MemoryStream[StAgDept](spark)
    val cat: Translator.Catalog = Map(
      "facts" -> Source(fMem.toDF(), "ts"),
      "depts_t" -> Source(tMem.toDF(), "roff", key = Some("dept_id"),
        isTable = true))
    val (cat2, Some(out)) = Translator.run(spark, cat,
      """CREATE STREAM enriched AS
        |  SELECT fid, amt, dept_name
        |  FROM facts JOIN depts_t ON dept = dept_id
        |  PARTITION BY dept_name;""".stripMargin): @unchecked
    assert(out.isStreaming)
    // the re-key is in the plan: a repartition on the new key
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
    assert(out.queryExecution.logical.exists {
      case r: RepartitionByExpression =>
        r.partitionExpressions.exists(_.references.exists(
          _.name.equalsIgnoreCase("dept_name")))
      case _ => false
    })
    // the registered stream's ROWKEY is the partitioning column
    assert(cat2("enriched").key === Some("dept_name"))
    assert(!cat2("enriched").isTable)
    // ...and the re-keyed stream still runs end to end
    val q = out.writeStream.format("memory").queryName("st_rekey_out")
      .outputMode("update").start()
    try {
      tMem.addData(StAgDept(10L, "eng", 1))
      fMem.addData(StAgFact(100L, 10L, 50L, ts(2000)))
      q.processAllAvailable()
      assert(spark.table("st_rekey_out").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSet ===
        Set((100L, 50L, "eng")))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    // TABLE-TABLE changelog: PARTITION BY refuses with the ksqlDB
    // stream-operation pointer (re-keying a keyed changelog would need
    // retraction rewrites the store doesn't carry)
    val tMemL = MemoryStream[StAgDept](spark)
    val tMemR = MemoryStream[StAgDept](spark)
    val tcat: Translator.Catalog = Map(
      "t1" -> Source(tMemL.toDF().withColumnRenamed("dept_name", "v1"),
        "roff", key = Some("dept_id"), isTable = true),
      "t2" -> Source(tMemR.toDF().toDF("d2", "v2", "roff2"), "roff2",
        key = Some("d2"), isTable = true))
    val e2 = intercept[IllegalArgumentException] {
      Translator.run(spark, tcat,
        """CREATE TABLE j AS SELECT dept_id, v1, v2
          |FROM t1 JOIN t2 ON dept_id = d2
          |PARTITION BY v1;""".stripMargin)
    }
    assert(e2.getMessage.contains("STREAM operation"))
  }
}
