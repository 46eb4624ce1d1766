package graft

import graft.streaming.{KsqlStream, KsqlTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

case class DocRow(doc_id: Long, lang: String, source: String)
case class TextDoc(doc_id: Long, text: String)
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

case class SDoc(doc_id: Long, text: String, lang: String, source: String)

/** Streaming-runtime specs: KSQL semantics through actual micro-batch
  * execution (MemoryStream in, memory sink out). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(minutes: Int) = new Timestamp(1700000000000L + minutes * 60000L)

  private def runToCompletion(writer: org.apache.spark.sql.streaming.DataStreamWriter[_]): Unit = {
    val q = writer.start()
    q.processAllAvailable()
    q.stop()
  }

  test("CREATE STREAM -> tumbling window agg with watermark (append after close)") {
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes")
    val agg = s.tumblingAgg("10 minutes", Seq(col("event_type")),
      Seq(count(lit(1)).as("cnt"), sum("value").as("sum_value")))
    val w = agg.writeStream.format("memory").queryName("tumb")
      .outputMode(OutputMode.Append)
    mem.addData(
      Ev(1, t(0), 1, "click", 1.0), Ev(2, t(3), 1, "click", 2.0),
      Ev(3, t(11), 2, "view", 3.0),
      Ev(4, t(30), 1, "click", 4.0)) // advances watermark past first windows
    runToCompletion(w)
    val out = spark.table("tumb").collect()
    // windows [0,10) click cnt=2 and [10,20) view cnt=1 are closed
    assert(out.exists(r => r.getAs[String]("event_type") == "click" && r.getAs[Long]("cnt") == 2))
    assert(out.exists(r => r.getAs[String]("event_type") == "view" && r.getAs[Long]("cnt") == 1))
  }

  test("streaming OHLC: min_by/max_by window aggs match the batch bars") {
    // base aligned to a 10-minute boundary: t() (epoch+minutes) is NOT,
    // and unaligned times straddle two tumbling windows
    def ta(m: Int) = new Timestamp(1700000400000L + m * 60000L)
    val evs = Seq(
      Ev(1, ta(0), 1, "click", 5.0), Ev(2, ta(2), 1, "click", 9.0),
      Ev(3, ta(4), 1, "click", 1.0), Ev(4, ta(7), 1, "click", 7.0),
      Ev(5, ta(1), 2, "view", 3.0), Ev(6, ta(8), 2, "view", 2.0),
      Ev(7, ta(30), 1, "click", 4.0))   // advances watermark past [0,10)
    val ohlc = Seq(
      min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
      max(col("value")).as("high"), min(col("value")).as("low"),
      max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes")
    val agg = s.tumblingAgg("10 minutes", Seq(col("event_type")), ohlc)
    val w = agg.writeStream.format("memory").queryName("ohlc")
      .outputMode(OutputMode.Append)
    mem.addData(evs.toIndexedSeq: _*)
    runToCompletion(w)
    val got = spark.table("ohlc")
      .select("event_type", "open", "high", "low", "close").collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("click") == ((5.0, 9.0, 1.0, 7.0)))
    assert(got("view") == ((3.0, 3.0, 2.0, 2.0)))
  }

  test("session window agg in streaming (append mode after watermark close)") {
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes")
    val agg = s.sessionAgg("5 minutes", Seq(col("user_id")),
      Seq(count(lit(1)).as("cnt")))
    // streaming session windows only support append mode: results emit
    // once the watermark passes the session end
    val w = agg.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append)
    mem.addData(Ev(1, t(0), 1, "a", 1), Ev(2, t(2), 1, "a", 1),
      Ev(3, t(40), 1, "a", 1)) // watermark 35min > session end 7min
    runToCompletion(w)
    val out = spark.table("sess").collect()
    assert(out.exists(r => r.getAs[Long]("cnt") == 2)) // merged session
  }

  test("streaming hopping/session window aggs match the batch IVM " +
    "views key-for-key (q_incr_hopping / q_incr_session parity)") {
    // the §2.15 claim in streaming form: the incrementally-maintained
    // batch views and a continuous query over the SAME events produce
    // identical windowed aggregates. All sf events stream through in
    // one batch (watermark can't drop anything), then a far-future
    // sentinel advances the watermark so append-mode session windows
    // close and emit.
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev].collect()
    val sentinelTs = new Timestamp(
      evs.map(_.ts.getTime).max + 30L * 86400000L)
    def pairCheck(name: String, got: org.apache.spark.sql.DataFrame,
                  want: org.apache.spark.sql.DataFrame): Unit = {
      val cols = want.columns.sorted.map(col).toSeq
      assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).count() == 0
        && want.select(cols: _*).exceptAll(got.select(cols: _*)).count() == 0,
        s"$name diverged from the batch view")
    }
    // ── session (6h gap, per user) vs q_incr_session
    val memS = MemoryStream[Ev](spark)
    val aggS = memS.toDF().withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(cents).as("sum_cents"))
      .select(unix_millis(col("session_window.start")).as("session_start"),
        unix_millis(col("session_window.end")).as("session_end"),
        col("user_id"), col("cnt"),
        (col("sum_cents") / lit(100.0)).as("sum_value"))
    val qS = aggS.writeStream.format("memory").queryName("ivm_sess_par")
      .outputMode(OutputMode.Append).start()
    memS.addData(evs.toIndexedSeq: _*)
    memS.addData(Ev(-1L, sentinelTs, -1L, "sentinel", 0.0))
    qS.processAllAvailable(); qS.stop()
    pairCheck("session",
      spark.table("ivm_sess_par").filter(col("user_id") =!= -1L),
      SparkEntry.queries("q_incr_session")(spark, sfDir))
    // ── hopping (1h size / 30m advance, per type) vs q_incr_hopping
    val memH = MemoryStream[Ev](spark)
    val aggH = memH.toDF().withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(cents).as("sum_cents"))
      .select(unix_millis(col("window.start")).as("ws"),
        (unix_millis(col("window.start")) + lit(3600000L)).as("we"),
        col("event_type"), col("cnt"),
        (col("sum_cents") / lit(100.0)).as("sum_value"))
    val qH = aggH.writeStream.format("memory").queryName("ivm_hop_par")
      .outputMode(OutputMode.Append).start()
    memH.addData(evs.toIndexedSeq: _*)
    memH.addData(Ev(-1L, sentinelTs, -1L, "sentinel", 0.0))
    qH.processAllAvailable(); qH.stop()
    pairCheck("hopping",
      spark.table("ivm_hop_par").filter(col("event_type") =!= "sentinel"),
      SparkEntry.queries("q_incr_hopping")(spark, sfDir))
  }

  test("hopping window agg in streaming emits size/slide replicas") {
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes")
    val agg = s.hoppingAgg("20 minutes", "10 minutes", Seq(col("event_type")),
      Seq(count(lit(1)).as("cnt")))
    val w = agg.writeStream.format("memory").queryName("hop")
      .outputMode(OutputMode.Update)
    mem.addData(Ev(1, t(15), 1, "click", 1.0))
    runToCompletion(w)
    // one event at minute 15 belongs to windows starting at 0 and 10
    assert(spark.table("hop").count() == 2)
  }

  test("CTAS writer materializes a grouped table in complete mode") {
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes")
    val agg = s.groupByAgg(Seq(col("event_type")), Seq(count(lit(1)).as("cnt")))
    val q = s.createTableAs(agg, "ctas_tab").start()
    mem.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(1), 2, "click", 2.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("ctas_tab").collect()
    assert(out.length == 1 && out.head.getAs[Long]("cnt") == 2)
  }

  test("stream-stream join WITHIN emits matched pairs") {
    val m1 = MemoryStream[Ev](spark)
    val m2 = MemoryStream[Ev](spark)
    val signups = KsqlStream(m1.toDF().select(
      col("user_id"), col("ts"), col("event_id").as("signup_id")), "ts", "10 minutes")
    val purchases = KsqlStream(m2.toDF().select(
      col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id")), "p_ts", "10 minutes")
    val joined = signups.df.withWatermark("ts", "10 minutes").join(
      purchases.df.withWatermark("p_ts", "10 minutes"),
      col("user_id") === col("p_user")
        && col("p_ts") >= col("ts")
        && col("p_ts") < col("ts") + expr("INTERVAL 30 MINUTES"))
    val w = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append)
    m1.addData(Ev(1, t(0), 7, "signup", 0))
    m2.addData(Ev(2, t(10), 7, "purchase", 9.99), Ev(3, t(50), 7, "purchase", 1.0))
    runToCompletion(w)
    val out = spark.table("ssj").collect()
    assert(out.length == 1 && out.head.getAs[Long]("purchase_id") == 2)
  }

  test("LEFT OUTER stream-stream join WITHIN emits unmatched rows with NULLs after the watermark") {
    val m1 = MemoryStream[Ev](spark)
    val m2 = MemoryStream[Ev](spark)
    val signups = KsqlStream(m1.toDF().select(
      col("user_id"), col("ts"), col("event_id").as("signup_id")), "ts", "5 minutes")
    val purchases = KsqlStream(m2.toDF().select(
      col("user_id"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id")), "p_ts", "5 minutes")
    val joined = signups.outerJoinWithin(purchases, "user_id", "10 MINUTES")
      .select(col("signup_id"), col("purchase_id"))
    val w = joined.writeStream.format("memory").queryName("lsoj")
      .outputMode(OutputMode.Append)
    // batch 1: the joinable data; batch 2: rows far in the future on
    // BOTH streams — the global watermark is the min across inputs, and
    // unmatched left rows only emit once it passes their join window
    val q = w.start()
    m1.addData(Ev(1, t(0), 7, "signup", 0),   // will match
      Ev(2, t(1), 8, "signup", 0))            // will NOT match
    m2.addData(Ev(3, t(5), 7, "purchase", 9.99))
    q.processAllAvailable()
    m1.addData(Ev(5, t(120), 98, "signup", 0))
    m2.addData(Ev(4, t(120), 99, "purchase", 1.0))
    q.processAllAvailable()
    // one more empty-progress cycle lets the state-store eviction emit
    m2.addData(Ev(6, t(121), 99, "purchase", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("lsoj").collect()
    val matched = out.filter(_.getAs[Long]("signup_id") == 1)
    val unmatched = out.filter(_.getAs[Long]("signup_id") == 2)
    assert(matched.length == 1 && matched.head.getAs[Long]("purchase_id") == 3)
    assert(unmatched.length == 1 && unmatched.head.isNullAt(
      unmatched.head.fieldIndex("purchase_id")))
  }

  test("streaming mix gate admits exactly the batch sampler's doc ids (stateless, replayable)") {
    import graft.streaming.StreamingText
    val docs = (0L until 200L).map(i =>
      DocRow(i, if (i % 3 == 0) "en" else "de", s"src${i % 2}"))
    val rates = Seq(("en", "src0", 6000L), ("en", "src1", 3000L),
      ("de", "src0", 10000L), ("de", "src1", 1500L))
      .toDF("lang", "source", "cut")
    val batchKeep = StreamingText.mixGate(docs.toDF(), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val mem = MemoryStream[DocRow](spark)
    val gated = StreamingText.mixGate(mem.toDF(), rates)
    val w = gated.writeStream.format("memory").queryName("mixgate")
      .outputMode(OutputMode.Append)
    mem.addData(docs.take(100): _*)
    val q = w.start(); q.processAllAvailable()
    mem.addData(docs.drop(100): _*)   // second batch: same gate, no state
    q.processAllAvailable(); q.stop()
    val streamKeep = spark.table("mixgate")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamKeep == batchKeep)
    assert(streamKeep.nonEmpty && streamKeep.size < docs.size)
  }

  test("streaming corpus gate equals batch band collisions (stream-static, stateless)") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    val docs = Tables.documents(spark, sfDir)
    val oldDocs = docs.filter(col("doc_id") % 10 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 10 === 0)
    val idx = Dedup.bandIndex(oldDocs)
    // batch expectation: the distinct (new, old) band collisions
    val want = Dedup.bandIndex(newDocs)
      .join(idx.select(col("band"), col("band_key"), col("doc_id").as("old_id")),
        Seq("band", "band_key"))
      .select("doc_id", "old_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)   // the sf0.001 corpus does contain cross near-dups
    val rows = newDocs.select("doc_id", "text").collect()
      .map(r => TextDoc(r.getLong(0), r.getString(1)))
    val mem = MemoryStream[TextDoc](spark)
    val gated = StreamingDedup.corpusGate(mem.toDF(), idx)
    val w = gated.writeStream.format("memory").queryName("corpusgate")
      .outputMode(OutputMode.Append)
    mem.addData(rows.take(rows.length / 2).toIndexedSeq: _*)
    val q = w.start(); q.processAllAvailable()
    mem.addData(rows.drop(rows.length / 2).toIndexedSeq: _*)   // no state carried between batches
    q.processAllAvailable(); q.stop()
    val got = spark.table("corpusgate").select("doc_id", "old_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("streaming corpus gate over an EMPTY band index emits nothing, never throws") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    val docs = Tables.documents(spark, sfDir)
    val emptyIdx = Dedup.bandIndex(docs.filter(col("doc_id") < 0))  // 0 rows
    val rows = docs.filter(col("doc_id") < 20).select("doc_id", "text")
      .collect().map(r => TextDoc(r.getLong(0), r.getString(1)))
    val mem = MemoryStream[TextDoc](spark)
    val gated = StreamingDedup.corpusGate(mem.toDF(), emptyIdx)
    val w = gated.writeStream.format("memory").queryName("emptygate")
      .outputMode(OutputMode.Append)
    mem.addData(rows.toIndexedSeq: _*)
    val q = w.start(); q.processAllAvailable(); q.stop()
    assert(spark.table("emptygate").count() == 0)
  }

  test("stream-table join enriches records against a broadcast table") {
    val mem = MemoryStream[Ev](spark)
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "tier")
    val enriched = KsqlStream(mem.toDF(), "ts", "5 minutes")
      .joinTable(dim.withColumnRenamed("user_id", "d_uid"),
        col("user_id") === col("d_uid"))
    val w = enriched.df.writeStream.format("memory").queryName("stj")
      .outputMode(OutputMode.Append)
    mem.addData(Ev(1, t(0), 7, "click", 1.0), Ev(2, t(1), 9, "click", 1.0))
    runToCompletion(w)
    val out = spark.table("stj").collect()
    assert(out.length == 1 && out.head.getAs[String]("tier") == "gold")
  }

  test("KSQL TABLE: latest value per key over a stream (update mode)") {
    val mem = MemoryStream[Ev](spark)
    val table = KsqlTable.fromStream(mem.toDF(), "user_id", "event_id", Seq("value"))
    val w = table.writeStream.format("memory").queryName("ktab")
      .outputMode(OutputMode.Complete)
    mem.addData(Ev(1, t(0), 1, "a", 10.0), Ev(5, t(4), 1, "a", 50.0),
      Ev(3, t(2), 1, "a", 30.0), Ev(2, t(1), 2, "b", 20.0))
    runToCompletion(w)
    val out = spark.table("ktab").collect().map(r =>
      r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(out(1L) == 50.0 && out(2L) == 20.0)
  }

  test("KSQL TABLE from batch snapshot: latest by offset") {
    val snap = KsqlTable.fromBatch(Tables.events(spark, sfDir), "user_id", "event_id")
    val direct = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(max_by(col("value"), col("event_id")).as("value"))
    val a = snap.select("user_id", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = direct.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b)
  }

  test("streaming dedup emits first record per key only") {
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "10 minutes")
    val w = s.dedupByKey("user_id", "event_type").writeStream
      .format("memory").queryName("dedup").outputMode(OutputMode.Append)
    mem.addData(Ev(1, t(0), 1, "click", 1), Ev(2, t(1), 1, "click", 2),
      Ev(3, t(2), 1, "view", 3))
    runToCompletion(w)
    assert(spark.table("dedup").count() == 2)
  }

  test("flatMapGroupsWithState running aggregate emits per-record updates") {
    val mem = MemoryStream[Ev](spark)
    val agg = KsqlTable.runningAggregate(mem.toDF(), "user_id", "value")
    val w = agg.writeStream.format("memory").queryName("runagg")
      .outputMode(OutputMode.Update)
    mem.addData(Ev(1, t(0), 1, "a", 1.0), Ev(2, t(1), 1, "a", 2.0))
    runToCompletion(w)
    val out = spark.table("runagg").orderBy("n").collect()
    assert(out.map(_.getAs[Double]("sum")).toSeq == Seq(1.0, 3.0))
  }

  test("observe() DQ checks report exact per-batch counters through the listener") {
    import graft.streaming.StreamingQuality
    val listener = new StreamingQuality.DqListener("dq_obs")
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Ev](spark)
      val out = StreamingQuality.observed(mem.toDF())
      val q = out.writeStream.format("memory").queryName("dq_obs")
        .outputMode(OutputMode.Append).start()
      // batch 1: 3 clean rows + one range violation + one bad type
      mem.addData(
        Ev(1, t(0), 1, "click", 10.0), Ev(2, t(1), 2, "view", 20.0),
        Ev(3, t(2), 3, "purchase", 30.0), Ev(4, t(3), 4, "click", 150.0),
        Ev(5, t(4), 5, "bogus", 40.0))
      q.processAllAvailable()
      // batch 2: clean
      mem.addData(Ev(6, t(5), 6, "view", 50.0), Ev(7, t(6), 7, "click", 60.0))
      q.processAllAvailable()
      // listener delivery is async: poll briefly for both batches
      val deadline = System.nanoTime() + 10_000_000_000L
      def dataBatches = listener.collected.filter(_.metrics("rows") > 0)
      while (dataBatches.size < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      q.stop()
      val Seq(b1, b2) = dataBatches.take(2)
      assert(b1.metrics("rows") == 5 && b1.metrics("value_nonnull") == 5)
      assert(b1.metrics("value_in_range") == 4, b1) // 150.0 out of range
      assert(b1.metrics("accepted_type") == 4, b1)  // 'bogus' rejected
      assert(b2.metrics("rows") == 2 && b2.metrics("value_in_range") == 2
        && b2.metrics("accepted_type") == 2, b2)
      assert(b1.batchId < b2.batchId)
    } finally spark.streams.removeListener(listener)
  }

  test("observe() listener skips non-integral metrics instead of " +
    "dropping the batch") {
    import graft.streaming.StreamingQuality
    val listener = new StreamingQuality.DqListener("dq_mixed")
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Ev](spark)
      // a rule set mixing integral counters with an avg() — the double
      // metric must not throw inside the listener callback and silently
      // lose the batch's integral counters to the bus log
      val out = StreamingQuality.observed(mem.toDF(), Seq(
        count(lit(1)).as("rows"),
        avg(col("value")).as("value_avg")))
      val q = out.writeStream.format("memory").queryName("dq_mixed")
        .outputMode(OutputMode.Append).start()
      mem.addData(Ev(1, t(0), 1, "click", 10.0), Ev(2, t(1), 2, "view", 15.0))
      q.processAllAvailable()
      val deadline = System.nanoTime() + 10_000_000_000L
      def dataBatches = listener.collected
        .filter(_.metrics.get("rows").exists(_ > 0))
      while (dataBatches.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      q.stop()
      val b = dataBatches.head
      assert(b.metrics("rows") == 2)
      assert(!b.metrics.contains("value_avg"), b) // skipped, not coerced
    } finally spark.streams.removeListener(listener)
  }

  test("transformWithState latest-per-key across micro-batches (RocksDB store)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev](spark)
      val out = KsqlTable.latestWithState(mem.toDF(), "user_id", "event_id", "value")
      val w = out.writeStream.format("memory").queryName("tws")
        .outputMode(OutputMode.Update)
      val q = w.start()
      mem.addData(Ev(1, t(0), 1, "a", 10.0), Ev(3, t(2), 1, "a", 30.0))
      q.processAllAvailable()
      mem.addData(Ev(2, t(1), 1, "a", 20.0)) // older offset: must NOT win
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      // last update for key 1 keeps offset 3 / value 30.0
      assert(rows.last == ((1L, 3L, 30.0)))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("CSAS writes an append stream to parquet files") {
    val dir = java.nio.file.Files.createTempDirectory("csas").toString
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes")
      .where(col("event_type") === "click")
    mem.addData(Ev(1, t(0), 1, "click", 1), Ev(2, t(1), 1, "view", 2))
    val q = s.createStreamAs("parquet", s"$dir/out", s"$dir/cp").start()
    q.awaitTermination(60000)
    val written = spark.read.parquet(s"$dir/out")
    assert(written.count() == 1 && written.head.getAs[String]("event_type") == "click")
  }

  test("streaming minhash near-dup detection flags repeats across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import graft.streaming.StreamingDedup
      val mem = MemoryStream[(Long, String)](spark)
      val docs = mem.toDF().toDF("doc_id", "text")
      val out = StreamingDedup.nearDupCandidates(docs)
      val q = out.writeStream.format("memory").queryName("sdedup")
        .outputMode(OutputMode.Update).start()
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      mem.addData((1L, base), (2L, "completely different words about spark shuffles and joins here"))
      q.processAllAvailable()
      mem.addData((3L, base + " ok")) // near-dup of doc 1, later batch
      q.processAllAvailable()
      q.stop()
      val matches = spark.table("sdedup").filter(col("matched_doc") >= 0)
        .select("doc_id", "matched_doc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(matches.contains((3L, 1L)), s"got $matches")
      assert(!matches.exists(_._1 == 2L))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming contamination check: doc stream vs static benchmark grams") {
    // the batch contamination op's gram projection applied to a stream,
    // joined against a STATIC benchmark gram set — stream-static joins
    // need no watermark and broadcast the (small) benchmark side
    val mem = MemoryStream[(Long, String)](spark)
    val gram = (df: org.apache.spark.sql.DataFrame) => df.select(col("doc_id"),
      explode(expr(
        """array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 6, 2) - 1),
          |  i -> concat_ws(' ', slice(split(text, ' '), i, 8))))""".stripMargin)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = gram(Seq((100L, benchText)).toDF("doc_id", "text"))
      .select(col("doc_id").as("bench_id"), col("gh"))
    val stream = gram(mem.toDF().toDF("doc_id", "text"))
    val flagged = stream.join(broadcast(bench), "gh")
      .select(col("doc_id"), col("bench_id"))
    val q = flagged.writeStream.format("memory").queryName("scontam")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      (1L, "prefix words then " + benchText + " trailing content here"),
      (2L, "totally unrelated text with no overlap whatsoever in any gram window"))
    q.processAllAvailable(); q.stop()
    val hits = spark.table("scontam").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L), s"got $hits")
  }

  test("CSAS restart from checkpoint is exactly-once (no dup, no loss)") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes")
    mem.addData(Ev(1, t(0), 1, "a", 1), Ev(2, t(1), 1, "a", 2))
    val q1 = s.df.writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
      .outputMode(OutputMode.Append).start()
    q1.processAllAvailable(); q1.stop()
    // second incarnation of the same query, same checkpoint + sink
    mem.addData(Ev(3, t(2), 2, "b", 3))
    val q2 = s.df.writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
      .outputMode(OutputMode.Append).start()
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 3)
    assert(out.select("event_id").distinct().count() == 3)
  }

  test("PARTITION BY repartitions the stream on the key") {
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes").partitionBy(col("user_id"))
    val plan = s.df.queryExecution.logical.toString
    assert(plan.contains("RepartitionByExpression"), plan)
  }

  test("streaming KLL quantiles over micro-batches match the full-scan sketch ranks") {
    import spark.implicits._
    // deterministic values in two groups, split across two batches
    val all = (1 to 2000).map(i => (if (i % 2 == 0) "even" else "odd", i.toDouble * 3 % 997))
    val (b1, b2) = all.splitAt(1000)
    val mem = MemoryStream[(String, Double)](spark)
    @volatile var last: Map[String, org.apache.datasketches.kll.KllDoublesSketch] = Map.empty
    val q = graft.streaming.StreamingSketches.quantileSink(
      mem.toDF().toDF("g", "v"), "g", "v") { (sks, _) => last = sks }
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // after both batches the accumulated sketch covers the full set:
    // same N as the data, quantile estimates within the rank bound
    val byG = all.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    byG.foreach { case (g, xs) =>
      val sk = last(g)
      assert(sk.getN == xs.length, s"$g: N ${sk.getN} != ${xs.length}")
      Seq(0.1, 0.5, 0.9).foreach { p =>
        val v = sk.getQuantile(p)
        val rank = xs.count(_ <= v).toDouble / xs.length
        assert(math.abs(rank - p) <= 0.03, s"$g p=$p est=$v rank=$rank")
      }
    }
  }

  test("incremental term document-frequency folds new docs across micro-batches") {
    val mem = MemoryStream[SDoc](spark)
    val w = graft.streaming.StreamingText.incrementalTermDf(mem.toDF()).writeStream.format("memory")
      .queryName("inc_df").outputMode(OutputMode.Update)
    val q = w.start()
    mem.addData(SDoc(1, "spark joins data", "en", "web"),
      SDoc(2, "spark state data data", "en", "web"))
    q.processAllAvailable()
    mem.addData(SDoc(3, "spark streams", "en", "wiki"))
    q.processAllAvailable()
    q.stop()
    // update-mode memory sink accumulates per-batch updates; df is
    // monotone, so the running value per term is the max emitted
    val fin = spark.table("inc_df").groupBy("term").agg(max("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch replay over the full corpus must agree with the running state
    assert(fin == Map("spark" -> 3L, "data" -> 2L, "joins" -> 1L,
      "state" -> 1L, "streams" -> 1L))
    // array_distinct guarantees df counts DOCS, not occurrences: doc 2
    // repeats "data" but contributes 1
    assert(fin("data") == 2L)
  }

  test("incremental domain-mix stats fold counts across micro-batches") {
    val mem = MemoryStream[SDoc](spark)
    val w = graft.streaming.StreamingText.incrementalDomainMix(mem.toDF()).writeStream.format("memory")
      .queryName("inc_mix").outputMode(OutputMode.Update)
    val q = w.start()
    mem.addData(SDoc(1, "a b c", "en", "web"), SDoc(2, "d e", "en", "wiki"))
    q.processAllAvailable()
    mem.addData(SDoc(3, "f g h i", "en", "web"))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("inc_mix")
      .groupBy("lang", "source")
      .agg(max("n_docs").as("n_docs"), max("n_tokens").as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(fin == Map(("en", "web") -> ((2L, 7L)), ("en", "wiki") -> ((1L, 2L))))
  }

  test("dedup within watermark: exact inside the horizon, state expires beyond it") {
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "10 minutes")
    val w = s.dedupWithinWatermark("user_id", "event_type").writeStream
      .format("memory").queryName("dedup_wm").outputMode(OutputMode.Append)
    val q = w.start()
    // in-horizon duplicate dedups exactly
    mem.addData(Ev(1, t(0), 1, "click", 1), Ev(2, t(1), 1, "click", 2))
    q.processAllAvailable()
    // advance the watermark far past the first occurrence (other key)
    mem.addData(Ev(3, t(60), 2, "view", 3))
    q.processAllAvailable()
    // (1, click) state has expired -> this re-emits instead of growing
    // state forever (the point: bounded state on unbounded key spaces)
    mem.addData(Ev(4, t(55), 1, "click", 4))
    q.processAllAvailable()
    q.stop()
    val clicks = spark.table("dedup_wm")
      .filter(col("user_id") === 1 && col("event_type") === "click").count()
    assert(clicks == 2, s"expected re-emit after state expiry, got $clicks")
  }

  test("upsert sink materializes a keyed table across micro-batches (delta wins)") {
    val dir = java.nio.file.Files.createTempDirectory("upsert").toString
    val mem = MemoryStream[Ev](spark)
    val q = KsqlTable.upsertSink(mem.toDF(), "user_id", "event_id",
      s"$dir/tab", s"$dir/cp").start()
    mem.addData(Ev(1, t(0), 1, "a", 10.0), Ev(2, t(1), 1, "a", 20.0),
      Ev(3, t(2), 2, "b", 30.0))
    q.processAllAvailable()
    mem.addData(Ev(5, t(4), 1, "a", 50.0), Ev(4, t(3), 3, "c", 40.0))
    q.processAllAvailable()
    q.stop()
    val tab = spark.read.parquet(s"$dir/tab").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("event_id"), r.getAs[Double]("value")))).toMap
    // key 1 upserted by the batch-2 delta; keys 2 and 3 retain their rows
    assert(tab == Map(1L -> ((5L, 50.0)), 2L -> ((3L, 30.0)), 3L -> ((4L, 40.0))))
  }

  test("curation Column ops run unchanged on a stream (batch/stream parity)") {
    import graft.functions.TextFunctions
    val mem = MemoryStream[SDoc](spark)
    // the same Column expressions the batch queries use — NFC cleanup
    // hash + whitespace token count — applied to a streaming frame
    def curationCols(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      md5(TextFunctions.nfcNormalize(
        trim(regexp_replace(lower(col("text")), "\\s+", " ")))).as("nhash"),
      size(split(col("text"), "\\s+")).as("ws_tokens"))
    val q = curationCols(mem.toDF()).writeStream.format("memory")
      .queryName("cur_stream").outputMode(OutputMode.Append).start()
    mem.addData(SDoc(1, "Café  societies", "fr", "s"),
      SDoc(2, "café  societies", "fr", "s"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cur_stream").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    // NFC (composed vs decomposed é) + casefold + whitespace collapse
    // make the two spellings hash-identical, on the stream, exactly as
    // in batch
    assert(rows(1L)._1 == rows(2L)._1)
    assert(rows(1L)._2 == 2 && rows(2L)._2 == 2)
  }

  test("quality-logit and BPE encoding score a stream exactly like batch") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      SDoc(1, "the quick brown fox jumps over the lazy dog and runs", "en", "s"),
      SDoc(2, "spam spam spam spam spam spam", "en", "s"),
      SDoc(3, "a cab abc abcab", "en", "s"))
    val rules = Seq((1, "a", "b"), (2, "ab", "c"))
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.qualityLogit(df)
        .join(TextAnalysis.bpeEncode(
          df.select(col("doc_id"), col("text").as("word")), rules)
          .select(col("doc_id"), col("encoded")), Seq("doc_id"))
    // batch reference on the same rows
    import spark.implicits._
    val batch = pipeline(docs.toDF()).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2), r.getString(3))))
      .toMap
    val mem = MemoryStream[SDoc](spark)
    // stream side: both ops are pure projections, so they run on the
    // stream unchanged — as two independent sinks over the same input
    // (the batch `pipeline` join is only there to collate columns)
    val scoredQ = TextAnalysis.qualityLogit(mem.toDF())
      .writeStream.format("memory").queryName("logit_stream")
      .outputMode(OutputMode.Append).start()
    val encodedQ = TextAnalysis.bpeEncode(
      mem.toDF().select(col("doc_id"), col("text").as("word")), rules)
      .select(col("doc_id"), col("encoded"))
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode(OutputMode.Append).start()
    mem.addData(docs: _*)
    scoredQ.processAllAvailable(); encodedQ.processAllAvailable()
    scoredQ.stop(); encodedQ.stop()
    val s1 = spark.table("logit_stream").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val s2 = spark.table("bpe_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { d =>
      val (bp, bk, be) = batch(d.doc_id)
      assert(s1(d.doc_id) == ((bp, bk)), s"logit parity ${d.doc_id}")
      assert(s2(d.doc_id) == be, s"bpe parity ${d.doc_id}")
    }
  }

  test("streaming graph-ANN probes match the batch search on the prebuilt index") {
    import graft.operators.Similarity
    import graft.streaming.StreamingSimilarity
    val emb = Tables.embeddings(spark, sfDir)
    val (vecs, edges) = Similarity.buildGraphIndex(emb, dim = 64)
    try {
      val probes = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id"), col("embedding"))
      val expected = Similarity.searchGraphIndex(vecs, edges, probes)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(expected.nonEmpty)
      val probeRows = probes.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val mem = MemoryStream[(Long, Array[Float])](spark)
      val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      val q = StreamingSimilarity.serveGraphAnn(vecs, edges,
        mem.toDF().toDF("vec_id", "embedding")) { (out, _) =>
        got ++= out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      }
      // two micro-batches: per-probe independence means the union of the
      // batch results must equal the one-shot batch search
      val (first, rest) = probeRows.splitAt(probeRows.length / 2)
      mem.addData(first.toSeq)
      q.processAllAvailable()
      mem.addData(rest.toSeq)
      q.processAllAvailable()
      q.stop()
      assert(got.toSet == expected)
    } finally { vecs.unpersist(); edges.unpersist() }
  }

  test("streaming CSAS to AVRO: micro-batches append, reader sees the union") {
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("avro-csas").toString
    val mem = MemoryStream[Ev](spark)
    val s = KsqlStream(mem.toDF(), "ts", "5 minutes")
    // AvailableNow processes what exists at start() then terminates, so
    // each restart = one micro-batch; the shared checkpoint carries the
    // offset (and batch id) across restarts — the production CSAS
    // resume path
    mem.addData(Ev(1, t(0), 1, "a", 1.5), Ev(2, t(1), 2, "b", 2.5))
    val q1 = s.createStreamAsAvro(s"$dir/out", s"$dir/cp").start()
    q1.awaitTermination(60000)
    mem.addData(Ev(3, t(2), 3, "c", 3.5))
    val q2 = s.createStreamAsAvro(s"$dir/out", s"$dir/cp").start()
    q2.awaitTermination(60000)
    val back = Sources.avro(spark, s"$dir/out",
      Sources.avroInferSchema(spark, s"$dir/out"))
    assert(back.count() == 3)
    assert(back.select("event_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    // batch-id-named files: the two batches wrote distinct file sets
    val names = new java.io.File(s"$dir/out").listFiles()
      .map(_.getName).filter(_.endsWith(".avro"))
    assert(names.exists(_.startsWith("part-b0-"))
      && names.exists(_.startsWith("part-b1-")), names.mkString(","))
  }

  test("INSERT INTO unions streams by name") {
    val m1 = MemoryStream[Ev](spark)
    val m2 = MemoryStream[Ev](spark)
    val s = KsqlStream(m1.toDF(), "ts", "5 minutes")
      .insertInto(KsqlStream(m2.toDF(), "ts", "5 minutes"))
    val w = s.df.writeStream.format("memory").queryName("ins")
      .outputMode(OutputMode.Append)
    m1.addData(Ev(1, t(0), 1, "a", 1))
    m2.addData(Ev(2, t(1), 2, "b", 2))
    runToCompletion(w)
    assert(spark.table("ins").count() == 2)
  }

  test("sequence pattern detection matches the batch as-of formulation across micro-batches") {
    import org.apache.spark.sql.functions._
    // user 1: view→click within bound (match, CROSS-batch); user 2:
    // click with no view (no match); user 3: view→click beyond the
    // bound (no match); user 4: two views then click (matches LATEST
    // view); user 1 again: second click re-matches the same view
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev](spark)
    val out = graft.streaming.StreamingPatterns.matchSequence(
      mem.toDF(), "view", "click", java.time.Duration.ofMinutes(10))
    val w = out.writeStream.format("memory").queryName("seq_out")
      .outputMode(OutputMode.Update)
    val q = w.start()
    mem.addData(
      Ev(1, t(0), 1, "view", 1),
      Ev(2, t(1), 3, "view", 1),
      Ev(3, t(2), 4, "view", 1))
    q.processAllAvailable()
    mem.addData(
      Ev(4, t(5), 1, "click", 1),          // matches t(0) view
      Ev(5, t(30), 3, "click", 1),         // 28 min after view: no match
      Ev(6, t(6), 4, "view", 1),
      Ev(7, t(8), 4, "click", 1),          // matches the LATER view t(6)
      Ev(8, t(3), 2, "click", 1),          // no view at all
      Ev(9, t(9), 1, "click", 1))          // re-matches t(0) view
    q.processAllAvailable()
    q.stop()
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    val got = spark.table("seq_out")
      .select("user_id", "first_ts", "second_ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ms = (m: Int) => t(m).getTime
    assert(got == Set(
      (1L, ms(0), ms(5)), (4L, ms(6), ms(8)), (1L, ms(0), ms(9))))
  }

  test("streaming decayed sum converges to the batch closed form") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // real events, split by time into two micro-batches (so anchors
    // advance across batches), plus an out-of-order tail in batch 2
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect().sortBy(_.ts.getTime)
    val (b1all, b2main) = ev.splitAt(ev.length / 2)
    // hold back a few EARLY events and deliver them in batch 2: they
    // arrive LATE relative to the running anchors, so the exact
    // late-fold branch is exercised
    val (b1, held) = (b1all.dropRight(5), b1all.takeRight(5))
    val b2 = b2main ++ held
    val mem = MemoryStream[Ev](spark)
    val out = graft.streaming.StreamingPatterns.decayedSum(
      mem.toDF(), java.time.Duration.ofHours(1))
    val q = out.writeStream.format("memory").queryName("decay_out")
      .outputMode(OutputMode.Update).start()
    mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    // update-mode memory sink: last emit per user is the final state
    val fin = spark.table("decay_out")
      .groupBy("user_id").agg(max(struct(col("t_last"), col("decayed"))).as("s"))
      .select(col("user_id"), col("s.t_last"), col("s.decayed")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = SparkEntry.queries("q_decayed_sum")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(fin.keySet == batch.keySet)
    batch.foreach { case (u, (tLast, d)) =>
      val (st, sd) = fin(u)
      assert(st == tLast, s"user $u anchor $st != $tLast")
      // batch value is rounded to 4 decimals; allow that plus float slack
      assert(math.abs(sd - d) <= 1e-4 + math.abs(d) * 1e-9,
        s"user $u streamed $sd vs batch $d")
    }
  }

  test("streaming count-min sketch equals the batch sketch after all batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the SAME term stream the batch q_heavy_hitters sketches, split
    // into 3 micro-batches: CMS merge is plain counter addition, so the
    // accumulated matrix must equal the batch bucket totals EXACTLY and
    // the top-30 estimates must match the oracle-checked cms_est values
    val terms = Tables.documents(spark, sfDir).select(
      explode(filter(split(lower(col("text")), "[^a-z]+"),
        t => length(t) > 0)).as("term")).as[String].collect()
    val batchTop = SparkEntry.queries("q_heavy_hitters")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mem = MemoryStream[String](spark)
    @volatile var last: graft.streaming.StreamingSketches.CmsState = null
    val q = graft.streaming.StreamingSketches.countMinSink(
      mem.toDF().toDF("term"), "term") { (st, _) => last = st }
    terms.grouped(terms.length / 3 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq: _*); q.processAllAvailable()
    }
    q.stop()
    assert(last.n == terms.length, s"stream N ${last.n} != ${terms.length}")
    batchTop.foreach { case (t, exact, est) =>
      assert(last.estimate(t) == est,
        s"$t: streaming estimate ${last.estimate(t)} != batch sketch $est")
      assert(last.estimate(t) >= exact, s"$t: CMS must never undercount")
    }
  }
}
