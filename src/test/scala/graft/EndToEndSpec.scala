package graft

import graft.ksql._
import org.apache.spark.sql.functions._

/** The full reference-user workflow, end to end through the dialect:
  * declare file-bound sources, derive streams, aggregate into tables,
  * inspect the catalog, insert test rows, run subquery-predicate pull
  * queries, and tear down — one script, one catalog thread. Plus a
  * concurrency stress on the subquery-predicate path (session-global
  * temp views are the shared state the viewLock must protect).
  */
class EndToEndSpec extends SparkSpec {

  test("reference workflow: sources -> derived streams -> tables -> queries -> teardown") {
    val script =
      s"""CREATE STREAM ev (event_id BIGINT, user_id BIGINT, event_type VARCHAR,
         |  value DOUBLE)
         |WITH (PATH='$sfDir/events.parquet', VALUE_FORMAT='PARQUET',
         |      TIMESTAMP='ts');
         |CREATE STREAM purchases AS
         |  SELECT event_id, user_id, value FROM ev
         |  WHERE event_type = 'purchase';
         |INSERT INTO purchases (event_id, user_id, value)
         |  VALUES (999997, 42, 10.5);
         |CREATE TABLE spend AS
         |  SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
         |  FROM purchases GROUP BY user_id""".stripMargin
    val (cat, _) = Translator.runScript(spark, Map.empty, script)

    // catalog holds the whole lineage
    assert(Set("ev", "purchases", "spend").subsetOf(cat.keySet))
    // the inserted literal row flowed into the aggregate
    val manual = cat("spend").df.filter(col("user_id") === 42L)
    assert(manual.count() >= 1)
    // DESCRIBE sees the derived table's schema
    val (_, Some(desc)) = Translator.run(spark, cat, "DESCRIBE spend"): @unchecked
    assert(desc.collect().map(_.getString(0)).toSet == Set("user_id", "n", "total"))
    // PRINT pages rows; a subquery-predicate pull query runs over the
    // derived catalog
    val (_, Some(page)) = Translator.run(spark, cat, "PRINT spend LIMIT 3"): @unchecked
    assert(page.count() == 3)
    val (_, Some(big)) = Translator.run(spark, cat,
      "SELECT user_id, total FROM spend WHERE total > (SELECT AVG(total) FROM spend)"): @unchecked
    val avg0 = cat("spend").df.agg(avg("total")).head.getDouble(0)
    assert(big.count() ==
      cat("spend").df.filter(col("total") > avg0).count())
    // teardown
    val (cat2, _) = Translator.run(spark, cat, "DROP TABLE spend")
    assert(!cat2.contains("spend"))
  }

  test("LLM curation pipeline composes: curate -> dedup-keep -> mix-sample -> pack") {
    import graft.operators.{Dedup, TextAnalysis}
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()

    // stage 1: fused quality/dedup curation (exact-dup removal + floor)
    val curated = TextAnalysis.curate(docs, minQuality = 0.2)
    val curatedDocs = docs.join(curated.select("doc_id"), "doc_id")
    val nCurated = curatedDocs.count()
    assert(nCurated > 0 && nCurated <= total)

    // stage 2: near-dup clusters -> keep min-id representative
    val comp = Dedup.connectedComponents(Dedup.fuzzyPairs(curatedDocs))
    val dupes = comp.filter(col("doc_id") =!= col("component")).select("doc_id")
    val kept = curatedDocs.join(dupes, Seq("doc_id"), "left_anti")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= nCurated)

    // stage 3: reproducible mixing gate (inverse-sqrt per lang/source)
    val g = kept.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_g"))
    val m = g.agg(min(col("n_g")).as("min_n"))
    val rates = g.crossJoin(broadcast(m))
      .withColumn("cut", floor(sqrt(col("min_n").cast("double") / col("n_g")) * 10000).cast("long"))
      .select(col("lang"), col("source"), col("cut"))
    val mixed = kept.join(broadcast(rates), Seq("lang", "source"))
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000 < col("cut"))
    val nMixed = mixed.count()
    assert(nMixed > 0 && nMixed <= nKept)

    // stage 4: pack into token budgets — every surviving doc lands in
    // exactly one pack and no pack exceeds the budget (single-doc
    // overruns aside, impossible at this corpus's doc lengths)
    val packed = TextAnalysis.packSequences(mixed, budget = 2000)
    assert(packed.count() == nMixed)
    val over = packed.groupBy("pack_id")
      .agg(sum(col("tokens")).as("t"), count(lit(1)).as("n"))
      .filter(col("t") > 2000 && col("n") > 1).count()
    assert(over == 0, "no multi-doc pack may exceed the budget")

    // determinism: the whole pipeline is RNG-free — same rows on re-run
    val rerun = kept.join(broadcast(rates), Seq("lang", "source"))
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000 < col("cut"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rerun == mixed.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("concurrent subquery-predicate statements don't clobber each other's views") {
    val catalog: Translator.Catalog = Map(
      "orders" -> Translator.Source(Tables.orders(spark, sfDir), "o_orderdate"),
      "customer" -> Translator.Source(Tables.customer(spark, sfDir), "c_custkey"))
    val expectedOrders = {
      val t = Tables.orders(spark, sfDir).agg(avg("o_totalprice")).head.getDouble(0)
      Tables.orders(spark, sfDir).filter(col("o_totalprice") > t).count()
    }
    val expectedCust = {
      val t = Tables.customer(spark, sfDir).agg(avg("c_acctbal")).head.getDouble(0)
      Tables.customer(spark, sfDir).filter(col("c_acctbal") > t).count()
    }
    // 8 threads alternate two different subquery statements against the
    // SAME SparkSession — before the viewLock fix these raced on the
    // shared temp-view registry between registration and analysis
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(8)
    val futures = (0 until 16).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          val q =
            if (i % 2 == 0)
              "SELECT o_orderkey FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)"
            else
              "SELECT c_custkey FROM customer WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)"
          val (_, Some(df)) = Translator.run(spark, catalog, q): @unchecked
          df.count()
        }
      })
    }
    pool.shutdown()
    val results = futures.map(_.get())
    results.zipWithIndex.foreach { case (n, i) =>
      val expected = if (i % 2 == 0) expectedOrders else expectedCust
      assert(n == expected, s"statement $i: $n != $expected")
    }
  }

  test("AVRO topic lifecycle: files -> stream -> windowed agg -> AVRO CSAS -> batch read") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("avro_e2e").toString
    val inDir = s"$tmp/topic_in"; val outDir = s"$tmp/topic_out"
    // "topic": two avro container files of events
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val (half1, half2) = (ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1))
    graft.sources.Sources.avroAppend(half1, inDir, batchId = 0)
    graft.sources.Sources.avroAppend(half2, inDir, batchId = 1)
    // CREATE STREAM over the avro dir → tumbling hourly count per type
    val schema = graft.sources.Sources.avroInferSchema(spark, inDir)
    val stream = graft.streaming.KsqlStream(
      graft.sources.Sources.avroStream(spark, inDir, schema), "ts", "1 hour")
    val agg = stream.df
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("ws"),
        col("event_type"), col("cnt"))
    // CSAS back to an avro "topic"
    val q = graft.streaming.KsqlStream(agg, "ws", "1 hour")
      .createStreamAsAvro(outDir, s"$tmp/cp").start()
    q.awaitTermination() // AvailableNow: drains the input then stops
    // batch read of the output topic equals the batch computation over
    // the WATERMARK-CLOSED windows: append mode emits a window only
    // once the watermark (max event time - 1 hour) passes its end, so
    // the tail windows correctly stay open at drain
    val back = graft.sources.Sources.avro(spark, outDir,
      graft.sources.Sources.avroInferSchema(spark, outDir))
    val maxTs = ev.agg(max(unix_millis(col("ts")))).head.getLong(0)
    val hourMs = 3600000L
    val expect = ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("ws"),
        col("event_type"), col("cnt"))
      .filter(col("ws") + hourMs <= maxTs - hourMs)
    assert(back.count() > 0)
    assert(back.exceptAll(expect).count() == 0 && expect.exceptAll(back).count() == 0,
      "streamed AVRO aggregation differs from the batch computation on closed windows")
  }
}
