package graft

import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-src").toString

  test("csv (KSQL DELIMITED) round-trips with explicit schema") {
    val df = Tables.customer(spark, sfDir).limit(50)
    df.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val schema = df.schema
    val back = Sources.csv(spark, s"$tmp/csv", schema)
    assert(back.count() == 50)
    assert(back.schema.map(_.dataType) == schema.map(_.dataType))
  }

  test("json (KSQL JSON) round-trips with explicit schema") {
    val df = Tables.nation(spark, sfDir)
    df.write.mode("overwrite").json(s"$tmp/json")
    val back = Sources.json(spark, s"$tmp/json", df.schema)
    assert(back.count() == df.count())
  }

  test("orc round-trips with schema and value equality") {
    val df = Tables.customer(spark, sfDir)
    Sources.orcSink(df, s"$tmp/orc")
    val back = Sources.orc(spark, s"$tmp/orc")
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("avro (KSQL AVRO) round-trips values incl. timestamps, nulls, binary") {
    import spark.implicits._
    import java.sql.Timestamp
    val df = Seq(
      (1L, "alpha", Some(1.5), new Timestamp(1700000000123L), Array[Byte](1, 2)),
      (2L, "béta", None, new Timestamp(1700000099999L), Array[Byte]()),
      (3L, null.asInstanceOf[String], Some(-0.25), new Timestamp(0L),
        Array[Byte](-1))
    ).toDF("id", "name", "score", "ts", "payload")
    Sources.avroSink(df, s"$tmp/avro")
    // explicit-schema read
    val back = Sources.avro(spark, s"$tmp/avro", df.schema)
    assert(back.count() == 3)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // inferred-schema read (avro is self-describing)
    val inferred = Sources.avroInferSchema(spark, s"$tmp/avro")
    assert(inferred.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(Sources.avro(spark, s"$tmp/avro", inferred).count() == 3)
  }

  test("avro DATE/TIME logicals (round 18): Spark DATE/TIME round-trip " +
    "via date + time-micros, and ksqlDB's time-millis INT serialization " +
    "reads onto the TIME type") {
    val df = spark.range(2).selectExpr("id",
      "DATE'2024-03-01' AS d", "TIME'23:59:59.123456' AS t")
    Sources.avroSink(df, s"$tmp/avro_dt")
    val inferred = Sources.avroInferSchema(spark, s"$tmp/avro_dt")
    assert(inferred("d").dataType === DateType)
    assert(inferred("t").dataType === TimeType(6))
    val back = Sources.avro(spark, s"$tmp/avro_dt", inferred)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)

    // ksqlDB's own TIME serialization is `time-millis` on INT (and DATE
    // is `date` on INT) — a topic dump written by ksqlDB must read
    // without a cast shim
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    val rec = ASchema.createRecord("r", null, "g", false)
    rec.setFields(java.util.Arrays.asList(
      new ASchema.Field("d",
        LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT)),
        null, null.asInstanceOf[Object]),
      new ASchema.Field("t",
        LogicalTypes.timeMillis().addToSchema(ASchema.create(ASchema.Type.INT)),
        null, null.asInstanceOf[Object])))
    val dir2 = new java.io.File(s"$tmp/avro_tmillis"); dir2.mkdirs()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](rec))
    w.create(rec, new java.io.File(dir2, "part-0.avro"))
    val r0 = new org.apache.avro.generic.GenericData.Record(rec)
    r0.put("d", Integer.valueOf(
      java.time.LocalDate.of(2024, 3, 1).toEpochDay.toInt))
    r0.put("t", Integer.valueOf((23 * 3600 + 59 * 60 + 59) * 1000 + 123))
    w.append(r0); w.close()
    val inf2 = Sources.avroInferSchema(spark, dir2.toString)
    assert(inf2("t").dataType === TimeType(6))
    assert(inf2("d").dataType === DateType)
    val got = Sources.avro(spark, dir2.toString, inf2).collect().head
    assert(got.getAs[java.time.LocalTime]("t") ===
      java.time.LocalTime.of(23, 59, 59, 123000000))
    assert(got.getAs[java.sql.Date]("d").toLocalDate ===
      java.time.LocalDate.of(2024, 3, 1))
  }

  test("avro schema evolution: added-with-default, dropped, promoted fields " +
      "resolve across mixed writer versions") {
    import spark.implicits._
    import org.apache.avro.{JsonProperties, Schema => ASchema}
    val dir = s"$tmp/avro_evolve"
    // writer v1: (id int, name string, score float, legacy string)
    val v1 = Seq((1, "a", 1.5f, "old"), (2, "b", -0.25f, "older"))
      .toDF("id", "name", "score", "legacy")
    Sources.avroSink(v1, s"$dir")
    // a SECOND writer version lands in the same dir (the mixed-version
    // topic shape): v2 already has the added field, no legacy
    val v2 = Seq((3, "c", 9.0f, "fresh"))
      .toDF("id", "name", "score", "region")
    Sources.avroAppend(v2, s"$dir", batchId = 1)
    // reader (the "latest registered schema"): id promoted int→long,
    // score promoted float→double, legacy dropped, region added with a
    // default for pre-evolution files
    val reader = {
      val fields = java.util.Arrays.asList(
        new ASchema.Field("id", ASchema.create(ASchema.Type.LONG), null,
          null.asInstanceOf[Object]),
        new ASchema.Field("name", ASchema.createUnion(
          ASchema.create(ASchema.Type.NULL), ASchema.create(ASchema.Type.STRING)),
          null, JsonProperties.NULL_VALUE),
        new ASchema.Field("score", ASchema.create(ASchema.Type.DOUBLE), null,
          null.asInstanceOf[Object]),
        new ASchema.Field("region", ASchema.createUnion(
          ASchema.create(ASchema.Type.STRING), ASchema.create(ASchema.Type.NULL)),
          null, "unknown"))
      val rec = ASchema.createRecord("graft_row", null, "graft", false)
      rec.setFields(fields)
      rec
    }
    val back = Sources.avroEvolved(spark, dir, reader)
    import org.apache.spark.sql.types._
    assert(back.schema.map(f => (f.name, f.dataType)) == Seq(
      ("id", LongType), ("name", StringType),
      ("score", DoubleType), ("region", StringType)))
    assert(!back.columns.contains("legacy"))
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(rows == Set(
      (1L, "a", 1.5, "unknown"),   // v1 file: default injected, types promoted
      (2L, "b", -0.25, "unknown"),
      (3L, "c", 9.0, "fresh")))    // v2 file: real value wins over default
  }

  test("avro survives multi-partition writes and a real table round-trip") {
    val df = Tables.events(spark, sfDir).repartition(4)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    Sources.avroSink(df, s"$tmp/avro_ev")
    val back = Sources.avro(spark, s"$tmp/avro_ev",
      Sources.avroInferSchema(spark, s"$tmp/avro_ev"))
    assert(back.count() == df.count())
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("avro streaming source picks up new container files per micro-batch") {
    import spark.implicits._
    val dir = s"$tmp/avro_stream"
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sources.avroSink(df1, dir) // first file
    val stream = Sources.avroStream(spark, dir, df1.schema)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("avro_in")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("avro_in").count() == 2)
    // a LATER file lands (append, no truncate) → next batch adds its rows
    Sources.avroAppend(Seq((3L, "c")).toDF("id", "v"), dir, batchId = 7)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("avro_in").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("avro intra-file splits read every record exactly once") {
    // ONE file, many records, then a split size far below the file
    // length: ranges cut through the middle of blocks, and the sync
    // contract (read blocks whose sync offset is in [start, end)) must
    // yield exactly-once coverage — no dropped first block, no
    // double-read across adjacent ranges
    val df = Tables.events(spark, sfDir).coalesce(1)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    // ~1 KB blocks so the ~31 KB file carries many sync points
    Sources.avroSink(df, s"$tmp/avro_split", syncInterval = 1024)
    val files = new java.io.File(s"$tmp/avro_split").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 1)
    val len = files.head.length()
    val splitSize = 4L * 1024
    assert(len > 4 * splitSize, s"file too small ($len) to test splitting")
    val back = Sources.avro(spark, s"$tmp/avro_split", df.schema, splitSize)
    assert(back.rdd.getNumPartitions > 1, "expected multiple split tasks")
    assert(back.count() == df.count())
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // degenerate range (splitSize > file length) still reads everything
    assert(Sources.avro(spark, s"$tmp/avro_split", df.schema,
      splitSize = 1L << 30).count() == df.count())
  }

  test("dialect: CREATE STREAM / CSAS with VALUE_FORMAT='AVRO'") {
    import graft.ksql.Translator
    val src = Tables.nation(spark, sfDir)
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
    Sources.avroSink(src, s"$tmp/avro_nat")
    // inferred columns: CREATE STREAM declares none
    val (c1, _) = Translator.run(spark, Map.empty,
      s"CREATE STREAM nat WITH (PATH='$tmp/avro_nat', VALUE_FORMAT='AVRO')")
    val (c2, Some(out)) = Translator.run(spark, c1,
      s"""CREATE TABLE agg WITH (PATH='$tmp/avro_agg', VALUE_FORMAT='AVRO') AS
         |SELECT n_regionkey, COUNT(*) AS cnt FROM nat
         |GROUP BY n_regionkey""".stripMargin): @unchecked
    assert(out.agg(sum("cnt")).head.getLong(0) == src.count())
    // the CSAS materialized as avro container files, readable back
    val files = new java.io.File(s"$tmp/avro_agg").listFiles()
      .map(_.getName).filter(_.endsWith(".avro"))
    assert(files.nonEmpty)
    val back = Sources.avro(spark, s"$tmp/avro_agg",
      Sources.avroInferSchema(spark, s"$tmp/avro_agg"))
    assert(back.agg(sum("cnt")).head.getLong(0) == src.count())
    assert(c2.contains("agg"))
  }

  test("binaryFile source feeds the multimodal decode pipeline") {
    import graft.operators.Multimodal
    val dir = new java.io.File(s"$tmp/media"); dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "a.jpg").toPath,
      Array[Byte](1, 2, 3, 4, 5))
    java.nio.file.Files.write(new java.io.File(dir, "b.wav").toPath,
      Array[Byte](9, 8, 7))
    java.nio.file.Files.write(new java.io.File(dir, "skip.txt").toPath,
      Array[Byte](0))
    val files = Sources.binaryFiles(spark, s"$tmp/media", "*.{jpg,wav}")
    val media = Multimodal.fromBinaryFiles(files)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "mime", "media", "n_bytes"))
    val rows = media.collect()
    assert(rows.length == 2) // glob filtered skip.txt out
    assert(rows.map(_.getAs[String]("mime")).toSet == Set("image/jpeg", "audio/wav"))
    // ingested bytes flow through decode: deterministic stub features
    val decoded = Multimodal.decode(media).collect()
      .map(r => r.getAs[Long]("n_bytes")).sorted.toSeq
    assert(decoded == Seq(3L, 5L))
  }

  test("compaction rewrites a fragmented parquet dir into few files, data intact") {
    val df = Tables.orders(spark, sfDir)
    df.repartition(20).write.mode("overwrite").parquet(s"$tmp/frag")
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$tmp/frag") == 20)
    Sinks.compactParquet(spark, s"$tmp/frag", targetRowsPerFile = 10000000L)
    assert(parquetFiles(s"$tmp/frag") == 1)
    val back = spark.read.parquet(s"$tmp/frag")
    assert(back.count() == df.count())
    assert(back.exceptAll(df).count() == 0)
  }

  test("compaction is crash-safe: source intact until staging complete, staging promoted on recovery") {
    val df = Tables.nation(spark, sfDir)
    // normal path leaves no staging dir behind
    df.repartition(5).write.mode("overwrite").parquet(s"$tmp/cs")
    Sinks.compactParquet(spark, s"$tmp/cs")
    assert(!new java.io.File(s"$tmp/cs.compact-staging").exists())
    assert(spark.read.parquet(s"$tmp/cs").count() == df.count())
    // recovery path: crash happened after delete, before rename — the
    // live dir is gone and the complete staging dir remains
    val live = new java.io.File(s"$tmp/cs")
    val staging = new java.io.File(s"$tmp/cs.compact-staging")
    assert(live.renameTo(staging))
    Sinks.compactParquet(spark, s"$tmp/cs")
    assert(!staging.exists())
    assert(spark.read.parquet(s"$tmp/cs").count() == df.count())
  }

  test("streaming file source reads with declared schema") {
    val df = Tables.region(spark, sfDir)
    df.write.mode("overwrite").parquet(s"$tmp/stream-in")
    val stream = Sources.fileStream(spark, s"$tmp/stream-in", df.schema)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("filesrc")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("filesrc").count() == df.count())
  }

  test("kafka source builder produces the connector contract + JSON decode") {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val (fmt, opts, decode) = Sources.kafka("broker:9092", "events", schema,
      startingOffsets = "earliest")
    assert(fmt == "kafka")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "events")
    assert(opts("startingOffsets") == "earliest")
    // decode applies to any frame with the kafka wire schema
    val wire = spark.createDataFrame(Seq(
      ("k1".getBytes, """{"user_id": 7, "value": 1.5}""".getBytes,
        new java.sql.Timestamp(0L), 0L)))
      .toDF("key", "value", "timestamp", "offset")
    val decoded = decode(wire)
    val row = decoded.head
    assert(row.getAs[Long]("user_id") == 7L && row.getAs[Double]("value") == 1.5)
  }

  test("kafka sink builder emits key + JSON value payload") {
    val df = Tables.nation(spark, sfDir).limit(3)
    val (payload, fmt, opts) = Sources.kafkaSink(df, "b:9092", "out", "n_nationkey")
    assert(fmt == "kafka" && opts("topic") == "out")
    assert(payload.columns.toSeq == Seq("key", "value"))
    val v = payload.head.getAs[String]("value")
    assert(v.contains("n_name"))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sinks.bucketedTable(Tables.orders(spark, sfDir), "b_orders", "o_custkey", 4)
      Sinks.bucketedTable(
        Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", "o_custkey", 4)
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      // bucketing pre-shuffled at write time: the join itself must not
      // re-exchange either side
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == Tables.orders(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("z-order write localizes BOTH keys per file (data-skipping layout)") {
    val df = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    Sinks.zorderParquet(df, s"$tmp/zorder", "user_id", "value", nFiles = 8)
    val files = new java.io.File(s"$tmp/zorder").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    val (uLo, uHi) = { val r = df.agg(min("user_id"), max("user_id")).head
      (r.getLong(0).toDouble, r.getLong(1).toDouble) }
    val (vLo, vHi) = { val r = df.agg(min("value"), max("value")).head
      (r.getDouble(0), r.getDouble(1)) }
    // every file's span over each key, as a fraction of the full range;
    // a random (non-clustered) layout gives ~1.0 on both — z-order must
    // keep the AVERAGE well below that on both dimensions at once
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min("user_id"), max("user_id"), min("value"), max("value")).head
      ((r.getLong(1) - r.getLong(0)) / (uHi - uLo),
        (r.getDouble(3) - r.getDouble(2)) / (vHi - vLo))
    }
    val avgU = spans.map(_._1).sum / spans.length
    val avgV = spans.map(_._2).sum / spans.length
    assert(avgU < 0.7 && avgV < 0.7, f"avg spans u=$avgU%.2f v=$avgV%.2f")
    // nothing lost in the rewrite
    assert(spark.read.parquet(s"$tmp/zorder").count() == df.count())
  }

  test("3-key z-order localizes every key per file") {
    val df = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    Sinks.zorderParquetN(df, s"$tmp/zorder3",
      Seq("event_id", "user_id", "value"), nFiles = 8)
    val files = new java.io.File(s"$tmp/zorder3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 4)
    def range(c: String): (Double, Double) = {
      val r = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head
      (r.getDouble(0), r.getDouble(1))
    }
    val ranges = Seq("event_id", "user_id", "value").map(range)
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min("event_id").cast("double"), max("event_id").cast("double"),
        min("user_id").cast("double"), max("user_id").cast("double"),
        min("value").cast("double"), max("value").cast("double")).head
      Seq(0, 1, 2).map { j =>
        (r.getDouble(2 * j + 1) - r.getDouble(2 * j)) /
          (ranges(j)._2 - ranges(j)._1)
      }
    }
    // every dimension's AVERAGE per-file span must beat the ~1.0 of an
    // unclustered layout; 3 keys at 20 bits each is coarser than the
    // 2-key case, so the bound is looser
    Seq(0, 1, 2).foreach { j =>
      val avg = spans.map(_(j)).sum / spans.length
      assert(avg < 0.8, f"key $j avg span $avg%.2f")
    }
    assert(spark.read.parquet(s"$tmp/zorder3").count() == df.count())
  }

  test("partitioned parquet write lays out by partition column") {
    Sinks.partitionedParquet(Tables.nation(spark, sfDir), s"$tmp/part", Seq("n_regionkey"))
    val dirs = new java.io.File(s"$tmp/part").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("n_regionkey=")))
    // partition pruning must reach the scan: the filter shows up as a
    // PartitionFilter (directory skip), not a post-scan row filter
    val one = spark.read.parquet(s"$tmp/part").filter(col("n_regionkey") === 0)
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("n_regionkey"), p.take(2000))
    assert(one.count() > 0)
  }
}
