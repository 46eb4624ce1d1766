package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.7): KSQL's topic+format model mapped
  * to Spark readers/writers.
  *
  * KSQL value formats: JSON → `from_json`, DELIMITED → csv, AVRO → the
  * avro jars (present in /opt/spark/jars). The Kafka connector jar is NOT
  * in this zero-egress image, so [[kafka]] builds the exact reader config
  * (format/options/value-decode) without starting it — the config path is
  * unit-tested, the physical connection is not testable here.
  */
object Sources {

  // ---- batch ---------------------------------------------------------
  def parquet(s: SparkSession, path: String): DataFrame = s.read.parquet(path)

  def csv(s: SparkSession, path: String, schema: StructType,
          delimiter: String = ","): DataFrame =
    s.read.schema(schema).option("delimiter", delimiter)
      .option("header", "true").csv(path)

  def json(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** ORC: the other columnar format Spark ships natively — same pushdown
    * and pruning posture as parquet. */
  def orc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  /** Raw-media ingestion for the multimodal pipeline (Multimodal.asMedia
    * downstream): each file becomes one row (path, modificationTime,
    * length, content binary). `pathGlobFilter` bounds the listing to one
    * modality; `maxBytesPerFile` guards the executor heap — at 100 TB
    * the listing parallelizes across the driver's listing threads and
    * rows split across tasks by file, so one giant file can't skew a
    * partition beyond its own size.
    */
  def binaryFiles(s: SparkSession, path: String, glob: String = "*"): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

  def orcSink(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  // ---- AVRO (KSQL's third value format) ------------------------------
  // No spark-avro connector jar ships in this image, but the CORE avro
  // library does — so the container-file read/write is implemented
  // directly on the public org.apache.avro API. Reads split INSIDE
  // files on the container format's sync markers (round 6; the same
  // byte-range semantics as Hadoop's AvroRecordReader: a task syncs to
  // the first block boundary at-or-after its range start and reads
  // blocks whose sync offset falls in [start, end)), streamed through
  // FsInput — a multi-GB topic dump divides across the cluster and no
  // file ever needs to fit in memory. Writes go through the Hadoop
  // FileSystem API from each partition, so the same code path works
  // against HDFS/S3 on a cluster. Supported field types: the KSQL
  // value surface (boolean/int/long/float/double/string/bytes +
  // timestamp-micros/date/time logicals — TIME writes time-micros and
  // reads ksqlDB's own time-millis INT serialization too).

  private def avroFieldSchema(dt: org.apache.spark.sql.types.DataType)
  : org.apache.avro.Schema = {
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case IntegerType => ASchema.create(ASchema.Type.INT)
      case LongType => ASchema.create(ASchema.Type.LONG)
      case FloatType => ASchema.create(ASchema.Type.FLOAT)
      case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
      case StringType => ASchema.create(ASchema.Type.STRING)
      case BinaryType => ASchema.create(ASchema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
      // round 18, with the dialect's TIME/DATE column types: DATE is
      // avro's `date` logical (INT days), TIME writes `time-micros`
      // (LONG — full TimeType(6) precision; reads also accept ksqlDB's
      // own `time-millis` INT serialization, see sparkTypeOf)
      case DateType =>
        LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
      case _: TimeType =>
        LogicalTypes.timeMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
      case other => throw new IllegalArgumentException(
        s"AVRO value format supports primitive/timestamp/date/time columns, got $other")
    }
  }

  /** Avro writer schema for a Spark schema (nullable → union[null, T]). */
  def avroSchemaFor(st: StructType): org.apache.avro.Schema = {
    import org.apache.avro.{JsonProperties, Schema => ASchema}
    val fields = st.fields.map { f =>
      val t = avroFieldSchema(f.dataType)
      if (f.nullable)
        new ASchema.Field(f.name,
          ASchema.createUnion(ASchema.create(ASchema.Type.NULL), t),
          null, JsonProperties.NULL_VALUE)
      else new ASchema.Field(f.name, t, null, null.asInstanceOf[Object])
    }
    val rec = ASchema.createRecord("graft_row", null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  private[sources] def sparkTypeOf(s: org.apache.avro.Schema)
  : (org.apache.spark.sql.types.DataType, Boolean) = {
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.spark.sql.types._
    s.getType match {
      case ASchema.Type.UNION =>
        val nonNull = s.getTypes.asScalaSeq
          .filter(_.getType != ASchema.Type.NULL)
        require(nonNull.size == 1, s"unsupported avro union $s")
        (sparkTypeOf(nonNull.head)._1, true)
      case ASchema.Type.BOOLEAN => (BooleanType, false)
      case ASchema.Type.INT =>
        // ksqlDB serializes DATE as `date` (INT days) and TIME as
        // `time-millis` (INT millis-of-day) — both land on the
        // dialect's column types, TIME at the uniform micros precision
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date])
          (DateType, false)
        else if (s.getLogicalType.isInstanceOf[LogicalTypes.TimeMillis])
          (TimeType(6), false)
        else (IntegerType, false)
      case ASchema.Type.LONG =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
          (TimestampType, false)
        else if (s.getLogicalType.isInstanceOf[LogicalTypes.TimeMicros])
          (TimeType(6), false)
        else (LongType, false)
      case ASchema.Type.FLOAT => (FloatType, false)
      case ASchema.Type.DOUBLE => (DoubleType, false)
      case ASchema.Type.STRING => (StringType, false)
      case ASchema.Type.BYTES => (BinaryType, false)
      case other => throw new IllegalArgumentException(
        s"unsupported avro type $other")
    }
  }

  /** Spark schema inferred from an avro container dir's embedded writer
    * schema (avro is self-describing — CREATE STREAM may omit columns).
    * Opens ONE file and reads only its header — never the data blocks. */
  def avroInferSchema(s: SparkSession, path: String): StructType = {
    import org.apache.spark.sql.types._
    val conf = s.sparkContext.hadoopConfiguration
    val (first, _) = avroFileList(s, path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $path"))
    val in = new org.apache.avro.mapred.FsInput(
      new org.apache.hadoop.fs.Path(first), conf)
    val reader = org.apache.avro.file.DataFileReader.openReader(in,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try StructType(reader.getSchema.getFields.asScalaSeq.map { f =>
      val (dt, nullable) = sparkTypeOf(f.schema())
      StructField(f.name(), dt, nullable)
    })
    finally reader.close()
  }

  private def avroFileList(s: SparkSession, path: String): Seq[(String, Long)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val stats =
      if (fs.isDirectory(p)) fs.globStatus(new org.apache.hadoop.fs.Path(p, "*.avro"))
      else fs.globStatus(p)
    stats.toIndexedSeq.map(st => (st.getPath.toString, st.getLen)).sorted
  }

  /** Convert one Row to a generic record under the given avro schema
    * (Spark Timestamp → timestamp-micros long, Binary → ByteBuffer).
    * Shared by the container writer and the wire-format encoder. */
  private[sources] def rowToRecord(row: org.apache.spark.sql.Row,
                                   schema: StructType,
                                   aSchema: org.apache.avro.Schema)
  : org.apache.avro.generic.GenericRecord = {
    import org.apache.spark.sql.types._
    val rec = new org.apache.avro.generic.GenericData.Record(aSchema)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null else f.dataType match {
        case TimestampType =>
          val ts = row.getAs[java.sql.Timestamp](i)
          java.lang.Long.valueOf(
            Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
              ts.getNanos / 1000L)
        case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
        case DateType =>
          java.lang.Integer.valueOf(
            row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
        case _: TimeType =>
          java.lang.Long.valueOf(
            row.getAs[java.time.LocalTime](i).toNanoOfDay / 1000L)
        case _ => row.get(i).asInstanceOf[AnyRef]
      }
      rec.put(f.name, v)
    }
    rec
  }

  /** Convert one generic record to a Row under `schema` (by-name field
    * lookup, target-type driven conversion). */
  private[sources] def recordToRow(rec: org.apache.avro.generic.GenericRecord,
                          schema: StructType): org.apache.spark.sql.Row = {
    import org.apache.spark.sql.types._
    org.apache.spark.sql.Row.fromSeq(schema.fields.toSeq.map { f =>
      val v = if (rec.getSchema.getField(f.name) == null) null else rec.get(f.name)
      if (v == null) null else f.dataType match {
        case StringType => v.toString
        case TimestampType =>
          val micros = v.asInstanceOf[java.lang.Long].longValue()
          val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          ts
        case BinaryType =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer]
          val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
        case DateType =>
          java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(
              v.asInstanceOf[java.lang.Integer].longValue()))
        case _: TimeType => v match {
          // time-micros lands as LONG; ksqlDB's own time-millis as INT
          case l: java.lang.Long =>
            java.time.LocalTime.ofNanoOfDay(l.longValue() * 1000L)
          case i: java.lang.Integer =>
            java.time.LocalTime.ofNanoOfDay(i.longValue() * 1000000L)
          case other => throw new IllegalArgumentException(
            s"unexpected avro time value ${other.getClass}")
        }
        case _ => v
      }
    })
  }

  /** Read an avro container dir into the given schema (or pass
    * `avroInferSchema` output). Field lookup is BY NAME, values convert
    * per the target Spark type.
    *
    * Splits inside files: each task gets a byte range, seeks to the
    * first sync marker at-or-after its start and reads exactly the
    * blocks whose sync offset lies in [start, end) — the standard avro
    * split contract, so every record is read exactly once no matter how
    * ranges and block boundaries interleave. Records stream through
    * FsInput; memory per task is one decompressed block. */
  def avro(s: SparkSession, path: String, schema: StructType,
           splitSize: Long = 32L * 1024 * 1024): DataFrame =
    avroRead(s, path, schema, readerJson = None, splitSize)

  /** Spark schema for an avro (reader) schema — the public half of the
    * evolution API: declare the reader schema, derive the frame shape. */
  def avroStructFor(schema: org.apache.avro.Schema): StructType = {
    import org.apache.spark.sql.types._
    StructType(schema.getFields.asScalaSeq.map { f =>
      val (dt, nullable) = sparkTypeOf(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  /** Read an avro container dir THROUGH a declared reader schema —
    * Confluent-Schema-Registry-style evolution semantics, resolved by
    * Avro's own schema-resolution rules per file:
    *   - field added in the reader (with a default) → default injected
    *     for files written before the field existed;
    *   - field dropped from the reader → skipped on decode (never
    *     materialized);
    *   - type promotion (int→long→float→double, string↔bytes) →
    *     decoded directly as the reader type.
    * Each task builds `GenericDatumReader(writer=file header, reader=
    * declared)`, exactly what a registry-backed KSQL consumer does with
    * the latest registered schema — so a dir holding a MIX of writer
    * versions reads back as one uniform frame. The reader schema
    * travels to tasks as its JSON form (avro Schemas are not
    * serializable). */
  def avroEvolved(s: SparkSession, path: String, readerSchema: org.apache.avro.Schema,
                  splitSize: Long = 32L * 1024 * 1024): DataFrame =
    avroRead(s, path, avroStructFor(readerSchema),
      readerJson = Some(readerSchema.toString), splitSize)

  private def avroRead(s: SparkSession, path: String, schema: StructType,
                       readerJson: Option[String], splitSize: Long): DataFrame = {
    require(splitSize > 0, "splitSize must be positive")
    val files = avroFileList(s, path)
    val splits = files.flatMap { case (file, len) =>
      (0L until math.max(len, 1L) by splitSize)
        .map(st => (file, st, math.min(st + splitSize, len)))
    }
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val parallelism = math.min(math.max(splits.size, 1),
      s.sparkContext.defaultParallelism * 4)
    val rows = s.sparkContext
      .parallelize(splits, parallelism)
      .flatMap { case (file, start, end) =>
        val in = new org.apache.avro.mapred.FsInput(
          new org.apache.hadoop.fs.Path(file), hadoopConf.value)
        // with a reader schema: expected = declared reader, actual =
        // the file's writer schema (set by openReader from the header)
        // → avro resolves defaults/drops/promotions per record
        val datum = readerJson match {
          case Some(j) => new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord](
            null, new org.apache.avro.Schema.Parser().parse(j))
          case None => new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]()
        }
        val reader = org.apache.avro.file.DataFileReader.openReader(in, datum)
        reader.sync(start)
        // close on task completion, not only on iterator exhaustion: a
        // consumer that stops early (limit/take) or throws mid-decode
        // never reaches the hasNext-false path and would leak the open
        // input stream — the standard record-reader cleanup hook
        val it = new Iterator[org.apache.spark.sql.Row] {
          private var closed = false
          def closeOnce(): Unit = if (!closed) { reader.close(); closed = true }
          override def hasNext: Boolean = {
            val h = !closed && reader.hasNext && !reader.pastSync(end)
            if (!h) closeOnce()
            h
          }
          override def next(): org.apache.spark.sql.Row =
            recordToRow(reader.next(), schema)
        }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => it.closeOnce()))
        it
      }
    s.createDataFrame(rows, schema)
  }

  /** Write a frame as avro container files, one per partition, via the
    * Hadoop FS API (cluster-portable). Timestamps encode as
    * timestamp-micros; the writer schema embeds in every file. */
  /** `syncInterval`: approximate bytes per avro block (the split
    * granularity readers can parallelize at) — avro's default 64 KB
    * unless overridden. */
  /** Streaming avro source: new container files appearing under `path`
    * become micro-batch rows (the file-monitoring analogue of a topic
    * subscription — KSQL's AVRO streams). Built on the binaryFile
    * stream source (Spark tracks seen files in the checkpoint), with
    * the decode as a per-file flatMap. Streaming granularity is the
    * FILE (a micro-batch's new files decode whole — topic-dump files
    * are block-compressed and arrive complete); the batch `avro` reader
    * remains the intra-file-split path for backfills. */
  def avroStream(s: SparkSession, path: String, schema: StructType): DataFrame =
    avroStreamRead(s, path, schema, readerJson = None)

  /** Streaming twin of [[avroEvolved]]: decode each arriving container
    * file through the declared READER schema (avro resolution: defaults
    * / drops / promotions) — the registry-consumer posture on a live
    * topic dir, where files written by OLDER producer versions keep
    * arriving after the schema evolves. */
  def avroStreamEvolved(s: SparkSession, path: String,
                        readerSchema: org.apache.avro.Schema): DataFrame =
    avroStreamRead(s, path, avroStructFor(readerSchema),
      readerJson = Some(readerSchema.toString))

  private def avroStreamRead(s: SparkSession, path: String, schema: StructType,
                             readerJson: Option[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    // binaryFile's fixed schema must be declared explicitly on a STREAM
    val binSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    s.readStream.format("binaryFile").option("pathGlobFilter", "*.avro")
      .schema(binSchema)
      .load(path)
      .select("content")
      .flatMap { (fileRow: org.apache.spark.sql.Row) =>
        val datum = readerJson match {
          case Some(j) => new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord](
            null, new org.apache.avro.Schema.Parser().parse(j))
          case None => new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]()
        }
        val ds = new org.apache.avro.file.DataFileStream(
          new java.io.ByteArrayInputStream(fileRow.getAs[Array[Byte]](0)), datum)
        val out = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
        try while (ds.hasNext) out += recordToRow(ds.next(), schema)
        finally ds.close()
        out
      }(encoder)
      .toDF(schema.fieldNames.toIndexedSeq: _*)
  }

  def avroSink(df: DataFrame, path: String,
               syncInterval: Int = 64000): Unit =
    writeAvroFiles(df, path, "part", truncate = true, syncInterval)

  /** Append one micro-batch as avro files (streaming CSAS sink). File
    * names carry the batch id, so a replayed batch after a crash
    * OVERWRITES its own files instead of duplicating rows — idempotent
    * per batch, which is all exactly-once needs from a file sink. */
  def avroAppend(df: DataFrame, path: String, batchId: Long): Unit =
    writeAvroFiles(df, path, s"part-b$batchId", truncate = false)

  private def writeAvroFiles(df: DataFrame, path: String,
                             prefix: String, truncate: Boolean,
                             syncInterval: Int = 64000): Unit = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val schema = df.schema
    val schemaJson = avroSchemaFor(schema).toString
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fsRoot = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (truncate && fsRoot.exists(dir)) fsRoot.delete(dir, true)
    fsRoot.mkdirs(dir)
    df.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (it.nonEmpty) {
        val aSchema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val file = new org.apache.hadoop.fs.Path(path, f"$prefix%s-$idx%05d.avro")
        val fs = file.getFileSystem(hadoopConf.value)
        val os = fs.create(file, true)
        val writer = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](aSchema))
        writer.setSyncInterval(syncInterval)
        writer.create(aSchema, os)
        try it.foreach(row => writer.append(rowToRecord(row, schema, aSchema)))
        finally writer.close()
      }
      Iterator.empty[Int]
    }.count(): Unit
    // an all-empty frame still materializes its SCHEMA: one header-only
    // container — the file analogue of an empty topic whose schema is
    // registered. Without it a column-less CREATE STREAM (schema
    // inferred from the writer schema) over the output of an empty
    // CSAS fails with "no .avro files" instead of binding empty.
    val wroteAny = fsRoot.listStatus(dir)
      .exists(_.getPath.getName.endsWith(".avro"))
    if (!wroteAny) {
      val aSchema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val os = fsRoot.create(
        new org.apache.hadoop.fs.Path(dir, s"$prefix-00000.avro"), true)
      val writer = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](aSchema))
      writer.create(aSchema, os)
      writer.close()
    }
  }

  // scala-friendly view of avro's java lists without a collection-compat
  // import tangle at the use sites
  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScalaSeq: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }

  // ---- streaming -----------------------------------------------------
  /** Streaming file source — the test/CI stand-in for a topic. */
  def fileStream(s: SparkSession, path: String, schema: StructType,
                 format: String = "parquet"): DataFrame =
    s.readStream.schema(schema).format(format).option("path", path).load()

  def rateStream(s: SparkSession, rowsPerSecond: Int): DataFrame =
    s.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** CREATE STREAM ... WITH (kafka_topic=..., value_format='JSON'):
    * returns (format, options, decode) — `decode` turns the raw Kafka
    * value into typed columns. Apply as:
    * {{{
    *   val (fmt, opts, decode) = Sources.kafka("broker:9092", "events", schema)
    *   decode(spark.readStream.format(fmt).options(opts).load())
    * }}}
    */
  def kafka(bootstrap: String, topic: String, valueSchema: StructType,
            startingOffsets: String = "latest")
  : (String, Map[String, String], DataFrame => DataFrame) = {
    val opts = Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      // at 100 TB/day topics: cap per-trigger intake so micro-batches
      // stay within executor memory; tune with cluster size
      "maxOffsetsPerTrigger" -> "10000000")
    val decode = (raw: DataFrame) => raw.select(
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), valueSchema).as("v"),
      col("timestamp").as("kafka_ts"),
      col("offset"))
      .select(col("key"), col("v.*"), col("kafka_ts"), col("offset"))
    ("kafka", opts, decode)
  }

  /** Kafka sink config: value as JSON of all columns. */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String,
                keyCol: String): (DataFrame, String, Map[String, String]) = {
    val payload = df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
    (payload, "kafka", Map(
      "kafka.bootstrap.servers" -> bootstrap, "topic" -> topic))
  }
}

/** Sink helpers: partitioned + bucketed writes for co-located downstream
  * joins (SURVEY.md §5 — bucketing pre-shuffles ONCE at write time so
  * every later join/agg on the bucket key is shuffle-free).
  */
object Sinks {
  def partitionedParquet(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Z-order clustered parquet write: interleave the bits of two
    * min/max-normalized numeric keys into one z-value, range-partition
    * and sort the files on it. Every file then covers a SMALL rectangle
    * in (a, b) space, so parquet min/max row-group stats prune scans
    * filtered on EITHER column — the data-skipping layout a 100 TB
    * table needs when two independent predicates matter and hive
    * partitioning can only serve one. Min/max normalization (one cheap
    * agg, broadcast back) rather than rank: skewed keys degrade
    * locality gracefully instead of costing a global sort to rank. The
    * one range-partition shuffle is the WRITE-time price; every
    * subsequent scan pays less.
    */
  def zorderParquet(df: DataFrame, path: String, colA: String, colB: String,
                    nFiles: Int): Unit =
    zorderParquetN(df, path, Seq(colA, colB), nFiles)

  /** N-key generalization: bit i of key j lands at bit n·i + j of the
    * z-value. Bits per key shrink as keys grow (min(16, 62/n) — the
    * composite must fit a long), which is the right trade: each added
    * clustering key halves the per-key resolution but buys skipping on
    * one more independent predicate column. */
  def zorderParquetN(df: DataFrame, path: String, cols: Seq[String],
                     nFiles: Int): Unit = {
    require(cols.size >= 2, "z-order needs at least 2 keys")
    val n = cols.size
    val bits = math.min(16, 62 / n)
    val maxVal = (1L << bits) - 1
    val boundAggs = cols.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(col(c)).cast("double").as(s"__lo$j"),
        max(col(c)).cast("double").as(s"__hi$j"))
    }
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*)
    def norm(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        least(lit(maxVal), floor((c.cast("double") - lo) / (hi - lo)
          * (maxVal + 1))).cast("long"))
    val normed = cols.zipWithIndex.map { case (c, j) =>
      norm(col(c), col(s"__lo$j"), col(s"__hi$j"))
    }
    val z = (for {
      i <- 0 until bits
      (nc, j) <- normed.zipWithIndex
    } yield shiftleft(shiftrightunsigned(nc, i).bitwiseAND(lit(1L)), n * i + j))
      .reduce(_ bitwiseOR _)
    val boundCols = cols.indices.flatMap(j => Seq(s"__lo$j", s"__hi$j"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z" +: boundCols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction: rewrite a parquet dir into files of
    * ~targetRowsPerFile. Streaming sinks (and per-batch upserts)
    * accrete thousands of tiny files; at 100 TB the file LISTING alone
    * dominates scan planning, so periodic compaction is part of the
    * sink contract, not an afterthought.
    *
    * Crash-safe two-phase rewrite (same swap as KsqlTable.upsertSink):
    * the compacted copy lands in `<path>.compact-staging` first, read
    * straight from the ORIGINAL files — never from checkpointed blocks
    * that an executor loss could drop after the source is deleted —
    * then swaps in via delete+rename. A crash before the swap leaves
    * the source intact; a crash between delete and rename leaves the
    * complete staging dir, which the recovery branch promotes on the
    * next call. maxRecordsPerFile lets Spark split oversized
    * partitions without a row-count pass.
    */
  def compactParquet(s: SparkSession, path: String,
                     targetRowsPerFile: Long = 1000000L): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + ".compact-staging")
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    // recovery: a previous call crashed after deleting the source but
    // before renaming the finished staging dir — promote it, then fall
    // through and compact normally (the promoted data IS the source)
    if (!fs.exists(hPath) && fs.exists(staging)) fs.rename(staging, hPath)
    val df = s.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(nFiles)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(staging.toString)
    fs.delete(hPath, true)
    fs.rename(staging, hPath)
  }
}
