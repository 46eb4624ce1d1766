package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      to_json(struct(df.columns.map(col): _*)).as("value"))
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
