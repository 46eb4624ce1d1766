package graft.ksql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Embedded connector runtime serving ksqlDB's connector-management DDL
  * (CREATE SOURCE/SINK CONNECTOR, SHOW/DESCRIBE/DROP CONNECTOR). The
  * real ksql server proxies these statements to a Kafka Connect
  * cluster; in this zero-egress engine a connector is a managed
  * Structured Streaming copy job over the file-backed topic model —
  * the exact role Connect's SpoolDir source / file sink play:
  *
  *  - SOURCE: watch an external directory ('input.path') of
  *    JSON/DELIMITED/PARQUET files and append its rows continuously
  *    into an engine topic directory ('topic', parquet — the engine's
  *    native topic format), which CREATE STREAM ... WITH (PATH=...)
  *    then binds.
  *  - SINK: watch an engine topic directory ('topic', parquet) and
  *    export its rows continuously to an external directory
  *    ('output.path') as JSON/DELIMITED/PARQUET.
  *
  * Each connector is one named streaming query (`connector_<name>`),
  * so it also shows up in SHOW QUERIES and dies with TERMINATE — same
  * lifecycle the real server gives connector tasks. Schemas come from
  * the 'schema' property (KSQL column syntax) or are inferred from the
  * files present at creation time (SpoolDir's behavior); a streaming
  * file source can't infer on its own.
  *
  * Scale posture: a connector moves data through the cluster's normal
  * file-source micro-batches (`maxFilesPerTrigger` is settable via
  * 'tasks.max'-like 'files.per.trigger'), so ingestion parallelism is
  * the file split parallelism — no driver-side row handling anywhere.
  *
  * Registries are per-SparkSession and weak-keyed (same lifecycle
  * discipline as Translator.sessionProps): a stopped session's
  * connectors don't pin the JVM. Node-local BY DESIGN: connector DDL is
  * NOT replicated through the command log — graft's runtime is an
  * embedded single-worker "Connect cluster" per server, and replaying
  * CREATE CONNECTOR on a second server would start a second writer
  * into the same topic directory (the real deployment distributes
  * tasks across Connect workers precisely so that exactly one writer
  * owns a task).
  */
object Connectors {

  final case class Connector(name: String, isSource: Boolean,
      props: Map[String, String], query: StreamingQuery)

  private val sessions =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Connector]]()
  private def registry(spark: SparkSession) =
    sessions.synchronized {
      var m = sessions.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Connector]
        sessions.put(spark, m)
      }
      m
    }

  private def need(props: Map[String, String], key: String,
      what: String): String =
    props.getOrElse(key, throw new IllegalArgumentException(
      s"connector needs '${key.toLowerCase}' ($what)"))

  /** Schema for the external side: explicit 'schema' property (KSQL
    * column syntax) wins; otherwise infer from the files already in the
    * directory — the SpoolDir posture. Inference requires at least one
    * file at creation time. */
  private def schemaFor(spark: SparkSession, props: Map[String, String],
      path: String, fmt: String): StructType =
    props.get("SCHEMA") match {
      case Some(ddl) => Translator.parseSchema(spark, ddl)
      case None =>
        val df = fmt match {
          case "JSON" => spark.read.json(path)
          case "DELIMITED" => spark.read
            .option("header", "true").option("inferSchema", "true").csv(path)
          case _ => spark.read.parquet(path)
        }
        if (df.schema.isEmpty) throw new IllegalArgumentException(
          s"cannot infer a schema from $path — give the connector a " +
            "'schema' property or seed the directory with one file")
        df.schema
    }

  def create(spark: SparkSession, isSource: Boolean, name: String,
      props: Map[String, String], ifNotExists: Boolean): Unit = {
    val reg = registry(spark)
    val key = name.toLowerCase
    if (reg.contains(key)) {
      if (ifNotExists) return
      throw new IllegalArgumentException(s"connector $name already exists")
    }
    val q = if (isSource) startSource(spark, name, props)
            else startSink(spark, name, props)
    reg.put(key, Connector(name, isSource, props, q))
  }

  private def intervalMs(props: Map[String, String]): Long =
    props.getOrElse("INTERVAL.MS", "500").toLong

  private def trigger(props: Map[String, String]): Trigger =
    Trigger.ProcessingTime(intervalMs(props))

  private def startSource(spark: SparkSession, name: String,
      props: Map[String, String]): StreamingQuery = {
    val in = need(props, "INPUT.PATH", "directory to watch")
    val topic = need(props, "TOPIC", "engine topic directory to append to")
    val fmt = props.getOrElse("FORMAT", "JSON").toUpperCase
    val schema = schemaFor(spark, props, in, fmt)
    val reader = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger",
        props.getOrElse("FILES.PER.TRIGGER", "1000"))
    val src = fmt match {
      case "JSON" => reader.json(in)
      case "DELIMITED" => reader.option("header", "true").csv(in)
      case "PARQUET" => reader.parquet(in)
      case other => throw new IllegalArgumentException(
        s"unsupported connector format $other (JSON|DELIMITED|PARQUET)")
    }
    src.writeStream.queryName(s"connector_$name")
      .format("parquet")
      .option("path", topic)
      .option("checkpointLocation", s"$topic/_connector_checkpoint")
      .trigger(trigger(props))
      .start()
  }

  private def startSink(spark: SparkSession, name: String,
      props: Map[String, String]): StreamingQuery = {
    val topic = need(props, "TOPIC", "engine topic directory to export")
    val out = need(props, "OUTPUT.PATH", "directory to export into")
    val fmt = props.getOrElse("FORMAT", "JSON").toUpperCase
    // the engine topic side is always parquet; its schema is whatever
    // the topic already carries
    val schema = spark.read.parquet(topic).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger",
        props.getOrElse("FILES.PER.TRIGGER", "1000"))
      .parquet(topic)
    val writer = src.writeStream.queryName(s"connector_$name")
      .option("checkpointLocation", s"$out/_connector_checkpoint")
      .trigger(trigger(props))
    val bound = fmt match {
      case "JSON" => writer.format("json")
      case "DELIMITED" => writer.format("csv").option("header", "true")
      case "PARQUET" => writer.format("parquet")
      case other => throw new IllegalArgumentException(
        s"unsupported connector format $other (JSON|DELIMITED|PARQUET)")
    }
    bound.option("path", out).start()
  }

  /** SHOW CONNECTORS rows: (name, type, state). */
  def list(spark: SparkSession): Seq[(String, String, String)] =
    registry(spark).values.toSeq.sortBy(_.name).map(c =>
      (c.name, if (c.isSource) "SOURCE" else "SINK",
        if (c.query.isActive) "RUNNING" else "STOPPED"))

  /** DESCRIBE CONNECTOR rows: properties + runtime state, including the
    * engine's own progress numbers (rows in the last batch). */
  def describe(spark: SparkSession, name: String): Seq[(String, String)] = {
    val c = registry(spark).get(name.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"no connector $name"))
    val progress = Option(c.query.lastProgress)
    Seq(
      "name" -> c.name,
      "type" -> (if (c.isSource) "SOURCE" else "SINK"),
      "state" -> (if (c.query.isActive) "RUNNING" else "STOPPED"),
      "query_id" -> c.query.id.toString,
      "last_batch_rows" ->
        progress.map(_.numInputRows.toString).getOrElse("0")) ++
      c.props.toSeq.sortBy(_._1).map { case (k, v) => k.toLowerCase -> v }
  }

  def drop(spark: SparkSession, name: String, ifExists: Boolean): Unit = {
    val reg = registry(spark)
    reg.remove(name.toLowerCase) match {
      case Some(c) => c.query.stop()
      case None if ifExists => ()
      case None =>
        throw new IllegalArgumentException(s"no connector $name")
    }
  }

  /** Stop and forget every connector on the session (server shutdown). */
  def stopAll(spark: SparkSession): Unit = {
    val reg = registry(spark)
    reg.values.foreach(c => try c.query.stop() catch { case _: Throwable => () })
    reg.clear()
  }
}
