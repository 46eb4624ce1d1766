package graft.sources

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-backed schema registry with Confluent-Registry semantics over
  * the avro value format — the reference deploys KSQL next to a
  * Confluent Schema Registry, and its AVRO format is meaningless
  * without one: producers register subject versions under a
  * compatibility policy, consumers resolve a subject to its latest
  * schema and read every historical writer version through it.
  *
  * Storage is a directory of `<subject>/<version>.avsc` files behind
  * the Hadoop FS API (an object-store path on a real cluster — the
  * file analogue of the registry's `_schemas` topic). All operations
  * are metadata-sized driver work; nothing here touches data paths.
  *
  * Compatibility is checked with avro's OWN resolution rules
  * ([[SchemaCompatibility]] — the same checker the real registry
  * uses), per mode:
  *   - BACKWARD (the registry default): the NEW schema must read data
  *     written with the latest registered schema.
  *   - FORWARD: the latest registered schema must read data written
  *     with the new schema.
  *   - FULL: both.
  *   - NONE: register anything.
  * BACKWARD_TRANSITIVE / FORWARD_TRANSITIVE / FULL_TRANSITIVE apply
  * the same check against EVERY registered version, not just the
  * latest — the policy that actually guarantees a latest-schema
  * consumer can read an arbitrarily old topic segment.
  */
final class SchemaRegistry(root: String, conf: Configuration) {
  import SchemaRegistry._

  private val rootPath = new Path(root)
  private def fs = rootPath.getFileSystem(conf)

  /** Versions registered under `subject`, ascending (empty if none). */
  def versions(subject: String): Seq[Int] = {
    val dir = new Path(rootPath, subject)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case AvscName(v) => v.toInt }
      .sorted
  }

  def schemaAt(subject: String, version: Int): Schema = {
    val p = new Path(new Path(rootPath, subject), s"$version.avsc")
    val in = fs.open(p)
    try new Schema.Parser().parse(in)
    finally in.close()
  }

  def latest(subject: String): Option[(Int, Schema)] =
    versions(subject).lastOption.map(v => v -> schemaAt(subject, v))

  /** Register `schema` under `subject` enforcing `mode`. Returns the
    * assigned version. Re-registering a schema identical to the latest
    * is idempotent (returns the existing version — the registry
    * contract producers rely on at every restart). Throws
    * [[IncompatibleSchemaException]] listing avro's incompatibilities
    * when the policy rejects the schema.
    */
  def register(subject: String, schema: Schema,
               mode: Compatibility = Backward): Int = {
    val existing = versions(subject)
    val latestOpt = existing.lastOption.map(v => schemaAt(subject, v))
    if (latestOpt.contains(schema)) return existing.last
    val against: Seq[(Int, Schema)] = mode match {
      case None_ => Seq.empty
      case Backward | Forward | Full =>
        existing.lastOption.map(v => v -> schemaAt(subject, v)).toSeq
      case BackwardTransitive | ForwardTransitive | FullTransitive =>
        existing.map(v => v -> schemaAt(subject, v))
    }
    val problems = against.flatMap { case (v, old) =>
      val errs = Seq.newBuilder[String]
      def check(reader: Schema, writer: Schema, dir: String): Unit = {
        val r = SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
        if (r.getType != SchemaCompatibilityType.COMPATIBLE)
          errs += s"v$v $dir: ${r.getResult.getIncompatibilities}"
      }
      mode match {
        case Backward | BackwardTransitive => check(schema, old, "backward")
        case Forward | ForwardTransitive => check(old, schema, "forward")
        case Full | FullTransitive =>
          check(schema, old, "backward"); check(old, schema, "forward")
        case None_ =>
      }
      errs.result()
    }
    if (problems.nonEmpty)
      throw new IncompatibleSchemaException(subject, mode, problems)
    val next = existing.lastOption.getOrElse(0) + 1
    val p = new Path(new Path(rootPath, subject), s"$next.avsc")
    val out = fs.create(p, false) // no overwrite: concurrent register loses loudly
    try out.write(schema.toString(true).getBytes("UTF-8"))
    finally out.close()
    next
  }

  /** Confluent-style GLOBAL schema ids (the 4-byte id every
    * wire-format record embeds). Assigned on first request per
    * (subject, version), persisted as `_ids/<id>` files whose content
    * is "subject version" — create-without-overwrite makes concurrent
    * assignment race-safe (the loser re-reads and retries). All
    * metadata-sized driver work, like the rest of the registry. */
  private def idsDir = new Path(rootPath, "_ids")

  /** id → (subject, version) for every assigned global id. */
  def allIds(): Map[Int, (String, Int)] = {
    if (!fs.exists(idsDir)) return Map.empty
    fs.listStatus(idsDir).toSeq.flatMap { st =>
      val id = scala.util.Try(st.getPath.getName.toInt).toOption
      id.map { i =>
        val in = fs.open(st.getPath)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val Array(subj, ver) = content.trim.split(' ')
        i -> (subj, ver.toInt)
      }
    }.toMap
  }

  def idFor(subject: String, version: Int): Option[Int] =
    allIds().collectFirst { case (id, (s, v)) if s == subject && v == version => id }

  /** The global id for (subject, version), assigning the next free id
    * if none exists yet. */
  def ensureId(subject: String, version: Int): Int = {
    require(versions(subject).contains(version),
      s"no version $version registered under $subject")
    var attempt = 0
    while (attempt < 100) {
      idFor(subject, version) match {
        case Some(id) => return id
        case None =>
          val next = allIds().keys.maxOption.getOrElse(0) + 1
          try {
            val out = fs.create(new Path(idsDir, next.toString), false)
            try out.write(s"$subject $version".getBytes("UTF-8"))
            finally out.close()
            return next
          } catch { case _: java.io.IOException => attempt += 1 } // lost the race
      }
    }
    throw new IllegalStateException("could not assign a global schema id")
  }

  def schemaById(id: Int): (String, Int, Schema) = {
    val (subj, ver) = allIds().getOrElse(id,
      throw new IllegalArgumentException(s"unknown global schema id $id"))
    (subj, ver, schemaAt(subj, ver))
  }

  /** Read an avro container dir through the subject's LATEST registered
    * schema — the standard registry-consumer posture: every historical
    * writer version in the dir resolves (defaults / drops / promotions)
    * to the one current shape. */
  def read(s: SparkSession, path: String, subject: String): DataFrame = {
    val (_, schema) = latest(subject).getOrElse(throw new IllegalArgumentException(
      s"no schema registered for subject '$subject' under $root"))
    Sources.avroEvolved(s, path, schema)
  }

  /** Streaming consumer: arriving container files — including ones
    * written by OLDER producer versions — decode through the subject's
    * latest registered schema. Resolved ONCE at stream definition, like
    * a consumer that fetches the latest schema at startup. */
  def readStream(s: SparkSession, path: String, subject: String): DataFrame = {
    val (_, schema) = latest(subject).getOrElse(throw new IllegalArgumentException(
      s"no schema registered for subject '$subject' under $root"))
    Sources.avroStreamEvolved(s, path, schema)
  }

  /** Register the frame's schema (producer posture: register-on-write,
    * rejected writes never touch the data path), then write. */
  def write(df: DataFrame, path: String, subject: String,
            mode: Compatibility = Backward): Int = {
    val v = register(subject, Sources.avroSchemaFor(df.schema), mode)
    Sources.avroSink(df, path)
    v
  }
}

object SchemaRegistry {
  private val AvscName = "(\\d+)\\.avsc".r

  sealed trait Compatibility
  case object Backward extends Compatibility
  case object Forward extends Compatibility
  case object Full extends Compatibility
  case object BackwardTransitive extends Compatibility
  case object ForwardTransitive extends Compatibility
  case object FullTransitive extends Compatibility
  /** `NONE` in registry terms (underscore: `None` is taken in Scala). */
  case object None_ extends Compatibility

  final class IncompatibleSchemaException(subject: String, mode: Compatibility,
                                          problems: Seq[String])
    extends IllegalArgumentException(
      s"schema for '$subject' violates $mode compatibility:\n  " +
        problems.mkString("\n  "))

  def apply(spark: SparkSession, root: String): SchemaRegistry =
    new SchemaRegistry(root, spark.sparkContext.hadoopConfiguration)
}
