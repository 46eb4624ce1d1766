package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Confluent wire format for registry-backed values: every record is
  *
  *   byte 0      magic 0x00
  *   bytes 1-4   global schema id, big-endian int
  *   bytes 5..   avro BINARY body (no container framing)
  *
  * — the exact on-topic layout Confluent serializers produce, so a
  * corpus encoded here is byte-compatible with what a real Kafka
  * consumer configured against a Confluent Registry expects, and
  * graft can decode topic dumps produced by real producers. The
  * physical broker connection stays environment-bound (no Kafka jar in
  * this image); the SERIALIZATION seam — the part users actually
  * migrate code against — is fully implemented and spec'd.
  *
  * Scale posture: encode/decode are mapPartitions projections (one
  * schema parse + one reusable encoder per partition, per-record work
  * is pure avro binary codec); the registry lookups are metadata-sized
  * and resolved ON THE DRIVER, shipped as a broadcast-sized map in the
  * closure — executors never touch the registry filesystem.
  */
object WireFormat {

  val Magic: Byte = 0x00

  /** Encode `df` as wire-format records under `subject`: registers the
    * frame's avro schema (compatibility-checked like every producer),
    * assigns/reuses its global id, and returns a single binary `value`
    * column. */
  def encode(df: DataFrame, registryRoot: String, subject: String,
             mode: SchemaRegistry.Compatibility = SchemaRegistry.Backward)
  : DataFrame = {
    val spark = df.sparkSession
    val reg = SchemaRegistry(spark, registryRoot)
    val schema = df.schema
    val aSchema = Sources.avroSchemaFor(schema)
    val version = reg.register(subject, aSchema, mode)
    val id = reg.ensureId(subject, version)
    val schemaJson = aSchema.toString
    val out = df.rdd.mapPartitions { it =>
      val writerSchema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val writer = new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](writerSchema)
      val header = java.nio.ByteBuffer.allocate(5)
        .put(Magic).putInt(id).array()
      it.map { row =>
        val rec = Sources.rowToRecord(row, schema, writerSchema)
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(header)
        val enc = org.apache.avro.io.EncoderFactory.get()
          .binaryEncoder(bos, null)
        writer.write(rec, enc)
        enc.flush()
        Row(bos.toByteArray)
      }
    }
    spark.createDataFrame(out,
      StructType(Seq(StructField("value", BinaryType, nullable = false))))
  }

  /** Decode wire-format records through the subject's LATEST registered
    * schema (the registry-consumer posture): each record's WRITER
    * schema is resolved from its embedded global id, then avro's
    * reader/writer resolution applies defaults / drops / promotions —
    * mixed-version topics decode to the one current shape. Unknown
    * magic or id fails loudly (a corrupt record must never decode as
    * zeros). */
  def decode(spark: SparkSession, wire: DataFrame, registryRoot: String,
             subject: String): DataFrame = {
    val reg = SchemaRegistry(spark, registryRoot)
    val (_, readerSchema) = reg.latest(subject).getOrElse(
      throw new IllegalArgumentException(s"no schema registered under $subject"))
    val readerJson = readerSchema.toString
    // the full id → writer-schema map is metadata-sized; resolving it
    // here keeps executors off the registry filesystem
    val writersJson: Map[Int, String] =
      reg.allIds().map { case (id, (s, v)) => id -> reg.schemaAt(s, v).toString }
    val struct = StructType(readerSchema.getFields.asScalaSeq.map { f =>
      val (dt, nullable) = Sources.sparkTypeOf(f.schema())
      StructField(f.name(), dt, nullable)
    })
    val out = wire.select("value").rdd.mapPartitions { it =>
      val parser = new org.apache.avro.Schema.Parser()
      val reader = parser.parse(readerJson)
      val readers = scala.collection.mutable.Map.empty[Int,
        org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]]
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](0)
        if (bytes.length < 5 || bytes(0) != Magic)
          throw new IllegalArgumentException(
            s"not a wire-format record (len=${bytes.length}, " +
              s"magic=${if (bytes.nonEmpty) bytes(0) else -1})")
        val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
        val rdr = readers.getOrElseUpdate(id, {
          val writerJson = writersJson.getOrElse(id,
            throw new IllegalArgumentException(s"unknown global schema id $id"))
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord](
            new org.apache.avro.Schema.Parser().parse(writerJson), reader)
        })
        val dec = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(bytes, 5, bytes.length - 5, null)
        Sources.recordToRow(rdr.read(null, dec), struct)
      }
    }
    spark.createDataFrame(out, struct)
  }

  // avro's java lists, scala-side (mirror of Sources' private helper)
  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScalaSeq: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }
}
