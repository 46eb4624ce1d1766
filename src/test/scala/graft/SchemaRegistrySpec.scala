package graft

import graft.sources.{SchemaRegistry, Sources}
import org.apache.avro.{JsonProperties, Schema => ASchema}

/** Confluent-Registry semantics over the avro layer: subject versioning,
  * compatibility enforcement (avro's own checker), and latest-schema
  * reads across mixed writer versions.
  */
class SchemaRegistrySpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-registry").toString

  private def record(fields: ASchema.Field*): ASchema = {
    val r = ASchema.createRecord("graft_row", null, "graft", false)
    r.setFields(java.util.Arrays.asList(fields: _*))
    r
  }
  private def f(name: String, t: ASchema.Type): ASchema.Field =
    new ASchema.Field(name, ASchema.create(t), null, null.asInstanceOf[Object])
  private def fDefault(name: String, t: ASchema.Type, dflt: Object): ASchema.Field =
    new ASchema.Field(name, ASchema.create(t), null, dflt)

  test("register assigns increasing versions and is idempotent on the latest") {
    val reg = SchemaRegistry(spark, s"$tmp/r1")
    val v1 = record(f("id", ASchema.Type.LONG))
    assert(reg.register("orders-value", v1) == 1)
    assert(reg.register("orders-value", v1) == 1) // producer restart
    val v2 = record(f("id", ASchema.Type.LONG),
      fDefault("region", ASchema.Type.STRING, "unknown"))
    assert(reg.register("orders-value", v2) == 2)
    assert(reg.versions("orders-value") == Seq(1, 2))
    assert(reg.latest("orders-value").map(_._1).contains(2))
  }

  test("BACKWARD rejects an added field without a default; accepts with one") {
    val reg = SchemaRegistry(spark, s"$tmp/r2")
    reg.register("s", record(f("id", ASchema.Type.LONG)))
    val bad = record(f("id", ASchema.Type.LONG), f("req", ASchema.Type.STRING))
    intercept[SchemaRegistry.IncompatibleSchemaException] {
      reg.register("s", bad)
    }
    val good = record(f("id", ASchema.Type.LONG),
      fDefault("req", ASchema.Type.STRING, "n/a"))
    assert(reg.register("s", good) == 2)
  }

  test("FORWARD rejects dropping a defaultless field; FULL needs both directions") {
    val reg = SchemaRegistry(spark, s"$tmp/r3")
    reg.register("s", record(f("id", ASchema.Type.LONG), f("name", ASchema.Type.STRING)),
      SchemaRegistry.None_)
    // dropping `name`: old reader (with defaultless name) can't read new
    // data → FORWARD-incompatible, but BACKWARD-compatible
    val dropped = record(f("id", ASchema.Type.LONG))
    intercept[SchemaRegistry.IncompatibleSchemaException] {
      reg.register("s", dropped, SchemaRegistry.Forward)
    }
    intercept[SchemaRegistry.IncompatibleSchemaException] {
      reg.register("s", dropped, SchemaRegistry.Full)
    }
    assert(reg.register("s", dropped, SchemaRegistry.Backward) == 2)
  }

  test("BACKWARD_TRANSITIVE checks every version, not just the latest") {
    val reg = SchemaRegistry(spark, s"$tmp/r4")
    reg.register("s", record(f("id", ASchema.Type.LONG), f("tag", ASchema.Type.STRING)),
      SchemaRegistry.None_)
    // v2 drops tag (backward-OK vs v1: reader without tag skips it)
    reg.register("s", record(f("id", ASchema.Type.LONG)), SchemaRegistry.Backward)
    // v3 re-adds tag WITHOUT a default: vs latest (v2) BACKWARD passes
    // (v2 data has no tag? no — reader tag has no default → incompatible
    // vs v2, which never wrote tag). Against v1 it would pass; the
    // non-transitive check against v2 alone must already reject.
    val v3 = record(f("id", ASchema.Type.LONG), f("tag", ASchema.Type.STRING))
    intercept[SchemaRegistry.IncompatibleSchemaException] {
      reg.register("s", v3, SchemaRegistry.Backward)
    }
    // with a default it passes plain BACKWARD but must also clear every
    // version under TRANSITIVE (it does: default covers v1 and v2 data)
    val v3d = record(f("id", ASchema.Type.LONG),
      fDefault("tag", ASchema.Type.STRING, "none"))
    assert(reg.register("s", v3d, SchemaRegistry.BackwardTransitive) == 3)
  }

  test("registry readStream decodes old-version files arriving on a live dir") {
    import spark.implicits._
    val reg = SchemaRegistry(spark, s"$tmp/rs")
    val dir = java.nio.file.Files.createTempDirectory("graft-sr-stream").toString
    // v1 producer schema registered and one v1 file written
    val d1 = Seq((1L, "a")).toDF("id", "name")
    reg.write(d1, dir, "live-value")
    // subject evolves to v2 (adds nullable tag) BEFORE the stream starts
    val v2 = {
      import org.apache.avro.{JsonProperties, Schema => ASchema}
      val base = Sources.avroSchemaFor(d1.schema)
      val r = ASchema.createRecord("graft_row", null, "graft", false)
      r.setFields(java.util.Arrays.asList(
        new ASchema.Field("id", base.getFields.get(0).schema(), null,
          null.asInstanceOf[Object]),
        new ASchema.Field("name", base.getFields.get(1).schema(), null,
          JsonProperties.NULL_VALUE),
        new ASchema.Field("tag", ASchema.createUnion(
          ASchema.create(ASchema.Type.NULL), ASchema.create(ASchema.Type.STRING)),
          null, JsonProperties.NULL_VALUE)))
      r
    }
    assert(reg.register("live-value", v2) == 2)
    val stream = reg.readStream(spark, dir, "live-value")
    assert(stream.isStreaming)
    assert(stream.columns.toSeq == Seq("id", "name", "tag"))
    val q = stream.writeStream.format("memory").queryName("sr_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a LATE v1-schema file lands after the stream started (the old
      // producer still running) — must decode through v2 with the default
      Sources.avroAppend(Seq((2L, "b")).toDF("id", "name"), dir, batchId = 9)
      q.processAllAvailable()
      val rows = spark.table("sr_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
      assert(rows == Set((1L, "a", None), (2L, "b", None)))
    } finally { q.stop(); spark.catalog.dropTempView("sr_stream") }
  }

  test("registry read resolves mixed writer versions to the latest schema") {
    import spark.implicits._
    val reg = SchemaRegistry(spark, s"$tmp/r5")
    val dir = s"$tmp/r5-data"
    // producer v1 writes (id, name)
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    assert(reg.write(d1, dir, "docs-value") == 1)
    // producer v2 adds a defaulted column and appends to the same dir
    val d2 = Seq((3L, "c", "eu")).toDF("id", "name", "region")
    val v2 = {
      val base = Sources.avroSchemaFor(d2.schema)
      // rebuild with a default on region so v1 files resolve
      val fields = base.getFields
      val rebuilt = record(
        new ASchema.Field("id", fields.get(0).schema(), null, null.asInstanceOf[Object]),
        new ASchema.Field("name", fields.get(1).schema(), null, JsonProperties.NULL_VALUE),
        new ASchema.Field("region", fields.get(2).schema(), null, JsonProperties.NULL_VALUE))
      rebuilt
    }
    assert(reg.register("docs-value", v2) == 2)
    Sources.avroAppend(d2, dir, batchId = 7)
    val back = reg.read(spark, dir, "docs-value")
    assert(back.columns.toSeq == Seq("id", "name", "region"))
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(rows == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some("eu"))))
  }

  test("global ids are stable, race-safe files, and resolvable back to schemas") {
    val reg = SchemaRegistry(spark, s"$tmp/ids")
    reg.register("a-value", record(f("id", ASchema.Type.LONG)))
    reg.register("b-value", record(f("x", ASchema.Type.STRING)))
    val id1 = reg.ensureId("a-value", 1)
    val id2 = reg.ensureId("b-value", 1)
    assert(id1 != id2)
    assert(reg.ensureId("a-value", 1) == id1) // stable on re-request
    val (subj, ver, sch) = reg.schemaById(id2)
    assert(subj == "b-value" && ver == 1 && sch.getField("x") != null)
    intercept[IllegalArgumentException](reg.schemaById(9999))
    intercept[IllegalArgumentException](reg.ensureId("a-value", 99))
  }

  test("wire format round-trips, decodes mixed writer versions, rejects corrupt bytes") {
    import graft.sources.WireFormat
    import spark.implicits._
    val root = s"$tmp/wire"
    // v1 producer: (id, name)
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val w1 = WireFormat.encode(d1, root, "t-value")
    val bytes1 = w1.collect().map(_.getAs[Array[Byte]](0))
    // exact Confluent layout: magic 0, big-endian global id
    assert(bytes1.forall(_(0) == 0))
    val reg = SchemaRegistry(spark, root)
    val wantId = reg.ensureId("t-value", 1)
    assert(bytes1.forall(b =>
      java.nio.ByteBuffer.wrap(b, 1, 4).getInt == wantId))
    // v2 producer adds a defaulted column (BACKWARD-compatible)
    val d2 = Seq((3L, "c", "eu")).toDF("id", "name", "region")
    val w2 = WireFormat.encode(d2, root, "t-value")
    // consumer: decode the MIXED stream through the latest schema —
    // v1 records surface the defaulted region
    val mixed = w1.union(w2)
    val back = WireFormat.decode(spark, mixed, root, "t-value")
    assert(back.columns.toSeq == Seq("id", "name", "region"))
    // v1 records surface the null-defaulted region (avroSchemaFor maps
    // a nullable Spark column to a null-defaulted union)
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(rows == Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some("eu"))))
    // corrupt records fail loudly, never decode as garbage
    val bad = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("value")
    val e = intercept[org.apache.spark.SparkException] {
      WireFormat.decode(spark, bad, root, "t-value").collect()
    }
    assert(e.getMessage.contains("wire-format")
      || Option(e.getCause).exists(_.getMessage.contains("wire-format")))
  }
}
