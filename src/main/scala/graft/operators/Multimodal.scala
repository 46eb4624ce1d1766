package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2.11): media as opaque `binary`
  * columns + typed metadata, with decode/feature steps structured as
  * partition-batch transforms.
  *
  * The decode itself is STUBBED (this container ships no image/audio
  * codecs): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes. Everything around it — the schema contract, the
  * mapPartitions batch shape, partition sizing — is the real 100 TB
  * design: media rows are heavy, so the decode stage must (a) stream
  * per-partition without materializing all batches, (b) run AFTER
  * predicate pushdown has pruned rows, and (c) never widen the row with
  * the raw bytes past the stage that needs them.
  */
object Multimodal {

  /** Typed metadata carried alongside every media binary column. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Wrap any table with a binary payload column into the media contract.
    * (Test data has no real media; documents.text bytes stand in.) */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("application/octet-stream").as("mime"),
      col("text").cast("binary").as("media"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Adapt a `binaryFile`-source frame (path, modificationTime, length,
    * content) to the media contract: media_id = stable hash of the path
    * (files have no natural long key), mime guessed from the extension.
    * This is the ingestion edge for real image/audio dirs — downstream
    * (decode → resize → frameSample) is source-agnostic.
    */
  def fromBinaryFiles(files: DataFrame): DataFrame =
    files.select(
      conv(substring(md5(col("path")), 1, 15), 16, 10).cast("long").as("media_id"),
      when(col("path").rlike("(?i)\\.(jpe?g)$"), "image/jpeg")
        .when(col("path").rlike("(?i)\\.(png)$"), "image/png")
        .when(col("path").rlike("(?i)\\.(wav)$"), "audio/wav")
        .when(col("path").rlike("(?i)\\.(mp4)$"), "video/mp4")
        .otherwise("application/octet-stream").as("mime"),
      col("content").as("media"),
      col("length").as("n_bytes"))

  /** ??? in spirit — the deterministic stand-in for a real codec. A real
    * deployment replaces the body with e.g. JPEG decode + resize; the
    * signature (Iterator[Row] => Iterator[Row], schema'd, per-partition)
    * is exactly what survives that swap. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    val width = (b0 % 8) * 32 + 64
    val height = (b1 % 8) * 32 + 64
    val nFrames = bytes.length % 30 + 1
    // fake 8-dim feature vector: byte-histogram moments
    val feats = new Array[Float](8)
    var i = 0
    while (i < bytes.length) { feats(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    (width, height, nFrames, feats)
  }

  /** Decode/feature-extract as a per-partition batch transform. Raw bytes
    * are dropped from the output row — the wide column dies here, so
    * downstream shuffles move only metadata + features. */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "mime", "media", "n_bytes").rdd
      .mapPartitions(_.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val (w, h, f, feats) = decodeStub(bytes)
        Row(r.getLong(0), r.getString(1), r.getLong(3), w, h, f, feats)
      })
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Resize stage: rescales decoded dimensions and features to a target
    * box. STUBBED math (real codecs would re-decode pixels), real stage
    * contract: schema-preserving, per-partition, no raw media bytes.
    */
  def resize(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = decoded.sparkSession
    val rdd = decoded.rdd.mapPartitions(_.map { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      val scale = math.min(targetW.toDouble / w, targetH.toDouble / h).toFloat
      val feats = r.getAs[scala.collection.Seq[Float]]("features")
        .map(_ * scale).toArray
      Row(r.getAs[Long]("media_id"), r.getAs[String]("mime"),
        r.getAs[Long]("n_bytes"), targetW, targetH,
        r.getAs[Int]("n_frames"), feats)
    })
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Frame sampling for temporal media: every nth frame index, exploded
    * to one row per sampled frame — a pure Column projection (sequence +
    * explode), so sampling never leaves whole-stage codegen.
    */
  def frameSample(decoded: DataFrame, everyN: Int): DataFrame =
    decoded.select(col("media_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))

  /** Exact media dedup by content digest: keep the min-id copy of every
    * distinct payload. The digest projects BEFORE the shuffle, so the
    * grouping moves 16-byte hashes — never the media bytes themselves
    * (at 100 TB the payload column must not cross an exchange); the
    * keeper set re-joins the full rows as a broadcast semi join. */
  def dedupByContent(media: DataFrame): DataFrame = {
    val keep = media
      .select(col("media_id"), md5(col("media")).as("content_md5"))
      .groupBy(col("content_md5")).agg(min(col("media_id")).as("media_id"))
    media.join(broadcast(keep.select(col("media_id"))), Seq("media_id"),
      "left_semi")
  }

  // ---- driver-verifiable entry (metadata path, SQL-expressible) ------

  def entries: Map[String, Q] = Map(
    // NOTE: this metadata path derives its fake dims from character
    // CODEPOINTS (ascii() — SQL-replayable in both engines), while
    // decodeStub reads raw UTF-8 BYTES. They agree on ASCII payloads
    // (all test data) but are NOT bit-identical on multibyte text —
    // both are stand-ins for a real codec, not mirrors of each other.
    "q_media_meta" -> Q(
      (s, d) => asMedia(Tables.documents(s, d)).select(
        col("media_id"), col("mime"), col("n_bytes"),
        ((ascii(substring(col("media").cast("string"), 1, 1)) % 8) * 32 + 64).as("fake_width"),
        ((ascii(substring(col("media").cast("string"), 2, 1)) % 8) * 32 + 64).as("fake_height"),
        (col("n_bytes") % 30 + 1).as("n_frames")),
      """SELECT doc_id AS media_id,
        |  'application/octet-stream' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST((ascii(substr(text, 1, 1)) % 8) * 32 + 64 AS INT) AS fake_width,
        |  CAST((ascii(substr(text, 2, 1)) % 8) * 32 + 64 AS INT) AS fake_height,
        |  CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin),

    // media dedup by content digest: only hashes shuffle, payloads stay
    // put; the survivors' ids + sizes are SQL-replayable (full oracle)
    "q_media_dedup" -> Q(
      (s, d) => dedupByContent(asMedia(Tables.documents(s, d)))
        .select(col("media_id"), col("n_bytes")),
      """SELECT min(doc_id) AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents
        |GROUP BY md5(text), octet_length(encode(text))""".stripMargin)
  )
}
