package graft.streaming

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming near-duplicate detection: the batch MinHash+LSH banding
  * (graft.operators.Dedup) lifted onto a continuous stream.
  *
  * Each arriving document is shingled, MinHash-signed and exploded into
  * band buckets — all stateless per-row projections. State lives ONLY at
  * the bucket level: a ValueState holding the first doc_id that claimed
  * the bucket (with TTL so the store stays bounded on infinite streams).
  * A later doc hitting a claimed bucket emits a candidate pair; exact
  * verification joins text back by id downstream, exactly like the batch
  * path.
  *
  * Scale: state per bucket is ONE long, keyed by (band, band_key) —
  * shuffle and store both stay linear in distinct buckets, never in
  * pairs.
  */
object StreamingDedup {

  /** First-claimant bucket processor: emits (doc_id, first_doc_id) per
    * bucket hit; first_doc_id == -1 marks the claim itself. */
  private class BucketProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, (String, Long), (Long, Long)] {
    @transient private var first: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      first = getHandle.getValueState[Long]("first", Encoders.scalaLong, ttl)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[(Long, Long)] = {
      val out = Seq.newBuilder[(Long, Long)]
      rows.foreach { case (_, docId) =>
        if (!first.exists()) { first.update(docId); out += ((docId, -1L)) }
        else if (first.get() != docId) out += ((docId, first.get()))
      }
      out.result().iterator
    }
  }

  /** Stream-static incremental gate: arriving docs are checked against
    * a STATIC corpus band index — the (doc_id, band, band_key) table
    * `Dedup.bandIndex` materializes and each admitted batch appends to.
    * A stream-static equi-join is completely stateless on the stream
    * side (no state store; Spark re-plans the static side per
    * micro-batch, broadcasting it when small). Emits (doc_id, old_id)
    * band collisions — one row PER COLLIDING BAND, dedup-by-key being
    * a stateful choice left to the caller (trivially `.dropDuplicates`
    * with a watermark, or distinct inside foreachBatch). Downstream
    * routes collisions to exact verification, same as the batch path.
    */
  def corpusGate(docs: DataFrame, bandIndex: DataFrame, k: Int = 16,
                 bands: Int = 4): DataFrame = {
    // same banding recipe as the index builder BY CONSTRUCTION — a
    // drifted copy here would silently miss every corpus collision
    val banded = graft.operators.Dedup.bandIndex(docs, k, bands)
    banded.join(
      bandIndex.select(col("band"), col("band_key"), col("doc_id").as("old_id")),
      Seq("band", "band_key"))
      .select(col("doc_id"), col("old_id"))
  }

  /** docs: streaming frame with (doc_id: long, text: string). Returns a
    * streaming frame (doc_id, matched_doc) in update mode — matched_doc
    * is the earlier near-dup candidate, or -1 for first-seen buckets.
    */
  def nearDupCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4,
                        stateTtl: java.time.Duration = null): DataFrame = {
    import docs.sparkSession.implicits._
    val rows = k / bands
    val banded = docs
      .withColumn("sig", minhashSignatureFromHashes(
        wordShingleHashes(col("text")), k))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(
        concat_ws(":", col("band"),
          concat_ws(",", slice(col("sig"), col("band") * rows + 1, lit(rows))))
          .as("bucket"),
        col("doc_id"))
    val ttl = Option(stateTtl).map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    banded.as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new BucketProcessor(ttl), TimeMode.None(),
        OutputMode.Update(), Encoders.product[(Long, Long)])
      .toDF("doc_id", "matched_doc")
  }
}
