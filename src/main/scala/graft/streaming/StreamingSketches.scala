package graft.streaming

import graft.functions.KllSketches
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous sketch maintenance over streams: each micro-batch is
  * summarized by per-partition sketches (linear scan, zero shuffle)
  * and merged into a caller-held accumulator — the streaming half of
  * the incremental-maintenance contract spec'd for the batch sketches
  * (old ∪ delta == full rescan). State is one KB-sized sketch per
  * group on the driver, independent of stream length.
  */
object StreamingSketches {

  /** A count-min sketch as a d×w counter matrix with the SAME
    * md5-stable row hashes as the batch `q_heavy_hitters` query:
    * bucket_r(t) = stable_hash32(r || '_' || t) mod w. CMS is
    * additively mergeable, so per-micro-batch bucket totals fold into
    * the accumulated matrix by plain addition — the streaming estimate
    * after batch k equals the batch sketch over the union of batches
    * 1..k (spec-asserted). Bounded state: d·w longs, stream-length-
    * independent. */
  final class CmsState(val d: Int, val w: Int) {
    val counters: Array[Array[Long]] = Array.fill(d)(new Array[Long](w))
    var n: Long = 0L
    // the ONE hash recipe, shared with the Spark-side StableHash32 that
    // built the distributed bucket totals — a drifted private copy here
    // would probe arbitrary buckets (thread-safe: fresh digest per call)
    private def bucket(r: Int, term: String): Int =
      (graft.functions.TextFunctions.stableHash32Static(s"${r}_$term") % w).toInt
    /** One-sided estimate: min over the d rows, >= the true count. */
    def estimate(term: String): Long =
      (0 until d).map(r => counters(r)(bucket(r, term))).min
  }

  /** Maintain a count-min sketch of a term stream across micro-batches.
    * Each batch aggregates DISTRIBUTED (r, bucket, cnt) partial totals
    * (an Expand over d rows, one small shuffle to ≤ d·w groups); only
    * the d×w summary reaches the driver accumulator. `onBatch` observes
    * the accumulated sketch — heavy-hitter dashboards over unbounded
    * streams with KB state. */
  def countMinSink(stream: DataFrame, termCol: String, d: Int = 3, w: Int = 2000)
                  (onBatch: (CmsState, Long) => Unit): StreamingQuery = {
    import org.apache.spark.sql.functions._
    val acc = new CmsState(d, w)
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val totals = batch
          .filter(col(termCol).isNotNull) // a null term is not a term
          .select(col(termCol).as("term"),
            explode(expr(s"sequence(0, ${d - 1})")).as("r"))
          .withColumn("bucket",
            pmod(graft.functions.TextFunctions.stableHash32(
              concat(col("r").cast("string"), lit("_"), col("term"))), lit(w)))
          .groupBy(col("r"), col("bucket")).count()
          .collect()
        var batchN = 0L
        totals.foreach { row =>
          val r = row.getInt(0)
          val c = row.getLong(2)
          acc.counters(r)(row.getLong(1).toInt) += c
          if (r == 0) batchN += c
        }
        acc.n += batchN
        onBatch(acc, id)
      }.start()
  }

  /** Maintain per-group KLL quantile sketches across micro-batches.
    * `onBatch` observes the accumulated sketches after each batch —
    * quantile dashboards over an unbounded stream with bounded state.
    */
  def quantileSink(stream: DataFrame, groupCol: String, valueCol: String)
                  (onBatch: (Map[String, KllDoublesSketch], Long) => Unit): StreamingQuery = {
    val acc = collection.mutable.HashMap.empty[String, KllDoublesSketch]
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        KllSketches.sketchesByGroup(batch, groupCol, valueCol).foreach {
          case (g, sk) =>
            acc.get(g) match {
              case Some(m) => m.merge(sk)
              case None =>
                val m = KllDoublesSketch.newHeapInstance()
                m.merge(sk)
                acc.put(g, m)
            }
        }
        onBatch(acc.toMap, id)
      }.start()
  }
}
