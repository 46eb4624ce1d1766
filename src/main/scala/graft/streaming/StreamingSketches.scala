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
