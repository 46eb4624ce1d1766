package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming micro-batch throughput/latency probe (round-8 verdict ask:
  * the reference is a STREAMING engine and the batch bench alone leaves
  * its continuous path unmeasured).
  *
  * Each op drives a MemoryStream through a representative §2.6 plan into
  * a noop sink: `batches` micro-batches of `batchRows` rows each, fed
  * and drained sequentially (`processAllAvailable` per batch — the
  * steady-state micro-batch cadence, not one giant backlog, so per-batch
  * latency means "latency of a batch", not "latency of the whole
  * backlog"). Reported per op: rows/s over the driven wall-clock and
  * mean per-batch trigger latency from the engine's own progress
  * metrics. MemoryStream feeds from the driver — at sf-independent row
  * volume this measures the ENGINE's per-batch overhead + stateful
  * operator cost, which is the number that transfers to a real source;
  * source I/O is the batch bench's subject.
  */
object StreamBench {

  final case class Result(name: String, rowsPerSec: Double, avgBatchMs: Double)

  private val t0 = 1700000000000L

  /** One op: build a streaming frame from the fed MemoryStream, run it
    * to a noop sink, feed+drain `batches` rounds, report throughput. */
  private def drive(spark: SparkSession, name: String, batches: Int,
                    batchRows: Int, mkRows: (Int, Int) => Seq[StreamRow],
                    plan: DataFrame => DataFrame,
                    outputMode: String): Result = {
    import spark.implicits._
    val mem = MemoryStream[StreamRow](spark)
    val df = plan(mem.toDF())
    val q: StreamingQuery = df.writeStream.format("noop")
      .outputMode(outputMode).start()
    try {
      // one warm-up batch outside the timed region: the first trigger
      // pays state-store init + codegen, which would skew a 10-batch mean
      mem.addData(mkRows(-1, batchRows))
      q.processAllAvailable()
      val s0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        mem.addData(mkRows(b, batchRows))
        q.processAllAvailable()
        b += 1
      }
      val wall = (System.nanoTime() - s0) / 1e9
      // engine-reported trigger latency for the timed batches (the
      // warm-up batch is earlier in recentProgress; take the tail)
      val prog = q.recentProgress.toSeq.takeRight(batches)
        .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toDouble))
      val avgMs = if (prog.nonEmpty) prog.sum / prog.size else -1.0
      Result(name, batches.toLong * batchRows / wall, avgMs)
    } finally q.stop()
  }

  /** Shared row shape for every probe stream: (event_id, ts, user_id,
    * event_type, value) — the events-table schema. Timestamps advance
    * ~1 s per 1000 rows within a batch and 60 s per batch, so windows
    * close and the watermark genuinely expires state as batches arrive
    * (a probe whose state only grows measures a leak, not an operator).
    */
  final case class StreamRow(event_id: Long, ts: java.sql.Timestamp,
                             user_id: Long, event_type: String, value: Double)

  private def rows(batch: Int, n: Int): Seq[StreamRow] = {
    val base = t0 + batch.toLong * 60000L
    (0 until n).map { i =>
      StreamRow(batch.toLong * n + i, new java.sql.Timestamp(base + i / 1000),
        i % 997, if (i % 3 == 0) "click" else if (i % 3 == 1) "view" else "buy",
        (i % 100) / 10.0)
    }
  }

  def run(spark: SparkSession, batches: Int = 10,
          batchRows: Int = 50000): Seq[Result] = {
    val ops: Seq[(String, DataFrame => DataFrame, String)] = Seq(
      ("tumbling_agg", df => df
        .withWatermark("ts", "2 minutes")
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v")),
        "update"),
      ("sliding_agg", df => df
        .withWatermark("ts", "2 minutes")
        .groupBy(window(col("ts"), "2 minutes", "30 seconds"), col("user_id"))
        .agg(count(lit(1)).as("cnt")),
        "update"),
      ("dedup_watermark", df => df
        .withWatermark("ts", "2 minutes")
        .dropDuplicatesWithinWatermark(Seq("user_id", "event_type")),
        "append"),
      // append, not update: Spark's session-window streaming agg only
      // emits merged sessions once the watermark closes them
      ("session_window", df => df
        .withWatermark("ts", "2 minutes")
        .groupBy(session_window(col("ts"), "45 seconds"), col("user_id"))
        .agg(count(lit(1)).as("cnt")),
        "append"))
    ops.map { case (name, plan, mode) =>
      try drive(spark, name, batches, batchRows, rows, plan, mode)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[streambench] $name failed: $e")
          Result(name, -1.0, -1.0)
      }
    }
  }

  /** Standalone entry for iterating on the probe itself. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark).foreach(r => println(
      f"${r.name}%-18s ${r.rowsPerSec}%12.0f rows/s  ${r.avgBatchMs}%8.1f ms/batch"))
    spark.stop()
  }
}
