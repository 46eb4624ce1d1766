package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming data quality — the §2.14 constraint suite attached to a LIVE
  * pipeline through `Dataset.observe`.
  *
  * Why observe() and not a second aggregation: an `observe` metric rides
  * the batch's EXISTING pass as an accumulator-style aggregate — zero
  * extra scans, zero extra stateful operators, no second sink. At 100 TB
  * of daily stream volume the monitoring must be free; a parallel
  * "metrics query" over the same topic doubles the read. The engine
  * reports the observed values per micro-batch in `QueryProgress
  * .observedMetrics`, and [[DqListener]] turns that into the same tall
  * (check_name, metric) shape the batch suite emits — per batch, with
  * the batch id attached.
  *
  * The check counters mirror the batch suite's discipline: exact integer
  * counts (never a float ratio inside the aggregate — the consumer
  * thresholds on exact numerators/denominators), NULL-safe by
  * construction (count(col) skips nulls; count(when(...)) counts only
  * matches).
  */
object StreamingQuality {

  /** The default rule set for the events stream: completeness, accepted
    * values, range conformance — counter form (exact ints). */
  def eventChecks: Seq[Column] = Seq(
    count(lit(1)).as("rows"),
    count(col("value")).as("value_nonnull"),
    count(col("user_id")).as("user_nonnull"),
    count(when(col("value") >= 0.0 && col("value") <= 100.0, 1))
      .as("value_in_range"),
    count(when(col("event_type")
      .isin("click", "view", "purchase", "signup", "error"), 1))
      .as("accepted_type"))

  /** Attach check counters to a streaming (or batch) frame. The frame's
    * data is unchanged — metrics are observation side-channel only. */
  def observed(df: DataFrame, checks: Seq[Column] = eventChecks,
               name: String = "dq"): DataFrame =
    df.observe(name, checks.head, checks.tail: _*)

  /** One micro-batch's observed check values. */
  final case class BatchMetrics(batchId: Long, metrics: Map[String, Long])

  /** Collects per-batch observed metrics for one named query. Register
    * with `spark.streams.addListener`; progress events are ASYNC — a
    * test (or an alerting consumer) polls [[collected]] after
    * `processAllAvailable`. Batches with zero input still report (all
    * counters 0) — silence is itself a freshness signal. */
  final class DqListener(queryName: String, observationName: String = "dq")
    extends StreamingQueryListener {
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[BatchMetrics]()
    def collected: Seq[BatchMetrics] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq.sortBy(_.batchId)
    }
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryIdle(
        e: StreamingQueryListener.QueryIdleEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.name == queryName) {
        Option(p.observedMetrics.get(observationName)).foreach { row =>
          // integral metrics only — a non-integral check column (an
          // avg(), say) must not throw inside the listener callback and
          // silently drop the whole batch's metrics to the bus log, so
          // anything that isn't a whole number is skipped, not coerced
          val m = row.schema.fieldNames.zipWithIndex.flatMap { case (f, i) =>
            row.get(i) match {
              case l: java.lang.Long => Some(f -> l.longValue())
              case i2: java.lang.Integer => Some(f -> i2.longValue())
              case s: java.lang.Short => Some(f -> s.longValue())
              case b: java.lang.Byte => Some(f -> b.longValue())
              case _ => None
            }
          }.toMap
          buf.add(BatchMetrics(p.batchId, m))
        }
      }
    }
  }
}
