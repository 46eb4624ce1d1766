package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}

/** Batch-to-stream state handoff: a streaming aggregation SEEDED from
  * the batch-built incremental state (Spark 4's
  * `StatefulProcessorWithInitialState`).
  *
  * This closes the loop on the `graft.operators.Incremental` family:
  * the batch IVM state ((cnt, sum_cents, max_cents) per key — exact
  * BIGINT cents, the lossless merge algebra) and the streaming runtime
  * share ONE state shape. At 100 TB the point is bootstrap cost: a new
  * continuous query starts from yesterday's batch state artifact
  * instead of replaying the topic from offset zero — the store is
  * seeded key-partition-locally on the first batch (no shuffle beyond
  * the grouped seed frame), and only the live delta streams through.
  *
  * The seeded processor maintains the IDENTICAL fold as the batch
  * merge, so `seed(batch_state) + stream(Δ) ≡ batch agg over
  * (base ∪ Δ)` — asserted key-for-key in the spec against the full
  * recompute, the same oracle discipline as the batch family.
  */
object StreamingIncremental {

  /** (cnt, sum_cents, max_cents) — the mergeable aggregate state. */
  private type AggState = (Long, Long, Long)
  /** Input: (key, cents). Output/seed row: (key, cnt, sum_cents, max_cents). */
  private type Keyed = (Long, Long, Long, Long)

  private class SeededAggProcessor(ttl: TTLConfig)
    extends StatefulProcessorWithInitialState[Long, (Long, Long), Keyed, Keyed] {
    @transient private var st: ValueState[AggState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AggState]("agg",
        Encoders.product[AggState], ttl)
    override def handleInitialState(key: Long, initial: Keyed,
        tv: TimerValues): Unit =
      st.update((initial._2, initial._3, initial._4))
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[Keyed] = {
      var (n, s, m) = if (st.exists()) st.get() else (0L, 0L, Long.MinValue)
      rows.foreach { case (_, cents) =>
        n += 1; s += cents; if (cents > m) m = cents
      }
      st.update((n, s, m))
      Iterator.single((key, n, s, m))
    }
  }

  /** Continuous per-key (count, sum, max) over `cents`, seeded from a
    * batch state frame with columns (key, cnt, sum_cents, max_cents).
    * `delta` is a streaming frame with (key: long, cents: long). Emits
    * the updated (key, cnt, sum_cents, max_cents) per key per
    * micro-batch, update mode. A non-null `stateTtl` ages idle keys out
    * of the store; Spark only honors TTL under processing-time
    * semantics, so supplying one switches the processor's time mode
    * (timers are unused either way — the fold itself is identical). */
  def seededAggregate(delta: DataFrame, initState: DataFrame,
                      stateTtl: java.time.Duration = null): DataFrame = {
    import delta.sparkSession.implicits._
    val ttl = Option(stateTtl).map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val timeMode =
      if (stateTtl == null) TimeMode.None() else TimeMode.ProcessingTime()
    val seed: Dataset[Keyed] = initState
      .select(col("key").cast("long"), col("cnt").cast("long"),
        col("sum_cents").cast("long"), col("max_cents").cast("long"))
      .as[Keyed]
    delta
      .select(col("key").cast("long"), col("cents").cast("long"))
      .filter(col("key").isNotNull && col("cents").isNotNull)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SeededAggProcessor(ttl),
        timeMode, OutputMode.Update(),
        seed.groupByKey(_._1),
        Encoders.product[Keyed], Encoders.product[Keyed])
      .toDF("key", "cnt", "sum_cents", "max_cents")
  }
}
