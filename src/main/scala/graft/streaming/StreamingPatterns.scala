package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** CEP-lite event-sequence detection over a keyed stream: emit a match
  * whenever a `secondType` event follows a `firstType` event on the
  * same key within a time bound — the continuous form of the funnel /
  * as-of-join batch analytics (each match pairs the second event with
  * the LATEST qualifying first event, as-of semantics).
  *
  * State is ONE long per key (the latest first-event timestamp),
  * TTL-boundable — per-key state is independent of stream length and
  * of how many events a key produces, and the keyed shuffle is the
  * only data movement. Late/out-of-order SECOND events still match
  * (the state keeps the latest first), but a first event arriving
  * after its second cannot retro-match — the documented trade-off of
  * single-value state vs buffering the full event history.
  */
object StreamingPatterns {

  private class SeqProcessor(firstType: String, secondType: String,
                             withinMs: Long, ttl: TTLConfig)
    extends StatefulProcessor[Long, (Long, String, Long), (Long, Long, Long)] {
    @transient private var lastFirst: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastFirst = getHandle.getValueState[Long]("lastFirst", Encoders.scalaLong, ttl)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
        tv: TimerValues): Iterator[(Long, Long, Long)] = {
      val out = Seq.newBuilder[(Long, Long, Long)]
      // a micro-batch delivers a key's rows in arbitrary order — process
      // in event-time order so within-batch sequences match exactly like
      // the batch as-of join over the same data
      rows.toSeq.sortBy(_._3).foreach { case (_, et, ts) =>
        if (et == firstType) {
          if (!lastFirst.exists() || ts > lastFirst.get()) lastFirst.update(ts)
        } else if (et == secondType && lastFirst.exists()) {
          val f = lastFirst.get()
          if (ts >= f && ts - f <= withinMs) out += ((key, f, ts))
        }
      }
      out.result().iterator
    }
  }

  private class DecayProcessor(lambda: Double, ttl: TTLConfig)
    extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double)] {
    @transient private var st: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("decay",
        Encoders.product[(Long, Double)], ttl)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
        tv: TimerValues): Iterator[(Long, Long, Double)] = {
      var (t, s) = if (st.exists()) st.get() else (Long.MinValue, 0.0)
      rows.foreach { case (_, tms, x) =>
        if (t == Long.MinValue) { t = tms; s = x }
        else if (tms >= t) { s = s * math.exp(-lambda * (tms - t)) + x; t = tms }
        // late event: fold at its own decay against the current anchor —
        // the closed form is order-free, so this is exact, not an
        // approximation
        else s += x * math.exp(-lambda * (t - tms))
      }
      st.update((t, s))
      Iterator.single((key, t, s))
    }
  }

  /** Continuous time-decayed value sum per key (the streaming form of
    * the batch `q_decayed_sum` closed formula): state is ONE
    * (anchor_ts, sum) pair per key; each event either rescales the sum
    * by exp(-λΔt) (new anchor) or folds in at its own decay (late
    * arrival) — both EXACT under the order-free closed form. Emits the
    * running (user_id, t_last, decayed) per key per micro-batch. */
  def decayedSum(events: DataFrame, halfLife: java.time.Duration,
                 stateTtl: java.time.Duration = null): DataFrame = {
    import events.sparkSession.implicits._
    val lambda = math.log(2) / halfLife.toMillis.toDouble
    val ttl = Option(stateTtl).map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    events
      .select(col("user_id").cast("long"), unix_millis(col("ts")).as("tms"),
        col("value").cast("double"))
      .filter(col("user_id").isNotNull && col("tms").isNotNull
        && col("value").isNotNull)
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new DecayProcessor(lambda, ttl),
        TimeMode.None(), OutputMode.Update(),
        Encoders.product[(Long, Long, Double)])
      .toDF("user_id", "t_last", "decayed")
  }

  /** events: streaming frame with (user_id: long, event_type: string,
    * ts: timestamp). Returns (user_id, first_ts, second_ts) in epoch
    * millis, update mode. */
  def matchSequence(events: DataFrame, firstType: String, secondType: String,
                    within: java.time.Duration,
                    stateTtl: java.time.Duration = null): DataFrame = {
    import events.sparkSession.implicits._
    val ttl = Option(stateTtl).map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .filter(col("user_id").isNotNull && col("ts_ms").isNotNull)
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new SeqProcessor(firstType, secondType, within.toMillis, ttl),
        TimeMode.None(), OutputMode.Update(),
        Encoders.product[(Long, Long, Long)])
      .toDF("user_id", "first_ts", "second_ts")
  }
}
