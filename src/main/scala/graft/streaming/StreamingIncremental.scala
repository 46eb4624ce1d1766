package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** One session interval: (first_ms, last_ms, cnt, sum_cents). */
  private type Sess = (Long, Long, Long, Long)
  /** Seed/output row: (user, first_ms, last_ms, cnt, sum_cents). */
  private type SessRow = (Long, Long, Long, Long, Long)
  /** Output row: (user, ver, first_ms, last_ms, cnt, sum_cents). */
  private type SessOut = (Long, Long, Long, Long, Long, Long)

  /** The session shape of the handoff: the batch session-IVM state
    * artifact (one interval record per materialized session — the
    * `graft.operators.Incremental.sessionStatePrepare` shape) seeds a
    * `ListState` of intervals per user, and live events repair it with
    * the SAME interval-level gaps-and-islands merge the batch
    * maintenance runs: the batch's merge-two-sessions regime (a late
    * event bridging the gap between two materialized sessions) happens
    * HERE when a streamed event lands between two seeded intervals.
    * Per-key work is |key's events in the batch| log-sorted plus the
    * key's session list — never another key's state — so the repair
    * cost scales with the touched keys only, the identical posture to
    * the batch query's broadcast-semi-join pruning.
    */
  private class SeededSessionProcessor(gapMs: Long)
    extends StatefulProcessorWithInitialState[Long, (Long, Long, Long),
      SessOut, SessRow] {
    @transient private var st: ListState[Sess] = _
    @transient private var ver: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getListState[Sess]("sessions",
        Encoders.product[Sess], TTLConfig.NONE)
      ver = getHandle.getValueState[Long]("ver",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    // one call per seed row — a user's N materialized sessions arrive
    // as N rows and accumulate in the list
    override def handleInitialState(key: Long, initial: SessRow,
        tv: TimerValues): Unit =
      st.appendValue((initial._2, initial._3, initial._4, initial._5))
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
        tv: TimerValues): Iterator[SessOut] = {
      // 1) sessionize the batch's new events alone (sorted fold)
      val evs = rows.map(r => (r._2, r._3)).toArray.sortBy(_._1)
      val fresh = scala.collection.mutable.ArrayBuffer.empty[Sess]
      evs.foreach { case (ts, cents) =>
        if (fresh.nonEmpty && ts - fresh.last._2 <= gapMs) {
          val (f, _, n, s) = fresh.last
          fresh(fresh.length - 1) = (f, ts, n + 1, s + cents)
        } else fresh += ((ts, ts, 1L, cents))
      }
      // 2) interval-level gaps-and-islands merge with the stored
      //    sessions — equivalent to re-sessionizing the raw events
      //    (every event-level gap < g is witnessed by interval
      //    adjacency), the batch maintenance's exact algebra
      val all = ((if (st.exists()) st.get().toArray else Array.empty[Sess])
        ++ fresh).sortBy(s => (s._1, s._2))
      val merged = scala.collection.mutable.ArrayBuffer.empty[Sess]
      all.foreach { case s @ (f, l, n, c) =>
        if (merged.nonEmpty && f - merged.last._2 <= gapMs) {
          val (pf, pl, pn, pc) = merged.last
          merged(merged.length - 1) = (pf, math.max(pl, l), pn + n, pc + c)
        } else merged += s
      }
      st.put(merged.toArray)
      val v = (if (ver.exists()) ver.get() else 0L) + 1L
      ver.update(v)
      // emit the key's FULL current session set, version-stamped so a
      // reader keeps only the newest emission per key (sessions can
      // merge — a per-session emission could not retract the subsumed)
      merged.iterator.map { case (f, l, n, c) => (key, v, f, l, n, c) }
    }
  }

  /** Continuous sessionization seeded from the batch session state:
    * `initState` has (user, first_ms, last_ms, cnt, sum_cents) — one
    * row per materialized session; `delta` streams (user: long,
    * ts_ms: long, cents: long). Emits the user's full repaired session
    * set per micro-batch, stamped with a per-user version `ver` —
    * filter to each user's max ver for the current view. Seed + Δ ≡
    * re-sessionizing base ∪ Δ (the spec's oracle). */
  def seededSessionize(delta: DataFrame, initState: DataFrame,
                       gapMs: Long): DataFrame = {
    import delta.sparkSession.implicits._
    val seed: Dataset[SessRow] = initState
      .select(col("user").cast("long"), col("first_ms").cast("long"),
        col("last_ms").cast("long"), col("cnt").cast("long"),
        col("sum_cents").cast("long"))
      .as[SessRow]
    delta
      .select(col("user").cast("long"), col("ts_ms").cast("long"),
        col("cents").cast("long"))
      .filter(col("user").isNotNull && col("ts_ms").isNotNull)
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SeededSessionProcessor(gapMs),
        TimeMode.None(), OutputMode.Update(),
        seed.groupByKey(_._1),
        Encoders.product[SessOut], Encoders.product[SessRow])
      .toDF("user", "ver", "first_ms", "last_ms", "cnt", "sum_cents")
  }

  /** Pane state: (cnt, sum_cents). */
  private type PaneState = (Long, Long)
  /** Pane key: (window_start_ms, group). */
  private type PaneKey = (Long, String)
  /** Seed/output row: (ws, grp, cnt, sum_cents). */
  private type PaneRow = (Long, String, Long, Long)

  /** The windowed (tumbling/hopping) shape of the handoff: identical
    * fold to [[SeededAggProcessor]] but keyed by the COMPOSITE
    * (pane start, group) — the session case needed new algebra
    * (interval repair), the windowed case is pure key plumbing: a pane
    * is just an aggregate key derived from the timestamp, so the
    * flat mergeable-partial fold applies unchanged. One ValueState row
    * per live pane; at 100 TB the store holds |panes in retention| ×
    * |groups| rows, never events.
    */
  private class SeededPaneProcessor
    extends StatefulProcessorWithInitialState[PaneKey, PaneRow, PaneRow,
      PaneRow] {
    @transient private var st: ValueState[PaneState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PaneState]("pane",
        Encoders.product[PaneState], TTLConfig.NONE)
    override def handleInitialState(key: PaneKey, initial: PaneRow,
        tv: TimerValues): Unit =
      st.update((initial._3, initial._4))
    override def handleInputRows(key: PaneKey, rows: Iterator[PaneRow],
        tv: TimerValues): Iterator[PaneRow] = {
      var (n, s) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { r => n += 1; s += r._4 }
      st.update((n, s))
      Iterator.single((key._1, key._2, n, s))
    }
  }

  /** Continuous windowed (count, sum_cents) per (pane, group), seeded
    * from the batch window-IVM state (the
    * `graft.operators.Incremental.hoppingStatePrepare` /
    * `windowStatePrepare` artifact shape: one (ws, grp, cnt, sum_cents)
    * partial per pane). `delta` streams (ts_ms: long, grp: string,
    * cents: long); each event fans out to its size/advance panes
    * (1 for tumbling, where `advanceMs == sizeMs`) BEFORE the keyed
    * fold — the same pane replication the batch maintenance and
    * KSQL/Flink hopping windows do, so the replication factor
    * multiplies the delta only, never the seeded history. Emits the
    * updated (ws, we, grp, cnt, sum_cents) per touched pane per
    * micro-batch, update mode — `cnt` is monotone per pane, so a
    * reader keeps each key's max-cnt emission for the current view.
    * Seed + Δ ≡ re-windowing base ∪ Δ (the spec's oracle, same
    * discipline as the batch family). */
  def seededWindowedAggregate(delta: DataFrame, initState: DataFrame,
                              sizeMs: Long,
                              advanceMs: Long): DataFrame = {
    require(sizeMs > 0 && advanceMs > 0 && sizeMs % advanceMs == 0,
      s"size ($sizeMs ms) must be a positive multiple of advance " +
        s"($advanceMs ms) — the KSQL hopping contract")
    import delta.sparkSession.implicits._
    val panes = (sizeMs / advanceMs).toInt
    val seed: Dataset[PaneRow] = initState
      .select(col("ws").cast("long"), col("grp").cast("string"),
        col("cnt").cast("long"), col("sum_cents").cast("long"))
      .as[PaneRow]
    delta
      .select(col("ts_ms").cast("long"), col("grp").cast("string"),
        col("cents").cast("long"))
      .filter(col("ts_ms").isNotNull && col("grp").isNotNull)
      // pane fan-out on the advance grid, newest pane first: ws =
      // floor(ts/adv)·adv − i·adv for i < size/adv — integer division
      // on epoch millis, the exact grid the batch ops and the DuckDB
      // oracles use
      .withColumn("ws", explode(expr(
        // FLOOR division, not `div` (truncation toward zero): a
        // pre-1970 event (negative epoch millis) must land on the same
        // pane grid Spark's window()/the batch state use, or the merged
        // view diverges from the re-window for pre-epoch feeds
        s"transform(sequence(0, ${panes - 1}), " +
          s"i -> ((ts_ms div $advanceMs) - (CASE WHEN ts_ms % $advanceMs < 0" +
          s" THEN 1 ELSE 0 END)) * $advanceMs - i * $advanceMs)")))
      .select(col("ws").cast("long"), col("grp"), lit(1L).as("one"),
        col("cents"))
      .as[PaneRow]
      .groupByKey(r => (r._1, r._2))
      .transformWithState(new SeededPaneProcessor,
        TimeMode.None(), OutputMode.Update(),
        seed.groupByKey(r => (r._1, r._2)),
        Encoders.product[PaneRow], Encoders.product[PaneRow])
      .toDF("ws", "grp", "cnt", "sum_cents")
      .select(col("ws"), (col("ws") + lit(sizeMs)).as("we"), col("grp"),
        col("cnt"), col("sum_cents"))
  }

  /** Seed row: (grp, dv, dn) — one counted pair. */
  private type PairSeed = (String, Long, Long)
  /** Input row: (grp, dv, w) — w = +1 insert / −1 CDC retraction. */
  private type PairIn = (String, Long, Long)
  /** Output row: (grp, n_distinct). */
  private type DistinctOut = (String, Long)

  /** The COUNT(DISTINCT) shape of the handoff, retraction-capable: the
    * batch MULTIPLICITY-CARRYING pair state (the
    * `graft.plans.MaterializedViews` countedPairs artifact — one
    * (group, value, count) row per pair) seeds a per-group
    * `MapState[value → count]`, and live rows carry a WEIGHT: +1
    * inserts, −1 CDC retractions — counts subtract exactly, a pair
    * reaching zero leaves the map, and the per-group distinct count is
    * maintained INCREMENTALLY in a ValueState (+1 on 0→positive, −1 on
    * positive→0), so each emission is O(touched rows), never
    * O(|group's pairs|). Retracting below zero fails loudly — the same
    * contract violation the batch refresh refuses (deleting rows the
    * state never counted poisons the adjacent counts too). At 100 TB
    * the store holds the distinct pairs (the information-theoretic
    * minimum for an exact retractable answer); only the delta streams.
    */
  private class SeededDistinctProcessor
    extends StatefulProcessorWithInitialState[String, PairIn, DistinctOut,
      PairSeed] {
    @transient private var counts: MapState[Long, Long] = _
    @transient private var nd: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[Long, Long]("pairs",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      nd = getHandle.getValueState[Long]("nd",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    // one call per seed row: a group's pairs arrive as N rows; every
    // seeded count is ≥ 1 by the batch-refresh contract, so each adds
    // one distinct value
    override def handleInitialState(key: String, initial: PairSeed,
        tv: TimerValues): Unit = {
      counts.updateValue(initial._2, initial._3)
      nd.update((if (nd.exists()) nd.get() else 0L) + 1L)
    }
    override def handleInputRows(key: String, rows: Iterator[PairIn],
        tv: TimerValues): Iterator[DistinctOut] = {
      var n = if (nd.exists()) nd.get() else 0L
      rows.foreach { case (_, dv, w) =>
        val cur = if (counts.containsKey(dv)) counts.getValue(dv) else 0L
        val nxt = cur + w
        if (nxt < 0L) throw new IllegalStateException(
          s"pair (group=$key, value=$dv) retracted below zero — the " +
            "retraction stream deleted rows the state never counted")
        if (cur == 0L && nxt > 0L) n += 1L
        if (cur > 0L && nxt == 0L) { n -= 1L; counts.removeKey(dv) }
        else if (nxt > 0L) counts.updateValue(dv, nxt)
      }
      nd.update(n)
      Iterator.single((key, n))
    }
  }

  /** Continuous retraction-capable COUNT(DISTINCT dv) per group, seeded
    * from the batch counted-pair artifact (`initState` columns: grp,
    * dv, dn — the countedPairs state shape). `delta` streams (grp:
    * string, dv: long, w: long) where w = +1 for inserts and −1 for
    * CDC retractions. Emits the group's updated distinct count per
    * micro-batch, update mode — keep each group's LATEST emission.
    * Seed + Δ ≡ count(DISTINCT) over (base ∪ inserts − retractions),
    * the spec's oracle — the streaming continuation of
    * `q_mv_distinct_delete`'s batch refresh. */
  def seededDistinctCount(delta: DataFrame, initState: DataFrame): DataFrame = {
    import delta.sparkSession.implicits._
    val seed: Dataset[PairSeed] = initState
      .select(col("grp").cast("string"), col("dv").cast("long"),
        col("dn").cast("long"))
      .as[PairSeed]
    delta
      .select(col("grp").cast("string"), col("dv").cast("long"),
        col("w").cast("long"))
      .filter(col("grp").isNotNull && col("dv").isNotNull)
      .as[PairIn]
      .groupByKey(_._1)
      .transformWithState(new SeededDistinctProcessor,
        TimeMode.None(), OutputMode.Update(),
        seed.groupByKey(_._1),
        Encoders.product[DistinctOut], Encoders.product[PairSeed])
      .toDF("grp", "n_distinct")
  }

  /** One seeded-view row: (encoded key, per-agg accumulators, per-agg
    * presence flags — 1 when the slot holds a real value, 0 when the
    * aggregate is empty-so-far and must surface as NULL). */
  private type ViewRow = (String, Array[Long], Array[Long])

  /** The GENERIC shape of the handoff — the streaming continuation of a
    * registered materialized view (`graft.plans.MaterializedViews`): one
    * (accumulator, presence) slot pair per registered aggregate, folded
    * by the view's own merge kind (COUNT/SUM add, MIN/MAX compare). The
    * presence flag carries SQL null semantics exactly: a SUM/MIN/MAX
    * over zero non-null inputs is NULL, and the seed (the batch-served
    * answer) may already carry such a NULL — so presence, not a
    * sentinel value, distinguishes "empty" from "accumulated zero".
    * COUNT ignores presence (count of nothing is 0, never NULL).
    */
  private class SeededViewProcessor(kinds: Array[String])
    extends StatefulProcessorWithInitialState[String, ViewRow, ViewRow,
      ViewRow] {
    @transient private var st: ValueState[(Array[Long], Array[Long])] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Array[Long], Array[Long])]("view",
        Encoders.product[(Array[Long], Array[Long])], TTLConfig.NONE)
    override def handleInitialState(key: String, initial: ViewRow,
        tv: TimerValues): Unit =
      st.update((initial._2, initial._3))
    override def handleInputRows(key: String, rows: Iterator[ViewRow],
        tv: TimerValues): Iterator[ViewRow] = {
      val (acc, pres) =
        if (st.exists()) st.get()
        else (Array.fill(kinds.length)(0L), Array.fill(kinds.length)(0L))
      rows.foreach { case (_, v, p) =>
        var i = 0
        while (i < kinds.length) {
          val has = p(i) == 1L
          kinds(i) match {
            case "count" => acc(i) += v(i) // contribution is 0/1 already
            case "sum" => if (has) { acc(i) += v(i); pres(i) = 1L }
            case "min" => if (has) {
              if (pres(i) == 0L || v(i) < acc(i)) acc(i) = v(i)
              pres(i) = 1L
            }
            case _ => if (has) { // max
              if (pres(i) == 0L || v(i) > acc(i)) acc(i) = v(i)
              pres(i) = 1L
            }
          }
          i += 1
        }
      }
      st.update((acc, pres))
      Iterator.single((key, acc, pres))
    }
  }

  /** NULL group keys survive the string keying via a marker no cast can
    * produce (a control byte); decoded back to a real NULL on output. */
  private val NullKeyMarker = "\u0000"
  /** Separator between the parts of a COMPOSITE group key — another
    * control byte, so multi-column keys (pane × group, compound
    * business keys) ride the same string-keyed store. A real key value
    * containing \u0001 is adversarial input; documented, not defended. */
  private val KeyPartSep = "\u0001"

  /** The continuous serving half of a registered materialized view (the
    * ksqlDB TABLE push query): `seed` is the view's BATCH-SERVED answer
    * — merge(state ∪ Δ), exactly what the transparent rewrite serves a
    * pull query — and `delta` is the live stream the view's LIVE
    * binding names. Per event, each registered aggregate receives its
    * contribution (`contribs`, one per agg: the non-null witness for
    * COUNT, the argument for SUM/MIN/MAX) and the per-key fold
    * continues the registered merge algebra, so at any micro-batch
    * boundary a key's LATEST emission ≡ the batch answer over
    * (base ∪ live-so-far) — the topic is never replayed, the state
    * artifact is read once into the store seed. Output columns and
    * types mirror the seed frame (the view's serving schema); group
    * keys restricted to ONE column of string/integral type and
    * aggregates to the view's integral-partial discipline — both
    * enforced by the caller at BIND time, with loud refusals. */
  def seededViewAggregate(delta: DataFrame, seed: DataFrame,
                          keyName: String, keyExpr: Column,
                          contribs: Seq[Column],
                          kinds: Seq[String]): DataFrame =
    seededViewAggregate(delta, seed, Seq(keyName), Seq(keyExpr),
      contribs, kinds)

  /** Composite-key form: `keyNames` are the seed's group columns (in
    * order) and `keyExprs` the matching per-event expressions over the
    * live stream. Parts string-encode (NULLs via the marker) and join
    * on a control-byte separator into ONE store key; outputs decode
    * back to the original columns and types. */
  def seededViewAggregate(delta: DataFrame, seed: DataFrame,
                          keyNames: Seq[String], keyExprs: Seq[Column],
                          contribs: Seq[Column],
                          kinds: Seq[String]): DataFrame = {
    import delta.sparkSession.implicits._
    require(contribs.length == kinds.length, "one contribution per kind")
    require(keyNames.nonEmpty && keyNames.length == keyExprs.length,
      "one live expression per key column")
    val outNames = seed.columns.filterNot(keyNames.contains).toSeq
    require(outNames.length == kinds.length,
      s"seed carries ${outNames.length} aggregate columns for " +
        s"${kinds.length} kinds")
    val keyTypes = keyNames.map(n => seed.schema(n).dataType)
    val outTypes = outNames.map(n => seed.schema(n).dataType)
    def encPart(c: Column): Column =
      when(c.isNull, lit(NullKeyMarker)).otherwise(c.cast("string"))
    def encKey(parts: Seq[Column]): Column =
      concat_ws(KeyPartSep, parts.map(encPart): _*)
    val seedRows = seed.select(
      encKey(keyNames.map(col)).as("k"),
      array(outNames.map(n => coalesce(col(n).cast("long"), lit(0L))): _*)
        .as("v"),
      array(outNames.map(n =>
        when(col(n).isNotNull, 1L).otherwise(0L)): _*).as("p"))
      .as[ViewRow]
    val deltaRows = delta.select(
      encKey(keyExprs).as("k"),
      array(contribs.zip(kinds).map {
        case (c, "count") => when(c.isNotNull, 1L).otherwise(0L)
        case (c, _) => coalesce(c.cast("long"), lit(0L))
      }: _*).as("v"),
      array(contribs.map(c =>
        when(c.isNotNull, 1L).otherwise(0L)): _*).as("p"))
      .as[ViewRow]
    deltaRows
      .groupByKey(_._1)
      .transformWithState(new SeededViewProcessor(kinds.toArray),
        TimeMode.None(), OutputMode.Update(),
        seedRows.groupByKey(_._1),
        Encoders.product[ViewRow], Encoders.product[ViewRow])
      .toDF("k", "v", "p")
      .select(
        keyNames.zipWithIndex.map { case (n, i) =>
          val part = element_at(split(col("k"), KeyPartSep, -1), i + 1)
          when(part === lit(NullKeyMarker), lit(null))
            .otherwise(part).cast(keyTypes(i)).as(n)
        } ++
        outNames.zipWithIndex.map { case (n, i) =>
          val acc = element_at(col("v"), i + 1)
          val pres = element_at(col("p"), i + 1)
          (if (kinds(i) == "count") acc
           else when(pres === 1L, acc).otherwise(lit(null)))
            .cast(outTypes(i)).as(n)
        }: _*)
  }

  /** One generic session interval: (first_ms, last_ms, accumulators,
    * presence) — the SessV of the seeded SESSION-VIEW continuation. */
  private type SessV = (Long, Long, Array[Long], Array[Long])
  /** Seed row: (encoded key, first_ms, last_ms, acc, pres). */
  private type SessVRow = (String, Long, Long, Array[Long], Array[Long])
  /** Live input row: (encoded key, ts_ms, contribs, presence). */
  private type SessVIn = (String, Long, Array[Long], Array[Long])
  /** Output row: (encoded key, ver, first_ms, last_ms, acc, pres). */
  private type SessVOut = (String, Long, Long, Long, Array[Long],
    Array[Long])

  /** The SESSION shape of the generic view handoff: per key a
    * `ListState` of interval records (first, last, one (accumulator,
    * presence) slot pair per registered aggregate), seeded from the
    * view's BATCH-SERVED session set. Live events sessionize locally
    * per micro-batch (sorted fold), then interval-merge with the stored
    * sessions — the q_incr_session gaps-and-islands algebra, so a live
    * event can EXTEND a stored session or BRIDGE two into one. Because
    * event contributions encode exactly like interval partials (COUNT →
    * its 0/1 witness, SUM/MIN/MAX → the value with a presence flag),
    * ONE merge function serves both event-into-interval and
    * interval-into-interval folds. Emissions carry the key's FULL
    * current session set, version-stamped — sessions can merge, so a
    * per-session emission could not retract the subsumed; readers keep
    * each key's max-`__ver` emission. Per-key work is |key's batch
    * events| log-sorted + the key's own session list, never another
    * key's state. */
  private class SeededSessionViewProcessor(gapMs: Long,
      kinds: Array[String])
    extends StatefulProcessorWithInitialState[String, SessVIn, SessVOut,
      SessVRow] {
    @transient private var st: ListState[SessV] = _
    @transient private var ver: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getListState[SessV]("sessions",
        Encoders.product[SessV], TTLConfig.NONE)
      ver = getHandle.getValueState[Long]("ver",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    /** Merge (v, p) into (acc, pres) slot-wise by kind. COUNT slots add
      * their witnesses unconditionally (count of empty = 0, always
      * "present"); SUM adds present values; MIN/MAX compare present
      * values, adopting the first present one. */
    private def mergeInto(acc: Array[Long], pres: Array[Long],
        v: Array[Long], p: Array[Long]): Unit = {
      var i = 0
      while (i < kinds.length) {
        kinds(i) match {
          case "count" => acc(i) += v(i); pres(i) = 1L
          case "sum" => if (p(i) == 1L) { acc(i) += v(i); pres(i) = 1L }
          case "min" => if (p(i) == 1L) {
            if (pres(i) == 0L || v(i) < acc(i)) acc(i) = v(i)
            pres(i) = 1L
          }
          case _ => if (p(i) == 1L) { // max
            if (pres(i) == 0L || v(i) > acc(i)) acc(i) = v(i)
            pres(i) = 1L
          }
        }
        i += 1
      }
    }
    override def handleInitialState(key: String, initial: SessVRow,
        tv: TimerValues): Unit =
      st.appendValue((initial._2, initial._3, initial._4, initial._5))
    override def handleInputRows(key: String, rows: Iterator[SessVIn],
        tv: TimerValues): Iterator[SessVOut] = {
      // 1) sessionize the batch's events alone (sorted fold), folding
      //    each event's contribution vector as it lands
      val evs = rows.toArray.sortBy(_._2)
      val fresh = scala.collection.mutable.ArrayBuffer.empty[SessV]
      evs.foreach { case (_, ts, v, p) =>
        if (fresh.nonEmpty && ts - fresh.last._2 <= gapMs) {
          val (f, _, acc, pres) = fresh.last
          mergeInto(acc, pres, v, p)
          fresh(fresh.length - 1) = (f, ts, acc, pres)
        } else {
          val acc = Array.fill(kinds.length)(0L)
          val pres = Array.fill(kinds.length)(0L)
          mergeInto(acc, pres, v, p)
          fresh += ((ts, ts, acc, pres))
        }
      }
      // 2) interval-level gaps-and-islands merge with the stored
      //    sessions — ≡ re-sessionizing the raw events
      val all = ((if (st.exists()) st.get().toArray else Array.empty[SessV])
        ++ fresh).sortBy(s => (s._1, s._2))
      val merged = scala.collection.mutable.ArrayBuffer.empty[SessV]
      all.foreach { case s @ (f, l, v, p) =>
        if (merged.nonEmpty && f - merged.last._2 <= gapMs) {
          val (pf, pl, acc, pres) = merged.last
          mergeInto(acc, pres, v, p)
          merged(merged.length - 1) = (pf, math.max(pl, l), acc, pres)
        } else merged += s
      }
      st.put(merged.toArray)
      val nv = (if (ver.exists()) ver.get() else 0L) + 1L
      ver.update(nv)
      merged.iterator.map { case (f, l, v, p) => (key, nv, f, l, v, p) }
    }
  }

  /** The continuous serving half of a SESSION materialized view (the
    * push query over `CREATE … WINDOW SESSION … WITH (LIVE=…)`): `seed`
    * is the view's batch-served SESSION SET — the interval repair of
    * state ∪ Δ, exactly what the named pull serves — with columns
    * keys…, `__first_ms`, `__last_ms`, then the aggregate partials.
    * Live events key-encode like [[seededViewAggregate]] (composite
    * string keys, NULL markers), carry their event-time millis via
    * `tsExpr`, and fold through [[SeededSessionViewProcessor]]'s
    * interval repair. Output: the serving schema (keys, aggregates,
    * WINDOWSTART/WINDOWEND) plus `__ver` — sessions can merge, so
    * readers keep each key's max-`__ver` emission as the current view. */
  def seededSessionView(delta: DataFrame, seed: DataFrame, gapMs: Long,
                        keyNames: Seq[String], keyExprs: Seq[Column],
                        tsExpr: Column, contribs: Seq[Column],
                        kinds: Seq[String]): DataFrame = {
    import delta.sparkSession.implicits._
    require(contribs.length == kinds.length, "one contribution per kind")
    require(keyNames.nonEmpty && keyNames.length == keyExprs.length,
      "one live expression per key column")
    val outNames = seed.columns
      .filterNot(keyNames.contains)
      .filterNot(Set("__first_ms", "__last_ms")).toSeq
    require(outNames.length == kinds.length,
      s"seed carries ${outNames.length} aggregate columns for " +
        s"${kinds.length} kinds")
    val keyTypes = keyNames.map(n => seed.schema(n).dataType)
    val outTypes = outNames.map(n => seed.schema(n).dataType)
    def encPart(c: Column): Column =
      when(c.isNull, lit(NullKeyMarker)).otherwise(c.cast("string"))
    def encKey(parts: Seq[Column]): Column =
      concat_ws(KeyPartSep, parts.map(encPart): _*)
    val seedRows = seed.select(
      encKey(keyNames.map(col)).as("k"),
      col("__first_ms").cast("long").as("f"),
      col("__last_ms").cast("long").as("l"),
      array(outNames.map(n => coalesce(col(n).cast("long"), lit(0L))): _*)
        .as("v"),
      array(outNames.map(n =>
        when(col(n).isNotNull, 1L).otherwise(0L)): _*).as("p"))
      .as[SessVRow]
    val deltaRows = delta.select(
      encKey(keyExprs).as("k"),
      tsExpr.cast("long").as("ts"),
      array(contribs.zip(kinds).map {
        case (c, "count") => when(c.isNotNull, 1L).otherwise(0L)
        case (c, _) => coalesce(c.cast("long"), lit(0L))
      }: _*).as("v"),
      array(contribs.map(c =>
        when(c.isNotNull, 1L).otherwise(0L)): _*).as("p"))
      .filter(col("ts").isNotNull)
      .as[SessVIn]
    deltaRows
      .groupByKey(_._1)
      .transformWithState(
        new SeededSessionViewProcessor(gapMs, kinds.toArray),
        TimeMode.None(), OutputMode.Update(),
        seedRows.groupByKey(_._1),
        Encoders.product[SessVOut], Encoders.product[SessVRow])
      .toDF("k", "ver", "f", "l", "v", "p")
      .select(
        keyNames.zipWithIndex.map { case (n, i) =>
          val part = element_at(split(col("k"), KeyPartSep, -1), i + 1)
          when(part === lit(NullKeyMarker), lit(null))
            .otherwise(part).cast(keyTypes(i)).as(n)
        } ++
        outNames.zipWithIndex.map { case (n, i) =>
          val acc = element_at(col("v"), i + 1)
          val pres = element_at(col("p"), i + 1)
          (if (kinds(i) == "count") acc
           else when(pres === 1L, acc).otherwise(lit(null)))
            .cast(outTypes(i)).as(n)
        } ++ Seq(
          col("f").as("windowstart"),
          (col("l") + lit(gapMs)).as("windowend"),
          col("ver").as("__ver")): _*)
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
