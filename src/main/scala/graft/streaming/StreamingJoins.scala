package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming TABLE-TABLE joins. The headline operator is the
  * FOREIGN-KEY join (ksqlDB 0.19+): a left TABLE joins a right TABLE on
  * a NON-KEY left column, so a single right-side update must fan out to
  * every left row pointing at it, and a left row UPDATING ITS FK must
  * retract from the old key's output and upsert under the new one.
  *
  * ksqlDB implements this with a subscription store + a re-key hop over
  * internal topics; the Spark-first expression is ONE stateful operator
  * keyed by the RIGHT key: the left changelog carries each row's
  * PREVIOUS fk (exactly what a table changelog knows — ksqlDB reads the
  * same from its state store), a stateless fan-out turns an fk move
  * into (−1 at prev_fk, +1 at fk), and the keyed state holds the
  * right side's latest value plus the set of left rows currently
  * subscribed to that key. State is |left rows| + |right keys| — the
  * same footprint as ksqlDB's stores — and every emission is O(affected
  * rows): a right update touches its subscribers only, a left move
  * touches two keys.
  */
object StreamingJoins {

  /** Tagged, fanned-out input row: (key, side, l_pk, l_val, r_val, off)
    * where side 0 = left upsert, 1 = left retract, 2 = right update
    * (null r_val = right delete). Keys and l_pk travel as STRINGS —
    * the PRIMARY KEY's string form is injective for every atomic key
    * type, so string-keyed tables (ksqlDB's common VARCHAR ids) join
    * without a BIGINT bound; callers cast back to the declared type. */
  private type FkIn = (String, Int, String, String, String, Long)
  /** Output changelog row: (l_pk, fk, l_val, r_val, deleted, off). A
    * reader materializes the join as: per l_pk keep the max-offset
    * emission, preferring the non-deleted one on an equal offset (the
    * retract half of an fk move carries the same offset as its
    * upsert half, and the upsert reflects the newer state). */
  private type FkOut = (String, String, String, String, Boolean, Long)

  /** `leftOuter = false`: INNER — a left row emits only while its key
    * has a right value; a right delete retracts the subscribers.
    * `leftOuter = true`: LEFT — a left row ALWAYS emits (null r_val
    * while unmatched, ksqlDB's LEFT FK join), and a right delete
    * re-emits the subscribers unmatched instead of retracting them. */
  private class FkJoinProcessor(leftOuter: Boolean)
    extends StatefulProcessor[String, FkIn, FkOut] {
    @transient private var right: ValueState[String] = _
    @transient private var lefts: MapState[String, String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      right = getHandle.getValueState[String]("right",
        Encoders.STRING, TTLConfig.NONE)
      lefts = getHandle.getMapState[String, String]("lefts",
        Encoders.STRING, Encoders.STRING, TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[FkIn],
        tv: TimerValues): Iterator[FkOut] = {
      val out = Seq.newBuilder[FkOut]
      // fold in OFFSET order: a micro-batch may deliver several
      // changelog records for one key, and TABLE semantics are
      // last-write-wins by offset
      rows.toArray.sortBy(_._6).foreach {
        case (_, 0, lPk, lVal, _, off) => // left upsert under this fk
          lefts.updateValue(lPk, lVal)
          if (right.exists())
            out += ((lPk, key, lVal, right.get(), false, off))
          else if (leftOuter)
            out += ((lPk, key, lVal, null, false, off))
        case (_, 1, lPk, _, _, off) => // left retract (fk move / delete)
          if (lefts.containsKey(lPk)) lefts.removeKey(lPk)
          out += ((lPk, key, null, null, true, off))
        case (_, 2, _, _, rVal, off) if rVal != null => // right update
          right.update(rVal)
          lefts.iterator().foreach { case (lPk, lVal) =>
            out += ((lPk, key, lVal, rVal, false, off))
          }
        case (_, _, _, _, _, off) => // right delete
          if (right.exists()) right.clear()
          lefts.iterator().foreach { case (lPk, lVal) =>
            // INNER: subscribers unmatch (retract); LEFT: they stay,
            // re-emitted with a null right side
            if (leftOuter) out += ((lPk, key, lVal, null, false, off))
            else out += ((lPk, key, null, null, true, off))
          }
      }
      out.result().iterator
    }
  }

  /** Stream-row or table-changelog record for the STREAM⋈TABLE join:
    * (key, side 0=stream/1=table, s_val, r_val, off). */
  private type StIn = (String, Int, String, String, Long)
  /** Output FACT: (key, s_val, r_val, off) — append semantics, never
    * retracted. */
  private type StOut = (String, String, String, Long)

  private class StreamTableJoinProcessor(leftOuter: Boolean)
    extends StatefulProcessor[String, StIn, StOut] {
    @transient private var right: ValueState[String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      right = getHandle.getValueState[String]("right",
        Encoders.STRING, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[StIn],
        tv: TimerValues): Iterator[StOut] = {
      val out = Seq.newBuilder[StOut]
      // fold in OFFSET order (the shared event-time domain): a stream
      // fact joins the table state AS OF its position — the ksqlDB
      // timestamp-synchronization contract within a micro-batch
      rows.toArray.sortBy(_._5).foreach {
        case (_, 0, sVal, _, off) => // stream fact
          if (right.exists()) out += ((key, sVal, right.get(), off))
          else if (leftOuter) out += ((key, sVal, null, off))
        case (_, _, _, rVal, _) => // table upsert / delete (null)
          if (rVal == null) { if (right.exists()) right.clear() }
          else right.update(rVal)
      }
      out.result().iterator
    }
  }

  /** STREAM ⋈ TABLE join with a LIVE table side — ksqlDB's stream-table
    * join when the table is itself a changelog still flowing. Each
    * stream row is an immutable FACT that joins the table's state AS OF
    * its fold position: a later table update affects only later facts —
    * nothing retracts (the key contrast with [[fkTableJoin]]'s
    * subscription store, where output rows are table rows and must
    * retract). State is |table keys| only; stream rows pass through.
    *
    * `streamRows` columns: `key` (the join column, any atomic type —
    * stored by its string form;
    * NULL-keyed rows drop under INNER and emit unmatched under LEFT),
    * `s_val`, `off`. `tableChangelog` columns: `pk`, `r_val`
    * (null = delete), `off` — offsets share a domain (each side's
    * declared event time). Emits (key, s_val, r_val, off); INNER drops
    * unmatched facts, LEFT emits them with a null right side. */
  def streamTableJoin(streamRows: DataFrame, tableChangelog: DataFrame,
                      joinType: String = "inner"): DataFrame = {
    import streamRows.sparkSession.implicits._
    val leftOuter = joinType match {
      case "inner" => false
      case "left" => true
      case t => throw new IllegalArgumentException(
        s"stream-table joins are INNER or LEFT (ksqlDB) — got $t")
    }
    val sSide = streamRows.filter(col("key").isNotNull).select(
      col("key").cast("string"), lit(0).as("side"),
      col("s_val").cast("string"),
      lit(null).cast("string").as("r_val"), col("off").cast("long"))
    val tSide = tableChangelog.filter(col("pk").isNotNull).select(
      col("pk").cast("string").as("key"), lit(1).as("side"),
      lit(null).cast("string").as("s_val"),
      col("r_val").cast("string"), col("off").cast("long"))
    val joined = sSide.unionByName(tSide)
      .as[StIn]
      .groupByKey(_._1)
      .transformWithState(new StreamTableJoinProcessor(leftOuter),
        TimeMode.None(), OutputMode.Update(), Encoders.product[StOut])
      .toDF("key", "s_val", "r_val", "off")
    if (!leftOuter) joined
    else joined.unionByName(
      // NULL-keyed facts match nothing, ever — they bypass the store
      streamRows.filter(col("key").isNull).select(
        lit(null).cast("string").as("key"), col("s_val").cast("string"),
        lit(null).cast("string").as("r_val"), col("off").cast("long")))
  }

  /** FK TABLE-TABLE join (inner), streaming form.
    *
    * `leftChangelog` columns: `l_pk` (the left table's key), `fk` (the
    * CURRENT foreign key, nullable — null subscribes nowhere), `prev_fk`
    * (the row's previous fk, nullable — what the table's own changelog
    * knows; null for a first insert), `l_val`, `off` (changelog offset,
    * monotone per l_pk). `rightChangelog` columns: `pk`, `r_val`
    * (null = delete), `off`.
    *
    * Emits the join CHANGELOG (l_pk, fk, l_val, r_val, deleted, off) in
    * update mode; materialize per l_pk by max offset, non-deleted
    * preferred on ties (see [[FkJoinProcessor]]). Batch equivalence:
    * latest-left ⋈ latest-right on fk = pk — the spec's oracle. */
  def fkTableJoin(leftChangelog: DataFrame,
                  rightChangelog: DataFrame,
                  joinType: String = "inner"): DataFrame = {
    import leftChangelog.sparkSession.implicits._
    val leftOuter = joinType match {
      case "inner" => false
      case "left" => true
      case t => throw new IllegalArgumentException(
        s"FK TABLE-TABLE joins are INNER or LEFT (ksqlDB 0.19) — got $t")
    }
    val lc = leftChangelog.select(
      col("l_pk").cast("string"), col("fk").cast("string"),
      col("prev_fk").cast("string"), col("l_val").cast("string"),
      col("off").cast("long"))
    // stateless fan-out: an fk move becomes a retract at prev_fk and an
    // upsert at fk (same offset, the upsert the newer truth); inserts
    // fan to one row, fk-stable updates to a retract+upsert at the same
    // key, which the in-order fold collapses correctly
    val leftUpserts = lc.filter(col("fk").isNotNull).select(
      col("fk").as("key"), lit(0).as("side"), col("l_pk"),
      col("l_val"), lit(null).cast("string").as("r_val"), col("off"))
    val leftRetracts = lc.filter(col("prev_fk").isNotNull &&
      !(col("prev_fk") <=> col("fk"))).select(
      col("prev_fk").as("key"), lit(1).as("side"), col("l_pk"),
      lit(null).cast("string").as("l_val"),
      lit(null).cast("string").as("r_val"), col("off"))
    val rightUpdates = rightChangelog.filter(col("pk").isNotNull).select(
      col("pk").cast("string").as("key"), lit(2).as("side"),
      lit(null).cast("string").as("l_pk"),
      lit(null).cast("string").as("l_val"),
      col("r_val").cast("string"), col("off").cast("long"))
    val joined = leftUpserts.unionByName(leftRetracts)
      .unionByName(rightUpdates)
      .as[FkIn]
      .groupByKey(_._1)
      .transformWithState(new FkJoinProcessor(leftOuter), TimeMode.None(),
        OutputMode.Update(), Encoders.product[FkOut])
      .toDF("l_pk", "fk", "l_val", "r_val", "deleted", "off")
    if (!leftOuter) joined
    else {
      // LEFT keeps alive rows whose fk is NULL: they subscribe nowhere
      // (no right key can ever match NULL), so they bypass the store
      // statelessly as unmatched emissions. A later fk move to a real
      // key emits through the store under the higher offset; a move
      // back to NULL pairs this emission with the retract at prev_fk
      // (same offset — the reader's non-deleted-on-ties rule keeps the
      // unmatched row). A DELETE (null l_val) whose previous fk was a
      // real key retracts through the store; one whose previous fk was
      // NULL never subscribed anywhere, so its tombstone emits here
      // statelessly (deleted = l_val IS NULL).
      val nullFk = lc.filter(col("fk").isNull &&
          (col("l_val").isNotNull || col("prev_fk").isNull))
        .select(col("l_pk"), col("fk"), col("l_val"),
          lit(null).cast("string").as("r_val"),
          col("l_val").isNull.as("deleted"), col("off"))
      joined.unionByName(nullFk)
    }
  }
}
