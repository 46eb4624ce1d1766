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
    * (null r_val = right delete). */
  private type FkIn = (Long, Int, Long, String, String, Long)
  /** Output changelog row: (l_pk, fk, l_val, r_val, deleted, off). A
    * reader materializes the join as: per l_pk keep the max-offset
    * emission, preferring the non-deleted one on an equal offset (the
    * retract half of an fk move carries the same offset as its
    * upsert half, and the upsert reflects the newer state). */
  private type FkOut = (Long, Long, String, String, Boolean, Long)

  /** `leftOuter = false`: INNER — a left row emits only while its key
    * has a right value; a right delete retracts the subscribers.
    * `leftOuter = true`: LEFT — a left row ALWAYS emits (null r_val
    * while unmatched, ksqlDB's LEFT FK join), and a right delete
    * re-emits the subscribers unmatched instead of retracting them. */
  private class FkJoinProcessor(leftOuter: Boolean)
    extends StatefulProcessor[Long, FkIn, FkOut] {
    @transient private var right: ValueState[String] = _
    @transient private var lefts: MapState[Long, String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      right = getHandle.getValueState[String]("right",
        Encoders.STRING, TTLConfig.NONE)
      lefts = getHandle.getMapState[Long, String]("lefts",
        Encoders.scalaLong, Encoders.STRING, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[FkIn],
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
      col("l_pk").cast("long"), col("fk").cast("long"),
      col("prev_fk").cast("long"), col("l_val").cast("string"),
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
    val rightUpdates = rightChangelog.select(
      col("pk").cast("long").as("key"), lit(2).as("side"),
      lit(-1L).as("l_pk"), lit(null).cast("string").as("l_val"),
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
