package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Retraction-aware RE-AGGREGATION of a live TABLE changelog — ksqlDB's
  * table→table aggregation (`CREATE TABLE agg AS SELECT g, COUNT(*) …
  * FROM a_table GROUP BY g`), Kafka Streams' adder+subtractor pair.
  *
  * A table changelog is upserts (and deletes) per PRIMARY KEY; a GROUP
  * BY over it must treat every upsert as "retract the row's PREVIOUS
  * contribution, add its new one" — a key whose grouping column changes
  * moves between groups, decrementing one aggregate and incrementing
  * the other. ksqlDB implements this with each aggregate's undo
  * function; only SUBTRACTABLE aggregates are legal on tables (COUNT,
  * SUM, AVG — MIN/MAX/COLLECT_LIST/LATEST/TOPK cannot undo and ksqlDB
  * refuses them there too).
  *
  * The Spark-first split keeps the heavy half in Catalyst:
  *
  *  - LEVEL 1 ([[changelogDeltas]], here): one `transformWithState`
  *    keyed by the table's PRIMARY KEY holding the row's previous image
  *    — exactly the state ksqlDB's table store consults for its undo.
  *    Each upsert emits (old image, −1) then (new image, +1); a delete
  *    emits (old image, −1). State is |table keys| × one row image;
  *    every emission is O(1) per update.
  *  - LEVEL 2 (the caller): Spark's BUILT-IN streaming aggregation over
  *    sign-weighted expressions — COUNT(*) = sum(sign), SUM(x) =
  *    sum(sign·x) — whole-stage-codegen'd with map-side partial
  *    aggregation, shuffling only the new group key. The translator
  *    builds those columns (Translator.streamingTableReaggregate).
  *
  * Delta algebra makes convergence self-evident: after any prefix of
  * the changelog, the folded sums equal the aggregate of the CURRENT
  * snapshot, because each key contributes exactly its latest image
  * (every older image was emitted once with +1 and once with −1).
  */
object StreamingTableAgg {

  /** Input record: (pk, image JSON, offset, delete?). The key is a
    * STRING — casting any atomic PRIMARY KEY to string is injective,
    * so string-keyed tables (the common user_id case) and the derived
    * tables a GROUP BY produces re-aggregate without a BIGINT bound. */
  private type In = (String, String, Long, Boolean)
  /** Output delta: (image JSON, sign ±1, offset). */
  private type Out = (String, Int, Long)

  /** Previous-image store: (last applied offset, image JSON). */
  private class DeltaProcessor
    extends StatefulProcessor[String, In, Out] {
    @transient private var prev: ValueState[(Long, String)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      prev = getHandle.getValueState[(Long, String)]("prev",
        Encoders.product[(Long, String)], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[In],
        tv: TimerValues): Iterator[Out] = {
      val out = Seq.newBuilder[Out]
      // fold in OFFSET order: a micro-batch may carry several changelog
      // records for one key and TABLE semantics are last-write-wins by
      // offset; across batches a STALE replay (offset below the stored
      // one) is a no-op — applying it would resurrect an older image.
      // On EQUAL offsets deletes apply FIRST: an upstream changelog's
      // move emits its retract and upsert halves with the same offset
      // (the fkTableJoin contract), and shuffles do not preserve their
      // order — retract-then-upsert is the only fold that cannot end a
      // move tombstoned.
      rows.toArray.sortBy(r => (r._3, !r._4)).foreach {
        case (_, img, off, del) =>
          val stored = Option(prev.get())
          if (!stored.exists(off < _._1)) {
            stored.foreach { case (_, old) => out += ((old, -1, off)) }
            if (del) { if (stored.isDefined) prev.clear() }
            else { out += ((img, 1, off)); prev.update((off, img)) }
          }
      }
      out.result().iterator
    }
  }

  /** Changelog → signed delta stream.
    *
    * `changelog` columns: `pk` (any atomic type — cast to STRING for
    * the store key), `img` (JSON of the full row image), `off`
    * (BIGINT, monotone per key), `del` (BOOLEAN — true retracts the
    * key; a file-backed dialect source has no tombstone record and
    * passes false, the same contract note as
    * StreamingJoins.fkTableJoin — but DERIVED changelogs, a GROUP BY's
    * or an FK join's output, carry real tombstones in `__deleted` and
    * the translator maps them through).
    *
    * Emits (img, sign, off): the row's previous image with sign −1 and
    * (for upserts) the new image with sign +1. Downstream, any
    * subtractable aggregate folds these with a plain streaming
    * `groupBy(...).agg(sum(sign·…))` in update mode. */
  def changelogDeltas(changelog: DataFrame): DataFrame = {
    import changelog.sparkSession.implicits._
    changelog
      // a changelog record with a NULL key addresses no table row —
      // ksqlDB drops them (a keyless tombstone has nothing to delete)
      .filter(col("pk").isNotNull)
      .select(col("pk").cast("string"), col("img").cast("string"),
        col("off").cast("long"), col("del").cast("boolean"))
      .as[In]
      .groupByKey(_._1)
      .transformWithState(new DeltaProcessor, TimeMode.None(),
        OutputMode.Update(), Encoders.product[Out])
      .toDF("img", "__sign", "__delta_off")
  }
}
