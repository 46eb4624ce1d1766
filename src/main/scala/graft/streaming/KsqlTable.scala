package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** KSQL TABLE semantics: a changelog — latest value per key (SURVEY.md
  * §2.6). Over a stream, `latest_by_offset`-style aggregation in update
  * mode; over a batch snapshot, a max_by per key.
  */
object KsqlTable {

  /** TABLE over a batch snapshot: latest row per key by offset column. */
  def fromBatch(df: DataFrame, keyCol: String, offsetCol: String): DataFrame = {
    val others = df.columns.filterNot(c => c == keyCol)
    df.groupBy(col(keyCol))
      .agg(max_by(struct(others.toIndexedSeq.map(col): _*), col(offsetCol)).as("latest"))
      .select(col(keyCol) +: others.toIndexedSeq.map(c => col(s"latest.$c").as(c)): _*)
  }

  /** TABLE over a stream: continuous latest-per-key in update mode.
    * (max_by is not stream-supported; struct-max with a monotonic prefix
    * keeps it a plain streaming agg — offset must be non-negative.) */
  def fromStream(df: DataFrame, keyCol: String, offsetCol: String,
                 valueCols: Seq[String]): DataFrame =
    df.groupBy(col(keyCol))
      .agg(max(struct(col(offsetCol) +: valueCols.map(col): _*)).as("latest"))
      .select(col(keyCol) +: (offsetCol +: valueCols).map(c => col(s"latest.$c").as(c)): _*)

  /** KSQL TABLE via Spark 4's transformWithState: per-key latest value
    * with optional state TTL (the changelog-compaction analog — old keys
    * age out of the store instead of growing it unboundedly). RocksDB
    * state store recommended at scale:
    * spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider
    */
  def latestWithState(df: DataFrame, keyCol: String, offsetCol: String,
                      valueCol: String, ttl: java.time.Duration = null): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    val ttlConf = Option(ttl).map(TTLConfig.apply).getOrElse(TTLConfig.NONE)

    class LatestProcessor extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double)] {
      @transient private var state: ValueState[(Long, Double)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getValueState[(Long, Double)]("latest",
          Encoders.product[(Long, Double)], ttlConf)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
          timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Double)] = {
        // explicit empty-state handling (no sentinel): the first row
        // always wins, so negative offsets are legal and no fabricated
        // (-1, 0.0) row can escape
        var best = Option(state.get())
        rows.foreach { case (_, off, v) =>
          if (best.forall(off > _._1)) best = Some((off, v))
        }
        best match {
          case Some(b) =>
            state.update(b)
            Iterator.single((key, b._1, b._2))
          case None => Iterator.empty
        }
      }
    }

    df.select(col(keyCol).cast("long"), col(offsetCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new LatestProcessor, TimeMode.None(),
        OutputMode.Update(), Encoders.product[(Long, Long, Double)])
      .toDF(keyCol, offsetCol, valueCol)
  }

  /** Custom stateful operator via flatMapGroupsWithState: running
    * per-key counter + running sum over a value column, emitting one
    * update per input record — the KSQL `TABLE ... GROUP BY` changelog
    * shape, and the template for arbitrary custom state at scale (state
    * is per key-partition, GC'd by processing-time timeout).
    */
  def runningAggregate(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val out = df.select(col(keyCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, Double)]) =>
          var (n, sum) = state.getOption.getOrElse((0L, 0.0))
          val emitted = rows.map { case (_, v) =>
            n += 1; sum += v; (key, n, sum)
          }.toList
          state.update((n, sum))
          emitted.iterator
      }
    out.toDF(keyCol, "n", "sum")
  }

  /** Continuous TABLE materialization to parquet: each micro-batch is
    * collapsed to its latest row per key, then merged into the stored
    * snapshot (delta wins per key — the same changelog-apply semantics
    * as EventAnalytics.q_table_upsert, run incrementally). The merged
    * frame is localCheckpointed BEFORE the overwrite: parquet reads are
    * lazy, so without materialization the write would scan files it is
    * deleting. A production deployment swaps this two-step for an
    * ACID table format's MERGE; the streaming contract (foreachBatch +
    * per-key latest + checkpointed offsets) is identical.
    */
  /** Continuous materialization of a CHANGELOG WITH TOMBSTONES — the
    * sink for derived tables (an FK join's or a re-aggregation's
    * output, the `__deleted`/`__off` convention). [[upsertSink]] can
    * only keep the latest row per key; here a `__deleted` emission
    * REMOVES its key from the stored snapshot, so the parquet table
    * tracks exactly the live table's state (emptied groups disappear,
    * HAVING failures retract, join unmatches drop).
    *
    * Per batch: latest emission per key by `__off`, non-deleted
    * preferred on ties (the fk-join move contract — its retract and
    * upsert halves share an offset); merged against the stored
    * snapshot by the same rule, then tombstoned keys filter OUT. The
    * stored rows keep `__off` (they must lose to any newer emission)
    * with `__deleted` always false by construction. Same crash-safe
    * two-phase swap as [[upsertSink]].
    */
  def changelogSink(changelog: DataFrame, keyCol: String,
                    path: String, checkpoint: String)
  : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    changelog.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cols = batch.columns.toIndexedSeq
        require(cols.exists(_.equalsIgnoreCase("__deleted")) &&
          cols.exists(_.equalsIgnoreCase("__off")),
          "changelogSink consumes the derived-changelog convention — " +
            "columns __deleted and __off are required (plain streams " +
            "use upsertSink)")
        // higher offset wins; on a tie the non-deleted half of a move
        // pair reflects the newer state
        def pick(df: DataFrame): DataFrame = df
          .groupBy(col(keyCol))
          .agg(max_by(struct(cols.map(col): _*),
            struct(col("__off"),
              when(col("__deleted"), 0).otherwise(1))).as("r"))
          .select(col("r.*"))
        val latest = pick(batch)
        val hPath = new org.apache.hadoop.fs.Path(path)
        val staging = new org.apache.hadoop.fs.Path(path + ".staging")
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(hPath) && fs.exists(staging)) fs.rename(staging, hPath)
        val existing =
          if (fs.exists(hPath)) spark.read.parquet(path)
          else spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
            batch.schema)
        // staging-first: the merge still READS the live dir while the
        // staging write runs; only after it lands does the swap delete
        val merged = pick(existing.unionByName(latest))
          .filter(!col("__deleted"))
        merged.write.mode("overwrite").parquet(staging.toString)
        if (fs.exists(hPath)) fs.delete(hPath, true)
        fs.rename(staging, hPath)
        ()
      }
  }

  def upsertSink(stream: DataFrame, keyCol: String, offsetCol: String,
                 path: String, checkpoint: String)
  : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cols = batch.columns
        val latest = batch.groupBy(col(keyCol))
          .agg(max_by(struct(cols.toIndexedSeq.map(col): _*), col(offsetCol)).as("r"))
          .select(col("r.*"))
        // Crash-safe two-phase write: merged state lands in a staging
        // dir FIRST, then swaps in via delete+rename, so the live
        // snapshot is never a partially-written dir. Recovery: if a
        // crash hit between delete and rename, the staging dir holds
        // the complete merged state — promote it before reading. Only
        // a genuinely-missing snapshot falls back to empty; any other
        // read failure must fail the batch (a transient IO error
        // treated as "first batch" would silently destroy every key).
        val hPath = new org.apache.hadoop.fs.Path(path)
        val staging = new org.apache.hadoop.fs.Path(path + ".staging")
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(hPath) && fs.exists(staging)) fs.rename(staging, hPath)
        val existing =
          if (fs.exists(hPath)) spark.read.parquet(path)
          else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], batch.schema)
        val merged = existing.unionByName(latest)
          .groupBy(col(keyCol))
          .agg(max_by(struct(cols.toIndexedSeq.map(col): _*), col(offsetCol)).as("r"))
          .select(col("r.*"))
        merged.write.mode("overwrite").parquet(staging.toString)
        if (fs.exists(hPath)) fs.delete(hPath, true)
        fs.rename(staging, hPath)
        ()
      }
  }
}
