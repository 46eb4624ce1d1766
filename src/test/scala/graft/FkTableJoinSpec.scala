package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingJoins

/** Left-table changelog record: l_pk's row now points at fk (null =
  * row deleted), prev_fk is what it pointed at before (null = first
  * insert), off is the changelog offset (monotone, shared domain). */
case class FkLeft(l_pk: Long, fk: java.lang.Long, prev_fk: java.lang.Long,
                  l_val: String, off: Long)
/** Right-table changelog record: null r_val = key deleted. */
case class FkRight(pk: Long, r_val: String, off: Long)

/** The ksqlDB 0.19 FOREIGN-KEY TABLE-TABLE join, streaming form
  * (round-15 verdict #6): right updates fan out to subscribed left
  * rows, an fk move retracts at the old key and upserts at the new,
  * deletes on either side retract. Materialized changelog ≡ the batch
  * equivalence (latest-left ⋈ latest-right) after every micro-batch.
  */
class FkTableJoinSpec extends SparkSpec {

  /** Reader materialization rule (documented on fkTableJoin): per l_pk
    * keep the max-offset emission, non-deleted preferred on ties, then
    * drop tombstones. */
  private def materialize(sink: String): Map[Long, (Long, String, String)] = {
    import org.apache.spark.sql.expressions.Window
    // the operator's keys travel as STRINGS (round 18 — any atomic key
    // type joins by its string form); the spec casts back like the
    // dialect does
    spark.table(sink)
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col("l_pk"))
        .orderBy(col("off").desc, col("deleted").asc)))
      .filter(col("__rn") === 1 && !col("deleted")).drop("__rn")
      .select(col("l_pk").cast("long"), col("fk").cast("long"),
        col("l_val"), col("r_val"), col("deleted"), col("off"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getString(3)))).toMap
  }

  /** Batch oracle: latest-left (non-deleted) ⋈ latest-right
    * (non-deleted) on fk = pk. */
  private def oracle(lefts: Seq[FkLeft], rights: Seq[FkRight])
      : Map[Long, (Long, String, String)] = {
    val latestL = lefts.groupBy(_.l_pk).view.mapValues(_.maxBy(_.off))
      .values.filter(_.fk != null)
    val latestR = rights.groupBy(_.pk).view.mapValues(_.maxBy(_.off))
      .values.filter(_.r_val != null).map(r => r.pk -> r.r_val).toMap
    latestL.flatMap { l =>
      latestR.get(l.fk.longValue()).map(rv =>
        l.l_pk -> ((l.fk.longValue(), l.l_val, rv)))
    }.toMap
  }

  test("fk table-table join: right-update fan-out, fk-move retract+" +
    "upsert, both-side deletes — materialized view ≡ batch equivalence " +
    "after every micro-batch") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val lMem = MemoryStream[FkLeft](spark)
    val rMem = MemoryStream[FkRight](spark)
    val out = StreamingJoins.fkTableJoin(lMem.toDF(), rMem.toDF())
    val q = out.writeStream.format("memory").queryName("fk_join_out")
      .outputMode("update").start()
    try {
      var allL = Seq.empty[FkLeft]; var allR = Seq.empty[FkRight]
      def drive(ls: Seq[FkLeft], rs: Seq[FkRight]): Unit = {
        if (ls.nonEmpty) lMem.addData(ls: _*)
        if (rs.nonEmpty) rMem.addData(rs: _*)
        q.processAllAvailable()
        allL ++= ls; allR ++= rs
        val got = materialize("fk_join_out")
        val want = oracle(allL, allR)
        assert(got == want, s"got $got\nwant $want")
      }
      // batch 1: two right keys, three subscribers (7 ← {1,2}, 8 ← {3})
      drive(
        Seq(FkLeft(1L, 7L, null, "L1", 3), FkLeft(2L, 7L, null, "L2", 4),
          FkLeft(3L, 8L, null, "L3", 5)),
        Seq(FkRight(7L, "R7", 1), FkRight(8L, "R8", 2)))
      // batch 2: l_pk 1 MOVES 7→8 (retract at 7, upsert at 8), then a
      // right update on 7 fans out to its remaining subscriber only
      drive(
        Seq(FkLeft(1L, 8L, 7L, "L1b", 6)),
        Seq(FkRight(7L, "R7b", 7)))
      // batch 3: right DELETE unmatches 8's subscribers; an insert
      // pointing at a key with no right row joins nothing; a left
      // DELETE (fk null) retracts
      drive(
        Seq(FkLeft(4L, 9L, null, "L4", 9),
          FkLeft(2L, null, 7L, null, 10)),
        Seq(FkRight(8L, null, 8)))
      assert(materialize("fk_join_out").isEmpty,
        "after the deletes nothing should remain matched")
      // batch 4: the right side RETURNS — former subscribers are gone
      // (their retraction already happened), only live pointers rejoin
      drive(
        Seq(FkLeft(4L, 8L, 9L, "L4b", 12)),
        Seq(FkRight(8L, "R8b", 11)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** LEFT batch oracle: latest-left (non-deleted — l_val null = delete)
    * LEFT-joined against latest-right; fk may be NULL (alive,
    * unmatched). */
  private def oracleLeft(lefts: Seq[FkLeft], rights: Seq[FkRight])
      : Map[Long, (Option[Long], String, Option[String])] = {
    val latestL = lefts.groupBy(_.l_pk).view.mapValues(_.maxBy(_.off))
      .values.filter(_.l_val != null)
    val latestR = rights.groupBy(_.pk).view.mapValues(_.maxBy(_.off))
      .values.filter(_.r_val != null).map(r => r.pk -> r.r_val).toMap
    latestL.map { l =>
      val fk = Option(l.fk).map(_.longValue())
      l.l_pk -> ((fk, l.l_val, fk.flatMap(latestR.get)))
    }.toMap
  }

  test("LEFT fk table-table join (ksqlDB 0.19): unmatched rows emit " +
    "with a NULL right side, fill on right arrival, UNMATCH (not " +
    "retract) on right delete; NULL-fk rows live and die statelessly") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val lMem = MemoryStream[FkLeft](spark)
    val rMem = MemoryStream[FkRight](spark)
    val out = StreamingJoins.fkTableJoin(lMem.toDF(), rMem.toDF(), "left")
    val q = out.writeStream.format("memory").queryName("fk_left_out")
      .outputMode("update").start()
    try {
      var allL = Seq.empty[FkLeft]; var allR = Seq.empty[FkRight]
      def materializeL(): Map[Long, (Option[Long], String, Option[String])] = {
        import org.apache.spark.sql.expressions.Window
        spark.table("fk_left_out")
          .withColumn("__rn", row_number().over(Window
            .partitionBy(col("l_pk"))
            .orderBy(col("off").desc, col("deleted").asc)))
          .filter(col("__rn") === 1 && !col("deleted")).drop("__rn")
          .select(col("l_pk").cast("long"), col("fk").cast("long"),
            col("l_val"), col("r_val"), col("deleted"), col("off"))
          .collect()
          .map(r => r.getLong(0) -> ((
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getString(2), Option(r.getString(3))))).toMap
      }
      def drive(ls: Seq[FkLeft], rs: Seq[FkRight]): Unit = {
        if (ls.nonEmpty) lMem.addData(ls: _*)
        if (rs.nonEmpty) rMem.addData(rs: _*)
        q.processAllAvailable()
        allL ++= ls; allR ++= rs
        val got = materializeL(); val want = oracleLeft(allL, allR)
        assert(got == want, s"got $got\nwant $want")
      }
      // batch 1: no right rows yet — every left row emits unmatched,
      // the NULL-fk row included
      drive(Seq(FkLeft(1L, 7L, null, "L1", 1),
        FkLeft(2L, null, null, "L2", 2)), Nil)
      // batch 2: right 7 arrives — l_pk 1 fills, 2 stays unmatched
      drive(Nil, Seq(FkRight(7L, "R7", 3)))
      // batch 3: right DELETE — l_pk 1 UNMATCHES but survives
      drive(Nil, Seq(FkRight(7L, null, 4)))
      assert(materializeL()(1L) == ((Some(7L), "L1", None)))
      // batch 4: fk move 7→8 (right 8 absent → unmatched at the new
      // key), and the NULL-fk row DELETES via the stateless tombstone
      drive(Seq(FkLeft(1L, 8L, 7L, "L1b", 5),
        FkLeft(2L, null, null, null, 6)), Nil)
      assert(materializeL() == Map(1L -> ((Some(8L), "L1b", None))))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
