package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable scale utilities (SURVEY.md §5): the join/agg shapes that
  * decide whether a plan survives 100x data growth.
  */
object Ops {

  /** KSQL PARTITION BY: rekey the frame (hash repartition on the key).
    * At scale this is THE way to co-locate a stream with a later join
    * or stateful op on the same key. */
  def partitionBy(df: DataFrame, key: Column): DataFrame = df.repartition(key)

  /** Salted equi-join for low-cardinality or skewed join keys: the left
    * side gets a deterministic salt, the right side is replicated
    * `salt` ways, so a key that would land on one task spreads over
    * `salt` tasks. Result is identical to `left.join(right, keys)`.
    * Right side should be the smaller input (it is replicated).
    *
    * Left-preserving join types only: under RIGHT/FULL OUTER the
    * replicated right side would emit every unmatched right row `salt`
    * times — rejected up front rather than silently wrong.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltLeft: Column, salt: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    val l = left.withColumn("__salt", pmod(saltLeft, lit(salt)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Top-k rows per group without a global sort: partial top-k inside
    * each partition first (map-side prune), then the final rank. For
    * small k this cuts the shuffle to ~k rows per (group, partition).
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Windowed dedup: keep the first row per key by an ordering column —
    * the batch twin of KsqlStream.dedupByKey. */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Column): DataFrame =
    topKPerKey(df, keys, Seq(order.asc), 1)

  /** Range join via bin alignment: joining `probe.value` into interval
    * table `bands(lo, hi, …)` with a raw inequality condition plans as a
    * nested-loop join — O(|probe| * |bands|) and no shuffle pruning. This
    * instead explodes each band into the fixed-width bins it covers and
    * equi-joins on the bin id (the standard "range join bin" technique):
    * candidates are only the bands overlapping the probe's bin, and the
    * residual lo/hi filter restores exact semantics.
    */
  def rangeJoinBinned(probe: DataFrame, probeVal: Column,
                      bands: DataFrame, lo: Column, hi: Column,
                      binWidth: Double): DataFrame = {
    val binned = bands.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast("long"),
        floor((hi - lit(1e-9)) / binWidth).cast("long"))))
    probe.withColumn("__bin", floor(probeVal / binWidth).cast("long"))
      .join(binned, "__bin")
      .filter(probeVal >= lo && probeVal < hi)
      .drop("__bin")
  }

  /** As-of join: for each left row, attach the latest right row with
    * rightTime <= leftTime on the same key (the time-series enrichment
    * operator KSQL lacks; DuckDB/kdb call it ASOF JOIN). Inner
    * semantics: left rows with no eligible right row are dropped.
    *
    * Union-merge carry-forward shape (the round-6 equi-join + range
    * filter + rank form materialized |left_per_key| x |right_per_key|
    * intermediate rows — quadratic per key, a 100 TB scale-killer):
    * tag and union both sides on (key, time), then ONE window per key
    * ordered by (time, tag) carries the latest right payload forward
    * with `last(ignoreNulls)` over a running ROWS frame. Right rows
    * sort before left rows at equal time, so `rightTime == leftTime`
    * is eligible, matching `<=`. Linear in |left|+|right|, one
    * shuffle, no pair product. Among equal-(key,time) right rows the
    * carried one is arbitrary (same nondeterminism the ranked form
    * had) — project tie-deterministic columns downstream.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTime: Column, rightTime: Column): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val lNullable = StructType(left.schema.fields.map(_.copy(nullable = true)))
    val rNullable = StructType(right.schema.fields.map(_.copy(nullable = true)))
    // NULL keys are filtered on BOTH sides: the equi-join semantics this
    // operator replaces never match on NULL (null = null is not true),
    // but Window.partitionBy groups NULL keys into ONE partition — a
    // null-key right row would be carried into null-key left rows,
    // fabricating matches. Null-key left rows are inner-dropped either
    // way; dropping them up front keeps the fabrication impossible.
    val lSide = left.filter(leftKey.isNotNull).select(
      leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__tag"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rNullable).as("__r"))
    // null-time right rows can never satisfy rightTime <= leftTime, but
    // would sort first (nulls-first asc) and be carried into EVERY left
    // row — filtered out up front.
    val rSide = right.filter(rightKey.isNotNull && rightTime.isNotNull).select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__tag"),
      lit(null).cast(lNullable).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("__last").isNotNull)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        right.columns.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Explicit range repartition + sort-within-partitions: the write-side
    * preparation for sorted/bucketed layouts that downstream merge joins
    * and range scans exploit. */
  def sortedLayout(df: DataFrame, key: Column, partitions: Int): DataFrame =
    df.repartitionByRange(partitions, key).sortWithinPartitions(key)

  /** Bloom-prefiltered semi join: when the key side is too big to
    * broadcast as a hash-join table but its KEY SET fits a bloom
    * filter, build the filter once (Spark's own BloomFilterAggregate —
    * the machinery behind AQE runtime filters, here under explicit
    * control), inline it as a literal into a codegen'd
    * `might_contain(xxhash64(k))` scan predicate, and only the ~1%
    * false-positive survivors reach the exact semi join. At 100 TB this
    * is the difference between shuffling the whole fact table to the
    * join and shuffling a sliver of it; the trailing semi join removes
    * the false positives, so results are EXACT (oracle-checkable). */
  def bloomSemiJoin(fact: DataFrame, keys: DataFrame,
                    factKey: String, keyCol: String,
                    fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val n = math.max(keys.count(), 1L)
    // standard bloom sizing: m = -n ln(p) / (ln 2)^2
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bfAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(n), Literal(numBits)).toAggregateExpression())
    val bfBytes = keys.agg(bfAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    val might = ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bfBytes, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(xxhash64(col(factKey)))))
    fact.filter(might).join(keys.select(col(keyCol)).distinct(),
      col(factKey) === col(keyCol), "left_semi")
  }
}
