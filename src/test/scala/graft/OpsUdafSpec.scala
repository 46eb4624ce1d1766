package graft

import graft.functions.Udafs
import graft.operators.Ops
import org.apache.spark.sql.functions._

class OpsUdafSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain equi-join") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val plain = orders.join(customer.withColumnRenamed("c_custkey", "o_custkey"),
      Seq("o_custkey")).count()
    val salted = Ops.saltedJoin(
      orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
      Seq("o_custkey"), saltLeft = col("o_orderkey"), salt = 8).count()
    assert(salted == plain)
  }

  test("topKPerKey returns exactly k rows per group, correctly ordered") {
    val top2 = Ops.topKPerKey(Tables.orders(spark, sfDir),
      Seq(col("o_orderstatus")), Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
    val counts = top2.groupBy("o_orderstatus").count().collect()
    assert(counts.forall(_.getLong(1) == 2))
    // every kept row must be >= the max excluded row for its group
    val maxAll = Tables.orders(spark, sfDir).groupBy("o_orderstatus")
      .agg(max("o_totalprice").as("mx"))
    val joined = top2.groupBy("o_orderstatus").agg(max("o_totalprice").as("kept"))
      .join(maxAll, "o_orderstatus")
    assert(joined.filter(col("kept") =!= col("mx")).count() == 0)
  }

  test("asOfJoin: equi-join NULL semantics — null keys never match, " +
      "null times are never carried, exact-time ties are eligible") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(10L), 100L),          // matches r@100 (exact tie) not r@200
      (2L, Option(10L), 250L),          // matches r@200
      (3L, Option(10L), 50L),           // before first right row -> dropped
      (4L, Option.empty[Long], 100L),   // null key -> dropped
      (5L, Option(20L), 300L)           // key with only null-time right -> dropped
    ).toDF("id", "k", "t")
    val right = Seq(
      (Option(10L), Option(100L), "a"),
      (Option(10L), Option(200L), "b"),
      (Option(20L), Option.empty[Long], "x"),  // null time: never eligible
      (Option.empty[Long], Option(1L), "n")    // null key: never matchable
    ).toDF("rk", "rt", "payload")
    val out = Ops.asOfJoin(left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .select(col("id"), col("payload")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b"))
  }

  test("keepFirst dedups to one row per key") {
    val first = Ops.keepFirst(Tables.events(spark, sfDir),
      Seq(col("user_id")), col("event_id"))
    assert(first.count() == Tables.events(spark, sfDir)
      .select("user_id").distinct().count())
    // and it is the min event_id per user
    val direct = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(min("event_id").as("event_id"))
    assert(first.select("user_id", "event_id").collect().toSet ==
      direct.collect().toSet)
  }

  test("weightedAvg UDAF aggregates with partial+merge semantics") {
    val ds = Tables.lineitem(spark, sfDir)
      .select($"l_extendedprice".as[Double], $"l_quantity".as[Double])
      .as[(Double, Double)]
    val result = ds.select(Udafs.weightedAvg.toColumn).head()
    val expected = Tables.lineitem(spark, sfDir)
      .agg((sum($"l_extendedprice" * $"l_quantity") / sum($"l_quantity")))
      .head.getDouble(0)
    assert(math.abs(result - expected) < 1e-6 * math.abs(expected))
  }

  test("topK UDAF keeps bounded state and returns the true top-k") {
    val ds = Tables.events(spark, sfDir)
      .select($"event_id".as[Long])
    val got = ds.select(Udafs.topK(5).toColumn).head()
    val expected = Tables.events(spark, sfDir)
      .orderBy($"event_id".desc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("sortedLayout range-partitions and sorts within partitions") {
    val df = Ops.sortedLayout(Tables.orders(spark, sfDir), col("o_orderkey"), 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
  }
}
