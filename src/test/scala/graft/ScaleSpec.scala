package graft

import graft.operators.Ops
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Skew posture specs (SURVEY.md §5): the salting helper must preserve
  * join semantics exactly while spreading a hot key over many tasks,
  * and AQE's runtime skew handling must be active in every session.
  */
class ScaleSpec extends SparkSpec {

  import spark.implicits._

  // 20k rows on ONE key + a uniform tail: the classic hot-key shape
  private lazy val skewed = spark.range(0, 22000)
    .select(when(col("id") < 20000, 1L).otherwise(col("id") % 100).as("k"),
      col("id").as("payload"))
  private lazy val dim = spark.range(0, 100)
    .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("label"))

  test("salted join result is identical to the plain join") {
    val plain = skewed.join(dim, Seq("k")).select("k", "payload", "label")
    val salted = Ops.saltedJoin(skewed, dim, Seq("k"), col("payload"), salt = 8)
      .select("k", "payload", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salting spreads the hot key across partitions") {
    def spread(df: org.apache.spark.sql.DataFrame, parts: Seq[Column]) = df
      .repartition(8, parts: _*)
      .filter(col("k") === 1)
      .select(spark_partition_id().as("pid"))
      .distinct().count()
    // plain hash partitioning funnels the hot key into ONE task
    assert(spread(skewed, Seq(col("k"))) == 1)
    // the salt column fans it out across (up to) all of them
    val saltedDf = skewed.withColumn("__salt", pmod(col("payload"), lit(8)))
    assert(spread(saltedDf, Seq(col("k"), col("__salt"))) > 4)
  }

  test("AQE and its skew-join handling are active") {
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean)
  }

  test("salted left join keeps unmatched left rows exactly once") {
    val sparseDim = dim.filter(col("k") < 50)
    val plain = skewed.join(sparseDim, Seq("k"), "left")
      .select("k", "payload", "label")
    val salted = Ops.saltedJoin(skewed, sparseDim, Seq("k"), col("payload"),
      salt = 8, joinType = "left").select("k", "payload", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("plan shape survives a 10x scale-up (no broadcast/partial-agg degradation)") {
    // the properties the 100 TB posture rests on must hold at BOTH test
    // scales — a plan that silently switches a dim broadcast to a
    // shuffle join, or drops map-side partial aggregation, between
    // sf0.001 and sf0.01 would degrade the same way again at cluster SFs
    def shape(name: String, sf: String): (Int, Boolean) = {
      val p = SparkEntry.queries(name)(spark, s"/root/testdata/sf$sf")
        .queryExecution.executedPlan.toString
      ("BroadcastHashJoin".r.findAllIn(p).length,
        "partial".r.findFirstIn(p).isDefined)
    }
    // (query, needsPartialAgg): the dedup gate is join-shaped — its
    // invariant is the batch broadcast, not map-side aggregation
    Seq(("q_join_star", true), ("q_tpch_q5", true), ("q_tpch_q7", true),
        ("q_dedup_incremental", false), ("q_text_entropy", true))
      .foreach { case (q, needsPa) =>
        val (b1, pa1) = shape(q, "0.001")
        val (b2, pa2) = shape(q, "0.01")
        assert(b2 >= b1, s"$q: broadcast joins degraded $b1 -> $b2 at 10x")
        if (needsPa)
          assert(pa1 && pa2, s"$q: partial aggregation missing ($pa1, $pa2)")
      }
  }
}
