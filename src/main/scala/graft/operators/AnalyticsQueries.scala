package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** Analytic SQL surface beyond KSQL's own verbs — pivot, set ops,
  * anti-join, window functions, rollup. A reference user migrating to
  * Spark gets the full warehouse-grade query surface, not just the
  * streaming subset (SURVEY.md §2.1 extension).
  */
object AnalyticsQueries {

  def entries: Map[String, Q] = Map(
    // PIVOT: event counts per user across the 5 known types — explicit
    // value list keeps columns deterministic on both engines
    "q_pivot" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count().na.fill(0L),
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'view') AS view,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY user_id""".stripMargin),

    // set operations: INTERSECT / EXCEPT on key sets
    "q_setops" -> Q(
      (s, d) => {
        val withOrders = Tables.orders(s, d).select(col("o_custkey").as("custkey")).distinct()
        val highBal = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey"))
        withOrders.intersect(highBal)
      },
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000""".stripMargin),

    // anti join (NOT EXISTS): customers with no high-value order
    "q_anti_join" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 200000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)"""
        .stripMargin),

    // semi join (EXISTS): parts that appear in any lineitem
    "q_semi_join" -> Q(
      (s, d) => Tables.part(s, d)
        .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name")),
      """SELECT p_partkey, p_name FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)"""
        .stripMargin),

    // analytic window functions: rank within group + running sum
    "q_window_rank" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("best_price"))
      },
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) = 1""".stripMargin),

    "q_running_sum" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("running_total"),
            lag(col("o_orderkey"), 1, -1L).over(w).as("prev_order"))
      },
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER w, 2) AS running_total,
        |  coalesce(lag(o_orderkey, 1) OVER w, -1) AS prev_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING)""".stripMargin),

    // ROLLUP: region/nation revenue with subtotals + grand total
    "q_rollup" -> Q(
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders")),
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin),

    // GROUPING() indicators distinguish a real NULL key from a rollup
    // subtotal row — the standard way to consume ROLLUP output safely
    "q_grouping_id" -> Q(
      (s, d) => Tables.events(s, d)
        .rollup(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          grouping(col("event_type")).cast("int").as("is_total"))
        .select(col("event_type"), col("is_total"), col("cnt")),
      """SELECT event_type,
        |  CAST(GROUPING(event_type) AS INT) AS is_total,
        |  count(*) AS cnt
        |FROM events GROUP BY ROLLUP (event_type)""".stripMargin),

    // windowed top-k (trending items): top-3 users by event count per
    // tumbling hour — the window rank gets WindowGroupLimit's map-side
    // prune, so each partition ships at most k rows per (window, rank)
    "q_window_topk" -> Q(
      (s, d) => {
        val hour = (unix_millis(col("ts")) / 3600000L).cast("long")
        val w = Window.partitionBy(col("hour"))
          .orderBy(col("cnt").desc, col("user_id"))
        Tables.events(s, d)
          .groupBy(hour.as("hour"), col("user_id"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
      },
      """WITH c AS (
        |  SELECT epoch_ms(ts) // 3600000 AS hour, user_id,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT hour, user_id, cnt,
        |  CAST(row_number() OVER (PARTITION BY hour
        |    ORDER BY cnt DESC, user_id) AS INT) AS rk
        |FROM c QUALIFY rk <= 3""".stripMargin)
  )
}
