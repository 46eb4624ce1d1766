package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** Warehouse-grade analytic surface, round 2 (SURVEY.md §2.1/§2.3
  * extensions): multi-dimensional aggregation (CUBE / GROUPING SETS),
  * FULL OUTER join, ordered string aggregation, exact percentiles,
  * bivariate statistics, the full analytic-window function family,
  * UNPIVOT, frame-bounded moving aggregates, scalar / correlated
  * subquery shapes, bitwise ops and array algebra.
  *
  * Scale notes: CUBE/GROUPING SETS expand each input row once per
  * grouping set BEFORE the shuffle, so partial aggregation still
  * applies — same posture as a plain groupBy. The subquery shapes are
  * deliberately expressed as broadcast-of-aggregate (scalar) and
  * window-over-partition (correlated): both avoid the naive
  * re-scan-per-row plan a literal subquery would imply.
  */
object WarehouseQueries {

  def entries: Map[String, Q] = Map(
    // column profiler (the warehouse DESCRIBE-STATISTICS primitive):
    // per-column row/null/exact-distinct counts and native-order
    // min/max, in TWO passes (the oracle's UNION ALL shape would be 6
    // scans at 100 TB). The single-pass multi-countDistinct form was
    // retired in round 8: it plans as Expand(7×) feeding a
    // SORT-aggregate cascade — string min/max buffers knock the whole
    // expanded frame out of HashAggregate, and the 7-key sort of 7×
    // the scan was the bench's single most expensive query. Now:
    //   pass A — counts + native-order min/max, no distincts: plain
    //     two-stage partial aggregate over the scan, 1 row out;
    //   pass B — ALL exact distinct counts in one shuffle: unpivot to
    //     (column, value-as-string) via a map explode (the cast is
    //     injective for every profiled type, so distinct-on-string ==
    //     distinct-on-native), map-side-combined (col,val) dedupe,
    //     then a 6-row count — HashAggregate end to end.
    // Same exactness, same oracle; 2 scans of a 6-column projection
    // beat 1 scan expanded 7× into a sort at every scale.
    "q_profile" -> Q(
      (s, d) => {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        val aggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"${c}__nn"),
          min(col(c)).cast("string").as(s"${c}__mn"),
          max(col(c)).cast("string").as(s"${c}__mx"))) :+
          count(lit(1)).as("__rows")
        val one = Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
        val nd = Tables.orders(s, d)
          .select(explode(map(cols.flatMap(c =>
            Seq(lit(c), col(c).cast("string"))): _*)).as(Seq("col_name", "v")))
          .filter(col("v").isNotNull)
          .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("__c"))
          .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
        def pick(suffix: String) = element_at(
          map(cols.flatMap(c => Seq(lit(c), col(s"${c}__$suffix"))): _*),
          col("col_name"))
        // LEFT join from the literal column list: an all-null (or
        // empty-table) column still yields its profile row with
        // n_distinct = 0, exactly like the old single-pass form
        one.select(explode(array(cols.map(lit(_)): _*)).as("col_name"), col("*"))
          .join(nd, Seq("col_name"), "left")
          .select(col("col_name"),
            col("__rows").as("n_rows"),
            (col("__rows") - pick("nn")).as("n_nulls"),
            coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
            pick("mn").as("min_val"),
            pick("mx").as("max_val"))
      },
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val
           |FROM orders""".stripMargin).mkString("\nUNION ALL\n")),

    // CUBE: all 4 aggregation levels over (mktsegment, orderpriority)
    "q_cube" -> Q(
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue")),
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)""".stripMargin),

    // GROUPING SETS: two independent one-dimension rollups in one pass
    "q_grouping_sets" -> Q(
      (s, d) => Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(avg(col("o_totalprice")), 2).as("avg_price")),
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin),

    // FULL OUTER join: per-nation premium customers vs debtor suppliers —
    // partial coverage on both sides exercises both null directions
    "q_join_full" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_rich_cust"))
        val sup = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_debt_supp"))
        c.join(sup, Seq("nationkey"), "full_outer")
      },
      """WITH c AS (
        |  SELECT c_nationkey AS nationkey, count(*) AS n_rich_cust
        |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1
        |), s AS (
        |  SELECT s_nationkey AS nationkey, count(*) AS n_debt_supp
        |  FROM supplier WHERE s_acctbal < 0 GROUP BY 1
        |)
        |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  n_rich_cust, n_debt_supp
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""".stripMargin),

    // ordered string aggregation (LISTAGG): sort_array keeps the result
    // deterministic regardless of partitioning — the only safe form of
    // string_agg on a cluster
    "q_string_agg" -> Q(
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderstatus"))
        .agg(concat_ws(",", sort_array(collect_set(col("c_mktsegment"))))
          .as("segments"),
          count(lit(1)).as("n_orders")),
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_orderstatus""".stripMargin),

    // exact percentiles (linear interpolation, the percentile_cont
    // convention both engines share)
    "q_percentiles" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90_price"),
          round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99_price")),
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price,
        |  round(quantile_cont(l_extendedprice, 0.99), 2) AS p99_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // bivariate statistics: correlation, covariance, spread
    // Full k-column correlation MATRIX in ONE scan: all k(k+3)/2 moment
    // sums (per-column sum/sum-of-squares + per-pair cross products) are
    // partial aggregates of a single pass — never a scan per pair. Every
    // input maps to an EXACT integer grid (quantity is integral; money/
    // rates to ×100 cents) and moments accumulate in DECIMAL, so the
    // sums are order-independent (a double moment re-summed across
    // partition orderings drifts in the last ulp and a corr boundary
    // digit flips between engines); correlation is affine-invariant, so
    // the grid rescale changes nothing. The corr fold happens in double
    // AFTER the exact sums — identical IEEE ops on identical inputs on
    // both engines. At 100 TB this is the feature-store correlation
    // screen: one fact scan, a 1-row moment frame, k² driver-side work.
    "q_corr_matrix" -> Q(
      (s, d) => {
        val grid = Seq(
          "qty" -> col("l_quantity").cast("long"),
          "price" -> floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long"),
          "disc" -> floor(col("l_discount") * lit(100.0) + lit(0.5))
            .cast("long"),
          "tax" -> floor(col("l_tax") * lit(100.0) + lit(0.5)).cast("long"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(20,0)")
        val base = Tables.lineitem(s, d)
          .select(grid.map { case (n, c) => c.as(n) }: _*)
        val names = grid.map(_._1)
        val pairs = for {
          i <- names.indices; j <- names.indices if i < j
        } yield (names(i), names(j))
        val m = base.agg(
          count(lit(1)).as("n"),
          (names.flatMap(c => Seq(
            sum(dec(col(c))).as(s"s_$c"),
            sum(dec(col(c)) * dec(col(c))).as(s"ss_$c"))) ++
            pairs.map { case (a, b) =>
              sum(dec(col(a)) * dec(col(b))).as(s"sp_${a}_$b") }): _*)
        def corrCol(a: String, b: String) = {
          val nd = col("n").cast("double")
          def d(c: String) = col(c).cast("double")
          val cov = nd * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
          val vx = nd * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
          val vy = nd * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
          // a constant column has no correlation (and a 1-row table has
          // no variance): NULL, not an ANSI divide-by-zero abort
          when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6))
        }
        val r = m.select(pairs.map { case (a, b) =>
          corrCol(a, b).as(s"c_${a}_$b") }: _*)
        r.selectExpr(
          s"stack(${pairs.length}, " + pairs.map { case (a, b) =>
            s"'$a', '$b', `c_${a}_$b`" }.mkString(", ") +
            ") as (col_a, col_b, corr)")
      },
      """WITH g AS (
        |  SELECT CAST(l_quantity AS HUGEINT) AS qty,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT) AS price,
        |    CAST(floor(l_discount * 100.0 + 0.5) AS HUGEINT) AS disc,
        |    CAST(floor(l_tax * 100.0 + 0.5) AS HUGEINT) AS tax
        |  FROM lineitem
        |), m AS (
        |  SELECT count(*) AS n,
        |    sum(qty) AS s_qty, sum(qty*qty) AS ss_qty,
        |    sum(price) AS s_price, sum(price*price) AS ss_price,
        |    sum(disc) AS s_disc, sum(disc*disc) AS ss_disc,
        |    sum(tax) AS s_tax, sum(tax*tax) AS ss_tax,
        |    sum(qty*price) AS sp_qty_price, sum(qty*disc) AS sp_qty_disc,
        |    sum(qty*tax) AS sp_qty_tax, sum(price*disc) AS sp_price_disc,
        |    sum(price*tax) AS sp_price_tax, sum(disc*tax) AS sp_disc_tax
        |  FROM g
        |), v AS (
        |  SELECT CAST(n AS DOUBLE) AS nd,
        |    CAST(s_qty AS DOUBLE) AS d_qty, CAST(s_price AS DOUBLE) AS d_price,
        |    CAST(s_disc AS DOUBLE) AS d_disc, CAST(s_tax AS DOUBLE) AS d_tax,
        |    CAST(n AS DOUBLE) * CAST(ss_qty AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_qty AS DOUBLE) AS v_qty,
        |    CAST(n AS DOUBLE) * CAST(ss_price AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_price AS DOUBLE) AS v_price,
        |    CAST(n AS DOUBLE) * CAST(ss_disc AS DOUBLE) - CAST(s_disc AS DOUBLE) * CAST(s_disc AS DOUBLE) AS v_disc,
        |    CAST(n AS DOUBLE) * CAST(ss_tax AS DOUBLE) - CAST(s_tax AS DOUBLE) * CAST(s_tax AS DOUBLE) AS v_tax,
        |    CAST(sp_qty_price AS DOUBLE) AS p_qty_price,
        |    CAST(sp_qty_disc AS DOUBLE) AS p_qty_disc,
        |    CAST(sp_qty_tax AS DOUBLE) AS p_qty_tax,
        |    CAST(sp_price_disc AS DOUBLE) AS p_price_disc,
        |    CAST(sp_price_tax AS DOUBLE) AS p_price_tax,
        |    CAST(sp_disc_tax AS DOUBLE) AS p_disc_tax
        |  FROM m
        |), r AS (
        |  SELECT
        |    CASE WHEN v_qty > 0 AND v_price > 0 THEN round((nd * p_qty_price - d_qty * d_price) / sqrt(v_qty * v_price), 6) END AS c_qty_price,
        |    CASE WHEN v_qty > 0 AND v_disc > 0 THEN round((nd * p_qty_disc - d_qty * d_disc) / sqrt(v_qty * v_disc), 6) END AS c_qty_disc,
        |    CASE WHEN v_qty > 0 AND v_tax > 0 THEN round((nd * p_qty_tax - d_qty * d_tax) / sqrt(v_qty * v_tax), 6) END AS c_qty_tax,
        |    CASE WHEN v_price > 0 AND v_disc > 0 THEN round((nd * p_price_disc - d_price * d_disc) / sqrt(v_price * v_disc), 6) END AS c_price_disc,
        |    CASE WHEN v_price > 0 AND v_tax > 0 THEN round((nd * p_price_tax - d_price * d_tax) / sqrt(v_price * v_tax), 6) END AS c_price_tax,
        |    CASE WHEN v_disc > 0 AND v_tax > 0 THEN round((nd * p_disc_tax - d_disc * d_tax) / sqrt(v_disc * v_tax), 6) END AS c_disc_tax
        |  FROM v
        |)
        |SELECT u.col_a, u.col_b, u.corr FROM r,
        |  LATERAL (VALUES
        |    ('qty', 'price', c_qty_price), ('qty', 'disc', c_qty_disc),
        |    ('qty', 'tax', c_qty_tax), ('price', 'disc', c_price_disc),
        |    ('price', 'tax', c_price_tax), ('disc', 'tax', c_disc_tax)
        |  ) AS u(col_a, col_b, corr)""".stripMargin),

    "q_corr_stats" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
          round(stddev_samp(col("l_quantity")), 6).as("qty_stddev"),
          round(var_pop(col("l_quantity")), 6).as("qty_varpop")),
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |  round(stddev_samp(l_quantity), 6) AS qty_stddev,
        |  round(var_pop(l_quantity), 6) AS qty_varpop
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // the analytic-window function family over one deterministic ordering
    "q_window_analytics" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderpriority"),
          coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_key"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          round(first_value(col("o_totalprice")).over(w), 2).as("top_price"),
          round(last_value(col("o_totalprice")).over(wFull), 2).as("bottom_price"))
      },
      """SELECT o_orderkey, o_orderpriority,
        |  coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  round(first_value(o_totalprice) OVER w, 2) AS top_price,
        |  round(last_value(o_totalprice) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
        |    AS bottom_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin),

    // UNPIVOT (melt): wide measure columns → (metric, value) rows.
    // Contract: EXCLUDE NULLS (DuckDB's UNPIVOT default). Spark's
    // unpivot RETAINS null measure values, so the explicit isNotNull
    // filter pins the semantics — without it the pair only agrees
    // because these TPC-H measures happen to be non-null.
    "q_unpivot" -> Q(
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_retailprice").cast("double").as("retail"),
          col("p_size").cast("double").as("psize"))
        .unpivot(Array(col("p_partkey")),
          Array(col("retail"), col("psize")), "metric", "value")
        .filter(col("value").isNotNull),
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS retail,
        |    CAST(p_size AS DOUBLE) AS psize FROM part
        |) UNPIVOT (value FOR metric IN (retail, psize))""".stripMargin),

    // value-based (RANGE) window frame: for each order, how many of the
    // same customer's orders fall within ±5000 of its price. RANGE
    // frames bound by VALUE, not row position — counts are integers, so
    // the pair is engine-exact even on double ordering keys.
    "q_range_frame" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-5000, 5000)
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_similar_price"))
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) AS BIGINT)
        |    AS n_similar_price
        |FROM orders""".stripMargin),

    // frame-bounded moving aggregate: trailing-4-order average per customer
    "q_moving_avg" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-3, Window.currentRow)
        // frame-sum exact integer cents, floor the per-frame mean: float
        // frame sums and .5-boundary rounding both differ between
        // engines; integer sum + floor is order- and engine-independent
        Tables.orders(s, d)
          .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
          .select(col("o_custkey"), col("o_orderkey"),
            floor(sum(col("cents")).over(w) / count(col("cents")).over(w))
              .cast("long").as("trailing_avg_cents"))
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(floor(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER w
        |    / (count(*) OVER w)) AS BIGINT) AS trailing_avg_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin),

    // scalar subquery → broadcast-of-aggregate: one tiny agg row joined
    // to every order beats re-evaluating the subquery per row
    "q_subquery_scalar" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
        val avgPrice = o.agg(avg(col("o_totalprice")).as("global_avg"))
        o.crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("global_avg") * 1.5)
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      },
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)"""
        .stripMargin),

    // correlated subquery → window-over-partition: the per-key aggregate
    // computes once per partition instead of once per probe row
    "q_subquery_correlated" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
        Tables.orders(s, d)
          .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
          .filter(col("o_totalprice") > col("cust_avg") * 1.8)
          .select(col("o_orderkey"), col("o_custkey"))
      },
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE o_totalprice > 1.8 * (SELECT avg(o2.o_totalprice)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin),

    // bitwise algebra on the key column
    "q_bitwise" -> Q(
      (s, d) => Tables.events(s, d).select(col("event_id"),
        (col("event_id").bitwiseAND(lit(255L))).as("low_byte"),
        (col("event_id").bitwiseOR(lit(4096L))).as("with_flag"),
        (col("event_id").bitwiseXOR(lit(1234L))).as("xored"),
        shiftleft(col("event_id"), 2).as("shifted"),
        bit_count(col("event_id")).as("n_bits")),
      """SELECT event_id, event_id & 255 AS low_byte,
        |  event_id | 4096 AS with_flag, xor(event_id, 1234) AS xored,
        |  event_id << 2 AS shifted,
        |  CAST(bit_count(event_id) AS INT) AS n_bits
        |FROM events""".stripMargin),

    // array algebra over tokenized text: distinct, intersect, sorted slice
    "q_array_ops" -> Q(
      (s, d) => {
        val w = split(col("text"), " ")
        Tables.documents(s, d).select(col("doc_id"),
          size(array_distinct(w)).as("n_distinct"),
          size(array_intersect(w, array(lit("the"), lit("a"), lit("of"))))
            .as("n_markers"),
          concat_ws(" ", slice(sort_array(array_distinct(w)), 1, 3))
            .as("first3"))
      },
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_distinct(w)) AS INT) AS n_distinct,
        |  CAST(len(list_intersect(w, ['the','a','of'])) AS INT) AS n_markers,
        |  array_to_string(list_sort(list_distinct(w))[1:3], ' ') AS first3
        |FROM t""".stripMargin),

    // extended string scalar surface: pad, reverse, repeat, slice, ascii
    "q_scalar_string2" -> Q(
      (s, d) => Tables.customer(s, d).select(col("c_custkey"),
        lpad(col("c_mktsegment"), 12, "*").as("padded_l"),
        rpad(col("c_mktsegment"), 12, ".").as("padded_r"),
        reverse(col("c_name")).as("rev_name"),
        repeat(col("c_mktsegment"), 2).as("doubled"),
        substring(col("c_name"), 1, 4).as("left4"),
        ascii(col("c_mktsegment")).as("first_code")),
      """SELECT c_custkey,
        |  lpad(c_mktsegment, 12, '*') AS padded_l,
        |  rpad(c_mktsegment, 12, '.') AS padded_r,
        |  reverse(c_name) AS rev_name,
        |  repeat(c_mktsegment, 2) AS doubled,
        |  substring(c_name, 1, 4) AS left4,
        |  CAST(ascii(c_mktsegment) AS INT) AS first_code
        |FROM customer""".stripMargin),

    // KSQL ELT / FIELD / INSTR / INITCAP / CONCAT_WS surface. FIELD is
    // expressed as its when-chain expansion (the Spark-first form — a
    // lookup against a literal list folds to a codegen'd CASE), ELT via
    // the built-in; both engines compute the same labels.
    "q_scalar_misc" -> Q(
      (s, d) => Tables.customer(s, d).select(col("c_custkey"),
        elt((col("c_custkey") % 3 + 1).cast("int"),
          lit("alpha"), lit("beta"), lit("gamma")).as("elt_val"),
        when(col("c_mktsegment") === "BUILDING", 1)
          .when(col("c_mktsegment") === "MACHINERY", 2)
          .otherwise(0).as("field_idx"),
        instr(col("c_name"), "5").cast("long").as("pos5"),
        initcap(lower(col("c_mktsegment"))).as("seg_cap"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("joined")),
      """SELECT c_custkey,
        |  CASE c_custkey % 3 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
        |    ELSE 'gamma' END AS elt_val,
        |  CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'MACHINERY' THEN 2
        |    ELSE 0 END AS field_idx,
        |  CAST(strpos(c_name, '5') AS BIGINT) AS pos5,
        |  upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
        |    AS seg_cap,
        |  concat_ws('-', c_mktsegment, c_name) AS joined
        |FROM customer""".stripMargin),

    // regexp family: extract / extract_all count / replace-all / rlike.
    // Patterns stay in the RE2-compatible subset so Java regex (Spark)
    // and RE2 (DuckDB) agree; DuckDB's regexp_replace needs the 'g'
    // flag to match Spark's replace-all semantics.
    "q_regexp" -> Q(
      (s, d) => Tables.customer(s, d).select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        size(regexp_extract_all(col("c_name"), lit("0"), lit(0)))
          .cast("int").as("zeros"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        col("c_name").rlike("00$").as("ends_00")),
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  CAST(len(regexp_extract_all(c_name, '0', 0)) AS INT) AS zeros,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  regexp_matches(c_name, '00$') AS ends_00
        |FROM customer""".stripMargin),

    // RFM customer scoring (recency / frequency / monetary quintiles) —
    // the classic CRM segmentation. ONE aggregation over orders to the
    // per-customer triple, then quintile CUTOFFS from one exact-
    // percentile aggregate (a one-row frame) broadcast back into a pure
    // scoring projection. Deliberately NOT ntile: a global ntile is a
    // partition-less window — the whole customer table through one
    // task — while cutoff scoring is two linear passes + a broadcast,
    // the 100 TB shape (and the global plan guard enforces exactly
    // this). Boundary safety: metrics are integer-valued (days, counts)
    // or cent-rounded, and cutoffs are rounded to 1e-6 via the
    // engine-identical recipe, so a sub-ulp percentile difference
    // between engines cannot flip a v > cutoff comparison against
    // values spaced >= 0.01 apart. Recency anchors to the corpus max
    // order date (one-row aggregate), not wall-clock — reproducible.
    "q_rfm" -> Q(
      (s, d) => {
        val orders = Tables.orders(s, d)
        val anchor = orders.agg(max(col("o_orderdate")).as("anchor"))
        val per = orders.groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("last_order"),
            count(lit(1)).as("frequency"),
            round(sum(col("o_totalprice")), 2).as("monetary"))
          .crossJoin(broadcast(anchor))
          .select(col("o_custkey"),
            datediff(col("anchor"), col("last_order")).cast("long").as("recency_days"),
            col("frequency"), col("monetary"))
        val cutCols = Seq("recency_days", "frequency", "monetary").flatMap { m =>
          Seq(20, 40, 60, 80).map(q =>
            round(expr(s"percentile($m, 0.$q)"), 6).as(s"${m.take(1)}$q"))
        }
        val cuts = per.agg(cutCols.head, cutCols.tail: _*)
        def ascScore(v: Column, p: String) =
          lit(1) + Seq(20, 40, 60, 80).map(q =>
            when(v > col(s"$p$q"), 1).otherwise(0)).reduce(_ + _)
        per.crossJoin(broadcast(cuts))
          .select(col("o_custkey"), col("recency_days"), col("frequency"),
            col("monetary"),
            // low recency = best: ascending quintile directly; high
            // frequency/monetary = best: invert the ascending quintile
            ascScore(col("recency_days"), "r").as("r_score"),
            (lit(6) - ascScore(col("frequency"), "f")).as("f_score"),
            (lit(6) - ascScore(col("monetary"), "m")).as("m_score"))
          .withColumn("segment",
            when(col("r_score") <= 2 && col("f_score") <= 2, "champion")
              .when(col("f_score") <= 2, "loyal")
              .when(col("r_score") <= 2, "recent")
              .otherwise("hibernating"))
      },
      """WITH anchor AS (SELECT max(o_orderdate) AS anchor FROM orders),
        |per AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', max(o_orderdate), (SELECT anchor FROM anchor)) AS BIGINT)
        |      AS recency_days,
        |    count(*) AS frequency,
        |    round(sum(o_totalprice), 2) AS monetary
        |  FROM orders GROUP BY o_custkey
        |), cuts AS (
        |  SELECT
        |    round(quantile_cont(recency_days, 0.20), 6) AS r20,
        |    round(quantile_cont(recency_days, 0.40), 6) AS r40,
        |    round(quantile_cont(recency_days, 0.60), 6) AS r60,
        |    round(quantile_cont(recency_days, 0.80), 6) AS r80,
        |    round(quantile_cont(frequency, 0.20), 6) AS f20,
        |    round(quantile_cont(frequency, 0.40), 6) AS f40,
        |    round(quantile_cont(frequency, 0.60), 6) AS f60,
        |    round(quantile_cont(frequency, 0.80), 6) AS f80,
        |    round(quantile_cont(monetary, 0.20), 6) AS m20,
        |    round(quantile_cont(monetary, 0.40), 6) AS m40,
        |    round(quantile_cont(monetary, 0.60), 6) AS m60,
        |    round(quantile_cont(monetary, 0.80), 6) AS m80
        |  FROM per
        |), scored AS (
        |  SELECT o_custkey, recency_days, frequency, monetary,
        |    1 + CASE WHEN recency_days > r20 THEN 1 ELSE 0 END
        |      + CASE WHEN recency_days > r40 THEN 1 ELSE 0 END
        |      + CASE WHEN recency_days > r60 THEN 1 ELSE 0 END
        |      + CASE WHEN recency_days > r80 THEN 1 ELSE 0 END AS r_score,
        |    6 - (1 + CASE WHEN frequency > f20 THEN 1 ELSE 0 END
        |      + CASE WHEN frequency > f40 THEN 1 ELSE 0 END
        |      + CASE WHEN frequency > f60 THEN 1 ELSE 0 END
        |      + CASE WHEN frequency > f80 THEN 1 ELSE 0 END) AS f_score,
        |    6 - (1 + CASE WHEN monetary > m20 THEN 1 ELSE 0 END
        |      + CASE WHEN monetary > m40 THEN 1 ELSE 0 END
        |      + CASE WHEN monetary > m60 THEN 1 ELSE 0 END
        |      + CASE WHEN monetary > m80 THEN 1 ELSE 0 END) AS m_score
        |  FROM per, cuts
        |)
        |SELECT *,
        |  CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
        |       WHEN f_score <= 2 THEN 'loyal'
        |       WHEN r_score <= 2 THEN 'recent'
        |       ELSE 'hibernating' END AS segment
        |FROM scored""".stripMargin),

    // market-basket co-occurrence (support + lift): which parts sell
    // together. The pair join is a self-join of the per-order DISTINCT
    // item set on l_orderkey with a < guard — bounded by items-per-order
    // (~4–7 here, never corpus size), so candidate volume is
    // Σ k_i·(k_i−1)/2 ≈ linear in orders at any scale. Item marginals
    // are one aggregate broadcast into the lift expression. n >= 3
    // bounds the reported tail without changing the heavy pairs.
    "q_basket_pairs" -> Q(
      (s, d) => {
        // Round 16: the distinct item set is materialized ONCE (eager
        // localCheckpoint) and every consumer — both pair-join sides,
        // both marginal broadcasts, and the order count — reads that
        // one frame. The old shape evaluated the scan+distinct once per
        // broadcast side (final plan: 2 full lineitem scans + 2 dedup
        // exchanges, AQE reused only one) and paid a THIRD scan +
        // double distinct in a separate driver action for n_orders.
        // repartition(l_orderkey) BEFORE the dedup: hash(orderkey) ⊆
        // the dedup keys, so the aggregate adds no exchange and the
        // checkpointed layout already satisfies the self-join (plan:
        // 4 Exchange → 1 up to the pair aggregate). n_orders becomes a
        // one-row broadcast scalar — same exact integer-valued double
        // the retired count().toDouble produced, now inside the one
        // plan instead of a second sequential action.
        val items = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"))
          .repartition(Tables.sizedPartitions(s, d, "lineitem"),
            col("l_orderkey"))
          .dropDuplicates("l_orderkey", "l_partkey")
          .localCheckpoint(true)
        val nOrders = items.agg(
          countDistinct(col("l_orderkey")).cast("double").as("__n_orders"))
        val marg = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
        val pairs = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
          .join(items.select(col("l_orderkey"), col("l_partkey").as("part_b")),
            "l_orderkey")
          .filter(col("part_a") < col("part_b"))
          .groupBy(col("part_a"), col("part_b"))
          .agg(count(lit(1)).as("n_pair"))
          .filter(col("n_pair") >= 3)
        pairs
          .join(broadcast(marg.withColumnRenamed("l_partkey", "part_a")
            .withColumnRenamed("n_part", "n_a")), "part_a")
          .join(broadcast(marg.withColumnRenamed("l_partkey", "part_b")
            .withColumnRenamed("n_part", "n_b")), "part_b")
          .crossJoin(broadcast(nOrders))
          .select(col("part_a"), col("part_b"), col("n_pair"),
            round(col("n_pair") / col("__n_orders"), 6).as("support"),
            round((col("n_pair") * col("__n_orders")) / (col("n_a") * col("n_b")), 4)
              .as("lift"))
      },
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), no AS (
        |  SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items
        |), marg AS (
        |  SELECT l_partkey, count(*) AS n_part FROM items GROUP BY l_partkey
        |), pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    count(*) AS n_pair
        |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |)
        |SELECT part_a, part_b, n_pair,
        |  round(n_pair / no.n_orders, 6) AS support,
        |  round((n_pair * no.n_orders) / (ma.n_part * mb.n_part), 4) AS lift
        |FROM pairs
        |JOIN marg ma ON ma.l_partkey = part_a
        |JOIN marg mb ON mb.l_partkey = part_b, no""".stripMargin),

    // winsorized robust statistics: per-group p05/p95 clamp before the
    // moment aggregates — the outlier-robust mean/stddev a feature
    // pipeline computes before normalization. The percentile pass
    // aggregates to group cardinality (tiny) and broadcasts back over
    // the fact; the clamp is a pure projection, so the whole op is two
    // linear passes with one broadcast join — no window over the fact.
    "q_winsorize" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val bounds = li.groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, 0.05)").as("lo"),
            expr("percentile(l_extendedprice, 0.95)").as("hi"))
        li.join(broadcast(bounds), "l_returnflag")
          .select(col("l_returnflag"),
            greatest(least(col("l_extendedprice"), col("hi")), col("lo"))
              .as("w"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("w")), 4).as("wmean"),
            round(min(col("w")), 2).as("wmin"),
            round(max(col("w")), 2).as("wmax"))
      },
      """WITH bounds AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l.l_returnflag, count(*) AS n,
        |  round(avg(greatest(least(l_extendedprice, hi), lo)), 4) AS wmean,
        |  round(min(greatest(least(l_extendedprice, hi), lo)), 2) AS wmin,
        |  round(max(greatest(least(l_extendedprice, hi), lo)), 2) AS wmax
        |FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
        |GROUP BY l.l_returnflag""".stripMargin)
  )
}
