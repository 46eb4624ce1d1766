package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** Deequ-style declarative data-quality validation (the
  * "unit tests for data" layer every 100 TB ingest pipeline runs before
  * a drop of data reaches training): completeness, uniqueness,
  * accepted-value and range conformance, referential integrity, and
  * distribution summaries, emitted as one tall (check_name, metric)
  * frame a scheduler can threshold on.
  *
  * Scale posture — the whole suite is THREE scans, not one per check:
  *   - every per-column metric over a table folds into ONE partial
  *     aggregate (a single HashAggregate pass producing a 1-row frame:
  *     counts, conformance counters, means, extrema all together — at
  *     100 TB the scan dominates, so checks must share it);
  *   - exact uniqueness is its own pass (a distinct count cannot share
  *     the partial-agg buffer without an Expand cascade — the q_profile
  *     round-8 lesson);
  *   - referential integrity is a LEFT SEMI join on the FK (no row
  *     widening, map-side pruning under AQE; the 1-row result frames
  *     are then cross-joined — three single-row inputs — and unpivoted
  *     via stack() into the tall report).
  */
object DataQuality {

  def entries: Map[String, Q] = Map(
    // The validation suite over lineitem/orders: 10 checks, 3 scans.
    "q_dq_checks" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        // scan 1: every lineitem metric in one partial-agg pass.
        // Fractions are exact-int count ratios (bit-stable across
        // partition orderings — a float avg over CASE values would sum
        // in nondeterministic order); means of integer-valued doubles
        // are exact sums < 2^53, rounded only as a compare guard.
        // nullif guards: ANSI mode errors on x/0, and the validation
        // suite must stay TOTAL on a 0-row table (the empty-input gate)
        // — a null metric, not a crash, is the right answer there.
        val nLi = nullif(count(lit(1)), lit(0L))
        val liAgg = li.agg(
          count(lit(1)).cast("double").as("dq_rows_lineitem"),
          (count(col("l_shipdate")) / nLi)
            .as("dq_completeness_shipdate"),
          (count(when(col("l_returnflag").isin("A", "N", "R"), 1)) /
            nLi).as("dq_accepted_returnflag"),
          (count(when(col("l_discount").between(0.0, 0.1), 1)) /
            nLi).as("dq_range_discount"),
          (count(when(col("l_quantity") > 0, 1)) / nLi)
            .as("dq_positive_quantity"),
          round(avg(col("l_quantity")), 6).as("dq_mean_quantity"),
          round(max(col("l_extendedprice")), 6).as("dq_max_extendedprice"))
        // scan 2: orders key uniqueness + FK-column completeness
        val nOrd = nullif(count(lit(1)), lit(0L))
        val ordAgg = ord.agg(
          (countDistinct(col("o_orderkey")) / nOrd)
            .as("dq_unique_orderkey"),
          (count(col("o_custkey")) / nOrd)
            .as("dq_completeness_custkey"))
        // scan 3: referential integrity lineitem.l_orderkey ⊆ orders —
        // LEFT SEMI keeps only matching FK rows (never widens), so the
        // metric is matched/total. The total reuses scan 1's count via
        // the cross join below rather than a fourth scan.
        val matched = li.select(col("l_orderkey"))
          .join(ord.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
          .agg(count(lit(1)).cast("double").as("dq_fk_matched"))
        val row = liAgg.crossJoin(ordAgg).crossJoin(matched)
          .withColumn("dq_fk_containment_orderkey",
            col("dq_fk_matched") / nullif(col("dq_rows_lineitem"), lit(0.0)))
          .drop("dq_fk_matched")
        val checks = row.columns
        row.selectExpr(
          s"stack(${checks.length}, " +
            checks.map(c => s"'$c', `$c`").mkString(", ") +
            ") as (check_name, metric)")
      },
      """WITH li AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS dq_rows_lineitem,
        |    count(l_shipdate) / count(*) AS dq_completeness_shipdate,
        |    count(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 END)
        |      / count(*) AS dq_accepted_returnflag,
        |    count(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 END)
        |      / count(*) AS dq_range_discount,
        |    count(CASE WHEN l_quantity > 0 THEN 1 END) / count(*)
        |      AS dq_positive_quantity,
        |    round(avg(l_quantity), 6) AS dq_mean_quantity,
        |    round(max(l_extendedprice), 6) AS dq_max_extendedprice
        |  FROM lineitem
        |), ord AS (
        |  SELECT count(DISTINCT o_orderkey) / count(*) AS dq_unique_orderkey,
        |    count(o_custkey) / count(*) AS dq_completeness_custkey
        |  FROM orders
        |), fk AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS dq_fk_matched FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders)
        |), onerow AS (
        |  SELECT li.*, ord.*, fk.dq_fk_matched / li.dq_rows_lineitem
        |    AS dq_fk_containment_orderkey
        |  FROM li, ord, fk
        |)
        |SELECT u.check_name, u.metric FROM onerow,
        |  LATERAL (VALUES
        |    ('dq_rows_lineitem', dq_rows_lineitem),
        |    ('dq_completeness_shipdate', dq_completeness_shipdate),
        |    ('dq_accepted_returnflag', dq_accepted_returnflag),
        |    ('dq_range_discount', dq_range_discount),
        |    ('dq_positive_quantity', dq_positive_quantity),
        |    ('dq_mean_quantity', dq_mean_quantity),
        |    ('dq_max_extendedprice', dq_max_extendedprice),
        |    ('dq_unique_orderkey', dq_unique_orderkey),
        |    ('dq_completeness_custkey', dq_completeness_custkey),
        |    ('dq_fk_containment_orderkey', dq_fk_containment_orderkey)
        |  ) AS u(check_name, metric)""".stripMargin),

    // Volume-anomaly detection (Deequ's anomaly checks / freshness
    // monitors): daily ingest row counts vs a trailing 7-day window —
    // a day whose count sits >3σ from the trailing mean flags. The
    // daily-count aggregate reduces the fact table to one row per day
    // BEFORE the window (partial agg map-side), so the window sort is
    // over days, never rows — the 100 TB shape for any "alert when
    // today looks wrong" monitor.
    "q_dq_anomaly" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.orders(s, d)
          .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val trailing = Window.orderBy(col("day")).rowsBetween(-7, -1)
        // the flag compares the ROUNDED stats: raw window stddevs land a
        // last-ulp apart across engines (Welford vs two-pass), and a
        // 3σ boundary day (|Δ| exactly 3σ) would flip the boolean — the
        // engine-identical rounded values make the comparison stable.
        daily
          .withColumn("mean7", round(avg(col("cnt")).over(trailing), 6))
          .withColumn("sd7", round(stddev_samp(col("cnt")).over(trailing), 6))
          .select(col("day"), col("cnt"), col("mean7"), col("sd7"),
            (col("sd7").isNotNull && col("sd7") > 0 &&
              abs(col("cnt") - col("mean7")) > col("sd7") * 3)
              .as("is_anomaly"))
      },
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
        |    count(*) AS cnt
        |  FROM orders GROUP BY 1
        |), w AS (
        |  SELECT day, cnt,
        |    avg(cnt) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS mean7,
        |    stddev_samp(cnt) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sd7
        |  FROM daily
        |), r AS (
        |  SELECT day, cnt, round(mean7, 6) AS mean7, round(sd7, 6) AS sd7
        |  FROM w
        |)
        |SELECT day, cnt, mean7, sd7,
        |  (sd7 IS NOT NULL AND sd7 > 0 AND abs(cnt - mean7) > sd7 * 3)
        |    AS is_anomaly
        |FROM r""".stripMargin),

    // Row-level quarantine (the badRecordsPath pattern): every row is
    // evaluated against the rule set in ONE projection pass — violating
    // rows land in the quarantine output with the list of failed rules
    // (concat_ws skips NULLs on both engines, so the reason list needs
    // no array machinery). At 100 TB this is a scan-speed filter: no
    // shuffle, no join — the valid branch streams on to training while
    // this branch is what an operator inspects.
    "q_dq_quarantine" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.select(col("l_orderkey"), col("l_linenumber"),
          concat_ws(",",
            when(col("l_quantity") > 45, lit("quantity_gt_45")),
            when(col("l_discount") > 0.08, lit("discount_gt_8pct")),
            when(col("l_tax") > 0.06, lit("tax_gt_6pct")),
            when(col("l_extendedprice") < 1500.0, lit("price_lt_1500")))
            .as("failed_rules"))
          .filter(col("failed_rules") =!= "")
      },
      """SELECT l_orderkey, l_linenumber,
        |  concat_ws(',',
        |    CASE WHEN l_quantity > 45 THEN 'quantity_gt_45' END,
        |    CASE WHEN l_discount > 0.08 THEN 'discount_gt_8pct' END,
        |    CASE WHEN l_tax > 0.06 THEN 'tax_gt_6pct' END,
        |    CASE WHEN l_extendedprice < 1500.0 THEN 'price_lt_1500' END)
        |    AS failed_rules
        |FROM lineitem
        |WHERE l_quantity > 45 OR l_discount > 0.08 OR l_tax > 0.06
        |  OR l_extendedprice < 1500.0""".stripMargin),

    // Distribution drift between two time slices (the "did yesterday's
    // ingest change shape" monitor) in ONE scan: both slices' metrics
    // are conditional partial aggregates of the same pass — never one
    // scan per slice. Money means go through exact BIGINT cents (two
    // float sums over differently-ordered partitions would differ in
    // the last ulp between engines); fractions are exact-int ratios.
    "q_dq_drift" -> Q(
      (s, d) => {
        val cutoff = lit("1998-01-01").cast("timestamp")
        val isBase = col("o_orderdate") < cutoff
        val cents =
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
        def frac(slice: org.apache.spark.sql.Column,
                 cond: org.apache.spark.sql.Column) =
          count(when(slice && cond, 1)) /
            nullif(count(when(slice, 1)), lit(0L))
        val row = Tables.orders(s, d).agg(
          count(when(isBase, 1)).cast("double").as("base_rows"),
          count(when(!isBase, 1)).cast("double").as("cur_rows"),
          (sum(when(isBase, cents)) / lit(100.0) /
            nullif(count(when(isBase, 1)), lit(0L))).as("base_mean_price"),
          (sum(when(!isBase, cents)) / lit(100.0) /
            nullif(count(when(!isBase, 1)), lit(0L))).as("cur_mean_price"),
          frac(isBase, col("o_orderstatus") === "F").as("base_frac_f"),
          frac(!isBase, col("o_orderstatus") === "F").as("cur_frac_f"),
          frac(isBase, col("o_orderpriority") === "1-URGENT")
            .as("base_frac_urgent"),
          frac(!isBase, col("o_orderpriority") === "1-URGENT")
            .as("cur_frac_urgent"))
        val metrics = Seq("rows", "mean_price", "frac_f", "frac_urgent")
        row.selectExpr(
          s"stack(${metrics.length}, " + metrics.map(m =>
            s"'$m', `base_$m`, `cur_$m`, `cur_$m` - `base_$m`")
            .mkString(", ") +
            ") as (metric, base_value, cur_value, drift)")
      },
      """WITH one AS (
        |  SELECT
        |    CAST(count(*) FILTER (o_orderdate <  TIMESTAMP '1998-01-01')
        |      AS DOUBLE) AS base_rows,
        |    CAST(count(*) FILTER (o_orderdate >= TIMESTAMP '1998-01-01')
        |      AS DOUBLE) AS cur_rows,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |        FILTER (o_orderdate < TIMESTAMP '1998-01-01') AS BIGINT)
        |      / 100.0
        |      / count(*) FILTER (o_orderdate < TIMESTAMP '1998-01-01')
        |      AS base_mean_price,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |        FILTER (o_orderdate >= TIMESTAMP '1998-01-01') AS BIGINT)
        |      / 100.0
        |      / count(*) FILTER (o_orderdate >= TIMESTAMP '1998-01-01')
        |      AS cur_mean_price,
        |    count(*) FILTER (o_orderdate < TIMESTAMP '1998-01-01'
        |        AND o_orderstatus = 'F') * 1.0
        |      / count(*) FILTER (o_orderdate < TIMESTAMP '1998-01-01')
        |      AS base_frac_f,
        |    count(*) FILTER (o_orderdate >= TIMESTAMP '1998-01-01'
        |        AND o_orderstatus = 'F') * 1.0
        |      / count(*) FILTER (o_orderdate >= TIMESTAMP '1998-01-01')
        |      AS cur_frac_f,
        |    count(*) FILTER (o_orderdate < TIMESTAMP '1998-01-01'
        |        AND o_orderpriority = '1-URGENT') * 1.0
        |      / count(*) FILTER (o_orderdate < TIMESTAMP '1998-01-01')
        |      AS base_frac_urgent,
        |    count(*) FILTER (o_orderdate >= TIMESTAMP '1998-01-01'
        |        AND o_orderpriority = '1-URGENT') * 1.0
        |      / count(*) FILTER (o_orderdate >= TIMESTAMP '1998-01-01')
        |      AS cur_frac_urgent
        |  FROM orders
        |)
        |SELECT u.metric, u.base_value, u.cur_value,
        |  u.cur_value - u.base_value AS drift
        |FROM one, LATERAL (VALUES
        |  ('rows', base_rows, cur_rows),
        |  ('mean_price', base_mean_price, cur_mean_price),
        |  ('frac_f', base_frac_f, cur_frac_f),
        |  ('frac_urgent', base_frac_urgent, cur_frac_urgent)
        |) AS u(metric, base_value, cur_value)""".stripMargin),

    // Bisectable reconciliation checksum (the "did the copy preserve
    // every row" migration/replication check): each row serializes to a
    // canonical string → 56-bit md5 hash; rows bucket by hash and each
    // bucket folds to bit_xor(h) + count. XOR is commutative/associative
    // and overflow-free, so the checksum is partition- and
    // order-independent — two systems compare 256 (bucket, n, xor) rows
    // instead of 100 TB, and a mismatch names the bucket to bisect into
    // (re-run on the bucket's rows with more buckets). One scan, one
    // partial-agg pass; money joins the serialization as exact cents
    // (a double's string form differs between engines).
    "q_dq_checksum" -> Q(
      (s, d) => {
        val rowStr = concat_ws("|",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"),
          date_format(col("o_orderdate"), "yyyy-MM-dd"))
        Tables.orders(s, d)
          .select(conv(substring(md5(rowStr), 1, 14), 16, 10)
            .cast("long").as("h"))
          .groupBy(pmod(col("h"), lit(256L)).as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("checksum"))
      },
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(
        |    o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|'
        |    || o_orderpriority || '|'
        |    || CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) || '|'
        |    || strftime(o_orderdate, '%Y-%m-%d')), 1, 14))::BIGINT AS h
        |  FROM orders
        |)
        |SELECT h % 256 AS bucket, count(*) AS n_rows,
        |  bit_xor(h) AS checksum
        |FROM h GROUP BY 1""".stripMargin),

    // Per-source freshness (the "is any feed stale" monitor): one scan
    // reduces events to a row per event_type (max ts); the corpus-wide
    // high-water mark comes from a window over that TINY grouped frame
    // (|event types| rows — the pre-aggregated unpartitioned-window
    // class, never the fact table), so no second scan and no self-join.
    // Lag compares in exact millis; the stale flag thresholds at 20 min.
    "q_dq_freshness" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy(col("event_type"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(max(unix_millis(col("ts"))).as("max_ms"))
          .withColumn("lag_ms", max(col("max_ms")).over(w) - col("max_ms"))
          .select(col("event_type"), col("max_ms"), col("lag_ms"),
            (col("lag_ms") > 20L * 60000L).as("is_stale"))
      },
      """WITH g AS (
        |  SELECT event_type, max(epoch_ms(ts)) AS max_ms
        |  FROM events GROUP BY 1
        |)
        |SELECT event_type, max_ms,
        |  (SELECT max(max_ms) FROM g) - max_ms AS lag_ms,
        |  ((SELECT max(max_ms) FROM g) - max_ms > 20 * 60000)
        |    AS is_stale
        |FROM g""".stripMargin),

    // CUSUM change-point detection per event_type (Page 1954 — the
    // classic "when did this feed's level shift" monitor; the 7-day
    // rolling z-score above catches spikes, CUSUM catches sustained
    // drifts a per-day threshold never trips on). Formulation keeps
    // every accumulation exact-int for cross-engine stability:
    // S_d = cumsum(cnt) − idx·mean, where cumsum and idx are integers
    // and only ONE pre-rounded double (the per-type daily mean) enters
    // the float arithmetic — a float running sum of residuals would
    // accumulate order-dependent ulps. The change point is the argmax
    // of |S| (min-day tie-break). One fact scan; the daily frame is
    // |types|×|days| rows, so the windows run on a pre-aggregated
    // micro-frame — at 100 TB the scan is the cost and everything
    // after is metadata-scale.
    "q_dq_cusum" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val stats = daily.groupBy(col("event_type"))
          .agg(round(sum(col("cnt")) * lit(1.0) / count(lit(1)), 6)
            .as("mean_daily"))
        val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val scored = daily.join(broadcast(stats), "event_type")
          .withColumn("cum", sum(col("cnt")).over(byDay))
          .withColumn("idx", row_number().over(byDay))
          .withColumn("abs_s",
            round(abs(col("cum") - col("idx") * col("mean_daily")), 6))
        val pick = Window.partitionBy(col("event_type"))
          .orderBy(col("abs_s").desc, col("day"))
        scored.withColumn("rk", row_number().over(pick))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("day").as("cp_day"),
            col("abs_s").as("cusum_max"), col("mean_daily"))
      },
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), stats AS (
        |  SELECT event_type, round(sum(cnt) * 1.0 / count(*), 6) AS mean_daily
        |  FROM daily GROUP BY 1
        |), w AS (
        |  SELECT d.event_type, d.day, s.mean_daily,
        |    sum(d.cnt) OVER (PARTITION BY d.event_type ORDER BY d.day) AS cum,
        |    row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS idx
        |  FROM daily d JOIN stats s USING (event_type)
        |), c AS (
        |  SELECT event_type, day, mean_daily,
        |    round(abs(cum - idx * mean_daily), 6) AS abs_s
        |  FROM w
        |), r AS (
        |  SELECT event_type, day, mean_daily, abs_s,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs_s DESC, day) AS rk
        |  FROM c
        |)
        |SELECT event_type, day AS cp_day, abs_s AS cusum_max, mean_daily
        |FROM r WHERE rk = 1""".stripMargin),

    // Benford first-digit conformance over invoice amounts (the
    // standard forensic-accounting / synthetic-data smell test: natural
    // multi-scale amounts follow P(d) = log10(1 + 1/d); flat generators
    // — like this synthetic corpus, loudly — do not). The digit is
    // extracted from the EXACT cents integer's decimal string, never
    // via log10 (a float log at a power-of-ten boundary flips the
    // digit on one engine and not the other); expected probabilities
    // are embedded as identical 10-digit literals in both engines.
    // One scan → 9-row digit histogram; everything downstream is
    // constant-size.
    "q_dq_benford" -> Q(
      (s, d) => {
        val spark = s
        import spark.implicits._
        val cents = floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
          .cast("long")
        val obs = Tables.lineitem(s, d)
          .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val benford = Seq(
          1 -> 0.3010299957, 2 -> 0.1760912591, 3 -> 0.1249387366,
          4 -> 0.0969100130, 5 -> 0.0791812460, 6 -> 0.0669467896,
          7 -> 0.0579919470, 8 -> 0.0511525224, 9 -> 0.0457574906)
          .toDF("digit", "benford_p")
        val tot = obs.agg(sum(col("n")).as("tot"))
        benford.join(obs, Seq("digit"), "left").crossJoin(broadcast(tot))
          .select(col("digit"),
            coalesce(col("n"), lit(0L)).as("n"),
            round(coalesce(col("n"), lit(0L)) / col("tot"), 6).as("obs_frac"),
            col("benford_p"),
            round(abs(coalesce(col("n"), lit(0L)) / col("tot")
              - col("benford_p")), 6).as("abs_dev"))
      },
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice * 100.0 + 0.5)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM lineitem
        |), obs AS (
        |  SELECT digit, count(*) AS n FROM d GROUP BY 1
        |), tot AS (SELECT sum(n) AS tot FROM obs),
        | bp AS (
        |  SELECT * FROM (VALUES (1, 0.3010299957), (2, 0.1760912591),
        |    (3, 0.1249387366), (4, 0.0969100130), (5, 0.0791812460),
        |    (6, 0.0669467896), (7, 0.0579919470), (8, 0.0511525224),
        |    (9, 0.0457574906)) AS t(digit, p)
        |)
        |SELECT bp.digit, coalesce(obs.n, 0) AS n,
        |  round(coalesce(obs.n, 0) / tot.tot, 6) AS obs_frac,
        |  CAST(bp.p AS DOUBLE) AS benford_p,
        |  round(abs(coalesce(obs.n, 0) / tot.tot - bp.p), 6) AS abs_dev
        |FROM bp LEFT JOIN obs ON obs.digit = bp.digit, tot""".stripMargin)
  )
}
