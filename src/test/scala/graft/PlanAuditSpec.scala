package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits: the properties that decide whether a plan
  * survives a 100x scale-up, asserted against the actual executed plan.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("filters are pushed down to the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(event_type)") || p.contains("EqualTo(event_type"), p)
  }

  test("projection prunes the parquet read schema") {
    val p = plan("q_filter_project")
    // only event_id, user_id, event_type, value should be read — props
    // (the widest column) must not appear in ReadSchema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), readSchema)
  }

  test("star join broadcasts every dimension (no fact shuffle for dims)") {
    val p = plan("q_join_star")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts\n$p")
    // the only shuffle-exchange allowed: lineitem<->orders join + final agg
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"too many shuffles ($exchanges)\n$p")
  }

  test("bucketed co-located join + per-key agg runs with ZERO shuffles") {
    // Both sides bucketed on custkey at write time (one file per bucket,
    // per-bucket sorted), so the merge join AND the per-custkey aggregate
    // reuse the write-time distribution: a plan with any Exchange here
    // means the layout lever is broken and a 100 TB fact join re-shuffles.
    val p = plan("q_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join plan must have no shuffle exchange\n$p")
  }

  test("incr_agg: the delta scan is date-pushed, base is never rescanned") {
    // Incremental maintenance means the orders table appears ONCE in the
    // plan (the delta branch), and that scan carries the pushed cutoff
    // predicate — a second orders scan or an unfiltered one means the
    // "incremental" query quietly recomputed the base.
    val p = plan("q_incr_agg")
    val ordersScans = "orders\\.parquet".r.findAllIn(p).length
    assert(ordersScans == 1, s"expected 1 orders scan, got $ordersScans\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"delta scan must push the cutoff filter\n$p")
  }

  test("incr_delete: repair recompute is a pruned broadcast semi-join") {
    // The MAX-repair branch may only rescan the TOUCHED groups: the base
    // scan feeds a LeftSemi against the (broadcast, tiny) touched-key
    // set. No semi join → the repair path degenerated to a full-group
    // recompute and the retraction is incremental in name only.
    val p = plan("q_incr_delete")
    assert(p.contains("LeftSemi"), s"expected a semi-join prune\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"touched-key set must broadcast\n$p")
  }

  test("corr matrix: ONE fact scan, all moments in one agg pair, no Expand") {
    // k(k+3)/2 moment sums must be partial aggregates of a single pass —
    // a per-pair or per-column scan would read the fact table 6-10x.
    val p = plan("q_corr_matrix")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 lineitem scan, got $scans\n$p")
    assert(!p.contains("Expand"), p)
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs <= 2, s"expected one partial/final agg pair, got $aggs\n$p")
  }

  test("dq drift: both slices' metrics come from ONE conditional-agg scan") {
    val p = plan("q_dq_drift")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 orders scan, got $scans\n$p")
  }

  test("incr_distinct: the delta scan pushes the event-time cutoff") {
    val p = plan("q_incr_distinct")
    assert(p.contains("GreaterThanOrEqual(ts"),
      s"delta scan must push the ts cutoff\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected state + delta scans only, got $scans\n$p")
  }

  test("incr_window: delta scan pushes the mid-window ts cutoff; " +
    "state + delta scans only") {
    // The maintained windowed view must never re-window history: the
    // plan reads the tiny state artifact plus ONE events scan whose
    // pushed predicate starts at the cutoff instant.
    val p = plan("q_incr_window")
    assert(p.contains("GreaterThanOrEqual(ts"),
      s"delta scan must push the ts cutoff\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected state + delta scans only, got $scans\n$p")
  }

  test("incr_hopping: delta scan pushes the mid-window ts cutoff; " +
    "state + delta scans only") {
    val p = plan("q_incr_hopping")
    assert(p.contains("GreaterThanOrEqual(ts"),
      s"delta scan must push the ts cutoff\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected state + delta scans only, got $scans\n$p")
  }

  test("incr_session: neighbor repair is pruned to touched users by " +
    "broadcast semi/anti joins; the window sort never sees untouched state") {
    val p = plan("q_incr_session")
    // the touched-user set broadcasts both ways: semi (repair input) and
    // anti (pass-through) — with state partitioned by user, these prune
    // the repair to the touched partitions at any scale
    assert(p.contains("LeftSemi"), s"missing touched-user semi join\n$p")
    assert(p.contains("LeftAnti"), s"missing untouched anti join\n$p")
    // the raw event HISTORY is never re-sessionized: every events scan in
    // the plan carries the delta predicate (event_id % 13 = 0), so each is
    // O(|Δ|); the compact session state is read once per routing branch
    val scanLines = p.linesIterator.filter(_.contains("FileScan parquet"))
      .toSeq
    val eventScans = scanLines.filter(_.contains("events.parquet"))
    assert(eventScans.nonEmpty &&
      eventScans.forall(_.contains("% 13)")),
      s"an events scan lacks the delta predicate\n$p")
    val stateScans = scanLines.size - eventScans.size
    assert(stateScans == 2,
      s"expected the 2 state routing-branch scans, got $stateScans\n$p")
    // the two identical touched-user broadcast builds dedupe at runtime
    // via exchange reuse (canonical-plan equality under AQE)
    assert("BroadcastExchange".r.findAllIn(p).length == 2, p)
    // the interval merge's window sort sits ABOVE the semi join (post-
    // prune), not over the full state union
    val win = p.indexOf("Window")
    val semi = p.indexOf("LeftSemi")
    assert(win >= 0 && semi > win,
      s"window sort must consume the pruned branch\n$p")
  }

  test("mv_global: the served no-key rollup reads |state| + one pushed " +
    "delta scan, never the history") {
    val p = plan("q_mv_global")
    val ordersScans = "orders\\.parquet".r.findAllIn(p).length
    assert(ordersScans == 1, s"expected 1 orders scan, got $ordersScans\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"delta scan must push the cutoff\n$p")
    // the state artifact is a plan leaf — ANY orders view may serve a
    // global aggregate (first successful signature wins, all correct):
    // the custkey rollup (original or refreshed) or the two-key
    // status/priority view
    val stateLeaf = Seq(
      Option(operators.Incremental.mvStateDir(sfDir)),
      Option(operators.Incremental.mvRefreshedStateDir(sfDir)),
      Option(operators.Incremental.mvRollupStateDir(sfDir)))
      .flatten.exists(p.contains)
    assert(stateLeaf, s"no MV state leaf in the served global plan\n$p")
    // the re-aggregate stacks above the merge: >= 3 aggregate layers
    // (delta partial, merge, global), each with its partial/final split
    assert("HashAggregate".r.findAllIn(p).length >= 6, p)
  }

  test("mv_distinct: the pair-set view serves with one ts-pushed events " +
    "scan; the delta pre-deduplicates before the union") {
    val p = plan("q_mv_distinct")
    assert(p.contains(operators.Incremental.mvDistinctStateDir(sfDir)),
      s"must serve from the pair-set state\n$p")
    val eventScans = "events\\.parquet".r.findAllIn(p).length
    assert(eventScans == 1, s"expected 1 events scan, got $eventScans\n$p")
    // the union's dedup + the final count are aggregates; the delta-side
    // distinct adds a third layer — all partial/final split
    assert("HashAggregate".r.findAllIn(p).length >= 6, p)
  }

  test("mv_refresh_delete: the retraction-refreshed view serves from the " +
    "new state with the ADVANCED cutoff pushed") {
    val p = plan("q_mv_refresh_delete")
    assert(p.contains(operators.Incremental.mvDeleteRefreshedDir(sfDir)),
      s"must serve from the retraction-refreshed state\n$p")
    assert(!p.contains(operators.Incremental.mvDeleteStateDir(sfDir)),
      s"the pre-delete artifact must have left the plan\n$p")
    val ordersScans = "orders\\.parquet".r.findAllIn(p).length
    assert(ordersScans == 1, s"expected 1 orders scan, got $ordersScans\n$p")
    assert(p.contains("2001-06-01"),
      s"the delta scan must carry the advanced cutoff\n$p")
  }

  test("mv_ddl: the dialect-created view serves the dialect pull query " +
    "from its state artifact with the pushed delta cutoff") {
    val p = plan("q_mv_ddl")
    assert(p.contains(
      graft.ksql.KsqlQueries.mvDdlDir(spark, sfDir) + "/state"),
      s"must serve from the DDL-built state\n$p")
    val ordersScans = "orders\\.parquet".r.findAllIn(p).length
    assert(ordersScans == 1, s"expected 1 orders scan, got $ordersScans\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"delta scan must push the DDL's cutoff\n$p")
  }

  test("mv_join: the join view serves from state + ONE date-pushed " +
    "orders scan with the dim joined on the delta branch only") {
    val p = plan("q_mv_join")
    assert(p.contains(operators.Incremental.mvJoinStateDir(sfDir)),
      s"must serve from the join-view state\n$p")
    val ordersScans = "orders\\.parquet".r.findAllIn(p).length
    assert(ordersScans == 1, s"expected 1 orders scan, got $ordersScans\n$p")
    val custScans = "customer\\.parquet".r.findAllIn(p).length
    assert(custScans == 1, s"expected 1 customer scan, got $custScans\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"the delta's orders scan must push the cutoff\n$p")
    // the dim side joins broadcast — the fact delta never shuffles for it
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("mv_join_star: the 3-table chain serves from state + one pushed " +
    "fact scan, both dims broadcast") {
    val p = plan("q_mv_join_star")
    assert(p.contains(operators.Incremental.mvJoinStarStateDir(sfDir)),
      s"must serve from the star view's state\n$p")
    val ordersScans = "orders\\.parquet".r.findAllIn(p).length
    assert(ordersScans == 1, s"expected 1 orders scan, got $ordersScans\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"both dims must broadcast on the delta branch\n$p")
  }

  test("mv_ddl_refresh: the dialect-refreshed view serves ONLY the new " +
    "artifact with the advanced cutoff pushed") {
    val p = plan("q_mv_ddl_refresh")
    val t = graft.ksql.KsqlQueries.mvRefreshDir(spark, sfDir)
    assert(p.contains(s"$t/state2"),
      s"must serve from the refreshed artifact\n$p")
    val all = java.util.regex.Pattern.quote(s"$t/state").r
      .findAllIn(p).length
    val ref = java.util.regex.Pattern.quote(s"$t/state2").r
      .findAllIn(p).length
    assert(all == ref, s"the pre-refresh artifact must be gone\n$p")
    assert(p.contains("2001-06-01"),
      s"the delta scan must carry the ADVANCED cutoff\n$p")
  }

  test("dq-checks suite shares scans: three aggregates, no row widening") {
    val p = plan("q_dq_checks")
    // the FK-containment branch must be a semi join, never an outer/inner
    // join that widens rows before counting
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("partial_count") || "HashAggregate.*partial".r.findFirstIn(p).isDefined, p)
  }

  test("aggregation is map-side partial before the shuffle") {
    val p = plan("q_agg_core")
    assert(p.contains("partial_sum") || p.contains("partial_count")
      || "HashAggregate.*partial".r.findFirstIn(p).isDefined, p)
  }

  test("whole-stage codegen covers the scan->filter->project pipeline") {
    val p = plan("q_filter_project")
    // codegen stages render as "*(n) Operator" in the plan string
    assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, p)
  }

  test("native vector expressions stay inside codegen (no BatchEvalPython/UDF)") {
    val p = plan("q_dedup_embed")
    assert(!p.contains("BatchEval"), p)
    assert(p.contains("vec_dot") || p.contains("WholeStageCodegen"), p)
  }

  test("minhash candidate join is an equi-join, not a cartesian product") {
    val p = plan("q_dedup_minhash")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin")
      || p.indexOf("BroadcastNestedLoopJoin") > p.indexOf("band_key"), p)
  }

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 100k rows, ~90% on key 1 → one fat shuffle partition
      val left = spark.range(100000)
        .select(when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(2000).select(col("id").as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k")
      // execute THIS plan (count()/foreach plan derived queries and the
      // adaptive re-plan would not be visible on joined's QueryExecution)
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(4000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANN brute force broadcasts the probe side, never shuffles the corpus") {
    val df = SparkEntry.queries("q_ann_brute")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("tfidf top-k gets the map-side rank prune (WindowGroupLimit)") {
    val p = plan("q_tfidf")
    // Spark inserts WindowGroupLimit below the rank shuffle: each map
    // task forwards at most k rows per doc instead of every (doc, term)
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("bm25 prunes to query terms and plans the top-n as TakeOrdered") {
    val df = SparkEntry.queries("q_bm25")(spark, sfDir)
    val op = df.queryExecution.optimizedPlan.toString
    // the term IN (...) prefilter must survive optimization (it keeps
    // the tf shuffle to matching terms only)
    assert(op.contains("INSET") || op.contains("IN ("), op.take(3000))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("contamination join carries only gram hashes (equi-join, no cartesian)") {
    val p = plan("q_contamination")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("fuzzy dedup joins on the full blocking key") {
    val df = SparkEntry.queries("q_dedup_fuzzy")(spark, sfDir)
    val p = df.queryExecution.optimizedPlan.toString
    // all three blocking columns must be join keys, not post-join filters
    assert(p.contains("lang") && p.contains("len_bucket") && p.contains("tok0"),
      p.take(3000))
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("scalar-subquery shape broadcasts the one-row aggregate") {
    val df = SparkEntry.queries("q_subquery_scalar")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(2000))
  }

  test("tpch q5 broadcasts the dims; the fact pair is the only shuffled join") {
    val p = plan("q_tpch_q5")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts\n${p.take(3000)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"too many shuffles ($exchanges)\n${p.take(3000)}")
  }

  test("sessionize plans ONE exchange: both window passes share the user_id partitioning") {
    val df = SparkEntry.queries("q_sessionize")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"lag + running-sum should reuse one user_id shuffle\n$p")
  }

  test("ngram frequency plans partial aggregation and a top-k take, not a global sort") {
    val df = SparkEntry.queries("q_ngram_freq")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || "HashAggregate.*partial".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("table upsert shuffles each side once on the key (partial aggs before the merge)") {
    val df = SparkEntry.queries("q_table_upsert")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"one exchange per side max\n$p")
  }

  test("salted join replicates only the small side and keeps the equi-join shape") {
    val p = plan("q_salted_join")
    // the explode (replication) must sit on the aggregated dim side,
    // never on the fact scan; join stays hash/sort-merge equi
    assert(p.contains("Generate explode"), p.take(2000))
    assert(!p.toLowerCase.contains("cartesianproduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p.take(2000))
  }

  test("dedup-keep plans the duplicate list as a broadcast anti-join") {
    val p = plan("q_dedup_keep")
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("lm-score count tables partial-aggregate before their shuffles") {
    val p = plan("q_lm_score")
    // three aggregations (bigram counts, left counts, per-doc mean) —
    // each plans partial_ before final; no cartesian anywhere
    assert("partial_count".r.findAllIn(p).length >= 2, p.take(3000))
    assert(!p.toLowerCase.contains("cartesianproduct"), p.take(3000))
  }

  test("graph ANN beam expansion is an equi-join on node id") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val g = Similarity.knnGraph(emb, dim = 64)
    val p = g.queryExecution.executedPlan.toString
    // candidate generation joins on bucket — equi, never cartesian
    assert(!p.toLowerCase.contains("cartesianproduct"), p.take(3000))
    assert(p.contains("bucket"), p.take(3000))
  }

  test("mix sampler broadcasts the rate table; the corpus never shuffles for the gate") {
    val p = plan("q_mix_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the only exchanges allowed belong to the tiny rate-table aggs,
    // all pre-broadcast — the documents scan side must join broadcast
    assert(!p.toLowerCase.contains("cartesianproduct")
      || p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("chunking is a pure projection: zero exchanges in the plan") {
    val p = plan("q_chunk_docs")
    assert(!p.contains("Exchange"), p.take(3000))
    assert(p.contains("Generate"), p.take(3000))  // the posexplode
  }

  test("embedding centroid partial-aggregates the rows×dims shuffle") {
    val p = plan("q_embed_centroid")
    assert("partial_avg|partial_.*avg".r.findFirstIn(p).isDefined
      || p.contains("partial"), p.take(3000))
    assert(!p.toLowerCase.contains("cartesianproduct"), p.take(3000))
  }

  test("bloom semi join plans might_contain as a fact-scan filter before the join") {
    val p = plan("q_bloom_semijoin")
    assert(p.contains("might_contain"), p.take(3000))
    assert(p.contains("LeftSemi"), p.take(3000))
    // the bloom predicate is a Filter below the join (prunes the scan),
    // not a post-join residual: it must appear AFTER the join operator
    // line in the plan dump (plans print top-down)
    assert(p.indexOf("might_contain") > p.indexOf("LeftSemi"), p.take(5000))
  }

  test("tpch q10 broadcasts both dims and takes the top-20 without a global sort") {
    val p = plan("q_tpch_q10")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    // quarter + returnflag predicates push into the fact scans
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)")
      || p.contains("EqualTo(l_returnflag,R)"), p.take(5000))
  }

  test("text normalization is a shuffle-free codegen projection") {
    val p = plan("q_text_normalize")
    assert(!p.contains("Exchange"), p.take(3000))
    assert(!p.contains("BatchEval"), p.take(3000))  // native expr, no UDF
    assert(p.contains("WholeStageCodegen")
      || "\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("sequence packing never plans a single-partition global window") {
    val p = plan("q_pack_sequences")
    // the per-row cumsum must partition by the range key; the only
    // allowed unpartitioned window is over the 64 range TOTALS
    // (post-aggregate), which plans as SinglePartition over 64 rows —
    // so assert the per-row window carries the rng partitioning
    assert(p.contains("Window"), p.take(3000))
    assert("Window .*rng".r.findFirstIn(p).isDefined
      || p.contains("windowspecdefinition(rng"), p.take(5000))
    // range offsets join back as a broadcast, not a shuffle join
    assert(p.contains("BroadcastHashJoin"), p.take(5000))
  }

  test("url dedup is per-row string algebra + one grouping shuffle") {
    val p = plan("q_dedup_url")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected <=1 shuffle, got $exchanges\n${p.take(3000)}")
    assert(p.contains("partial"), p.take(3000))  // map-side combine first
  }

  test("runtime bloom-filter pruning injects into a selective shuffle join") {
    // At 100 TB a fact⋈dim shuffle join with a selective dim filter
    // should prune fact rows BEFORE the shuffle via an injected bloom
    // filter. Locally the size thresholds never trigger, so pin them
    // down (and disable broadcast so the join actually shuffles) just
    // for this plan; conf restores in finally so the shared session is
    // untouched for other suites.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = Tables.part(spark, sfDir).filter(col("p_size") === 1)
        .select(col("p_partkey"), col("p_name"))
      val fact = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_quantity"))
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"), p.take(3000))
      // pruning must not change results: the bloom filter is a
      // might-contain prefilter, the equi-join still decides membership
      val expected = Tables.lineitem(spark, sfDir)
        .join(broadcast(Tables.part(spark, sfDir).filter(col("p_size") === 1)),
          col("l_partkey") === col("p_partkey")).count()
      assert(joined.count() == expected)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("tpch q6 pushes every predicate to the scan and joins nothing") {
    val p = plan("q_tpch_q6")
    assert(!p.contains("Join"), p)
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount")
      && pushed.contains("l_quantity"), pushed)
  }

  test("tpch q14 broadcasts the part dim over the date-pruned fact") {
    val p = plan("q_tpch_q14")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.linesIterator.find(_.contains("PushedFilters"))
      .exists(_.contains("l_shipdate")), p)
  }

  test("quality-logit classifier is a pure projection (zero shuffles)") {
    val p = plan("q_quality_logit")
    assert(!p.contains("Exchange"), p)
  }

  test("winnowing runs shuffle-free (array-native window-min, no sort)") {
    val p = plan("q_winnowing")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Sort "), p)
  }

  test("column profiler: two passes, hash-aggregated, never Expand+sort") {
    val p = plan("q_profile")
    // two scans of orders (counts/min-max + distincts), not six — the
    // oracle's UNION ALL shape; and NO Expand: the round-8 rewrite
    // replaced multi-countDistinct's Expand(7x) + string-buffer
    // SortAggregate cascade with a map-explode unpivot that stays in
    // HashAggregate end to end
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"expected <=2 scans, got $scans\n$p")
    assert(!p.contains("Expand"), p)
    // the distinct pass must stay hash-aggregated; the only acceptable
    // SortAggregate is the EMPTY-key global pass-A (string min/max
    // buffers, no keys -> no Sort node, nothing actually sorts)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Sort ["), p)
  }

  test("ANN rerank candidates come from a bucket equi-join, not a cartesian") {
    val p = plan("q_ann_rerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("tpch q4 plans the EXISTS as a semi join on pre-filtered keys") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), p)
    // the lineitem side carries only the key + pushed quantity filter
    assert(p.contains("GreaterThanOrEqual(l_quantity,45.0)")
      || p.contains("l_quantity"), p)
  }

  test("tpch q7 broadcasts all four dims; lineitem-orders is the only wide shuffle") {
    val p = plan("q_tpch_q7")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"too many shuffles ($exchanges)\n$p")
  }

  test("tpch q8 computes market share in ONE aggregation pass") {
    val p = plan("q_tpch_q8")
    // conditional + total sums together: exactly one partial/final agg
    // pair over the joined fact, never two scans of the join
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs <= 4, s"expected one partial/final agg pair (AQE may stage), got $aggs\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 8, s"each table scanned once, got $scans\n$p")
  }

  test("tpch q15 takes the max as a broadcast aggregate, not a re-scan or sort") {
    val p = plan("q_tpch_q15")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("Sort global"), p)
  }

  test("tpch q17 joins the per-part threshold broadcast (correlated subquery as hash join)") {
    val p = plan("q_tpch_q17")
    val broadcasts = "Broadcast".r.findAllIn(p).length
    assert(broadcasts >= 2, s"part dim AND threshold agg should broadcast\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch q22 anti-joins the order keys and broadcasts the scalar mean") {
    val p = plan("q_tpch_q22")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("tpch q2 argmin: part segment broadcast-prunes the scan; ONE window after the agg") {
    val p = plan("q_tpch_q2")
    // the part-segment filter must reach the fact scan as a broadcast
    // join (not a post-agg filter), and the per-part min is a single
    // partitioned Window over the (part, supp) aggregate — never a
    // second shuffle-join against a derived min frame
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"(part,supp) agg + per-part window only, got $exchanges\n$p")
  }

  test("tpch q9 broadcasts part/supplier/nation; lineitem-orders is the only wide shuffle") {
    val p = plan("q_tpch_q9")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"too many shuffles ($exchanges)\n$p")
  }

  test("tpch q11 broadcasts the global-sum threshold over the checkpointed part frame") {
    val p = plan("q_tpch_q11")
    // the per-part frame is localCheckpointed (referenced as rows AND as
    // the global sum) — no second lineitem scan; the threshold is a
    // broadcast scalar
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"), p)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"rows must come from the checkpointed frame, got $scans scans\n$p")
  }

  test("tpch q16 anti-joins the excluded suppliers as a broadcast") {
    val p = plan("q_tpch_q16")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch q20 semi-joins the qualifying keys broadcast into the supplier dim") {
    val p = plan("q_tpch_q20")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch q21 plans the EXISTS/NOT EXISTS pair as equi semi/anti joins") {
    val p = plan("q_tpch_q21")
    // both self-probes are equi-joins on orderkey with the supplier
    // inequality as a residual condition — never a cross product
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("oov rate broadcasts the vocab; tokens aggregate map-side per doc") {
    val p = plan("q_oov_rate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrdered"), s"vocab top-K should plan as TakeOrdered\n$p")
    assert("partial_count|partial_sum".r.findFirstIn(p).isDefined, p)
  }

  test("heavy hitters: bucket totals partial-aggregate from the histogram (no second corpus scan)") {
    val p = plan("q_heavy_hitters")
    // the corpus explode feeds ONE histogram; bucket totals and the
    // top-30 probe both derive from the checkpointed histogram
    assert(!p.contains("CartesianProduct"), p)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"corpus must come from the checkpointed histogram, got $scans scans\n$p")
  }

  test("char entropy: char counts partial-aggregate map-side; no cartesian") {
    val p = plan("q_text_entropy")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    // explode -> (doc, ch) agg -> doc agg -> join ttr: the doc-level agg
    // reuses the (doc_id, ch) partitioning's doc_id component never, so
    // the ceiling is 2 agg exchanges + the join's two sides
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 4, s"expected <= 4 exchanges, got $exchanges\n$p")
  }

  test("embed projection is a pure per-row pipeline (zero exchanges)") {
    val p = plan("q_embed_project")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("incremental dedup broadcasts the arriving batch; corpus never shuffles as pairs") {
    val p = plan("q_dedup_incremental")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dialect lambda and array-fn queries are pure projections (zero exchanges)") {
    for (q <- Seq("q_ksql_lambda", "q_ksql_arrayfns")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q:\n$p")
    }
  }

  test("OHLC bars are one hash aggregate — no per-window sort, no window operator") {
    val p = plan("q_window_ohlc")
    assert("partial_min|partial_max".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("Window"), s"min_by/max_by must not plan a window sort\n$p")
  }

  test("dsir: count tables partial-aggregate; one-row totals broadcast") {
    val p = plan("q_dsir_weights")
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"scalar totals should broadcast into the token stream\n$p")
  }

  test("split leakage runs corpus-vs-split as shuffle equi-joins (no forced broadcast)") {
    // broadcastNew = false here: the eval split is ~10% of the CORPUS,
    // so the band index must NOT be forced executor-resident — the
    // plan's joins stay equi (hash/sort-merge; AQE may still downgrade
    // to broadcast at runtime when the split turns out tiny)
    val p = plan("q_split_leakage")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("global guard: no query plans a cartesian product or an " +
      "unpartitioned data-sized window") {
    // Would have caught the round-6 q_asof_join shape (per-key pair
    // blowup via inequality join) at introduction time. Two invariants
    // over EVERY registered query plan:
    //   1. no CartesianProduct anywhere (a non-broadcast nested-loop
    //      join is planned as CartesianProduct; BroadcastNestedLoopJoin
    //      is allowed — its build side is broadcast by definition and
    //      every use here is a one-row/tiny aggregate);
    //   2. no partition-less Window operator — a window with no
    //      PARTITION BY funnels the whole input through one task.
    // Allowlisted: q_pack_sequences' second window runs over the
    // CONSTANT 64-row bucket-offsets frame (two-level prefix sum) —
    // unpartitioned by design and corpus-size-independent; q_ks_test's
    // ECDF running sum runs over the per-VALUE aggregate (the bounded
    // value grid — continuous data gets quantile-bucketed first at
    // scale, like q_psi_drift), same constant-frame class.
    // q_dq_anomaly's trailing-7-day window runs over the per-DAY
    // aggregate (one row per calendar day — bounded by the time span,
    // not the fact-table size), same pre-aggregated class.
    // q_dq_freshness's high-water-mark window runs over the per-
    // event-type aggregate (|event types| rows), same class.
    val unpartitionedWindowOk =
      Set("q_pack_sequences", "q_ks_test", "q_dq_anomaly", "q_dq_freshness")
    // a Window operator line prints "Window [exprs], [partition],
    // [sort]" with EMPTY lists omitted — so two bracket groups is
    // ambiguous: (exprs, partition) for an orderBy-less window vs
    // (exprs, sort) for a partition-less one. Disambiguate on the LAST
    // group: a sort list carries ASC/DESC, a partition list never does.
    def unpartitionedWindow(plan: String): Boolean =
      plan.linesIterator.exists { l =>
        val op = l.dropWhile(c => !c.isLetter)
        if (!op.startsWith("Window ")) false
        else "\\], \\[".r.findAllIn(op).length match {
          case n if n >= 2 => false // [exprs], [partition], [sort]
          case 1 => // partitioned-unordered vs unpartitioned-ordered
            op.matches(".*\\], \\[[^\\[\\]]*(ASC|DESC)[^\\[\\]]*\\]\\s*$")
          case _ => true // bare [exprs]: neither partition nor sort
        }
      }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val p = try fn(spark, sfDir).queryExecution.executedPlan.toString
          catch { case e: Throwable =>
            s"PLAN_ERROR ${e.getClass.getSimpleName}: ${e.getMessage}" }
        Seq(
          p.contains("CartesianProduct") -> "CartesianProduct in plan",
          p.startsWith("PLAN_ERROR") -> p.take(300),
          (!unpartitionedWindowOk(name) && unpartitionedWindow(p)) ->
            "partition-less Window over data-sized input"
        ).collect { case (true, msg) => s"$name: $msg" }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
