package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe: replicate the sf-dir `factor`× (id-shifted
  * copies, dims kept 1× like a TPC-H scale-up keeps region/nation) into
  * a scratch dir, then time a set of LINEAR-shaped queries at both
  * scales and print one JSON line of (query → seconds@1x, seconds@Nx).
  *
  * This is measurement scaffolding, NOT test data — correctness always
  * runs against the driver-generated parquet. Queries with pathological
  * behavior under exact duplication (minhash banding turns 10 identical
  * copies into ~45 pairs per doc — a 100% dup-rate corpus, quadratic in
  * the copy count by construction, not a scaling property) are simply
  * not in the default list; exact dedup IS (grouping collapses copies
  * linearly).
  *
  * Usage: runMain graft.ScaleProbe [srcDir] [scratchDir] [factor] [q...]
  */
object ScaleProbe {
  // The heavy-tail four (asof/graph/components/novelty) joined in round
  // 7: the earlier 8-query probe was all linear shapes and missed the
  // one super-linear join in the set (round-6 q_asof_join). Documents/
  // embeddings replicate with per-copy content variation (see below) so
  // content-bucketed ops measure organic growth, not the all-duplicate
  // pathology.
  // round 8 added the remaining bench heavy-tail (profile/winnowing/
  // pq): the r7 driver bench regressed exactly the queries nobody had
  // scale-probed, and "contention, not plans" needs the exponent on
  // record, not asserted
  // q_dedup_jaccard joined in round 10 with the prefix-filtered plan:
  // the old all-pairs form was excluded (replicated corpora are the
  // all-duplicate pathology for it); the vowel-rotated copies rewrite
  // word SETS, so jaccard's near-dup structure replicates ~linearly
  // and the prefix join's exponent is finally measurable (1.7× at 10×).
  // The EMBEDDING near-dup entries are NOT in the list, same reason as
  // minhash: the per-copy direction perturbation preserves cosine, so
  // replication makes every base vector a 10-copy near-dup family —
  // band buckets merge across copies (measured max bucket 2,285 vs
  // mean 39 at 10×) and candidate volume measures the all-duplicate
  // pathology, not organic growth. Their controlled exponents are
  // measured on independently-random corpora instead (SURVEY §6).
  // round 11 adds the new family: q_dq_checks/q_dq_anomaly (shared-scan
  // aggregates + semi join — linear by shape, on record), q_bucketed_join
  // (the zero-shuffle layout join; its prepare re-buckets the scratch
  // copy), q_jaro_winkler (blocked pairs — the vowel-rotated copies
  // rewrite first tokens, so blocks stay per-copy-sized) and
  // q_line_dedup (segment df counts — rotated copies keep segments
  // distinct across copies, so df structure grows organically).
  // The incremental-maintenance family probes q_incr_agg (state+delta
  // merge: both sides grow linearly, the merge is one key shuffle) and
  // q_incr_delete (retraction: the repair branch must stay pruned to
  // touched groups as the corpus grows); their prepares rebuild the
  // state artifacts against the scratch copy. q_dq_quarantine/q_dq_drift
  // are scan-shaped (zero-shuffle projection / one shared-scan agg).
  private val DefaultQueries = Seq(
    "q_agg_core", "q_join_star", "q_text_entropy", "q_dsir_weights",
    "q_dedup_exact", "q_ann_brute", "q_heavy_hitters", "q_tpch_q3",
    "q_asof_join", "q_novelty", "q_dedup_components", "q_ann_graph",
    "q_profile", "q_winnowing", "q_ann_pq", "q_dedup_jaccard",
    "q_dq_checks", "q_dq_anomaly", "q_bucketed_join", "q_jaro_winkler",
    "q_line_dedup",
    "q_incr_agg", "q_incr_delete", "q_dq_quarantine", "q_dq_drift",
    "q_incr_scd2", "q_corr_matrix", "q_dq_checksum",
    // round-11 late additions: q_bfs_hops's cost is the co-purchase
    // derivation join (the frontier walk itself stays seed-component-
    // sized on id-shifted copies — the graph becomes `factor` disjoint
    // copies, so the probe measures the linear derivation scan, which
    // is the 100 TB cost); q_dq_cusum/q_dq_benford are one-scan
    // aggregates over micro-frames — linear by shape, on record.
    // q_incr_window: state+delta windowed merge — both sides grow
    // linearly, the merge shuffles |windows|·|types| partials, never
    // events.
    // round 12: the remaining window-IVM shapes. q_incr_hopping is the
    // tumbling merge with a 2× delta fan-out (linear by shape);
    // q_incr_session's repair pass must stay pruned to touched users —
    // its cost is |touched sessions| + |Δ|, and on id-shifted copies
    // the touched-user fraction is scale-invariant, so the probe
    // catches any accidental full-state window sort.
    "q_bfs_hops", "q_dq_cusum", "q_dq_benford", "q_incr_window",
    "q_incr_hopping", "q_incr_session",
    // q_mv_rewrite: the serving plan the MV rule substitutes —
    // |state| rows + the date-pushed delta scan; both grow linearly on
    // id-shifted copies and the merge is one key shuffle, so the probe
    // catches any regression to a full-history rescan. q_mv_pull adds
    // the group-key predicate pushed into both branch scans — its wall
    // should track the MATCHING fraction, not the corpus (measured
    // 1.03x at 10x). q_mv_window is the pane-state serving shape —
    // |panes|x|types| state rows + the ts-pushed delta, linear like
    // q_incr_window's merge.
    // round 13: q_mv_global — the no-key re-aggregate adds a 1-row
    // reduction above the same state+delta merge as q_mv_rewrite, so its
    // exponent should track q_mv_rewrite's; q_mv_refresh_delete serves a
    // retraction-refreshed view (same serving shape, the refresh cost is
    // its own prepare); q_mv_ddl is the dialect-created view's serving
    // path (prepare runs the CMV statement).
    // q_mv_distinct: pair-set serving — state grows with distinct
    // (group, user) pairs, the delta pre-deduplicates map-side, and the
    // merge is one pair-key shuffle; linear by shape.
    // q_mv_rollup: three grouping-set branches re-aggregating the same
    // state+delta serve — the delta exchanges dedupe at runtime, so the
    // exponent should track the flat serve's.
    "q_mv_rewrite", "q_mv_pull", "q_mv_window", "q_mv_hopping",
    "q_mv_global", "q_mv_refresh_delete", "q_mv_ddl", "q_mv_distinct",
    "q_mv_rollup",
    // round 14: q_mv_join — the join-view serve; state + (date-pushed
    // Δorders ⋈ broadcast customer), dims stay 1× like every probe
    // scale-up, so the delta join grows linearly. q_mv_distinct_delete —
    // counted-pair serving after a retraction refresh (same pair-key
    // shuffle as q_mv_distinct; the refresh fold is its prepare).
    // q_mv_ddl_refresh — the dialect-refreshed view's serving path
    // (smaller delta, same shape). q_ksql_rollup_mv — the dialect ROLLUP
    // served per grouping set from the DDL view.
    "q_mv_join", "q_mv_join_star", "q_mv_window_join",
    "q_mv_hopping_join", "q_mv_distinct_delete", "q_mv_ddl_refresh",
    "q_ksql_rollup_mv",
    // round 15 (late): q_mv_ddl_session — the SESSION view's named
    // pull: interval-state leaf ∪ sessionized delta, the
    // gaps-and-islands repair windowed ONLY over delta-touched keys
    // (the anti-join branch streams sort-free), so cost tracks
    // |touched sessions| + |Δ|. q_mv_ddl_join — the dialect-created
    // join view's serve (same shape as q_mv_join, different key).
    "q_mv_ddl_session", "q_mv_ddl_join",
    // round 16: the six round-15 gates without an exponent on record.
    // q_fk_table_join — fact-table ⋈ broadcast dim over latest-by-key
    // tables; the latest-state reduction is one key shuffle, the join
    // side stays broadcast, so cost tracks |fact events|.
    // q_ksql_corr_where — Catalyst decorrelates the WHERE subquery to
    // an aggregate-then-join; both sides scan once, linear by shape.
    // q_mv_session_serve — the transparent session rewrite's serving
    // plan (same touched-key repair as q_mv_ddl_session plus the
    // struct-normalized substitution).
    // q_mv_table_pull / _window — the named-pull merge(state ∪ Δ)
    // forms; the windowed one repairs panes, both linear in |Δ| +
    // |matching state|.
    // q_mv_ddl_session_refresh — the session REFRESH fold's SERVING
    // path (the fold itself is its prepare, like q_mv_ddl_refresh).
    "q_fk_table_join", "q_ksql_corr_where", "q_mv_session_serve",
    "q_mv_table_pull", "q_mv_table_pull_window",
    "q_mv_ddl_session_refresh",
    // round-16 gates. q_ksql_fk_join — the dialect FK table-table join:
    // both snapshots are one key-shuffle max_by reductions, the dim
    // side broadcasts, so cost tracks |events|. q_mv_pull_window_range
    // — the WINDOWSTART-bounded pull: the range prunes the state scan
    // to |matching panes| and the delta scan to the range∩delta rows,
    // so its wall should track the MATCHING fraction, not the corpus.
    "q_ksql_fk_join", "q_mv_pull_window_range",
    // round 17: the HOPPING range pulls — the bound reaches the rewrite
    // in name-marker form and prunes the state scan to |matching panes|;
    // the delta branch's range stops at the Expand (as far as ANY plan
    // can push it), so the delta cost is |Δ| fan-out, linear. Both walls
    // should track the matching fraction, like q_mv_pull_window_range.
    "q_mv_hopping_range", "q_mv_pull_hopping_range",
    // round 18: q_ksql_table_reagg — the BATCH form of the table
    // re-aggregation (snapshot compaction = one key-shuffle max_by,
    // then a partial-agg GROUP BY over 5 types), linear in |events|;
    // the LIVE form's cost is per-update O(1) and is probed by
    // StreamBench's table_reagg_rocksdb instead. The chain adds one
    // more tiny aggregate over the 5-row derived table — same shape.
    "q_ksql_table_reagg", "q_ksql_table_reagg_chain",
    // q_ksql_time — scalar TIME kernels over one scan then a GROUP BY
    // on |seconds-of-day|-bounded keys: the aggregate's key space is
    // capped at 86,400 whatever the corpus, so cost is the linear scan.
    "q_ksql_time")

  /** Historically variance-prone entries (round 14, the round-13 verdict
    * ask): q_ann_pq and q_dq_checks oscillated 1.7–4.9× across rounds on
    * this host with no plan change. For these the probe reports the MIN
    * of three timed runs per side — the same noise floor BENCH_DETAIL's
    * solo column uses — so a GC pause or page-cache miss can't print as
    * a scaling regression.
    *
    * ADJUDICATED (round 14), with the memo-reset fix in `time` making
    * both entries read steady:
    *   - q_ann_pq ≈ 8.5× at 10×: CORRECT AND EXPECTED — plain PQ is an
    *     exhaustive ADC scan by definition (the compression is the
    *     point; pruning is IVF's job), so its ratio tracks the factor
    *     (exponent log10(8.5) ≈ 0.93, sub-linear). The old oscillation
    *     was the per-timed-run memo reset retraining codebooks inside
    *     the measurement. Its regression alarm is ratio ≫ factor, not
    *     the 3× rule used for the state-serving shapes. The 100 TB
    *     search path is q_ann_ivfpq (cell-pruned, same codebooks).
    *   - q_dq_checks ≈ 4× at 10×: FLOOR DISTORTION — its 1× time is
    *     ~the per-query session floor (~0.15 s), so the ratio divides
    *     by overhead, not work; the 10× ABSOLUTE (≲1 s for three
    *     full-table scans + a key semi-join at 6M rows) is the linear
    *     evidence. Ratios on sub-quarter-second 1× entries measure the
    *     floor, and the floor is corpus-size-independent. */
  private val Flagged = Set("q_ann_pq", "q_dq_checks")

  /** Documented-baseline entries (round 16): deliberately exhaustive
    * A/B references whose exponent tracks the corpus BY CONSTRUCTION —
    * q_ann_pq is the compressed-exhaustive half of the PQ A/B (the
    * production search path is the cell-pruned q_ann_ivfpq). They stay
    * in the probe for the record but are EXCLUDED from the ≤2.5×
    * contract; their regression alarm is ratio ≫ factor. */
  private[graft] val Baselines = Set("q_ann_pq")

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_scaleprobe")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val queries = if (args.length > 3) args.drop(3).toSeq else DefaultQueries
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      // UTC like Bench/Verify: NTZ→TIMESTAMP casts are session-tz
      // dependent; a non-UTC host would probe a shifted workload
      .config("spark.sql.session.timeZone", "UTC")
      // MB-scale splits, not the 128 MB default: the probe's tables are
      // a few MB, so default split packing hands an entire scan to ONE
      // task — and a ZERO-SHUFFLE query (q_winnowing) then runs its
      // whole pipeline single-threaded at both scales, measuring split
      // granularity instead of operator growth (first measured 44.6× at
      // 10× rows; with scan parallelism restored the same query is
      // ~1.4×). On a real cluster the inputs dwarf 128 MB and scans
      // parallelize by themselves; this pins the probe to that regime.
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val off = 1000000000L
    // SPARK_GRAFT_PROBE_REUSE=1 skips the corpus rebuild when the dirs
    // already exist — both an iteration convenience AND a measurement
    // control: the 10× build (≈6M-row unions, corpus-scale string
    // rewrites, distributed gaussian generation) leaves the measuring
    // JVM with a loaded old generation, and the string-allocation-
    // heaviest entries then measure GC backpressure instead of their
    // plans (q_line_dedup read 15-55× in build-then-measure JVMs vs
    // ~2× in a fresh one — same corpus, same conf, same plan). The
    // committed record protocol is: build once, then measure in a
    // REUSE run.
    // the stamp sidecar pins the corpus to its build (factor, src): a
    // stale corpus from a different scale run would silently measure
    // the wrong exponent and record it as a `factor`x result
    val stampFile = new java.io.File(s"$dst/.probe_stamp")
    val stamp = s"factor=$factor src=$src"
    val reuse = sys.env.get("SPARK_GRAFT_PROBE_REUSE").contains("1") &&
      new java.io.File(s"$dst/documents.parquet").exists() &&
      new java.io.File(s"${dst}_emb1x/embeddings.parquet").exists() &&
      stampFile.exists() && {
        val s = new String(java.nio.file.Files.readAllBytes(
          stampFile.toPath), "UTF-8").trim
        if (s != stamp) System.err.println(
          s"probe corpus stamp mismatch ('$s' != '$stamp') — rebuilding")
        s == stamp
      }
    if (!reuse) {
    def rep(name: String, idCols: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * off)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    rep("lineitem", Seq("l_orderkey"))
    // events via the nanos-normalizing loader (a bare parquet read
    // fails on TIMESTAMP(NANOS)); ids shifted like the other facts so
    // per-user/window cardinalities stay realistic
    (0 until factor).map { i =>
      Seq("event_id", "user_id").foldLeft(Tables.events(spark, src))(
        (d, c) => d.withColumn(c, col(c) + lit(i * off)))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    rep("orders", Seq("o_orderkey"))
    // documents replicate with VARIED content, not exact copies:
    // content-bucketed ops (minhash bands, gram tables) see 10
    // identical copies as one bucket 10x denser — pair volume ~100x,
    // the all-duplicate pathology, not organic growth. A deterministic
    // per-copy vowel rotation rewrites most words (all shingles/grams
    // distinct across copies); copy 0 is bit-identical to the source,
    // so 1x-vs-Nx compares the same base data.
    locally {
      // vowel rotation (period 5) x s/t swap (period 2) -> 10 distinct
      // per-copy character maps; copy 0 is the identity
      val from = "aeioust"
      (0 until factor).map { i =>
        val vow = "aeiou".drop(i % 5) + "aeiou".take(i % 5)
        val st = if ((i / 5) % 2 == 0) "st" else "ts"
        spark.read.parquet(s"$src/documents.parquet")
          .withColumn("doc_id", col("doc_id") + lit(i * off))
          .withColumn("text", translate(col("text"), from, vow + st))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    }
    // embeddings are INDEPENDENTLY sampled, not replicated (round 13 —
    // the round-12 verdict ask): any per-copy perturbation preserves
    // cosine, so a replicated corpus makes every base vector a
    // factor-copy near-dup family and the embedding-dedup entries
    // measure duplication structure, not plans (three rounds of sf1
    // walls were exactly that; EmbedLshProbe proved the operator's own
    // exponent is 1.34 on organic corpora). Same corpus model as the
    // probe, at corpus scale and fully distributed: n·factor fresh
    // deterministic gaussians (Box-Muller over xxhash64-derived
    // uniforms — no Random state on the driver, reproducible across
    // runs), with 1% planted near-dup pairs (partner = v + 0.5·g,
    // E[cos] ≈ 0.89) so near-dup output grows LINEARLY like a real
    // corpus with a real duplication rate.
    locally {
      val srcEmb = spark.read.parquet(s"$src/embeddings.parquet")
      val dim = srcEmb.selectExpr("size(embedding)").head().getInt(0)
      val nSrc = srcEmb.count()
      def gauss(idExpr: String, salt: Int): String =
        s"sqrt(-2.0 * ln((pmod(xxhash64($idExpr, j, $salt), 1000000007) " +
          s"+ 1.0) / 1000000009.0)) * cos(6.283185307179586 * " +
          s"(pmod(xxhash64($idExpr, j, ${salt + 1}), 1000000007) + 1.0) " +
          "/ 1000000009.0)"
      def indep(n: Long, out: String): Unit = {
        val nP = n / 100
        spark.range(n).toDF("vec_id")
          .withColumn("planted", col("vec_id") >= lit(n - nP))
          .withColumn("seed_id", when(col("planted"),
            col("vec_id") - lit(n - nP)).otherwise(col("vec_id")))
          .withColumn("embedding", expr(
            s"transform(sequence(0, ${dim - 1}), j -> float(" +
              s"${gauss("seed_id", 11)} + CASE WHEN planted THEN " +
              s"0.5 * (${gauss("vec_id", 31)}) ELSE 0.0d END))"))
          .withColumn("label", pmod(col("vec_id"), lit(10)).cast("int"))
          .select("vec_id", "embedding", "label")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      }
      indep(nSrc * factor, dst)
      // a 1x corpus from the SAME generator (its plain-gaussian prefix
      // is shared; the planted blocks differ by construction), so the
      // embedding queries' 1x-vs-Nx ratio compares like with like —
      // timing the synthetic 10x against the real sf corpus would
      // confound the exponent with a distribution change
      indep(nSrc, s"${dst}_emb1x")
    }
    for (t <- Seq("customer", "supplier", "part", "nation", "region"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    java.nio.file.Files.write(stampFile.toPath, stamp.getBytes("UTF-8"))
    }

    def time(dir: String, q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // embedding-only queries time their 1x side against the synthetic
    // 1x corpus (same generator as the 10x — see above); they read
    // nothing but embeddings.parquet, so the slim dir suffices
    val embQueries = Set("q_ann_brute", "q_ann_pq", "q_ann_graph")
    val rows = queries.map { q =>
      val oneX = if (embQueries(q)) s"${dst}_emb1x" else src
      // per-query warm-up on BOTH dirs (round 13): the first execution
      // pays codegen/plan compilation AND any write-once artifact build
      // (incremental state, MV registrations, index layouts) — charging
      // those to either sample corrupts the ratio in opposite
      // directions (1x-only warm-up billed the 10x state build into tN:
      // q_mv_refresh_delete measured 12.4x when its SERVING is ~1x).
      // Builds are Bench's separately-timed prepare phases; the probe's
      // exponents are the serving path, warmed like Bench's timed runs.
      // reset memoized shared artifacts ONCE per query, BEFORE the
      // warm-ups: the warm-up then rebuilds them fresh for BOTH dirs
      // (memo keys are per-dir), and the timed runs measure the
      // SERVING path symmetrically — cache-hit artifacts on both
      // sides, exactly like Bench's separately-timed prepares. The old
      // per-timed-run reset fought the round-13 both-sides warm-up:
      // q_ann_pq's timed run RETRAINED its codebooks every time, and
      // the 'exponent' (4.5–4.9× across rounds) was the corpus-sized
      // training phase, not the ADC scan.
      operators.Dedup.resetMemos()
      operators.Similarity.resetMemos()
      time(oneX, q); time(dst, q)
      // min-of-2 for EVERY entry (3 for the historically variance-prone
      // two): the probe runs queries sequentially in one JVM, so a
      // single timed sample can measure a NEIGHBOR'S GC debt instead of
      // the plan — each run one different entry read 15-55× (line_dedup
      // after the corpus build, dq_checksum after the jaccard string
      // shuffles) while a fresh-JVM re-run of the same query read
      // 1-2×. The min across two samples is the same noise floor
      // BENCH_DETAIL's solo column uses.
      val reps = if (Flagged(q)) 3 else 2
      def best(dir: String): Double =
        (1 to reps).map(_ => time(dir, q)).min
      val t1 = best(oneX); val tN = best(dst)
      // Locale.ROOT: f"%.3f" is default-locale-sensitive and a comma
      // decimal separator corrupts the JSON line (same fix as Bench)
      def fmt(v: Double, p: String) =
        String.format(java.util.Locale.ROOT, p, Double.box(v))
      System.err.println(s"$q 1x ${fmt(t1, "%6.2f")} s  ${factor}x ${fmt(tN, "%6.2f")} s  ratio ${fmt(tN / t1, "%5.2f")}")
      s""""$q":{"t1":${fmt(t1, "%.3f")},"tN":${fmt(tN, "%.3f")},"ratio":${fmt(tN / t1, "%.2f")}}"""
    }
    println(s"""{"metric":"scaleprobe","factor":$factor,"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
