package graft

import graft.operators.{Regression, TextAnalysis}
import org.apache.spark.sql.functions._

/** Batch-operator sanity specs (the deep equivalence check is the
  * driver's DuckDB oracle; these pin invariants + edge semantics). */
class OperatorsSpec extends SparkSpec {

  test("query registry has no duplicate keys across modules (merge would silently shadow)") {
    import graft.operators._
    val modules = Seq(CoreQueries.entries, WindowQueries.entries,
      JoinQueries.entries, TpchQueries.entries, Dedup.entries, Similarity.entries,
      TextAnalysis.entries, Multimodal.entries, AnalyticsQueries.entries,
      EventAnalytics.entries, WarehouseQueries.entries, Search.entries,
      Regression.entries, Pca.entries, Graph.entries, DataQuality.entries,
      Incremental.entries, graft.ksql.KsqlQueries.entries)
    val all = modules.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query keys: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("every query runs and every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_agg_core matches a hand-computed group") {
    val r = run("q_agg_core").filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
    assert(r.count() <= 1)
  }

  test("tumbling windows partition every event exactly once") {
    val events = Tables.events(spark, sfDir).count()
    val windowed = run("q_window_tumbling").agg(sum("cnt")).head.getLong(0)
    assert(windowed == events)
  }

  test("hopping windows count every event size/slide times") {
    val events = Tables.events(spark, sfDir).count()
    val windowed = run("q_window_hopping").agg(sum("cnt")).head.getLong(0)
    assert(windowed == 2 * events)
  }

  test("session windows cover every event, end >= start + gap") {
    val df = run("q_window_session")
    val events = Tables.events(spark, sfDir).count()
    assert(df.agg(sum("cnt")).head.getLong(0) == events)
    assert(df.filter(col("session_end") < col("session_start") + 21600000L).count() == 0)
  }

  test("left join keeps customers without orders") {
    val total = run("q_join_left").count()
    assert(total == Tables.customer(spark, sfDir).count())
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = run("q_approx").select("event_type", "approx_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(countDistinct("user_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k).toDouble - e) / e < 0.05, s"$k: ${approx(k)} vs $e")
    }
  }

  test("HLL sketch union estimate within 5% of exact global distinct") {
    val rows = run("q_hll_rollup").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.events(spark, sfDir)
      .select(countDistinct("user_id")).head.getLong(0)
    val est = rows("__all__").toDouble
    assert(math.abs(est - exactAll) / exactAll < 0.05, s"$est vs $exactAll")
    // the union can't exceed the sum of parts and can't be below the max
    val parts = rows.filter(_._1 != "__all__").values
    assert(est <= parts.sum * 1.05 && est >= parts.max * 0.95)
  }

  test("BPE training learns the hand-computed merge sequence") {
    import spark.implicits._
    // Sennrich-style toy: low x5, lower x2, newest x6, widest x3.
    // Char-pair counts: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, (n,e)=6,
    // (e,w)=6, (w,e)=2+3(wid-est? no: lower w-e=2, newest w-e=6? newest
    // = n,e,w,e,s,t → (w,e)=6) — ties break lexicographically:
    // round 1: (e,s) vs (s,t) both 9 → (e,s) wins (e < s)
    // round 2: (es,t)=9 beats all → merge (es,t)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower")
      ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => (w, "en")).toDF("text", "lang")
    val rules = TextAnalysis.bpeTrain(docs, merges = 3)
    assert(rules.take(2) == Seq((1, "e", "s"), (2, "es", "t")))
    // round 3: after est forms, remaining top pairs are (l,o)=7,(o,w)=7
    // → (l,o) wins lexicographically at count 7 vs (n,e)=6,(w,est)=6? —
    // (o,w)=7 ties (l,o); l < o
    assert(rules(2) == ((3, "l", "o")))
    // invariants on the real corpus: ranks ordered, merges distinct,
    // merged token is the concatenation
    val corpus = run("q_bpe_vocab").collect()
    assert(corpus.length == 20)
    assert(corpus.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    val pairs = corpus.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == pairs.length)
    corpus.foreach(r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2)))
  }

  test("BPE encoding applies merges greedily, leftmost-first") {
    import spark.implicits._
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower")
      ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => (w, "en")).toDF("text", "lang")
    // rules: (e,s) → (es,t) → (l,o)
    val rules = TextAnalysis.bpeTrain(docs, merges = 3)
    val enc = TextAnalysis.bpeEncode(
      Seq("lowest", "newest", "low", "wwww", "aaa").toDF("word"), rules)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc("lowest") == "lo w est")   // es → est → lo
    assert(enc("newest") == "n e w est")
    assert(enc("low") == "lo w")
    assert(enc("wwww") == "w w w w")      // no rule applies
    assert(enc("aaa") == "a a a")
    // leftmost-first on overlapping pair runs: rule a+a over "aaaa"
    // must give (aa)(aa), and over "aaa" give (aa)(a)
    val run2 = TextAnalysis.bpeEncode(
      Seq("aaaa", "aaa").toDF("word"), Seq((1, "a", "a")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run2("aaaa") == "aa aa")
    assert(run2("aaa") == "aa a")
    // driver query shape: top words (≤50 — the tiny sf vocab may be
    // smaller), pieces reconstruct the word
    val encoded = run("q_bpe_encode").collect()
    assert(encoded.nonEmpty && encoded.length <= 50)
    encoded.foreach { r =>
      assert(r.getAs[String]("encoded").replace(" ", "")
        == r.getAs[String]("word"))
      assert(r.getAs[Int]("n_pieces")
        == r.getAs[String]("encoded").split(" ").length)
    }
  }

  test("KLL quantile estimates land within the sketch's rank-error bound") {
    val est = run("q_kll_quantiles").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(est.nonEmpty)
    val byG = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    est.foreach { case ((g, q), v) =>
      val xs = byG(g)
      val rank = xs.count(_ <= v).toDouble / xs.length
      // default-k KLL: ~1.65% rank error at 99% confidence; 3% slack
      assert(math.abs(rank - q) <= 0.03, s"$g q=$q est=$v true rank=$rank")
    }
  }

  test("theta-sketch overlap estimates within 5% of exact set ops") {
    val est = run("q_theta_overlap").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sfDir)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct()
    val a = users("purchase").collect().map(_.getLong(0)).toSet
    val b = users("click").collect().map(_.getLong(0)).toSet
    val exact = Map(
      "purchase" -> a.size, "click" -> b.size, "both" -> a.intersect(b).size,
      "purchase_only" -> a.diff(b).size, "either" -> a.union(b).size)
    exact.foreach { case (k, e) =>
      assert(math.abs(est(k).toDouble - e) <= math.max(2, e * 0.05),
        s"$k: est ${est(k)} vs exact $e")
    }
  }

  test("theta sketches maintain incrementally: old-union-delta == full-scan sketch") {
    import graft.functions.ThetaSketches
    val ev = Tables.events(spark, sfDir)
    val old = ThetaSketches.sketchOf(ev.filter(col("event_id") % 2 === 0), "user_id")
    val delta = ThetaSketches.sketchOf(ev.filter(col("event_id") % 2 === 1), "user_id")
    val full = ThetaSketches.sketchOf(ev, "user_id")
    // merging yesterday's sketch with today's delta must equal the
    // full-rescan estimate EXACTLY (theta union is lossless at this
    // cardinality) — the incremental-maintenance contract: distinct
    // stats never need a rescan
    assert(ThetaSketches.union(old, delta).getEstimate == full.getEstimate)
  }

  test("KLL sketches maintain incrementally: old-merge-delta == full-scan quantiles") {
    import graft.functions.KllSketches
    val orders = Tables.orders(spark, sfDir)
    val old = KllSketches.sketchesByGroup(
      orders.filter(col("o_orderkey") % 2 === 0), "o_orderpriority", "o_totalprice")
    val delta = KllSketches.sketchesByGroup(
      orders.filter(col("o_orderkey") % 2 === 1), "o_orderpriority", "o_totalprice")
    val full = KllSketches.sketchesByGroup(
      orders, "o_orderpriority", "o_totalprice")
    // merging yesterday's sketches with today's delta must give
    // rank-equivalent quantiles to the full rescan: quantile stats of a
    // growing corpus never need a rescan. KLL merge is randomized-
    // compaction-equivalent, not bit-identical — assert the merged
    // estimate's true rank stays within the same 3% bound.
    val exact = orders.select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    full.keys.foreach { g =>
      val merged = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance()
      old.get(g).foreach(merged.merge)
      delta.get(g).foreach(merged.merge)
      assert(merged.getN == full(g).getN, s"$g: merged N != full N")
      val xs = exact(g)
      Seq(0.1, 0.25, 0.5, 0.75, 0.9).foreach { q =>
        val v = merged.getQuantile(q)
        val rank = xs.count(_ <= v).toDouble / xs.length
        assert(math.abs(rank - q) <= 0.03, s"$g q=$q merged est rank=$rank")
      }
    }
  }

  test("count-min heavy hitters: never undercounts, overshoot <= 2*eps*N") {
    val rows = run("q_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 30)
    val n = Tables.documents(spark, sfDir).select(
      sum(size(filter(split(lower(col("text")), "[^a-z]+"),
        t => length(t) > 0)))).head.getLong(0)
    rows.foreach { case (term, exact, est) =>
      assert(est >= exact, s"$term: CMS must never undercount ($est < $exact)")
      assert(est <= exact + 2 * (0.001 * n).toLong + 1,
        s"$term: overshoot $est vs $exact beyond 2*eps*N")
    }
    // the sketch is deterministic for a fixed seed: rerun agrees
    val again = run("q_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(again.toSeq.sorted == rows.map(r => (r._1, r._3)).toSeq.sorted)
  }

  test("linear-regression head: solution zeroes the gradient, R² is meaningful") {
    val docs = Tables.documents(spark, sfDir)
    val (w, r2) = Regression.fit(docs)
    // the driver-side solve is only correct if X'X·w − X'y ≈ 0 — check
    // the normal equations directly from an independently recomputed
    // stats row (relative tolerance: entries are O(1e10))
    val r = Regression.suffStats(docs).head()
    def g(c: String) = r.getAs[Double](c)
    val n = r.getAs[Long]("n").toDouble
    val xtx = Array(
      Array(n, g("s1"), g("s2"), g("s3")),
      Array(g("s1"), g("s11"), g("s12"), g("s13")),
      Array(g("s2"), g("s12"), g("s22"), g("s23")),
      Array(g("s3"), g("s13"), g("s23"), g("s33")))
    val xty = Array(g("sy"), g("s1y"), g("s2y"), g("s3y"))
    for (i <- 0 until 4) {
      val lhs = (0 until 4).map(j => xtx(i)(j) * w(j)).sum
      assert(math.abs(lhs - xty(i)) <= 1e-6 * math.max(1.0, math.abs(xty(i))),
        s"gradient component $i: $lhs vs ${xty(i)}")
    }
    // distinct-word count is genuinely predictable from length features
    assert(r2 > 0.5 && r2 <= 1.0, s"R² = $r2")
    // scoring is a full-corpus zero-shuffle projection; residuals of a
    // least-squares fit with an intercept sum to ~0
    val scored = run("q_linreg_score")
    assert(scored.count() == docs.count())
    val meanRes = scored.agg(avg(col("residual"))).head.getDouble(0)
    assert(math.abs(meanRes) < 0.01, s"mean residual $meanRes")
  }

  test("temperature sampling flattens monotonically: T=4 cuts large groups harder than T=2") {
    val docs = Tables.documents(spark, sfDir)
    val t2 = TextAnalysis.temperatureSample(docs, log2T = 1)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("k2"))
    val t4 = TextAnalysis.temperatureSample(docs, log2T = 2)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("k4"))
    val g = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_g"))
    val minN = g.agg(min(col("n_g"))).head.getLong(0)
    val joined = g.join(t2, Seq("lang", "source"), "left")
      .join(t4, Seq("lang", "source"), "left").collect()
    joined.foreach { row =>
      val nG = row.getAs[Long]("n_g")
      val k2 = Option(row.getAs[Any]("k2")).fold(0L)(_.asInstanceOf[Long])
      val k4 = Option(row.getAs[Any]("k4")).fold(0L)(_.asInstanceOf[Long])
      // a higher temperature is closer to uniform: keep-rate
      // (min/n)^(3/4) ≤ (min/n)^(1/2) for min/n ≤ 1, and the md5 gate
      // compares against the SAME hash — so T=4 admits a SUBSET of
      // T=2's documents in every group (T→∞ → equal counts per group)
      assert(k4 <= k2, s"group $row: T=4 kept $k4 > T=2's $k2")
      // the rarest group keeps ~everything at any T (rate = 1)
      if (nG == minN) assert(k4 == nG, s"rarest group truncated: $k4 of $nG")
    }
    // determinism: the md5 gate admits the same documents on a re-run
    val rerun = TextAnalysis.temperatureSample(docs, log2T = 2)
      .agg(sum(col("doc_id"))).head.getLong(0)
    val first = TextAnalysis.temperatureSample(docs, log2T = 2)
      .agg(sum(col("doc_id"))).head.getLong(0)
    assert(rerun == first)
  }

  test("PCA: orthonormal components, descending eigenvalues, projection " +
      "variance per component equals its eigenvalue") {
    import graft.operators.Pca
    val emb = Tables.embeddings(spark, sfDir)
    val Some((mean, comps, eig)) = Pca.fit(emb): @unchecked
    assert(mean.length == 64 && comps.length == Pca.TopK && eig.length == 64)
    // eigenvalues descending, non-negative (covariance is PSD)
    eig.toSeq.sliding(2).foreach(w => assert(w(0) >= w(1) - 1e-10))
    assert(eig.last >= -1e-10)
    // components orthonormal
    for (i <- comps.indices; j <- comps.indices) {
      val d = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-8, s"c($i).c($j) = $d")
    }
    // projections: variance along component j IS eigenvalue j (the
    // defining property of PCA — checked through the distributed
    // projection path, not the driver math)
    val n = emb.filter(col("embedding").isNotNull).count().toDouble
    val varByJ = Pca.project(emb).groupBy(col("j"))
      .agg((sum(col("p") * col("p")) / n).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (j <- 0 until Pca.TopK)
      assert(math.abs(varByJ(j) - eig(j)) < 1e-4 * math.max(1.0, eig(j)),
        s"component $j: projected variance ${varByJ(j)} vs eigenvalue ${eig(j)}")
    // trace identity: Σ eigenvalues = total variance of the corpus
    val v = col("embedding").cast("array<double>")
    val totVar = emb.filter(col("embedding").isNotNull)
      .select(explode(v).as("x")).agg(
        (sum(col("x") * col("x")) / (64 * n)
          ).as("ex2")).head.getDouble(0) * 64 -
      mean.map(m => m * m).sum
    assert(math.abs(eig.sum - totVar) < 1e-6 * math.max(1.0, totVar),
      s"trace ${eig.sum} vs total variance $totVar")
    // determinism: a refit lands on identical components
    val Some((_, comps2, _)) = Pca.fit(emb): @unchecked
    assert(comps.flatMap(_.toSeq).sameElements(comps2.flatMap(_.toSeq)))
  }

  test("sequence pattern matches view click* purchase with exact click " +
      "counts, rejects broken interiors") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val events = Seq(
      // user 1: view c c purchase → match, 2 clicks
      (1L, t(1), 10L, "view"), (2L, t(2), 10L, "click"),
      (3L, t(3), 10L, "click"), (4L, t(4), 10L, "purchase"),
      // user 2: view purchase → match, 0 clicks (B* admits empty)
      (5L, t(1), 20L, "view"), (6L, t(2), 20L, "purchase"),
      // user 3: view error purchase → interior broken, no match
      (7L, t(1), 30L, "view"), (8L, t(2), 30L, "error"),
      (9L, t(3), 30L, "purchase"),
      // user 4: signup click purchase → wrong leader, no match
      (10L, t(1), 40L, "signup"), (11L, t(2), 40L, "click"),
      (12L, t(3), 40L, "purchase"),
      // user 5: purchase with nothing before it → no leader, no match
      (13L, t(1), 50L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.EventAnalytics.sequencePattern(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toSet
    assert(out == Set(
      (10L, 1L, 4L, 2, 3000L),
      (20L, 5L, 6L, 0, 1000L)))
  }

  test("span strip keeps the corpus-first occurrence, merges overlapping " +
      "spans, and rewrites exactly the removed words") {
    import spark.implicits._
    val a = (1 to 25).map(i => s"a$i").mkString(" ") // 25-word shared region
    val b = (1 to 20).map(i => s"b$i").mkString(" ") // exactly one span
    val docs = Seq(
      (0L, s"u1 u2 u3 $a v1 v2"), // first occurrence (lowest doc_id) — kept
      (1L, s"x1 x2 $a y1"),       // 6 shifted repeated spans → ONE merged island
      (2L, "short doc"),          // under 20 words — untouched
      (3L, s"$b z $b")            // internal repetition: second copy removed
    ).toDF("doc_id", "text")
    val out = TextAnalysis.spanStrip(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(0L) == ((s"u1 u2 u3 $a v1 v2", 0)))
    assert(out(1L) == (("x1 x2 y1", 25)))
    assert(out(2L) == (("short doc", 0)))
    assert(out(3L) == ((s"$b z", 20)))
  }

  test("pagerank conserves probability mass and ranks the hub supplier highest") {
    val r = run("q_pagerank").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    // total mass stays 1.0 (in ppm: 1e6) — the dangling-mass term is
    // load-bearing on this bipartite graph (suppliers are all sinks);
    // without redistribution ~d of the mass drains per pass
    val total = r.values.sum
    assert(math.abs(total - 1e6) < 1.0, s"mass drained: $total ppm")
    // every supplier out-ranks the uniform share (they receive all
    // customer mass), customers sit below it
    val n = r.size.toDouble
    val uniform = 1e6 / n
    val (supp, cust) = r.partition(_._1.startsWith("s"))
    assert(supp.values.min > uniform, "suppliers must be above uniform")
    assert(cust.values.max < uniform, "customers must be below uniform")
  }

  test("triangle census matches brute force on random graphs; pagerank conserves mass") {
    import spark.implicits._
    // deterministic pseudo-random edge sets (no RNG dependency): for
    // each seed, nodes 1..8 with edges picked by a hash condition —
    // covers empty, sparse, and near-complete graphs
    for (seed <- 1 to 8) {
      val es = for {
        a <- 1L to 8L; b <- (a + 1) to 8L
        if ((a * 31 + b * 17 + seed * 101) % 3) == 0
      } yield (a, b)
      val eset = es.toSet
      val nodes = eset.flatMap(e => Set(e._1, e._2))
      def conn(x: Long, y: Long) =
        eset.contains((x min y, x max y))
      // brute force over node triples
      val triples = nodes.toSeq.sorted.combinations(3).count {
        case Seq(x, y, z) => conn(x, y) && conn(x, z) && conn(y, z)
        case _ => false
      }
      val wedges = nodes.toSeq.map { v =>
        val dv = eset.count(e => e._1 == v || e._2 == v).toLong
        dv * (dv - 1) / 2
      }.sum
      if (es.nonEmpty) {
        val row = graft.operators.Graph.triangleCensus(es.toDF("a", "b")).head
        assert(row.getLong(0) == triples, s"seed=$seed triangles")
        assert(row.getLong(1) == wedges, s"seed=$seed wedges")
        // pagerank over the same graph (directed a→b): mass sums to 1
        val pr = graft.operators.Graph.pageRank(
          es.toDF("src", "dst").selectExpr("CAST(src AS STRING) src",
            "CAST(dst AS STRING) dst"))
          .agg(org.apache.spark.sql.functions.sum("rank")).head.getDouble(0)
        assert(math.abs(pr - 1.0) < 1e-9, s"seed=$seed mass=$pr")
      }
    }
  }

  test("triangle census matches a hand-built graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus a pendant edge (4,5): 4 triangles,
    // wedges = 3 nodes of deg 3 (3 wedges each) + deg-4 node (6) + leaf 0
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val row = graft.operators.Graph.triangleCensus(edges).head
    assert(row.getLong(0) == 4, s"triangles: ${row.getLong(0)}")
    assert(row.getLong(1) == 15, s"wedges: ${row.getLong(1)}")
    assert(math.abs(row.getDouble(2) - 3.0 * 4 / 15) < 1e-6)
  }

  test("bfs hops matches brute-force shortest paths on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val es = for {
        a <- 1L to 10L; b <- (a + 1) to 10L
        if ((a * 13 + b * 29 + seed * 97) % 4) == 0
      } yield (a, b)
      if (es.nonEmpty) {
        // reference BFS from the min endpoint, driver-side
        val adj = (es ++ es.map(e => (e._2, e._1)))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val seed0 = adj.keys.min
        var dist = Map(seed0 -> 0)
        var frontier = Set(seed0)
        for (h <- 1 to 4) {
          val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
          dist ++= next.map(_ -> h)
          frontier = next
        }
        val got = graft.operators.Graph.bfsHops(es.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == dist, s"seed=$seed: $got vs $dist")
      }
    }
  }

  test("bfs hops: empty edge set yields an empty frame, disconnected nodes excluded") {
    import spark.implicits._
    assert(graft.operators.Graph.bfsHops(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    // two components: BFS from min node never reaches {7,8}
    val got = graft.operators.Graph.bfsHops(
      Seq((1L, 2L), (7L, 8L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1), got.toString)
  }
}
