package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** Iterative graph analytics over relationship graphs extracted from the
  * warehouse tables (SURVEY.md §2.13 extension, round 10).
  *
  * The canonical large-scale iterative op is PageRank: it is the
  * benchmark every distributed dataflow engine (Pregel, GraphX, Flink
  * Gelly, Spark itself in the original paper) uses to demonstrate
  * iterative convergence at scale, and a KSQL user doing influence /
  * importance ranking over an interaction topic needs exactly this
  * shape. Graft runs it DataFrame-first: each power iteration is ONE
  * equi-join (ranks ⋈ out-edges, both hash-partitioned on the join key)
  * feeding ONE partial→final aggregation on the destination — the same
  * linear-shuffle posture as a windowed aggregate, repeated k times.
  * No driver-side adjacency, no collect; the dangling-mass term is a
  * one-row aggregate broadcast back into the update expression.
  *
  * Scale posture (100 TB): edges are pre-aggregated to DISTINCT
  * (src, dst) once before the loop — the iteration cost is then
  * O(|E|) shuffle per pass, independent of the fact-table width. The
  * rank frontier is |V| rows (two narrow columns). A production run at
  * billions of edges would persist + truncate lineage between
  * iterations (checkpoint every ~5 passes) — with the fixed 5
  * iterations gated here the single unrolled plan stays well inside
  * codegen limits, and the per-iteration plan shape (join + hash agg)
  * is identical either way, so the gated plan IS the scaled plan
  * modulo checkpoint placement.
  */
object Graph {

  private val Damping = 0.85
  private val Iters = 5

  /** PageRank with proper dangling-mass redistribution.
    *
    * r'(v) = (1-d)/N + d · (Σ_{u→v} r(u)/outdeg(u) + dangling/N)
    *
    * where dangling = Σ over zero-outdegree nodes of r(u). The node set
    * is the union of both edge endpoints; here suppliers have no
    * out-edges (the purchase graph is bipartite customer→supplier), so
    * the dangling term is load-bearing, not decorative — without it the
    * total mass drains by ~d per pass and ranks are wrong.
    */
  def pageRank(edges: DataFrame, iters: Int = Iters, d: Double = Damping,
               parts: Option[Int] = None): DataFrame = {
    val spark = edges.sparkSession
    // distinct once, outside the loop, CACHED and HASH-PARTITIONED ON
    // dst: every iteration reuses the same deduplicated edge frame, and
    // because the per-iteration plan is broadcast(ranks) ⋈ e (preserves
    // e's partitioning) → groupBy(dst), the contribution aggregation
    // runs map-side with NO per-iteration exchange — the k-pass loop
    // pays ONE edge shuffle total, at cache fill. (At cluster scale
    // where the frontier outgrows broadcast, the same cached layout
    // serves a shuffled join that co-locates on dst for the agg.)
    //
    // Round 16: repartition(dst) BEFORE the distinct — hash(dst) is a
    // subset of the dedup keys {src,dst}, so the aggregate runs on the
    // repartition's layout and the separate distinct exchange the old
    // `.distinct().repartition(dst)` order paid disappears (plan:
    // 2 Exchange → 1 on the edge build). `parts` sizes that one
    // exchange to the DATA (Tables.sizedPartitions — bytes-derived,
    // guide §2), not to spark.sql.shuffle.partitions: the k-pass loop
    // re-reads the cached layout every iteration, so 32 core-count
    // shards of a 9 MB edge set cost 32 task launches per pass where
    // the data fills one.
    val ePart = parts.map(n => edges.select(col("src"), col("dst"))
        .repartition(n, col("dst")))
      .getOrElse(edges.select(col("src"), col("dst")).repartition(col("dst")))
    val e = ePart.dropDuplicates("src", "dst").cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).cache()
    // |V| is a metadata-scale scalar (node count, not row count of the
    // fact) — one distributed count up front, embedded as a literal so
    // both engines start every iteration from the identical double
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    // Each iteration MATERIALIZES its frontier with an eager
    // localCheckpoint, truncating lineage outright. This is
    // load-bearing, not an optimization: the update reads `ranks`
    // twice (contributions + dangling mass), so a fully lazy unroll
    // doubles the plan per level — 2^k evaluations of iteration 1 by
    // the top (measured 25 s for k=5 at sf0.1). persist()+count() was
    // tried and does NOT fix it: under AQE the nested cached plans
    // kept re-executing their fill plans (80 s — worse); checkpointing
    // cuts the plan instead of hoping cache substitution matches. The
    // frontier is |V| narrow rows — trivial to store at any scale. On
    // a multi-executor cluster use reliable checkpoint() (or persist
    // with replication) so a lost executor doesn't kill the lineage-
    // less frontier; the plan shape per pass is identical.
    for (_ <- 1 to iters) {
      // contributions: ranks ⋈ out-edges on src (both sides shuffle on
      // the key), partial-aggregated sum per destination
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("sum_in"))
      // dangling mass: one-row aggregate (anti-join against the degree
      // table finds zero-outdegree nodes), broadcast into the update
      val dangling = ranks.join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - d) / n) +
            lit(d) * (coalesce(col("sum_in"), lit(0.0)) + col("dangling") / lit(n)))
            .as("rank"))
        .localCheckpoint(true)
    }
    // the final frontier is checkpointed (lineage-free), so the loop's
    // cached inputs can be dropped NOW — a long-lived JVM (bench, REPL)
    // calling into this module repeatedly must not accumulate dead
    // cached blocks until the context cleaner happens to run
    e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    ranks
  }

  /** Customer→supplier purchase edges: who bought from whom, from the
    * orders⋈lineitem fact. Node ids are LONGS — customers on the even
    * axis (2k), suppliers odd (2k+1) — so the two key spaces cannot
    * collide and every per-iteration shuffle hashes 8-byte keys
    * instead of strings (the human-readable 'c…'/'s…' form is restored
    * only in the final projection). */
  private def purchaseEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))

  /** Long node id → the display form the oracle also emits. */
  private def displayId(id: org.apache.spark.sql.Column) =
    when(id % 2 === 0, concat(lit("c"), (id / 2).cast("long")))
      .otherwise(concat(lit("s"), ((id - 1) / 2).cast("long")))

  /** The same 5-iteration unrolled update as chained CTEs, so DuckDB
    * replays the identical computation. `n` and the damping constants
    * are embedded as the same decimal literals both engines parse to
    * the same doubles. */
  private def pageRankOracle(iters: Int, d: Double): String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), nodes AS (
        |  SELECT src AS id FROM edges UNION SELECT dst FROM edges
        |), outdeg AS (
        |  SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src
        |), nn AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
        |), r0 AS (
        |  SELECT id, 1.0 / n AS rank FROM nodes, nn
        |)""".stripMargin
    val its = (1 to iters).map { k =>
      s""", c$k AS (
         |  SELECT e.dst AS id, sum(r.rank / o.outdeg) AS sum_in
         |  FROM edges e JOIN r${k - 1} r ON e.src = r.id
         |  JOIN outdeg o ON o.src = e.src
         |  GROUP BY e.dst
         |), d$k AS (
         |  SELECT coalesce(sum(r.rank), 0.0) AS dangling
         |  FROM r${k - 1} r LEFT JOIN outdeg o ON o.src = r.id
         |  WHERE o.src IS NULL
         |), r$k AS (
         |  SELECT nodes.id,
         |    (1.0 - $d) / nn.n + $d * (coalesce(c$k.sum_in, 0.0) + d$k.dangling / nn.n) AS rank
         |  FROM nodes LEFT JOIN c$k ON nodes.id = c$k.id, d$k, nn
         |)""".stripMargin
    }.mkString
    base + its +
      s"""
         |SELECT CASE WHEN id % 2 = 0 THEN 'c' || CAST(CAST(id / 2 AS BIGINT) AS VARCHAR)
         |            ELSE 's' || CAST(CAST((id - 1) / 2 AS BIGINT) AS VARCHAR) END AS id,
         |  round(rank * 1e6, 6) AS rank_ppm FROM r$iters""".stripMargin
  }

  /** Co-purchase edges: part pairs bought together in >= 2 distinct
    * orders ("frequently bought together"), canonical a<b. The
    * candidate pair volume is bounded by items-per-order
    * (Σ kᵢ(kᵢ−1)/2, linear in orders at any scale) and the min-support
    * threshold keeps the GRAPH sparse — the supplier co-fulfillment
    * graph was tried first and is ~91% of the complete graph at sf0.1
    * (1000 suppliers across 150k orders co-occur almost everywhere), a
    * degenerate input for any triangle algorithm; support pruning is
    * how production co-purchase graphs stay subquadratic too. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    // Shape A/B (measured at sf1/10×): a collect_set-per-order +
    // map-side nested-transform pair expansion trades the self-join's
    // shuffle for ObjectHashAggregate array buffers and per-pair struct
    // allocation — 48.5 s vs 23.6 s for this three-shuffle join shape
    // (distinct, order-key re-key [one exchange, reused by both sides],
    // pair count). Hash-join machinery beats object aggregation here;
    // the join stays bounded by items-per-order either way.
    // Round 16: one exchange + one evaluation for the distinct item set.
    // repartition(l_orderkey) BEFORE the dedup (hash(orderkey) ⊆ the
    // dedup keys, so the aggregate adds no exchange and its output is
    // already the self-join's required distribution), then an EAGER
    // localCheckpoint so BOTH join sides read the one materialized
    // frame — the old `.distinct()` shape evaluated the scan+dedup once
    // per broadcast side (the q_basket_pairs final plan showed 2 full
    // scans + 2 dedup exchanges for the identical subtree; AQE reused
    // only one of them). LogicalRDD preserves the hash(orderkey)
    // partitioning, so the pair join needs no exchange at all.
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(Tables.sizedPartitions(s, d, "lineitem"),
        col("l_orderkey"))
      .dropDuplicates("l_orderkey", "l_partkey")
      .localCheckpoint(true)
    li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= 2)
      .select(col("a"), col("b"))
  }

  /** Triangle census with degree orientation (the MapReduce-era trick:
    * orient every undirected edge from its lower-(degree, id) endpoint
    * to the higher one, so out-degrees are bounded by ~√|E| on any
    * graph and the wedge join never explodes on hubs — THE property
    * that makes distributed triangle counting survive skewed degree
    * distributions at 100 TB). Each triangle then has exactly one
    * pivot vertex with two out-edges, and the closing edge carries
    * exactly one orientation, so the wedge⋈closing-edge equi-join
    * counts every triangle once with no ordering guard. Reports the
    * global census: triangles, wedges (Σ d(d−1)/2 over undirected
    * degrees), and the clustering coefficient 3·Δ/wedges.
    */
  def triangleCensus(edgesRaw: DataFrame): DataFrame = {
    // materialize the edge set EAGERLY, once: it is tiny (support-
    // pruned) but EXPENSIVE to derive (the per-order pair join), and
    // the census reads it three times (degree/wedge count + both
    // orientation sides). localCheckpoint rather than cache (round 16):
    // the census is now ONE distributed plan (below), so an explicit
    // unpersist after "both consumers have run" no longer has a spot to
    // live — the checkpointed blocks are released by the context
    // cleaner when the frame is collected, and every consumer reads the
    // one materialized RDD instead of re-running the pair join.
    val edges = edgesRaw.localCheckpoint(true)
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // rank = deg·2^32 + id: one sortable long encodes the (degree, id)
    // total order (ids are table keys, far below 2^32)
    val rank = deg.select(col("u"),
      (col("deg") * lit(4294967296L) + col("u")).as("rank"))
    // oriented is read three times below (two wedge sides + the closing
    // edge); it is support-pruned-tiny, so materialize it too — the
    // closing join needs a different key layout than the wedge join,
    // and without the checkpoint the und⋈rank⋈rank derivation runs
    // once per layout.
    val oriented = und
      .join(rank.withColumnRenamed("u", "src_u").withColumnRenamed("rank", "ru"),
        col("u") === col("src_u"))
      .join(rank.withColumnRenamed("u", "src_v").withColumnRenamed("rank", "rv"),
        col("v") === col("src_v"))
      .filter(col("ru") < col("rv"))
      .select(col("u").as("src"), col("v").as("dst"))
      .localCheckpoint(true)
    val wedges = oriented.select(col("src").as("pivot"), col("dst").as("x"))
      .join(oriented.select(col("src").as("pivot"), col("dst").as("y")), "pivot")
      .filter(col("x") =!= col("y"))
    val closed = wedges.join(oriented,
      col("x") === col("src") && col("y") === col("dst"))
    // Round 16: the census is ONE distributed plan instead of two
    // sequential driver actions (count() then head) + a driver-local
    // result frame — the triangle count and the wedge aggregate are
    // both one-row aggregates, cross-joined broadcast like every other
    // scalar in the suite, and the coefficient arithmetic replays the
    // retired driver-side expression IEEE-op-for-op:
    //   math.floor(3.0 * nTri / nWedge * 1e6 + 0.5) / 1e6
    // (count → double widening, left-associated multiply/divide chain,
    // Spark FLOOR's bigint result re-widened by the /1e6). nWedge = 0
    // keeps the old 0/0 → NaN behavior via the explicit guard — Spark's
    // FLOOR(NaN) is 0, math.floor(NaN) is NaN.
    val tri = closed.agg(count(lit(1)).as("n_triangles"))
    val wed = deg.agg(coalesce(sum(col("deg") * (col("deg") - 1) / lit(2)),
      lit(0.0)).as("__wed"))
    tri.crossJoin(broadcast(wed))
      .select(col("n_triangles"),
        col("__wed").cast("long").as("n_wedges"),
        when(col("__wed") > 0,
          floor(lit(3.0) * col("n_triangles") / col("__wed") * lit(1e6)
            + lit(0.5)) / lit(1e6))
          .otherwise(lit(Double.NaN)).as("clustering_coeff"))
  }

  /** Bounded-hop BFS: shortest hop distance from a seed node to every
    * node reachable within `maxHops`, over an undirected edge set
    * (columns a, b).
    *
    * The distributed shape is textbook frontier BFS — the one every
    * Pregel-style system demonstrates second after PageRank: per level,
    * ONE equi-join (frontier ⋈ edges on the node key) discovers
    * neighbors, ONE left-anti join against the visited set keeps the
    * work linear (each node enters a frontier at most once — the
    * visited set is what makes distributed BFS O(|E|) total instead of
    * O(|E|·hops)), and an early exit stops dead levels. Frontier and
    * visited frames are localCheckpointed per level for the same
    * reason as [[pageRank]]: the next level reads both, and a lazy
    * unroll re-derives every prior level at every depth. At cluster
    * scale the identical plan runs with reliable checkpoint() and the
    * visited set hash-partitioned on id so the anti-join is co-located
    * with the neighbor aggregation.
    *
    * The seed is the minimum node id in the edge set — one
    * metadata-scale scalar aggregate (like |V| in pageRank), embedded
    * so both engines start from the identical root.
    */
  def bfsHops(edgesRaw: DataFrame, maxHops: Int = 4,
              parts: Option[Int] = None): DataFrame = {
    val spark = edgesRaw.sparkSession
    import spark.implicits._
    val edges = edgesRaw.cache()
    // undirected adjacency, hash-partitioned on the expansion key so
    // every level's frontier join reuses one edge layout; `parts` sizes
    // the cached layout to the data (Tables.sizedPartitions) instead of
    // spark.sql.shuffle.partitions — every BFS level re-reads it, and
    // core-count shards of a KB-scale adjacency pay per-level task
    // launches for nothing (guide §2.2)
    val undBase = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
    val und = parts.map(n => undBase.repartition(n, col("u")))
      .getOrElse(undBase.repartition(col("u"))).cache()
    val seedRow = und.agg(min(col("u"))).head
    if (seedRow.isNullAt(0)) { // no edges at all → empty result, not an NPE
      und.unpersist(); edges.unpersist()
      return spark.emptyDataFrame
        .select(lit(0L).as("part_id"), lit(0).as("hops")).limit(0)
    }
    val seed = seedRow.getLong(0)
    var visited = Seq((seed, 0)).toDF("id", "hops")
    var frontier = visited
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      val next = frontier
        .join(und, frontier("id") === und("u"))
        .select(col("v").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next
      }
      h += 1
    }
    // visited is checkpointed — the cached adjacency can go (see
    // pageRank on why eager release matters in a long-lived JVM)
    und.unpersist(); edges.unpersist()
    visited.select(col("id").cast("long").as("part_id"),
      col("hops").cast("int").as("hops"))
  }

  def entries: Map[String, Q] = Map(
    // PageRank over the customer→supplier purchase graph: 5 power
    // iterations, damping 0.85, dangling mass redistributed (suppliers
    // are sinks in this bipartite graph, so ~half the mass is dangling
    // every pass). Ranks are reported in parts-per-million: raw ranks
    // are O(1/N) and a fixed decimal rounding of values that small
    // compares digits the float sum can't hold; scaling by 1e6 first
    // keeps the comparison at 6 meaningful fractional digits. The
    // ENTIRE iteration replays in the DuckDB oracle (same unrolled
    // update, same literals), so the gate checks the fixpoint math,
    // not just the plumbing.
    "q_pagerank" -> Q(
      (s, d) => pageRank(purchaseEdges(s, d),
        parts = Some(Tables.sizedPartitions(s, d, "lineitem")))
        .select(displayId(col("id")).as("id"),
          round(col("rank") * lit(1e6), 6).as("rank_ppm")),
      pageRankOracle(Iters, Damping)),

    // triangle census over the min-support co-purchase graph: degree
    // orientation bounds wedge-join work on hubs (see triangleCensus);
    // the oracle replays the identical support filter + orientation +
    // wedge + closing join, so the gate checks the counting
    // construction itself.
    "q_triangles" -> Q(
      (s, d) => triangleCensus(coPurchaseEdges(s, d)),
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b
        |  FROM li x JOIN li y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), und AS (
        |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
        |), deg AS (
        |  SELECT u, count(*) AS deg FROM und GROUP BY u
        |), rk AS (
        |  SELECT u, deg * 4294967296 + u AS rk FROM deg
        |), o AS (
        |  SELECT und.u AS src, und.v AS dst FROM und
        |  JOIN rk ru ON und.u = ru.u
        |  JOIN rk rv ON und.v = rv.u
        |  WHERE ru.rk < rv.rk
        |), tri AS (
        |  SELECT count(*) AS n FROM o e1
        |  JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
        |  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
        |), w AS (
        |  SELECT coalesce(sum(deg * (deg - 1) / 2), 0.0) AS nw FROM deg
        |)
        |SELECT CAST(tri.n AS BIGINT) AS n_triangles,
        |  CAST(w.nw AS BIGINT) AS n_wedges,
        |  round(3.0 * tri.n / w.nw, 6) AS clustering_coeff
        |FROM tri, w""".stripMargin),

    // bounded-hop BFS over the same support-pruned co-purchase graph,
    // seeded at the minimum node id: shortest hop distance to every
    // part reachable within 4 hops. The oracle is a RECURSIVE CTE —
    // DuckDB's set-semantics UNION walks every path of length ≤ 4 and
    // min(hops) collapses to the BFS distance, so the gate proves the
    // frontier/anti-join iteration against an independent declarative
    // formulation of reachability (a different algorithm entirely),
    // not a replay of the same loop.
    "q_bfs_hops" -> Q(
      (s, d) => bfsHops(coPurchaseEdges(s, d),
        parts = Some(Tables.sizedPartitions(s, d, "lineitem"))),
      """WITH RECURSIVE
        | li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        | e0 AS (
        |   SELECT x.l_partkey AS a, y.l_partkey AS b
        |   FROM li x JOIN li y
        |     ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |   GROUP BY 1, 2 HAVING count(*) >= 2
        | ),
        | und AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
        | seed AS (SELECT min(u) AS s FROM und),
        | walk(id, hops) AS (
        |   SELECT s, 0 FROM seed
        |   UNION
        |   SELECT und.v, walk.hops + 1 FROM walk
        |   JOIN und ON walk.id = und.u WHERE walk.hops < 4
        | )
        |SELECT CAST(id AS BIGINT) AS part_id,
        |  CAST(min(hops) AS INTEGER) AS hops
        |FROM walk GROUP BY id""".stripMargin)
  )
}
