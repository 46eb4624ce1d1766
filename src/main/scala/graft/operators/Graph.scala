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
  def pageRank(edges: DataFrame, iters: Int = Iters, d: Double = Damping): DataFrame = {
    val spark = edges.sparkSession
    // distinct once, outside the loop: every iteration reuses the same
    // deduplicated edge set (one shuffle paid once, not k times)
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // |V| is a metadata-scale scalar (node count, not row count of the
    // fact) — one distributed count up front, embedded as a literal so
    // both engines start every iteration from the identical double
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
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
    }
    ranks
  }

  /** Customer→supplier purchase edges: who bought from whom, from the
    * orders⋈lineitem fact. Node ids are prefixed so the two key spaces
    * cannot collide. */
  private def purchaseEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))

  /** The same 5-iteration unrolled update as chained CTEs, so DuckDB
    * replays the identical computation. `n` and the damping constants
    * are embedded as the same decimal literals both engines parse to
    * the same doubles. */
  private def pageRankOracle(iters: Int, d: Double): String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
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
      s"\nSELECT id, round(rank * 1e6, 6) AS rank_ppm FROM r$iters"
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
      (s, d) => pageRank(purchaseEdges(s, d))
        .select(col("id"), round(col("rank") * lit(1e6), 6).as("rank_ppm")),
      pageRankOracle(Iters, Damping))
  )
}
