package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Every implemented operator has an entry in `queries`; those with
  * SQL-expressible semantics also have a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** All operator registries, merged. Keys are unique per module. */
  private def all: Map[String, Q] =
    CoreQueries.entries ++ WindowQueries.entries ++ JoinQueries.entries ++
      TpchQueries.entries ++
      Dedup.entries ++ Similarity.entries ++ TextAnalysis.entries ++
      Multimodal.entries ++ AnalyticsQueries.entries ++
      EventAnalytics.entries ++
      WarehouseQueries.entries ++ Search.entries ++ Regression.entries ++
      DataQuality.entries ++ Incremental.entries ++
      Pca.entries ++ Graph.entries ++
      graft.ksql.KsqlQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q_agg_core").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** Write-once index/layout/materialization builds, keyed by the query
    * that consumes them: Bench runs each as its own separately-timed
    * phase (`prepare_<name>`), so timed queries measure the serving
    * path while the build cost stays visible in the bench JSON. Verify
    * needs no special handling — the first query call builds lazily. */
  def prepares: Map[String, (SparkSession, String) => Unit] =
    CoreQueries.prepares ++ Similarity.prepares ++ Dedup.prepares ++
      JoinQueries.prepares ++ Incremental.prepares ++
      graft.ksql.KsqlQueries.prepares

  /** DuckDB-equivalent SQL per query (same column names — the driver's
    * compare sorts columns by name before hashing). Every oracle is routed
    * through [[Rounding.rewriteSql]], which rewrites textual
    * `round(expr, n)` into the engine-identical floor recipe that the
    * Spark side uses via the shadowed [[Rounding.round]] — without this,
    * Spark (decimal-repr HALF_UP) and DuckDB (binary-value) disagree on
    * half-boundary doubles and any rounded oracle can flip red on a data
    * refresh (the round-6 `q_embed_project` failure). */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> Rounding.rewriteSql(sql) }
}
