package graft

import org.apache.spark.sql.SparkSession

/** Planning-vs-execution split probe (round-15): per query, separate
  * the frame-construction cost (dialect translation + analysis), the
  * optimizer cost (where rule regressions like a registry-linear MV
  * rewrite live), and the execution wall — so the next rule-cost
  * regression surfaces BY PHASE instead of hiding inside a per-query
  * wall number. Each query runs twice before (`pre`) and twice after
  * (`post`) the full prepare pass, because prepares register the MV
  * registry the bench suite runs under: a pre≈post split acquits the
  * registry; a post-only inflation indicts it.
  *
  * Usage: runMain graft.PlanSplit [query names...] (default: the
  * dialect subquery family that regressed in round 14).
  */
object PlanSplit {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  /** One measured run: (build sec, optimize sec, execute sec). */
  def split(spark: SparkSession, sfDir: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : (Double, Double, Double) = {
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val t1 = System.nanoTime()
    df.queryExecution.executedPlan // forces optimization + physical plan
    val t2 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val t3 = System.nanoTime()
    ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_ksql_exists", "q_ksql_scalar_subquery", "q_ksql_in_subquery")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    SparkEntry.queries.get("q_agg_core").foreach(f => f(spark, sfDir).count())

    def measure(tag: String): Unit = names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        (1 to 2).foreach { i =>
          val (b, o, e) = split(spark, sfDir, fn)
          println(s"""{"probe":"plan_split","query":"$n","phase":"$tag","run":$i,"build_sec":${fmt(b)},"optimize_sec":${fmt(o)},"exec_sec":${fmt(e)},"mv_views":${graft.plans.MaterializedViews.registered.size}}""")
        }
      }
    }
    if (args.headOption.contains("ALL")) {
      // floor attribution across the whole suite, solo, post-prepares:
      // how much of the per-query wall is frame construction + planning
      // (the session floor) vs execution (the operator under test)
      SparkEntry.prepares.toSeq.sortBy(_._1).foreach { case (_, p) =>
        try p(spark, sfDir) catch { case _: Throwable => () }
      }
      var (tb, to, te) = (0.0, 0.0, 0.0); var n = 0
      val perQuery = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, f) =>
          try {
            val (b, o, e) = split(spark, sfDir, f)
            tb += b; to += o; te += e; n += 1
            Some((name, b, o, e))
          } catch { case _: Throwable => None }
      }
      perQuery.sortBy(r => -(r._2 + r._3)).take(15).foreach {
        case (name, b, o, e) => println(
          s"""{"probe":"floor_top","query":"$name","build_sec":${fmt(b)},"optimize_sec":${fmt(o)},"exec_sec":${fmt(e)}}""")
      }
      println(s"""{"probe":"floor_total","n":$n,"build_sec":${fmt(tb)},"optimize_sec":${fmt(to)},"exec_sec":${fmt(te)},"per_query_floor_sec":${fmt((tb + to) / math.max(n, 1))}}""")
      spark.stop()
      return
    }
    measure("pre")
    SparkEntry.prepares.toSeq.sortBy(_._1).foreach { case (_, p) =>
      try p(spark, sfDir) catch { case _: Throwable => () }
    }
    measure("post")
    spark.stop()
  }
}
