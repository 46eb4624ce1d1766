package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-query formatted-plan dumps for the optimization-round audit
  * trail: one file per query, so a before/after pair of a touched
  * query can be committed side by side (plans/r16/<q>_before.txt /
  * _after.txt) and plan claims ("2 Exchange -> 1") are checkable
  * against the files without running Spark.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [query...]
  *   outDir  directory for the .txt files (created if missing)
  *   suffix  appended to the file name, e.g. "before" / "after"
  *   query   names from SparkEntry.queries; default = none (error)
  *
  * Plans are captured at sf0.001 under the same session shape Explain
  * uses (local[4], shuffle.partitions=4, UTC) — the plan SHAPE
  * (exchanges, join strategies, pushed filters) is what the audit
  * compares, and it is scale-independent for these queries.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    // SPARK_GRAFT_PLAN_EXEC=1: execute through the noop sink first so the
    // dump is the AQE FINAL plan (ReusedExchange, runtime join rewrites,
    // coalesced reads) — the plan the bench actually pays for, not the
    // isFinalPlan=false estimate.
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          // run the frame's OWN executedPlan (a noop write would wrap it
          // in a fresh QueryExecution and leave this one un-finalized)
          if (exec) df.queryExecution.executedPlan.execute().foreach(_ => ())
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
          println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
