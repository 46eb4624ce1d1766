package graft

/** Empty-input totality: every driver-gated query must PLAN and
  * EXECUTE over empty tables (0-row frames with the production
  * schemas) without throwing — the property that keeps a 100 TB
  * pipeline alive when a partition, a day, or a tenant slice turns up
  * empty. Row counts may legitimately be zero; exceptions may not.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    // events via the nanos-normalizing loader so the empty copy carries
    // a proper TimestampType ts (Tables.events handles both layouts)
    Tables.events(spark, sfDir).limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every query executes on empty inputs without throwing") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try fn(spark, emptyDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failures += s"$name: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(160) }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on empty inputs:\n" + failures.mkString("\n"))
  }
}
