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

  private lazy val oneRowDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_one").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    Tables.events(spark, sfDir).limit(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def sweep(dir: String, label: String): Unit = {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failures += s"$name: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(160) }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries throw on $label inputs:\n" + failures.mkString("\n"))
  }

  test("every query executes on empty inputs without throwing") {
    sweep(emptyDir, "empty")
  }

  // single-row tables: the other degenerate class — div-by-zero under
  // ANSI, descending sequence(1, 0) index errors, one-vector k-means,
  // one-word BPE, pairless components
  test("every query executes on single-row inputs without throwing") {
    sweep(oneRowDir, "single-row")
  }

  // adversarial CONTENT: nulls in optional fields, empty/whitespace/
  // single-char text, zero vectors, identical rows — the data-quality
  // hazards a 100 TB crawl actually contains
  private lazy val adversarialDir: String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_adv").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      spark.read.parquet(s"$sfDir/$t.parquet").limit(5)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    Tables.events(spark, sfDir).limit(5)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.limit(2)
    base.unionByName(base
        .withColumn("text", lit("")).withColumn("doc_id", col("doc_id") + 100))
      .unionByName(base
        .withColumn("text", lit("x")).withColumn("doc_id", col("doc_id") + 200))
      .unionByName(base
        .withColumn("text", lit("   ")).withColumn("doc_id", col("doc_id") + 300))
      .unionByName(base
        .withColumn("text", lit(null).cast("string"))
        .withColumn("doc_id", col("doc_id") + 400))
      .unionByName(base
        .withColumn("lang", lit(null).cast("string"))
        .withColumn("doc_id", col("doc_id") + 500))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ebase = emb.limit(2)
    ebase.unionByName(ebase
        .withColumn("embedding",
          expr("transform(embedding, x -> CAST(0.0 AS FLOAT))"))
        .withColumn("vec_id", col("vec_id") + 100))
      .unionByName(ebase
        .withColumn("embedding", lit(null).cast("array<float>"))
        .withColumn("vec_id", col("vec_id") + 200))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("every query executes on adversarial content without throwing") {
    sweep(adversarialDir, "adversarial")
  }
}
