package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Schema'd loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown:
  * column pruning and predicate pushdown reach the parquet scan. Do NOT
  * cache the DATA here — at 100 TB the scan must stream, and pruning only
  * works when the scan sees the final projection.
  *
  * The parquet SCHEMA is memoized per (dir, table): without a
  * user-supplied schema, `spark.read.parquet` opens files and reads
  * footers to infer it on every call — serial driver work that, at 150+
  * queries × several tables each, is a material planning floor. The
  * cached value is a plain immutable `StructType` keyed by strings, so
  * the cache references NO SparkSession (the round-6 form memoized the
  * resolved DataFrame in a WeakHashMap keyed by session — but a
  * DataFrame strongly references its session, so the weak key was
  * always reachable through the value and stopped sessions were pinned
  * for the JVM lifetime). The file LISTING is deliberately fresh on
  * every call: a table dir rewritten mid-session is picked up, and
  * listing one directory is cheap next to footer I/O.
  */
object Tables {
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  /** Drop memoized schemas — for callers that rewrite a table dir with a
    * DIFFERENT schema mid-session (same-schema rewrites need nothing). */
  def invalidate(): Unit = { schemaCache.clear(); partitionsCache.clear() }

  /** Scale-adaptive partition count for operator-INTERNAL repartitions
    * (cached graph adjacency, self-join inputs): ceil(source parquet
    * bytes × an expansion allowance ÷ 32 MiB), clamped to [1, 4096].
    * Derived from the INPUT SIZE, never from the local core count —
    * `spark.sql.shuffle.partitions` is sized to cores here, so a cached
    * frame repartitioned without an explicit count inherits 32 tiny
    * partitions at sf0.1 and an iterative operator then pays 32 task
    * launches per pass for KB-sized shards (guide §2.2/§6: partitions
    * should target ~100 MB–1 GB of data; the 32 MiB target reflects
    * that these frames are decompressed/widened relative to the parquet
    * bytes). At cluster scale the same formula yields thousands of
    * partitions. Memoized per path alongside the schema cache — the
    * value is a pure function of the committed file set. */
  def sizedPartitions(spark: SparkSession, dir: String, name: String,
                      targetBytes: Long = 32L << 20): Int =
    partitionsCache.getOrElseUpdate(s"$dir/$name.parquet", {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val bytes =
        try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
        catch { case _: Throwable => 0L }
      math.min(4096L, math.max(1L, (bytes + targetBytes - 1) / targetBytes)).toInt
    })
  private val partitionsCache =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(path,
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark only reads as a
    * raw long (nanos since epoch) under the legacy conf; normalize it back
    * to a proper TimestampType (micros) so downstream window/join logic is
    * uniform. Floor-truncation to micros matches DuckDB's epoch_ms floor.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // TIMESTAMP(NANOS) parquet under the legacy conf: integer
        // division — nanos exceed double's 2^53 mantissa, so a
        // floating-point `/ 1000` would silently corrupt low-order millis
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] with isAdjustedToUTC=false (the round-9 testdata
        // regeneration) infers as TIMESTAMP_NTZ on Spark 4 — cast to the
        // instant type every downstream unix_millis/window consumer
        // expects. Sessions here run UTC (Verify/specs pin it), so the
        // wall-clock reinterpretation is value-identical to the oracle's
        // naive read.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
