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
  * The resolved DataFrame (logical relation: file listing + parquet
  * footer schema) IS memoized per (session, dir, table): `spark.read
  * .parquet` re-lists the directory and re-reads footers on every call,
  * which is serial driver work. With 150+ queries × several tables each,
  * that planning floor is material. Reusing the immutable relation plan
  * changes no semantics — each query still stacks its own projections
  * and filters on top, and pushdown operates per-plan as before.
  */
object Tables {
  // WeakHashMap on the session (the house pattern — see Translator's
  // session-scoped stores): a strong TrieMap keyed by SparkSession
  // would pin every stopped session, its relation plans and file
  // listings for the JVM lifetime. The inner map is concurrent; the
  // outer lookup is synchronized (cheap — once per load call).
  private val relCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val m = relCache.synchronized {
      relCache.computeIfAbsent(spark, _ =>
        new scala.collection.concurrent.TrieMap[(String, String), DataFrame])
    }
    m.getOrElseUpdate((dir, name), spark.read.parquet(s"$dir/$name.parquet"))
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
        // integer division — nanos exceed double's 2^53 mantissa, so a
        // floating-point `/ 1000` would silently corrupt low-order millis
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
