package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over a sf-dir of parquet tables,
  * plus (when SQL-expressible) an equivalent DuckDB oracle query the driver
  * hash-compares against. Column names MUST match between the two.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(fn, Some(sql))
}
