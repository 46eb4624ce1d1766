package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

/** KLL quantile sketches (Apache DataSketches, public API — the jars
  * ship with Spark). Exact percentiles need a global sort (or the
  * full-width percentile_approx shuffle); a KLL sketch is a ~KB
  * mergeable summary with a PROVEN rank-error bound (~1.65% at the
  * default k for 99% confidence), so quantiles of a 100 TB column
  * come from: per-partition linear scans → numPartitions KB-sized
  * sketches → driver merge. Same architecture as [[ThetaSketches]]:
  * the collected artifact is bounded by partition count (× group
  * count for the grouped form), never by data size — and unlike a
  * percentile_approx aggregate, the serialized sketches can be STORED
  * and re-merged incrementally as new partitions arrive.
  */
object KllSketches {

  /** One serialized sketch per (partition × group): linear scan, zero
    * shuffle. Null group keys roll up under "" (matches the grouped
    * query contract; the ungrouped form passes a constant column). */
  def perPartitionSketches(df: DataFrame, groupCol: String,
                           valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(groupCol).cast("string"), col(valueCol).cast("double"))
      .rdd.mapPartitions { it =>
        val sks = collection.mutable.HashMap.empty[String, KllDoublesSketch]
        it.foreach { r =>
          if (!r.isNullAt(1)) {
            val g = if (r.isNullAt(0)) "" else r.getString(0)
            sks.getOrElseUpdate(g, KllDoublesSketch.newHeapInstance())
              .update(r.getDouble(1))
          }
        }
        sks.iterator.map { case (g, sk) => Row(g, sk.toByteArray) }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("group", StringType), StructField("sketch", BinaryType))))
  }

  /** Merged sketch per group — collects only the per-(partition, group)
    * sketches, bounded by partitions × groups. */
  def sketchesByGroup(df: DataFrame, groupCol: String,
                      valueCol: String): Map[String, KllDoublesSketch] = {
    val merged = collection.mutable.HashMap.empty[String, KllDoublesSketch]
    perPartitionSketches(df, groupCol, valueCol).collect().foreach { r =>
      val part = KllDoublesSketch.heapify(Memory.wrap(r.getAs[Array[Byte]](1)))
      merged.get(r.getString(0)) match {
        case Some(sk) => sk.merge(part)
        case None =>
          val sk = KllDoublesSketch.newHeapInstance()
          sk.merge(part)
          merged.put(r.getString(0), sk)
      }
    }
    merged.toMap
  }
}
