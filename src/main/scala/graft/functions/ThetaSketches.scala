package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Theta-sketch distinct-set algebra (Apache DataSketches, public API —
  * the jars ship with Spark). HLL answers |A| only; theta sketches keep
  * a hash SAMPLE of the set, so |A ∩ B|, |A \ B| and |A ∪ B| are all
  * estimable from per-set summaries — the "how many users did BOTH"
  * question that exact distinct-joins make brutally expensive at 100 TB.
  *
  * Architecture is the sketch architecture, not an aggregate hack: one
  * UpdateSketch built imperatively PER PARTITION (linear scan, zero
  * shuffle), then the ~numPartitions KB-sized compact sketches collect
  * to the driver and merge there — the collected artifact is bounded by
  * partition count, never data size.
  */
object ThetaSketches {

  /** One compact sketch per partition of `df`'s long key column. */
  def perPartitionSketches(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(keyCol).cast("long")).rdd.mapPartitions { it =>
      val sk = UpdateSketch.builder().build()
      it.foreach(r => if (!r.isNullAt(0)) sk.update(r.getLong(0)))
      Iterator.single(Row(sk.compact().toByteArray))
    }
    spark.createDataFrame(rdd,
      StructType(Seq(StructField("sketch", BinaryType))))
  }

  /** Merged compact sketch for a frame's key column (collects only the
    * per-partition sketches — bounded by partition count). */
  def sketchOf(df: DataFrame, keyCol: String): CompactSketch = {
    val u = SetOperation.builder().buildUnion()
    perPartitionSketches(df, keyCol).collect().foreach { r =>
      u.union(Sketches.wrapSketch(Memory.wrap(r.getAs[Array[Byte]](0))))
    }
    u.getResult
  }

  def union(a: CompactSketch, b: CompactSketch): CompactSketch = {
    val u = SetOperation.builder().buildUnion()
    u.union(a); u.union(b); u.getResult
  }

  def intersection(a: CompactSketch, b: CompactSketch): CompactSketch = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b); i.getResult
  }

  def aNotB(a: CompactSketch, b: CompactSketch): CompactSketch =
    SetOperation.builder().buildANotB().aNotB(a, b)
}
