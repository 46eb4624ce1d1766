package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (the KSQL custom-UDAF surface, Spark-first): implemented
  * as `Aggregator`s so Catalyst plans them with map-side partial
  * aggregation + merge, exactly like built-in aggregates — state is a
  * tiny case class per key-partition, never a collected list.
  */
object Udafs {

  case class WeightedAvgState(weightedSum: Double, weightSum: Double)

  /** weighted_avg(value, weight): Σ(v*w)/Σ(w). */
  val weightedAvg: Aggregator[(Double, Double), WeightedAvgState, Double] =
    new Aggregator[(Double, Double), WeightedAvgState, Double] {
      override def zero: WeightedAvgState = WeightedAvgState(0.0, 0.0)
      override def reduce(b: WeightedAvgState, a: (Double, Double)): WeightedAvgState =
        WeightedAvgState(b.weightedSum + a._1 * a._2, b.weightSum + a._2)
      override def merge(x: WeightedAvgState, y: WeightedAvgState): WeightedAvgState =
        WeightedAvgState(x.weightedSum + y.weightedSum, x.weightSum + y.weightSum)
      override def finish(r: WeightedAvgState): Double =
        if (r.weightSum == 0) 0.0 else r.weightedSum / r.weightSum
      override def bufferEncoder: Encoder[WeightedAvgState] = Encoders.product
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  case class TopKState(values: List[Long])

  /** topk(value, k) as a bounded-state aggregator: keeps only k values
    * per partial state — constant memory per group regardless of group
    * size (the KSQL TOPK UDAF semantics, scale-safe). */
  def topK(k: Int): Aggregator[Long, TopKState, Seq[Long]] =
    new Aggregator[Long, TopKState, Seq[Long]] {
      private def trim(vs: List[Long]): List[Long] =
        vs.sorted(Ordering[Long].reverse).take(k)
      override def zero: TopKState = TopKState(Nil)
      override def reduce(b: TopKState, a: Long): TopKState =
        TopKState(trim(a :: b.values))
      override def merge(x: TopKState, y: TopKState): TopKState =
        TopKState(trim(x.values ++ y.values))
      override def finish(r: TopKState): Seq[Long] = trim(r.values)
      override def bufferEncoder: Encoder[TopKState] = Encoders.product
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}
