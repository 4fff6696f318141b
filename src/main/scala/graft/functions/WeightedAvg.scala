package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §4 item 4): weighted average as an
  * Aggregator[IN, BUF, OUT]. O(1) buffer state — the shape that
  * scales: partial buffers merge associatively, so Spark plans it as
  * partial+final aggregation exactly like a built-in.
  */
case class WeightedAvgBuf(var sum: Double, var weight: Double)

class WeightedAvg extends Aggregator[(Double, Double), WeightedAvgBuf, Double] {
  override def zero: WeightedAvgBuf = WeightedAvgBuf(0.0, 0.0)
  override def reduce(b: WeightedAvgBuf, in: (Double, Double)): WeightedAvgBuf = {
    b.sum += in._1 * in._2; b.weight += in._2; b
  }
  override def merge(a: WeightedAvgBuf, b: WeightedAvgBuf): WeightedAvgBuf = {
    a.sum += b.sum; a.weight += b.weight; a
  }
  override def finish(b: WeightedAvgBuf): Double =
    if (b.weight == 0.0) Double.NaN else b.sum / b.weight
  override def bufferEncoder: Encoder[WeightedAvgBuf] = Encoders.product[WeightedAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
