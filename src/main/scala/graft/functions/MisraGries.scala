package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Aggregator: a bounded
  * map of at most `k` counters whose candidate set provably contains
  * every item with true frequency > n/(k+1), in O(k) space per
  * partial buffer.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et
  * al., PODS '12): sum the two counter maps, then subtract the
  * (k+1)-th largest count from every counter and drop the
  * non-positives. Each operation discards at most n/(k+1) weight per
  * item, so the superset guarantee — the only property the engine
  * relies on — survives arbitrary merge trees, i.e. any partitioning
  * and any AQE re-plan.
  *
  * The counter VALUES are merge-order-dependent (like any MG sketch),
  * so registered queries must not expose them — q_heavy_hitters uses
  * only the candidate KEY SET and re-counts exactly (see
  * Aggregates.heavyHitters). That two-pass shape is the 100 TB story:
  * pass 1 is a partial+final ObjectHashAggregate with an O(k) buffer,
  * pass 2 aggregates only rows matching ≤ k broadcast candidates —
  * the full-vocabulary groupBy (whose key cardinality is unbounded)
  * never runs.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)            => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      // all counters decrement; zeros vacate their slots
      case None => b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everyone
      val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
