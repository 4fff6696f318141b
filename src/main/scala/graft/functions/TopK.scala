package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for the top-k aggregate over lineitem: ordered by
  * (price desc, okey asc, lineno asc) — the same total order as
  * q_topk's window specification. */
case class LineRef(price: Double, okey: Long, lineno: Int)

/** Bounded top-k aggregate (SURVEY.md §4 item 5): each partial
  * buffer holds at most k rows, so the shuffle carries k rows per
  * (group × partition) instead of every row — the aggregate
  * formulation of per-group top-k that replaces
  * shuffle-all + sort + row_number at scale.
  */
class TopKByPrice(k: Int) extends Aggregator[LineRef, List[LineRef], Seq[LineRef]] {

  private def lt(a: LineRef, b: LineRef): Boolean =
    a.price > b.price ||
      (a.price == b.price && (a.okey < b.okey ||
        (a.okey == b.okey && a.lineno < b.lineno)))

  // Invariant: buffers are kept sorted (best first) and bounded at k,
  // so reduce is an O(k) ordered insert with an O(1) early exit for
  // rows that can't make the cut — not a per-row sort.
  private def insert(buf: List[LineRef], in: LineRef): List[LineRef] = {
    if (buf.lengthCompare(k) >= 0 && !lt(in, buf.last)) return buf
    val (better, rest) = buf.span(b => lt(b, in))
    (better ::: in :: rest).take(k)
  }

  override def zero: List[LineRef] = Nil
  override def reduce(buf: List[LineRef], in: LineRef): List[LineRef] =
    insert(buf, in)
  override def merge(a: List[LineRef], b: List[LineRef]): List[LineRef] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[LineRef]): Seq[LineRef] = buf
  override def bufferEncoder: Encoder[List[LineRef]] = Encoders.kryo[List[LineRef]]
  override def outputEncoder: Encoder[Seq[LineRef]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[LineRef]]()
}
