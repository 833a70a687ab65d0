package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as an aggregate: keeps only the k best
  * (key desc, id asc) entries in the buffer, so partial aggregation
  * runs map-side and the shuffle carries at most k entries per group —
  * O(n·k) work, no sort.
  *
  * This is the scale replacement for the row_number-window top-k
  * pattern: a window must shuffle EVERY row to its group's partition
  * and sort the whole partition before discarding all but k rows,
  * while this aggregator discards losers before the shuffle. Results
  * are identical (same comparator, same tie-break) — pinned by the
  * shared oracle of `window_topk_per_customer` / `_agg`.
  *
  * Determinism: insertion and merge keep the buffer sorted under a
  * total order ((key, id) with id ascending on key ties), so the
  * result is independent of row order and partition layout.
  */
object TopKAggregator {

  /** (id, key) beats (id2, key2) under (key desc, id asc). */
  private def beats(key: Double, id: Long, key2: Double, id2: Long): Boolean =
    key > key2 || (key == key2 && id < id2)

  private final class TopK(k: Int)
      extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] {
    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
      val (id, key) = in
      // buffer is sorted best-first and at most k long; find the slot
      val pos = buf.indexWhere { case (bk, bid) => beats(key, id, bk, bid) }
      if (pos < 0) {
        if (buf.length < k) buf :+ ((key, id)) else buf
      } else (buf.take(pos) :+ ((key, id))) ++ buf.drop(pos).take(k - pos - 1)
    }

    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.foldLeft(a) { case (acc, (key, id)) => reduce(acc, (id, key)) }

    override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** topk(idCol, keyCol) as an aggregate Column returning the ids of
    * the k largest keys, best first (ties → smaller id first).
    */
  def topk(id: Column, key: Column, k: Int): Column = {
    val fn = udaf(new TopK(k))
    fn(id, key)
  }
}
