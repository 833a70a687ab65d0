package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass 64-bit SimHash aggregator: per group, accumulate a signed
  * counter per bit position over (token-hash, weight) rows; the sign
  * vector packs into the final hash.
  *
  * Replaces the explode-×64 formulation (which shuffles 64 rows per
  * token) with one 64-long buffer per group — the input shuffle carries
  * one row per distinct token, 64× less data, and the merge is
  * order-free (deterministic).
  */
object SimHashAggregator {

  private val agg = new Aggregator[(Long, Long), Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long](64)

    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val (h, cnt) = in
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) buf(i) += cnt else buf(i) -= cnt
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Long = {
      var out = 0L
      var i = 0
      while (i < 64) {
        if (buf(i) > 0) out |= (1L << i)
        i += 1
      }
      out
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private lazy val fn = udaf(agg)

  /** simhash(hash64Col, weightCol) as an aggregate Column. */
  def simhash(h: Column, cnt: Column): Column = fn(h, cnt)
}
