package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra–Gries heavy-hitter summary (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * One pass over a token stream keeps at most `2·capacity` counters per
  * partial buffer; a COMPRESS step subtracts the (capacity+1)-th largest
  * count from every counter and drops the non-positive ones, so each
  * unit of subtracted "dec" retires at least capacity+1 units of count
  * mass. That gives the classic deterministic guarantee regardless of
  * partitioning or merge order:
  *
  *   true_freq(x) − stored(x) ≤ dec ≤ n / (capacity + 1)   for all x
  *
  * so every item with true frequency > n/capacity is GUARANTEED present
  * in the final candidate set. The engine uses this
  * candidates-then-verify style: the sketch (map-side combinable, fixed
  * memory, no shuffle of the raw token mass) nominates candidates, an
  * exact recount of just those candidates restores exactness, and the
  * deterministic output filter `exact_count · capacity > n` depends only
  * on corpus truth — the sketch's internal nondeterminism (which extra
  * sub-threshold tokens survive) is filtered out, so the result is
  * hash-stable and oracle-checkable as plain `HAVING count(*)·cap > n`.
  *
  * Cost model at 100 TB: the input side is a single map-side-combined
  * aggregation whose shuffle payload is one ≤2·capacity-entry map per
  * partition (KBs), NOT the token mass; the recount join filters the
  * token stream against a broadcast candidate list before its groupBy,
  * so the second shuffle carries only candidate tokens.
  */
object MisraGries {

  /** (counters, dec): counters holds ≤ 2·cap entries mid-stream and is
    * compressed to ≤ cap on merge; dec is the total subtracted mass,
    * the exact per-buffer undercount bound.
    */
  type Buf = (Map[String, Long], Long)

  val empty: Buf = (Map.empty, 0L)

  /** Stream one item into the buffer (the pure core — shared by the
    * batch Aggregator and the streaming twin so the two are
    * bit-identical in semantics).
    */
  def add(buf: Buf, w: String, cap: Int): Buf = {
    val (m, dec) = buf
    val m2 = m.updated(w, m.getOrElse(w, 0L) + 1L)
    if (m2.size <= 2 * cap) (m2, dec) else compress(m2, dec, cap)
  }

  /** Merge two buffers (Agarwal et al.: sum counters, COMPRESS back to
    * ≤ cap — the guarantee survives any merge tree).
    */
  def mergeBufs(a: Buf, b: Buf, cap: Int): Buf = {
    val (ma, da) = a; val (mb, db) = b
    val m = mb.foldLeft(ma) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (m.size <= cap) (m, da + db) else compress(m, da + db, cap)
  }

  /** Subtract the (cap+1)-th largest count from all counters, keep the
    * positive ones: ≤ cap survive, and the subtracted mass is ≥
    * v·(cap+1), charging dec at most total_mass/(cap+1).
    */
  private def compress(m: Map[String, Long], dec: Long, cap: Int): Buf = {
    val counts = m.valuesIterator.toArray
    java.util.Arrays.sort(counts)
    val v = counts(counts.length - (cap + 1))
    (m.collect { case (w, c) if c > v => (w, c - v) }, dec + v)
  }

  private final class MgAgg(cap: Int) extends Aggregator[String, Buf, Seq[String]] {
    override def zero: Buf = empty

    override def reduce(buf: Buf, w: String): Buf = add(buf, w, cap)

    override def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, cap)

    override def finish(buf: Buf): Seq[String] = buf._1.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Candidate heavy hitters of a string column as an aggregate Column:
    * a sorted array guaranteed to contain every value with frequency
    * > n/capacity (superset; callers recount exactly and threshold).
    */
  def candidates(w: Column, capacity: Int): Column = {
    val fn = udaf(new MgAgg(capacity))
    fn(w)
  }
}
