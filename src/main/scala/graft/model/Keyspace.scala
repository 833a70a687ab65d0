package graft.model

/** Wrap-around interval on the uint64 hash ring — the reference's sharding
  * unit (reference: protocol/protocol.proto:53-56; algebra at
  * protocol/keyspace.go:4-117). The JVM has no uint64, so `start`/`end`
  * are `Long` compared with `java.lang.Long.compareUnsigned`; arithmetic
  * (`end - start`) is identical in two's complement.
  *
  * Semantics (pinned by the reference's exhaustive case tables,
  * protocol/keyspace_test.go:10-318):
  *  - Membership is start-inclusive, end-exclusive, with explicit
  *    wraparound: `s <= a < e || a < e < s || e < s <= a` (unsigned).
  *  - A "maxed" keyspace (full ring) is encoded as `end == start - 1`.
  *  - `union` of non-overlapping spaces is undefined (None).
  *  - `intersection` of doubly-overlapping spaces returns the first
  *    intersection (the reference's acknowledged single-interval
  *    limitation).
  *
  * Absent (None) keyspaces mirror the reference's nil: include nothing,
  * union as identity, intersect to nothing, complement to the full ring.
  */
final case class Keyspace(start: Long, end: Long) {
  import Keyspace.{lt, lte}

  def includes(hash: Long): Boolean = {
    val a = hash; val s = start; val e = end
    (lte(s, a) && lt(a, e)) || (lt(a, e) && lt(e, s)) || (lt(e, s) && lte(s, a))
  }

  /** Size of the keyspace (wraparound-aware, modular arithmetic). */
  def mag: Long = end - start

  def maxed: Boolean = end == start - 1

  def complement: Option[Keyspace] =
    if (maxed) None else Some(Keyspace(end, start))

  def union(other: Keyspace): Option[Keyspace] = {
    val a = other
    val aSI = includes(a.start) || end == a.start
    val aEI = includes(a.end) || start == a.end
    val kSI = a.includes(start) || a.end == start
    val kEI = a.includes(end) || a.start == end
    if (aSI && aEI && kSI && kEI) Some(Keyspace(start, start - 1)) // full ring
    else if (aSI && aEI) Some(this)                                // this ⊇ a
    else if (kSI && kEI) Some(a)                                   // a ⊇ this
    else if (aSI) Some(Keyspace(start, a.end))
    else if (aEI) Some(Keyspace(a.start, end))
    else None
  }

  /** Split this keyspace into `k` contiguous, DISJOINT sub-intervals
    * whose union is exactly this interval — the ring-sharded
    * bloom/sync unit (each slice gets its own ring-fraction-sized
    * filter, so reconciliation never builds or broadcasts one
    * whole-ring bloom). Widths are ⌊mag/k⌋ with the unsigned remainder
    * spread one position each over the first slices, all arithmetic
    * modular on the uint64 ring (wrap-aware: a slice may cross 0). For
    * a maxed keyspace the slices cover its full 2⁶⁴−1 member positions
    * (the maxed encoding `end = start−1` excludes the single position
    * `start−1`, and so do its slices).
    */
  def slices(k: Int): Seq[Keyspace] = {
    require(k >= 1, s"slice count must be >= 1, got $k")
    val m = mag
    val w = java.lang.Long.divideUnsigned(m, k.toLong)
    val r = java.lang.Long.remainderUnsigned(m, k.toLong)
    val starts = (0 until k).map(i =>
      start + w * i + math.min(i.toLong, r))
    (0 until k).map(i =>
      Keyspace(starts(i), if (i == k - 1) end else starts(i + 1)))
  }

  def intersection(other: Keyspace): Option[Keyspace] = {
    val a = other
    val aSI = includes(a.start) || end == a.start
    val aEI = includes(a.end) || start == a.end
    val kSI = a.includes(start) || a.end == start
    val kEI = a.includes(end) || a.start == end
    if (maxed && a.maxed) Some(this)
    else if (aSI && aEI && kSI && kEI) Some(Keyspace(start, a.end)) // double overlap: first
    else if (aSI && aEI) Some(a)
    else if (kSI && kEI) Some(this)
    else if (aSI) Some(Keyspace(a.start, end))
    else if (aEI) Some(Keyspace(start, a.end))
    else None
  }
}

object Keyspace {
  @inline private def lt(x: Long, y: Long): Boolean =
    java.lang.Long.compareUnsigned(x, y) < 0
  @inline private def lte(x: Long, y: Long): Boolean =
    java.lang.Long.compareUnsigned(x, y) <= 0

  /** The full ring, anchored at `start`. */
  def maxed(start: Long = 0L): Keyspace = Keyspace(start, start - 1)

  /** The half-ring a reference node claims, centred on the node's own
    * hash: `[center - 2^62, center + 2^62]` ⇒ ~2× expected replication
    * (reference: network/network.go:283-289).
    */
  def halfRingAround(center: Long): Keyspace = {
    val quarter = 1L << 62
    Keyspace(center - quarter, center + quarter)
  }

  // Option-lifted algebra mirroring the reference's nil-tolerant methods.
  def includes(k: Option[Keyspace], hash: Long): Boolean = k.exists(_.includes(hash))
  def mag(k: Option[Keyspace]): Long = k.fold(0L)(_.mag)
  def union(k: Option[Keyspace], a: Option[Keyspace]): Option[Keyspace] = (k, a) match {
    case (None, None) => None
    case (Some(x), None) => Some(x)
    case (None, Some(y)) => Some(y)
    case (Some(x), Some(y)) => x.union(y)
  }
  def intersection(k: Option[Keyspace], a: Option[Keyspace]): Option[Keyspace] = (k, a) match {
    case (Some(x), Some(y)) => x.intersection(y)
    case _ => None
  }
  def complement(k: Option[Keyspace]): Option[Keyspace] = k match {
    case None => Some(Keyspace(1L, 0L))
    case Some(x) => x.complement
  }
}
