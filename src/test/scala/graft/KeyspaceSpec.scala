package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Keyspace

/** Ring-interval algebra, pinned to the reference's exhaustive case
  * tables (protocol/keyspace_test.go:10-318). uint64 MaxUint64 maps to
  * Long -1 in two's complement.
  */
class KeyspaceSpec extends AnyFunSuite {
  private val Max = -1L // uint64 MaxUint64

  test("includes: plain, wraparound, nil") {
    assert(Keyspace(1, 100).includes(50))
    assert(!Keyspace(1, 100).includes(150))
    assert(Keyspace(100, 1).includes(150))
    assert(!Keyspace(100, 1).includes(50))
    assert(Keyspace(100, 50).includes(25))
    assert(!Keyspace(100, 50).includes(75))
    assert(!Keyspace.includes(None, 0))
  }

  test("union case table") {
    val cases: Seq[(Keyspace, Keyspace, Option[Keyspace])] = Seq(
      (Keyspace(1, 10), Keyspace(20, 30), None),
      (Keyspace(1, 10), Keyspace(10, 20), Some(Keyspace(1, 20))),
      (Keyspace(10, 20), Keyspace(1, 10), Some(Keyspace(1, 20))),
      (Keyspace(1, 20), Keyspace(5, 10), Some(Keyspace(1, 20))),
      (Keyspace(5, 10), Keyspace(1, 20), Some(Keyspace(1, 20))),
      (Keyspace(Max - 5, Max - 1), Keyspace(Max - 1, 20), Some(Keyspace(Max - 5, 20))),
      (Keyspace(Max - 1, 20), Keyspace(Max - 5, Max - 1), Some(Keyspace(Max - 5, 20))),
      (Keyspace(Max - 5, 1), Keyspace(1, 20), Some(Keyspace(Max - 5, 20))),
      (Keyspace(1, 20), Keyspace(Max - 5, 1), Some(Keyspace(Max - 5, 20))),
      (Keyspace(1, 20), Keyspace(20, 1), Some(Keyspace(1, 0))) // full ring
    )
    cases.zipWithIndex.foreach { case ((a, b, want), i) =>
      assert(a.union(b) == want, s"case $i: $a union $b")
    }
    assert(Keyspace.union(None, None).isEmpty)
    assert(Keyspace.union(Some(Keyspace(1, 2)), None).contains(Keyspace(1, 2)))
    assert(Keyspace.union(None, Some(Keyspace(1, 2))).contains(Keyspace(1, 2)))
  }

  test("intersection case table") {
    val cases: Seq[(Keyspace, Keyspace, Option[Keyspace])] = Seq(
      (Keyspace(1, 10), Keyspace(20, 30), None),
      (Keyspace(1, 10), Keyspace(10, 20), Some(Keyspace(10, 10))),
      (Keyspace(10, 20), Keyspace(1, 10), Some(Keyspace(10, 10))),
      (Keyspace(1, 15), Keyspace(10, 20), Some(Keyspace(10, 15))),
      (Keyspace(10, 20), Keyspace(1, 15), Some(Keyspace(10, 15))),
      (Keyspace(1, 20), Keyspace(5, 10), Some(Keyspace(5, 10))),
      (Keyspace(5, 10), Keyspace(1, 20), Some(Keyspace(5, 10))),
      (Keyspace(Max - 5, Max - 1), Keyspace(Max - 1, 20), Some(Keyspace(Max - 1, Max - 1))),
      (Keyspace(Max - 1, 20), Keyspace(Max - 5, Max - 1), Some(Keyspace(Max - 1, Max - 1))),
      (Keyspace(Max - 5, 1), Keyspace(1, 20), Some(Keyspace(1, 1))),
      (Keyspace(1, 20), Keyspace(Max - 5, 1), Some(Keyspace(1, 1))),
      (Keyspace(1, 20), Keyspace(20, 1), Some(Keyspace(1, 1)))
    )
    cases.zipWithIndex.foreach { case ((a, b, want), i) =>
      assert(a.intersection(b) == want, s"case $i: $a intersection $b")
    }
    assert(Keyspace.intersection(None, None).isEmpty)
    assert(Keyspace.intersection(Some(Keyspace(1, 2)), None).isEmpty)
    assert(Keyspace.intersection(None, Some(Keyspace(1, 2))).isEmpty)
  }

  test("mag with wraparound") {
    assert(Keyspace(1, 10).mag == 9L)
    assert(Keyspace(Max - 5, 1).mag == 7L)
  }

  test("maxed") {
    assert(!Keyspace(1, 10).maxed)
    assert(Keyspace(2, 1).maxed)
    assert(Keyspace(1, 20).union(Keyspace(20, 1)).exists(_.maxed))
  }

  test("complement") {
    assert(Keyspace(1, 10).complement.contains(Keyspace(10, 1)))
    assert(Keyspace.complement(None).contains(Keyspace(1, 0)))
    assert(Keyspace(1, 0).complement.isEmpty)
  }

  test("half-ring node keyspace covers its center (network.go:283-289)") {
    val c = graft.functions.Murmur3x64.hash64("localhost:8181")
    val ks = Keyspace.halfRingAround(c)
    assert(ks.includes(c))
    assert(ks.mag == (1L << 63)) // exactly half the ring
  }

  test("slices: disjoint contiguous cover of the parent, wrap-aware, balanced") {
    // plain, wrapping, and zero-crossing parents; k that divides and
    // k that leaves an unsigned remainder
    val parents = Seq(Keyspace(100, 1100), Keyspace(Max - 5, 10),
      Keyspace(3L << 58, 1L << 58), Keyspace(1L << 63, 0L))
    for (p <- parents; k <- Seq(1, 3, 4, 7)) {
      val ss = p.slices(k)
      assert(ss.size == k)
      // contiguous: each slice starts where the previous ended; the
      // chain starts at the parent's start and ends at its end
      assert(ss.head.start == p.start && ss.last.end == p.end)
      ss.sliding(2).foreach {
        case Seq(a, b) => assert(a.end == b.start)
        case _ =>
      }
      // widths balanced within 1 (unsigned remainder spread)
      val mags = ss.map(s => java.lang.Long.divideUnsigned(s.mag, 1L))
      assert(java.lang.Long.compareUnsigned(mags.max - mags.min, 1L) <= 0)
      assert(mags.map(BigInt(_) & ((BigInt(1) << 64) - 1)).sum ==
        (BigInt(p.mag) & ((BigInt(1) << 64) - 1)))
      // membership: every slice member is a parent member, exactly one
      // slice claims each sampled parent member (probe around every
      // boundary, both sides)
      val probes = ss.flatMap(s => Seq(s.start, s.start + 1, s.end - 1)) ++
        Seq(p.start, p.end - 1)
      probes.foreach { a =>
        val owners = ss.count(_.includes(a))
        if (p.includes(a)) assert(owners == 1, s"$a owned by $owners slices of $p/$k")
        else assert(owners == 0, s"non-member $a claimed by a slice of $p/$k")
      }
    }
  }
}
