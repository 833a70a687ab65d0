package graft.functions

/** MurmurHash3 x64-128, low 64 bits, seed 0 — the shard-key hash of every
  * routing decision in the reference (murmur3.Sum64 call sites:
  * query/query.go:37, core/http.go:70, network/network.go:284).
  *
  * Implemented from the public MurmurHash3 algorithm (Austin Appleby,
  * public domain). Spark's builtin `hash()` is the *32-bit* murmur3 and
  * `xxhash64` is a different algorithm entirely, so a custom
  * implementation is required for shard-compat fidelity. Goldens from the
  * reference: hash64("foo") == 0xe271865701f54561L,
  * hash64("bar") == 0x923658dbfd3ae604L (query/query_test.go:57-63).
  */
object Murmur3x64 {
  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  def hash64(s: String): Long =
    hash64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def hash64(data: Array[Byte]): Long = {
    val len = data.length
    var h1 = 0L
    var h2 = 0L
    val nblocks = len >>> 4

    var i = 0
    while (i < nblocks) {
      val base = i << 4
      val k1 = getLongLE(data, base)
      val k2 = getLongLE(data, base + 8)
      h1 ^= mixK1(k1)
      h1 = java.lang.Long.rotateLeft(h1, 27)
      h1 += h2
      h1 = h1 * 5 + 0x52dce729L
      h2 ^= mixK2(k2)
      h2 = java.lang.Long.rotateLeft(h2, 31)
      h2 += h1
      h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    val tail = nblocks << 4
    var k1 = 0L
    var k2 = 0L
    var j = len - tail - 1
    while (j >= 8) {
      k2 ^= (data(tail + j) & 0xffL) << ((j - 8) << 3)
      j -= 1
    }
    if (len - tail > 8) h2 ^= mixK2(k2)
    while (j >= 0) {
      k1 ^= (data(tail + j) & 0xffL) << (j << 3)
      j -= 1
    }
    if (len - tail > 0) h1 ^= mixK1(k1)

    h1 ^= len.toLong
    h2 ^= len.toLong
    h1 += h2
    h2 += h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 += h2
    // h2 += h1  // (high word; not needed for Sum64)
    h1
  }

  @inline private def mixK1(k: Long): Long =
    java.lang.Long.rotateLeft(k * C1, 31) * C2

  @inline private def mixK2(k: Long): Long =
    java.lang.Long.rotateLeft(k * C2, 33) * C1

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  @inline private def getLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)
}
