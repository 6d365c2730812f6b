package graft.formats

/** CityHash128, version 1.0.2 — the exact revision ClickHouse pinned for
  * its compressed-frame checksums (the algorithm changed in CityHash 1.1,
  * so the version matters; ClickHouse vendors 1.0.2 forever for wire
  * compatibility). Implemented from the published algorithm (Google
  * CityHash 1.0.2, MIT); all arithmetic is mod-2^64, which signed JVM
  * longs provide natively. Used by [[ChCompression]] to checksum native
  * protocol compressed frames (reference protocol context:
  * /root/reference/main.py:498-512 reads the compression flag but the
  * facade never frames blocks; real ClickHouse clients default to LZ4).
  */
object CityHash102 {
  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val k3 = 0xc949d7c7509e6557L
  private val kMul = 0x9ddfea08eb382d69L

  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  @inline private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else java.lang.Long.rotateRight(v, shift)

  // Equivalent to rotate for 1..63; the caller guarantees shift != 0 mod 64
  @inline private def rotateByAtLeast1(v: Long, shift: Int): Long =
    java.lang.Long.rotateRight(v, shift)

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Hash128to64 (the uint128 -> uint64 folder). */
  @inline private def hashLen16(u: Long, v: Long): Long = {
    var a = (u ^ v) * kMul
    a ^= (a >>> 47)
    var b = (v ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(s, off)
      val b = fetch64(s, off + len - 8)
      hashLen16(a, rotateByAtLeast1(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4))
    } else if (len > 0) {
      val a = s(off) & 0xff
      val b = s(off + (len >> 1)) & 0xff
      val c = s(off + len - 1) & 0xff
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * k2 ^ z * k3) * k2
    } else k2
  }

  /** (a+w, b+c) state mixer over one 32-byte chunk. */
  @inline private def weakHashLen32WithSeeds(
      w: Long, x: Long, y: Long, z: Long, a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  @inline private def weakHashLen32WithSeeds(
      s: Array[Byte], off: Int, a: Long, b: Long): (Long, Long) =
    weakHashLen32WithSeeds(fetch64(s, off), fetch64(s, off + 8),
      fetch64(s, off + 16), fetch64(s, off + 24), a, b)

  /** len < 128 path. */
  private def cityMurmur(s: Array[Byte], off: Int, len: Int,
                         seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    var l = len - 16
    if (l <= 0) { // len <= 16
      c = b * k1 + hashLen0to16(s, off, len)
      d = rotate(b + (if (len >= 8) fetch64(s, off) else c), 32)
    } else { // len > 16
      c = hashLen16(fetch64(s, off + len - 8) + k1, a)
      d = hashLen16(b + len, c + fetch64(s, off + len - 16))
      a += d
      var p = off
      while (l > 0) {
        a ^= shiftMix(fetch64(s, p) * k1) * k1
        a *= k1
        b ^= a
        c ^= shiftMix(fetch64(s, p + 8) * k1) * k1
        c *= k1
        d ^= c
        p += 16
        l -= 16
      }
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  def cityHash128WithSeed(s: Array[Byte], off0: Int, len0: Int,
                          seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(s, off0, len0, seedLo, seedHi)
    var off = off0
    var len = len0
    var x = seedLo
    var y = seedHi
    var z = len * k1
    var vf = rotate(y ^ k1, 49) * k1 + fetch64(s, off)
    var vs = rotate(vf, 42) * k1 + fetch64(s, off + 8)
    var wf = rotate(y + z, 35) * k1 + x
    var ws = rotate(x + fetch64(s, off + 88), 53) * k1
    do {
      var i = 0
      while (i < 2) { // the manually-unrolled 64-byte halves
        x = rotate(x + y + vf + fetch64(s, off + 16), 37) * k1
        y = rotate(y + vs + fetch64(s, off + 48), 42) * k1
        x ^= ws
        y ^= vf
        z = rotate(z ^ wf, 33)
        val v2 = weakHashLen32WithSeeds(s, off, vs * k1, x + wf)
        val w2 = weakHashLen32WithSeeds(s, off + 32, z + ws, y)
        vf = v2._1; vs = v2._2; wf = w2._1; ws = w2._2
        val t = z; z = x; x = t
        off += 64
        i += 1
      }
      len -= 128
    } while (len >= 128)
    y += rotate(wf, 37) * k0 + z
    x += rotate(vf + z, 49) * k0
    // 0 < len < 128: up to 4 chunks of 32 bytes from the END of s
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * k0 + vs
      wf += fetch64(s, off + len - tailDone + 16)
      x = rotate(x, 49) * k0 + wf
      wf += vf
      val v2 = weakHashLen32WithSeeds(s, off + len - tailDone, vf, vs)
      vf = v2._1; vs = v2._2
    }
    x = hashLen16(x, vf)
    y = hashLen16(y, wf)
    (hashLen16(x + vs, ws) + y, hashLen16(x + ws, y + vs))
  }

  /** CityHash128 v1.0.2: (low64, high64). */
  def cityHash128(s: Array[Byte], off: Int, len: Int): (Long, Long) =
    if (len >= 16)
      cityHash128WithSeed(s, off + 16, len - 16,
        fetch64(s, off) ^ k3, fetch64(s, off + 8))
    else if (len >= 8)
      cityHash128WithSeed(Array.emptyByteArray, 0, 0,
        fetch64(s, off) ^ (len * k0), fetch64(s, off + len - 8) ^ k1)
    else
      cityHash128WithSeed(s, off, len, k0, k1)

  def cityHash128(s: Array[Byte]): (Long, Long) = cityHash128(s, 0, s.length)
}
