package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.formats.{ChCompression, CityHash102}

/** LZ4 compressed-frame codec (native protocol DATA framing):
  * CityHash128(v1.0.2)-checksummed LZ4 frames, the public ClickHouse
  * compressed wire layout. */
class CompressionSpec extends AnyFunSuite {

  private def randomBytes(n: Int, seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n); r.nextBytes(b); b
  }

  test("frame round-trips across all CityHash length paths") {
    // 0/1/5: <8-byte path; 9/16: 8..16; 20: len17-32 murmur; 100: <128
    // murmur; 200/4096/262144: >=128 loop incl. non-multiple tails
    for (n <- Seq(0, 1, 5, 9, 16, 20, 100, 127, 128, 200, 4096, 262144)) {
      val raw = randomBytes(n, seed = n + 1)
      val frame = ChCompression.compressFrame(raw)
      val (back, consumed) = ChCompression.decodeFrame(frame)
      assert(consumed === frame.length, s"n=$n")
      assert(back.toSeq === raw.toSeq, s"n=$n")
    }
  }

  test("ZSTD and None method frames round-trip (inbound client parity)") {
    val raw = randomBytes(10000, seed = 11)
    for (m <- Seq(ChCompression.MethodZSTD, ChCompression.MethodNone)) {
      val frame = ChCompression.compressFrame(raw, m)
      val (back, consumed) = ChCompression.decodeFrame(frame)
      assert(consumed === frame.length)
      assert(back.toSeq === raw.toSeq, s"method $m")
    }
  }

  test("compressible payload actually compresses") {
    val raw = Array.fill[Byte](65536)(42)
    val frame = ChCompression.compressFrame(raw)
    assert(frame.length < raw.length / 10)
  }

  test("checksum covers method byte through payload: tampering is detected") {
    val raw = randomBytes(1000, seed = 7)
    val frame = ChCompression.compressFrame(raw)
    // flip one bit in the method byte, the sizes, and the payload
    for (pos <- Seq(16, 18, 22, frame.length - 1)) {
      val bad = frame.clone()
      bad(pos) = (bad(pos) ^ 0x01).toByte
      val e = intercept[Exception](ChCompression.decodeFrame(bad))
      assert(e.getMessage.contains("checksum") || e.isInstanceOf[IllegalArgumentException],
        s"pos=$pos got ${e.getClass}")
    }
  }

  test("readFrame consumes exactly one frame from a stream of two") {
    val a = randomBytes(500, seed = 1)
    val b = randomBytes(300, seed = 2)
    val bytes = ChCompression.compressFrame(a) ++ ChCompression.compressFrame(b)
    val in = new java.io.ByteArrayInputStream(bytes)
    assert(ChCompression.readFrame(in).toSeq === a.toSeq)
    assert(ChCompression.readFrame(in).toSeq === b.toSeq)
    assert(in.available() === 0)
  }

  test("frameStream decodes a block spanning multiple frames") {
    import org.apache.spark.sql.types._
    // a native block whose raw bytes are split across 3 frames — the
    // shape clickhouse-driver produces for blocks past
    // max_compress_block_size (~1 MiB flush boundary); a reader that
    // assumes one-frame-one-block decodes only the first fragment
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = false)))
    val rows = Array.tabulate(1000)(i =>
      org.apache.spark.sql.Row(i.toLong, s"value-$i-${"x" * 50}"))
    val raw = graft.formats.NativeCodec.encode(schema, rows, customSerFlag = true)
    val third = raw.length / 3
    val wire =
      ChCompression.compressFrame(raw.slice(0, third)) ++
      ChCompression.compressFrame(raw.slice(third, 2 * third)) ++
      ChCompression.compressFrame(raw.slice(2 * third, raw.length))
    val in = ChCompression.frameStream(new java.io.ByteArrayInputStream(wire))
    val cols = graft.formats.NativeCodec.decode(in, true)
    assert(cols.map(_._1) === Seq("id", "s"))
    assert(cols.head._3.length === 1000)
    assert(cols(1)._3(999) === s"value-999-${"x" * 50}")
  }

  test("decodeFrame rejects hostile sizes before allocating") {
    val frame = ChCompression.compressFrame(randomBytes(64, seed = 9))
    // corrupt compressed_size to a negative value (offset 17..20 LE)
    val bad = frame.clone()
    bad(17) = 0xff.toByte; bad(18) = 0xff.toByte
    bad(19) = 0xff.toByte; bad(20) = 0xff.toByte
    val e = intercept[IllegalArgumentException](ChCompression.decodeFrame(bad))
    assert(e.getMessage.contains("compressed_size"), e.getMessage)
  }

  test("cityHash128 is deterministic and spreads on single-bit changes") {
    val base = randomBytes(256, seed = 3)
    val h1 = CityHash102.cityHash128(base)
    assert(h1 === CityHash102.cityHash128(base.clone()))
    val flipped = base.clone(); flipped(100) = (flipped(100) ^ 1).toByte
    val h2 = CityHash102.cityHash128(flipped)
    assert(h1 !== h2)
    // both halves move — a truncated/partial hash would leave one fixed
    assert((h1._1 != h2._1) && (h1._2 != h2._2))
  }
}
