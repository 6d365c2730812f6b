package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SipHash-2-4 (Aumasson & Bernstein, public domain reference
  * implementation) with the zero key — the algorithm behind
  * ClickHouse's `sipHash64` string hash (public ClickHouse source,
  * src/Common/SipHash.h; the reference delegates it to chdb at
  * /root/reference/main.py:190). Implemented from the published paper
  * spec; codegen'd like the other graft hashes. No ClickHouse binary
  * exists in this environment to diff byte-for-byte, so parity is
  * asserted against the SipHash paper's test vectors (see
  * ChHofSpec) — the keyed vectors pin the core rounds, the zero-key
  * ClickHouse variant reuses them unchanged.
  *
  * Result is the UInt64 bit pattern as a two's-complement Long
  * (SURVEY §1.2 UInt64 round-trip rule).
  */
object SipHash {

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  /** SipHash-2-4 of `data` with key (k0, k1). */
  def sipHash64Keyed(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m
      round(); round()
      v0 ^= m
      i += 8
    }
    // tail: remaining bytes little-endian, length in the top byte
    var b = n.toLong << 56
    var j = n - 1
    while (j >= end) { b |= (data(j) & 0xffL) << (8 * (j - end)); j -= 1 }
    v3 ^= b
    round(); round()
    v0 ^= b
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** ClickHouse sipHash64: SipHash-2-4 with the zero key. */
  def sipHash64(data: Array[Byte]): Long = sipHash64Keyed(0L, 0L, data)

  def sipHash64(s: UTF8String): Long = sipHash64(s.getBytes)
}

case class SipHash64Expr(child: Expression) extends UnaryExpression {
  // the registry builder casts the child to String
  override def dataType: DataType = LongType
  override def prettyName: String = "sipHash64"
  override protected def nullSafeEval(input: Any): Any =
    SipHash.sipHash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SipHash.sipHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SipHash64Expr =
    copy(child = newChild)
}
