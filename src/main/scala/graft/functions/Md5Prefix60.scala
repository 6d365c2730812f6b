package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** First 60 bits of md5(input) as a non-negative BIGINT — the hash the
  * dedup operators build on (SimHash fingerprints, MinHash base hash).
  *
  * Semantics are EXACTLY `conv(substr(md5(x), 1, 15), 16, 10)` (15 hex
  * chars = 60 bits), which is what the DuckDB oracle computes as
  * `('0x' || substr(md5(x),1,15))::BIGINT` — but fused: one digest, no
  * hex-string round-trip, and it participates in whole-stage codegen
  * via a static helper instead of three chained expressions.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5Prefix60 requires BINARY input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5Prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  /** Per-thread digest instance: getInstance("MD5") allocates a fresh
    * MessageDigest + provider lookup per call — measurable at millions
    * of hashes per task (minhash/simhash/substring-dedup all funnel
    * here). digest() leaves the instance reset for the next call. */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static so generated code can call it (one digest per call; the
    * JDK MD5 instance is thread-confined via the ThreadLocal above). */
  def hash(bytes: Array[Byte]): Long = {
    val d = md5.get().digest(bytes)
    // first 8 bytes big-endian (matching the hex-string prefix order),
    // shifted down to the leading 60 bits = 15 hex chars
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
