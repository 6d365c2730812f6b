package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** ClickHouse integer hashes as codegen'd Catalyst expressions.
  *
  * Algorithms from public ClickHouse source (src/Common/HashTable/
  * Hash.h): `intHash64` is the MurmurHash3 64-bit finalizer;
  * `intHash32` is Thomas Wang's 64→32-bit mix (the rotate variant).
  * The reference delegates these to chdb (/root/reference/main.py:190);
  * its CI uses intHash32(UserID) as the MergeTree ORDER BY / SAMPLE BY
  * key (.github/workflows/test.yml:49). No ClickHouse binary exists in
  * this environment to diff against byte-for-byte, so parity is
  * asserted at the algorithm level; results are stable across releases
  * of this engine either way, which is what persisted cluster keys
  * need.
  *
  * Results are Longs: intHash32 in [0, 2^32), intHash64 the UInt64 bit
  * pattern two's-complemented (SURVEY §1.2 UInt64 round-trip rule).
  */
object IntHash {

  def intHash32(keyIn: Long): Long = {
    var key = keyIn
    key = (~key) + (key << 18)
    key = key ^ ((key >>> 31) | (key << 33))
    key = key * 21
    key = key ^ ((key >>> 11) | (key << 53))
    key = key + (key << 6)
    key = key ^ ((key >>> 22) | (key << 42))
    key & 0xffffffffL
  }

  def intHash64(xIn: Long): Long = {
    var x = xIn
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}

case class IntHash32Expr(child: Expression)
    extends UnaryExpression {
  // the registry builder casts the child to Long; no ExpectsInputTypes
  // (AbstractDataType is private[sql] in Spark 4)
  override def dataType: DataType = LongType
  override def prettyName: String = "intHash32"
  override protected def nullSafeEval(input: Any): Any =
    IntHash.intHash32(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IntHash.intHash32($c)")
  override protected def withNewChildInternal(newChild: Expression): IntHash32Expr =
    copy(child = newChild)
}

case class IntHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "intHash64"
  override protected def nullSafeEval(input: Any): Any =
    IntHash.intHash64(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IntHash.intHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): IntHash64Expr =
    copy(child = newChild)
}
