package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two ARRAY<FLOAT> columns, accumulated in DOUBLE
  * (each product computed on the widened doubles). Used ONLY as a
  * pruning score in the two-phase exact near-dup scan
  * ([[graft.operators.CosineKnn.nearDupPairs]]): for unit vectors the
  * result differs from the exact double dot by at most
  * Σ|x_i||y_i| · 2^-23 ≤ 1.2e-7 (inputs are float32-rounded copies of
  * unit-vector components; products and sums carry double precision),
  * so pruning at threshold − 1e-3 can never drop a true pair —
  * survivors are re-verified exactly. Null/length semantics match
  * [[VecDot]].
  */
case class VecDotF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vecDotF requires two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vecDotF"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDotF.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDotFR")
      s"""
      java.lang.Double $r = graft.functions.VecDotF.dot($a, $b);
      if ($r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $r.doubleValue();
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotF =
    copy(left = newLeft, right = newRight)
}

object VecDotF {
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
