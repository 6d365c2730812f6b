package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of common elements between two SORTED, DISTINCT ARRAY<BIGINT>
  * inputs — the codegen'd merge-intersect that replaces interpreted
  * `size(array_intersect(a, b))` on the similarity-verify hot paths
  * (r16: l4 ran ~1M interpreted string-array set operations per run;
  * Spark's array_intersect builds a hash set of boxed values per CALL).
  *
  * Semantics: both inputs must be ascending-sorted with no duplicates
  * (the operators build them with array_sort over a distinct gram set's
  * hashes); under that contract the merge count equals the exact set
  * intersection size. One static call per row, whole-stage-codegen
  * friendly like [[Md5Prefix60]].
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sortedLongIntersect requires two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sortedLongIntersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedLongIntersect.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersect {
  /** Static so generated code can call it directly. Plain two-pointer
    * merge over primitive longs — no boxing, no per-call hash set. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
