package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `arrayAUC(scores, labels)` — area under the ROC curve across one
  * row's (score, 0/1-label) pairs (the ClickHouse ML-metric function,
  * semantics re-implemented from the published Mann-Whitney
  * equivalence: AUC = U / (P*N), ties counted half).
  *
  * O(n log n) per row: sort by score, then per equal-score run credit
  * positives with the negatives strictly below plus half the run's own
  * negatives. NULL when the row has no positives or no negatives (the
  * metric is undefined there).
  *
  * Per-row, small-n, off the scan hot path — CodegenFallback is the
  * right trade (a custom doGenCode would inline a sort for no win).
  */
case class ArrayAuc(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "arrayAUC"
  // inputs arrive pre-cast to Array(Double)/Array(Int) by the builder

  override protected def nullSafeEval(s: Any, l: Any): Any = {
    val scores = s.asInstanceOf[ArrayData].toDoubleArray()
    val labels = l.asInstanceOf[ArrayData].toIntArray()
    // ClickHouse raises BAD_ARGUMENTS on mismatched lengths — silently
    // truncating to the shorter array would compute a wrong-but-
    // plausible metric
    if (scores.length != labels.length)
      throw new IllegalArgumentException(
        s"arrayAUC: scores (${scores.length}) and labels " +
          s"(${labels.length}) must have equal length")
    val n = scores.length
    if (n == 0) return null
    val idx = (0 until n).sortBy(scores(_))
    // positive iff label > 0 (ClickHouse casts labels to bool via > 0;
    // a -1 label is a NEGATIVE, not a positive)
    val pTotal = (0 until n).count(labels(_) > 0)
    val nTotal = n - pTotal
    if (pTotal == 0 || nTotal == 0) return null
    var u = 0.0
    var negBelow = 0
    var i = 0
    while (i < n) {
      // one equal-score run [i, j)
      var j = i
      var posRun = 0; var negRun = 0
      while (j < n && scores(idx(j)) == scores(idx(i))) {
        if (labels(idx(j)) > 0) posRun += 1 else negRun += 1
        j += 1
      }
      u += posRun.toDouble * negBelow + 0.5 * posRun * negRun
      negBelow += negRun
      i = j
    }
    u / (pTotal.toDouble * nTotal)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAuc =
    copy(left = newLeft, right = newRight)
}
