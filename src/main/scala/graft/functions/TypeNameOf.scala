package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `toTypeName(x)` — the engine's name for the static type
  * of the argument (reference behavior: chdb pass-through answers the
  * ClickHouse type name; here the SURVEY §1.2 mapping names the
  * resolved Spark type). The child is never evaluated: the answer is a
  * property of the analyzed plan, and `foldable` lets ConstantFolding
  * collapse it to a string literal before execution — the
  * CodegenFallback is never hot.
  */
case class TypeNameOf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true

  private lazy val typeName: UTF8String =
    UTF8String.fromString(graft.formats.ChTypeNames.name(child.dataType))

  override def eval(input: InternalRow): Any = typeName

  override protected def withNewChildInternal(newChild: Expression): TypeNameOf =
    copy(child = newChild)
}
