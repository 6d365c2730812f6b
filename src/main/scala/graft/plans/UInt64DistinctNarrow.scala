package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType
import graft.functions.DecimalMod64

/** Narrow COUNT(DISTINCT <uint64>) keys from DECIMAL(20,0) to raw
  * longs (r16, guide §2.3 "narrower types").
  *
  * DECIMAL(20,0) is the engine's physical type for ClickHouse UInt64
  * (precision 20 > 18, so Spark stores and hash-aggregates it as a
  * byte-array-backed Decimal — every distinct-hash probe walks a
  * BigDecimal). The ClickBench sweep's heaviest aggregates
  * (cb04/08/09/10/11/13/22: COUNT(DISTINCT UserID)) pay that on every
  * row. Under the UInt64 domain contract (values < 2^64) the unscaled
  * mod-2^64 mapping [[DecimalMod64]] is injective, so the distinct
  * COUNT over the 8-byte longs is identical — and the aggregate's
  * declared output (a BIGINT count) never mentions the key type, so
  * the result schema is untouched. Group-by keys that APPEAR in the
  * output (cb15-cb18's UserID column) are deliberately left alone:
  * the decimal(20,0) output contract wins there.
  *
  * Runs in the user-provided optimizer batch, which executes before
  * physical distinct-aggregate planning for single-distinct plans and
  * before RewriteDistinctAggregates has any multi-distinct work to do
  * on these shapes.
  */
object UInt64DistinctNarrow extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ae @ AggregateExpression(c @ Count(children), _, true, _, _)
          if children.nonEmpty &&
            children.forall(_.dataType == DecimalType(20, 0)) &&
            !children.exists(_.isInstanceOf[DecimalMod64]) =>
        ae.copy(aggregateFunction = Count(children.map(DecimalMod64)))
    }
}
