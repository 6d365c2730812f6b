package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.DateType

/** ClickHouse-style partition pruning through a monotonic partition
  * expression.
  *
  * MergeTree DDL like the reference CI's hits table
  * (/root/reference/.github/workflows/test.yml:49) declares
  * `PARTITION BY toYYYYMM(EventDate)`; [[graft.dialect.Ddl]] stores it
  * as a materialized `_part` column that Spark physically partitions
  * on. ClickHouse prunes parts for a plain `EventDate >= '2013-07-01'`
  * range because toYYYYMM is monotonic in its argument; Spark can't
  * know that, so without help the ClickBench July queries (cb36–cb42)
  * full-scan all months.
  *
  * This optimizer rule restores the ClickHouse behavior: for a Filter
  * directly over a scan of a table whose registered partition
  * expression is `toYYYYMM(col)`, every date bound on `col` among the
  * top-level conjuncts derives the corresponding `_part` bound
  * (col >= d  ⇒  _part >= yyyymm(d), etc. — valid exactly because
  * yyyymm is order-preserving). The derived conjuncts land in the same
  * Filter, where FileSourceStrategy picks them up as PartitionFilters
  * — the scan then lists only the matching month directories, the
  * difference between reading one month and reading all of them at
  * 100 TB.
  *
  * Safety: the added predicate is implied by the original (strictly a
  * strengthening), null `col` rows are already rejected by the original
  * comparison, and the rule skips any filter that mentions `_part`
  * itself (user-supplied bounds win; also makes the rewrite idempotent
  * under AQE re-optimization).
  */
object PartitionPruneFromDate extends Rule[LogicalPlan] {

  private val yyyymmRe =
    "(?i)^\\s*(toYYYYMM|toYYYYMMDD)\\s*\\(\\s*`?([A-Za-z_]\\w*)`?\\s*\\)\\s*$".r

  private def monthFn(epochDays: Int): Int = {
    val d = java.time.LocalDate.ofEpochDay(epochDays.toLong)
    d.getYear * 100 + d.getMonthValue
  }
  private def dayFn(epochDays: Int): Int = {
    val d = java.time.LocalDate.ofEpochDay(epochDays.toLong)
    (d.getYear * 100 + d.getMonthValue) * 100 + d.getDayOfMonth
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation)
        if rel.catalogTable.isDefined &&
          !cond.references.exists(_.name == "_part") &&
          rel.output.exists(_.name == "_part") =>
      val id = rel.catalogTable.get.identifier
      val key = s"${id.database.getOrElse("default")}.${id.table}"
      graft.dialect.Ddl.partitionExprOf(key) match {
        case Some(yyyymmRe(fn, colName)) =>
          // both partition functions are order-preserving in the date,
          // which is exactly what makes bound derivation sound
          val partFn: Int => Int =
            if (fn.equalsIgnoreCase("toYYYYMMDD")) dayFn else monthFn
          val part = rel.output.find(_.name == "_part").get
          rel.output.find(a =>
            a.name.equalsIgnoreCase(colName) && a.dataType == DateType) match {
            case Some(src) =>
              var lo = Option.empty[Int]
              var hi = Option.empty[Int]
              def low(d: Int): Unit = { val m = partFn(d); lo = Some(lo.fold(m)(math.max(m, _))) }
              def high(d: Int): Unit = { val m = partFn(d); hi = Some(hi.fold(m)(math.min(m, _))) }
              // strict bounds tighten by one DAY before mapping through
              // the partition fn (dates are integral): `col < d` means
              // col <= d-1, so the bound is partFn(d-1) — partFn(d)
              // would list and scan one whole extra partition for the
              // canonical half-open month range
              conjuncts(cond).foreach {
                case GreaterThanOrEqual(a: AttributeReference, Literal(d: Int, DateType)) if a.semanticEquals(src) => low(d)
                case GreaterThan(a: AttributeReference, Literal(d: Int, DateType)) if a.semanticEquals(src) => low(d + 1)
                case LessThanOrEqual(a: AttributeReference, Literal(d: Int, DateType)) if a.semanticEquals(src) => high(d)
                case LessThan(a: AttributeReference, Literal(d: Int, DateType)) if a.semanticEquals(src) => high(d - 1)
                case EqualTo(a: AttributeReference, Literal(d: Int, DateType)) if a.semanticEquals(src) => low(d); high(d)
                case GreaterThanOrEqual(Literal(d: Int, DateType), a: AttributeReference) if a.semanticEquals(src) => high(d)
                case GreaterThan(Literal(d: Int, DateType), a: AttributeReference) if a.semanticEquals(src) => high(d - 1)
                case LessThanOrEqual(Literal(d: Int, DateType), a: AttributeReference) if a.semanticEquals(src) => low(d)
                case LessThan(Literal(d: Int, DateType), a: AttributeReference) if a.semanticEquals(src) => low(d + 1)
                case EqualTo(Literal(d: Int, DateType), a: AttributeReference) if a.semanticEquals(src) => low(d); high(d)
                case _ => ()
              }
              val derived: Seq[Expression] =
                lo.map(m => GreaterThanOrEqual(part, Literal(m))).toSeq ++
                  hi.map(m => LessThanOrEqual(part, Literal(m))).toSeq
              if (derived.isEmpty) f
              else Filter(derived.foldLeft(cond)(And), rel)
            case None => f
          }
        case _ => f
      }
  }
}
