package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TpchShapes

/** TPC-H shape batch: correctness is oracle-gated by the driver; here
  * we pin the plan properties that make the shapes scale.
  */
class TpchShapesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    TpchShapes.qs.find(_.name == name).get.run(spark, dir)

  /** Formatted explain: single plan rendering with untruncated
    * PushedFilters (the executedPlan string under AQE prints initial +
    * final plans, double-counting scans, and truncates metadata). */
  private def formatted(name: String): String = {
    val df = run(name)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q19 OR-of-ANDs pushes per-table residuals into both scans") {
    val plan = formatted("p19_or_of_ands_q19")
    // CNF extraction: the disjunction mixing both sides still yields a
    // pushable brand/size residual on part and a quantity residual on
    // lineitem — without it the whole OR evaluates post-join only.
    assert(plan.contains("EqualTo(p_brand,Brand#12)"), plan.take(3000))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,1.0)"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q7 nation self-join broadcasts both fixed-size dims") {
    val df = run("j9_volume_q7")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // nation appears twice; both sides must be broadcast (25 rows at
    // ANY scale), never shuffled on the fact table's key
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan.take(3000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q10 top-20 revenue plans a bounded sort, not a global one") {
    val df = run("j10_returns_q10")
    val out = df.collect()
    assert(out.length <= 20 && out.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("q13 outer-join histogram keeps zero-order customers") {
    val rows = run("j11_custdist_q13").collect()
    // residual ON filter must not turn the left join inner: the c_count=0
    // bucket only exists if unmatched customers survive
    assert(rows.nonEmpty)
    val plan = formatted("j11_custdist_q13")
    assert(plan.contains("LeftOuter") || plan.contains("RightOuter"), plan.take(2000))
  }

  test("q16 NOT IN blocklist plans an anti join before the distinct agg") {
    val plan = formatted("g19_supplier_cnt_q16")
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q20 nested scalar-threshold IN plans a semi join") {
    val plan = formatted("p20_excess_supp_q20")
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(run("p20_excess_supp_q20").collect().nonEmpty)
  }

  test("q14 promo ratio is a single-pass conditional aggregate") {
    assert(run("g17_promo_ratio_q14").collect().length == 1)
    val plan = formatted("g17_promo_ratio_q14")
    // one scan of lineitem — the ratio must not re-scan the fact table
    val lineitemScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(lineitemScans == 1, s"expected 1 lineitem scan, got $lineitemScans")
  }
}
