package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Subqueries

/** Correlated-subquery tier: every shape must decorrelate to keyed
  * joins — a CartesianProduct or BroadcastNestedLoopJoin in any of
  * these plans means Catalyst fell back to per-row re-execution, which
  * dies at scale.
  */
class SubquerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    Subqueries.qs.find(_.name == name).get.run(spark, dir)

  private def plan(name: String): String = {
    val df = run(name)
    df.collect() // let AQE finalize the executed plan
    df.queryExecution.executedPlan.toString
  }

  private def assertKeyedJoinsOnly(p: String): Unit = {
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q17 correlated scalar agg decorrelates to aggregate + hash join") {
    val p = plan("p12_scalar_subq_q17")
    assertKeyedJoinsOnly(p)
    // the inner avg must run as ONE grouped aggregate, not per outer row
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(run("p12_scalar_subq_q17").collect().length == 1)
  }

  test("q4 correlated EXISTS with non-equi outer reference -> left semi") {
    val p = plan("p13_exists_q4")
    assertKeyedJoinsOnly(p)
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("q21 EXISTS + NOT EXISTS chain -> semi + anti joins on l_orderkey") {
    val p = plan("p18_exists_chain_q21")
    assertKeyedJoinsOnly(p)
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("LeftAnti"), p.take(2000))
    val rows = run("p18_exists_chain_q21").collect()
    assert(rows.nonEmpty && rows.length <= 10)
  }

  test("q22 NOT EXISTS -> left anti; scalar threshold is a subquery reuse") {
    val p = plan("p14_notexists_q22")
    assertKeyedJoinsOnly(p)
    assert(p.contains("LeftAnti"), p.take(2000))
  }

  test("q18 IN over grouped HAVING -> semi join against aggregated keys") {
    val p = plan("p15_in_having_q18")
    assertKeyedJoinsOnly(p)
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(run("p15_in_having_q18").collect().length == 20)
  }

  test("NOT IN plans null-aware anti join semantics") {
    val p = plan("p16_notin_nullaware")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // Spark plans non-nullable NOT IN as LeftAnti (null-aware only when
    // the key is nullable) — either spelling is a keyed anti join
    assert(p.contains("LeftAnti"), p.take(2000))
  }

  test("LATERAL derived table returns one row per outer row") {
    val out = run("p17_lateral_subq").collect()
    assert(out.length == 200)
    assertKeyedJoinsOnly(plan("p17_lateral_subq"))
  }
}
