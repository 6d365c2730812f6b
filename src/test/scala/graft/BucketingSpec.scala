package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.ScaleOps

/** The whole point of bucketing: with broadcast off (as it would be at
  * real fact-⋈-fact scale), the bucketed join's physical plan has NO
  * shuffle on either join side. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val ns = {
    val s = spark.newSession()
    // force the plan shape a 100 TB fact-fact join takes: no broadcast,
    // bucketed scans always on
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    s
  }

  test("bucketed orders⋈lineitem joins without an exchange on the join key") {
    ScaleOps.ensureBucketed(ns, dir)
    val joined = ns.table("graft_b.orders_b")
      .join(ns.table("graft_b.lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
    val n = joined.count() // materialize so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"join shuffled despite buckets:\n$plan")
    val expected = Tables.load(ns, dir, "orders")
      .join(Tables.load(ns, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(n === expected)
  }

  test("bucketed scan reports the bucket layout") {
    ScaleOps.ensureBucketed(ns, dir)
    val scan = ns.table("graft_b.orders_b").queryExecution.executedPlan.toString
    assert(scan.contains("Bucketed: true"), scan)
  }
}
