package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` bridge the library needs: build a DataFrame
  * from a Catalyst LogicalPlan (`Dataset.ofRows`). Spark keeps this
  * constructor package-private, so plan-level rewrites (e.g. the
  * lazy-materialization top-k split in graft.operators.LateMaterialize)
  * get it through this minimal shim rather than reflection. Nothing
  * else from the private surface is exposed.
  */
object PlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column from a raw Catalyst Expression (the classic-API converter
    * is package-private in Spark 4) — used by internal builders that
    * aggregate with custom TypedImperativeAggregates outside the
    * function registry (e.g. the skip-index bloom builder). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
