package graft

import org.apache.spark.sql.SparkSession
import graft.dialect.{ChContext, Engine, Transpiler}
import graft.formats.ResultFormatter

/** Library-call entry point (reference EP3: the Lambda handler runs one
  * query per invocation with a default format,
  * /root/reference/lambda/lambda.py:6-19). Proves the engine is
  * callable without a server: one ClickHouse-dialect statement in,
  * formatted text out.
  */
object QueryRunner {

  /** Run one statement and render it. Defaults mirror the reference
    * handler: `SELECT version()`, JSONCompact. */
  def runOnce(spark: SparkSession,
              query: String = "SELECT version()",
              defaultFormat: String = "JSONCompact"): String = {
    val (bare, fmtClause) = Transpiler.extractFormat(query)
    val df = Engine.execute(spark, bare)
    ResultFormatter.render(df, fmtClause.getOrElse(defaultFormat))
  }

  /** Convenience with fixture views registered. */
  def runOnce(spark: SparkSession, dir: String, query: String,
              defaultFormat: String): String = {
    ChContext.setup(spark, dir)
    runOnce(spark, query, defaultFormat)
  }
}
