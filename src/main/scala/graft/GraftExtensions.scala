package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Standard Spark plug-in point: build sessions with
  * `spark.sql.extensions=graft.GraftExtensions` and every ClickHouse
  * dialect function is registered at session construction — no
  * explicit `ChFunctions.register` call needed. This is how the
  * library deploys onto an existing cluster's sessions (SURVEY §7:
  * extension-based registration instead of code changes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.dialect.ChFunctions.injectInto(ext)
    ext.injectOptimizerRule(_ => graft.plans.PartitionPruneFromDate)
    ext.injectOptimizerRule(_ => graft.plans.SkipIndexPrune)
    ext.injectOptimizerRule(_ => graft.plans.UInt64DistinctNarrow)
  }
}
