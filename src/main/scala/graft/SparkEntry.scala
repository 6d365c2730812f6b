package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All implemented operator queries, each named after the SURVEY.md §2
    * operator it evidences. */
  def all: Seq[Q] =
    graft.queries.Relational.qs ++ graft.queries.Joins.qs ++
      graft.queries.Subqueries.qs ++ graft.queries.TpchShapes.qs ++
      graft.queries.LlmPipeline.qs ++ graft.queries.Dialect.qs ++
      graft.queries.DdlQueries.qs ++ graft.queries.Streaming.qs ++
      graft.queries.ClickBench.qs ++ graft.queries.ScaleOps.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped scan+filter+groupBy+agg+sort. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "g2_agg_tpch1").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap

  /** Headline subset timed by Bench. */
  def benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
