package graft.queries

import graft.Q
import graft.dialect.{ChContext, Engine}

/** DDL + catalog evidence (SURVEY.md §2.1 S3-S5): Memory/MergeTree
  * table lifecycle driven end-to-end with ClickHouse statements.
  * Oracles are static VALUES / direct-over-parquet equivalents.
  */
object DdlQueries {

  val qs: Seq[Q] = Seq(

    // S3+S5: Memory-engine table, INSERT VALUES + INSERT SELECT
    // (test_suite.py:311-314 lifecycle)
    Q("s3_ddl_memory", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.kv")
      Engine.execute(s,
        "CREATE TABLE graft_t.kv (id UInt32, name String) ENGINE=Memory")
      Engine.execute(s, "INSERT INTO graft_t.kv VALUES (1, 'one'), (2, 'two')")
      Engine.execute(s,
        "INSERT INTO graft_t.kv SELECT number + 10, toString(number) FROM numbers(3)")
      Engine.execute(s, "SELECT id, name FROM graft_t.kv ORDER BY id")
    }, Some("""
      SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (10, '0'), (11, '1'), (12, '2'))
        t(id, name) ORDER BY id""")),

    // S4+S5: MergeTree with PARTITION BY toYYYYMM (test.yml:49 shape);
    // the partition expr materializes as the `_part` column so pruning
    // fires (see DdlSpec's PartitionFilters assertion)
    Q("s4_ddl_mergetree", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.ord")
      Engine.execute(s, """
        CREATE TABLE graft_t.ord (
          o_orderkey Int64, o_totalprice Float64, o_orderdate DateTime)
        ENGINE=MergeTree() PARTITION BY toYYYYMM(o_orderdate)
        ORDER BY (o_orderkey) SETTINGS index_granularity=8192""")
      Engine.execute(s, """
        INSERT INTO graft_t.ord
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders""")
      Engine.execute(s, """
        SELECT _part AS ym, count() AS n,
               sum(CAST(o_totalprice AS Decimal(12,2))) AS sum_price
        FROM graft_t.ord GROUP BY ym ORDER BY ym""")
    }, Some("""
      SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT) AS ym,
             count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_price
      FROM orders GROUP BY 1 ORDER BY ym"""))
  )
}
