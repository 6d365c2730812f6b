package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine}

/** DROP TABLE trash-staging + UNDROP TABLE (ClickHouse keeps dropped
  * tables for database_atomic_delay_before_drop_table_sec before the
  * final delete; UNDROP restores inside that window; SYNC skips it). */
class UndropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.length
    }.sum

  test("DROP TABLE stages for UNDROP; SYNC deletes immediately; restore keeps indexes, drops projections") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_spec")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_spec.ud SYNC")
    Engine.execute(spark, """
      CREATE TABLE graft_spec.ud (k Int64, x Int64)
      ENGINE=MergeTree() ORDER BY (k)""")
    for (off <- Seq(0L, 50000L))
      Engine.execute(spark, s"""
        INSERT INTO graft_spec.ud SELECT number, number + $off FROM numbers(100)""")
    Engine.execute(spark, "ALTER TABLE graft_spec.ud ADD INDEX ix x TYPE minmax")
    Engine.execute(spark, "ALTER TABLE graft_spec.ud MATERIALIZE INDEX ix")
    Engine.execute(spark, """
      ALTER TABLE graft_spec.ud ADD PROJECTION pu (SELECT k, count() GROUP BY k)""")
    Engine.execute(spark, "ALTER TABLE graft_spec.ud MATERIALIZE PROJECTION pu")

    Engine.execute(spark, "DROP TABLE graft_spec.ud")
    assert(!spark.catalog.tableExists("graft_spec.ud"))
    val listed = Engine.execute(spark, """
      SELECT database, table FROM system.dropped_tables
      WHERE table = 'ud'""").collect()
    assert(listed.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("graft_spec", "ud")), "dropped table must be UNDROP-able and listed")

    Engine.execute(spark, "UNDROP TABLE graft_spec.ud")
    assert(Engine.execute(spark, "SELECT count() AS n FROM graft_spec.ud")
      .collect().head.getLong(0) == 200L, "UNDROP restores the rows")
    // skip index came back with its manifest (file keys match: the
    // directory moved back to the identical location)
    val total = spark.table("graft_spec.ud").inputFiles.length
    val miss = Engine.execute(spark,
      "SELECT count() AS n FROM graft_spec.ud WHERE x = 999999999")
    assert(miss.collect().head.getLong(0) == 0L)
    assert(scannedFiles(miss) < total, "restored skip index should still prune")
    // projections do NOT come back (stores were hard-deleted)
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.projections
      WHERE table = 'graft_spec.ud'""").collect().head.getLong(0) == 0L)
    // nothing left to undrop now
    intercept[Exception](Engine.execute(spark, "UNDROP TABLE graft_spec.ud"))

    // a re-created name blocks UNDROP
    Engine.execute(spark, "DROP TABLE graft_spec.ud")
    Engine.execute(spark,
      "CREATE TABLE graft_spec.ud (a Int64) ENGINE=Memory")
    intercept[Exception](Engine.execute(spark, "UNDROP TABLE graft_spec.ud"))

    // SYNC = ClickHouse's wait-for-full-removal: no trash entry
    Engine.execute(spark, "DROP TABLE graft_spec.ud SYNC")
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.dropped_tables
      WHERE table = 'ud' AND database = 'graft_spec'""").collect()
      .head.getLong(0) >= 1L, "the first (staged) drop is still in trash")
    // drain the remaining staged entry to leave a clean slate
    Engine.execute(spark, "UNDROP TABLE graft_spec.ud")
    Engine.execute(spark, "DROP TABLE graft_spec.ud SYNC")
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.dropped_tables
      WHERE table = 'ud' AND database = 'graft_spec'""").collect()
      .head.getLong(0) == 0L)
    intercept[Exception](Engine.execute(spark, "UNDROP TABLE graft_spec.ud"))
  }

  test("DROP DATABASE cascades like ClickHouse and scrubs every registry") {
    Engine.execute(spark, "DROP DATABASE IF EXISTS graft_dbx SYNC")
    Engine.execute(spark, "CREATE DATABASE graft_dbx")
    Engine.execute(spark, """
      CREATE TABLE graft_dbx.t1 (k Int64, x Int64)
      ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark,
      "INSERT INTO graft_dbx.t1 SELECT number, number FROM numbers(10)")
    Engine.execute(spark, "ALTER TABLE graft_dbx.t1 ADD INDEX ix x TYPE minmax")
    Engine.execute(spark, """
      ALTER TABLE graft_dbx.t1 ADD PROJECTION p (SELECT k, count() GROUP BY k)""")
    Engine.execute(spark, "CREATE TABLE graft_dbx.t2 (a Int64) ENGINE=Memory")
    // an MV living in the database, fed by a table OUTSIDE it
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.mvsrc SYNC")
    Engine.execute(spark,
      "CREATE TABLE graft_t.mvsrc (k Int64) ENGINE=Memory")
    Engine.execute(spark, """
      CREATE MATERIALIZED VIEW graft_dbx.mv TO graft_dbx.t2 AS
      SELECT k AS a FROM graft_t.mvsrc""")
    // ClickHouse drops a NON-EMPTY database without any CASCADE keyword
    Engine.execute(spark, "DROP DATABASE graft_dbx")
    assert(!spark.catalog.databaseExists("graft_dbx"))
    // the MV must die DURABLY with its database: after a restart an
    // insert into the outside source must not fan out into the deleted
    // target (pre-fix, matviews.json resurrected it)
    CatalogStore.simulateRestart(spark, Seq("graft_t.mvsrc"))
    Engine.execute(spark, "INSERT INTO graft_t.mvsrc VALUES (7)")
    assert(Engine.execute(spark, "SELECT count() AS n FROM graft_t.mvsrc")
      .collect().head.getLong(0) == 1L)
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.mvsrc SYNC")
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.data_skipping_indices
      WHERE database = 'graft_dbx'""").collect().head.getLong(0) == 0L)
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.projections
      WHERE table LIKE 'graft_dbx%'""").collect().head.getLong(0) == 0L)
    // a fresh same-named database + table starts clean
    Engine.execute(spark, "CREATE DATABASE graft_dbx")
    Engine.execute(spark, """
      CREATE TABLE graft_dbx.t1 (k Int64, x Int64) ENGINE=Memory""")
    assert(Engine.execute(spark, "SELECT count() AS n FROM graft_dbx.t1")
      .collect().head.getLong(0) == 0L)
    Engine.execute(spark, "DROP DATABASE graft_dbx SYNC")
    intercept[Exception](Engine.execute(spark, "DROP DATABASE system"))
  }

  test("rapid drop/recreate/drop keeps BOTH generations; UNDROP restores the newest") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_spec")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_spec.udg SYNC")
    // two full drop cycles inside (typically) the same millisecond: the
    // trash names must not collide — a swallowed FileAlreadyExists would
    // orphan the newer stage and leave UNDROP restoring stale data
    Engine.execute(spark, """
      CREATE TABLE graft_spec.udg (k Int64) ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, "INSERT INTO graft_spec.udg SELECT number FROM numbers(5)")
    Engine.execute(spark, "DROP TABLE graft_spec.udg")
    Engine.execute(spark, """
      CREATE TABLE graft_spec.udg (k Int64) ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, "INSERT INTO graft_spec.udg SELECT number FROM numbers(9)")
    Engine.execute(spark, "DROP TABLE graft_spec.udg")
    val staged = Engine.execute(spark, """
      SELECT count() AS n FROM system.dropped_tables
      WHERE database = 'graft_spec' AND table = 'udg'""").collect().head.getLong(0)
    assert(staged == 2L, s"both drop generations must stage (got $staged)")
    Engine.execute(spark, "UNDROP TABLE graft_spec.udg")
    assert(Engine.execute(spark, "SELECT count() AS n FROM graft_spec.udg")
      .collect().head.getLong(0) == 9L, "UNDROP must restore the NEWEST generation")
    Engine.execute(spark, "DROP TABLE graft_spec.udg SYNC")
    Engine.execute(spark, "UNDROP TABLE graft_spec.udg") // older generation
    assert(Engine.execute(spark, "SELECT count() AS n FROM graft_spec.udg")
      .collect().head.getLong(0) == 5L)
    Engine.execute(spark, "DROP TABLE graft_spec.udg SYNC")
  }

  test("DROP DATABASE removes its delayed-drop entries (no cross-generation UNDROP)") {
    Engine.execute(spark, "DROP DATABASE IF EXISTS graft_dbu SYNC")
    Engine.execute(spark, "CREATE DATABASE graft_dbu")
    Engine.execute(spark, """
      CREATE TABLE graft_dbu.t (k Int64) ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark, "INSERT INTO graft_dbu.t SELECT number FROM numbers(3)")
    Engine.execute(spark, "DROP TABLE graft_dbu.t") // staged in trash
    Engine.execute(spark, "DROP DATABASE graft_dbu")
    // ClickHouse removes delayed-drop entries with the database:
    // system.dropped_tables must not list tables of a destroyed database
    assert(Engine.execute(spark, """
      SELECT count() AS n FROM system.dropped_tables
      WHERE database = 'graft_dbu'""").collect().head.getLong(0) == 0L)
    // and a recreated same-named database must not resurrect the old
    // generation via UNDROP
    Engine.execute(spark, "CREATE DATABASE graft_dbu")
    intercept[Exception](Engine.execute(spark, "UNDROP TABLE graft_dbu.t"))
    Engine.execute(spark, "DROP DATABASE graft_dbu SYNC")
  }

  test("UNDROP works across a restart (trash survives on disk)") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_spec")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_spec.udr SYNC")
    Engine.execute(spark, """
      CREATE TABLE graft_spec.udr (k Int64) ENGINE=MergeTree() ORDER BY (k)""")
    Engine.execute(spark,
      "INSERT INTO graft_spec.udr SELECT number FROM numbers(42)")
    Engine.execute(spark, "DROP TABLE graft_spec.udr")
    CatalogStore.simulateRestart(spark, Nil)
    Engine.execute(spark, "SELECT 1") // trigger the lazy restore
    assert(!spark.catalog.tableExists("graft_spec.udr"),
      "a restore must not resurrect dropped tables")
    Engine.execute(spark, "UNDROP TABLE graft_spec.udr")
    assert(Engine.execute(spark, "SELECT count() AS n FROM graft_spec.udr")
      .collect().head.getLong(0) == 42L)
    Engine.execute(spark, "DROP TABLE graft_spec.udr SYNC")
  }
}
