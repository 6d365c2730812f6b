package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine}

/** DETACH TABLE / ATTACH TABLE: park a table's data while forgetting it
  * in the catalog; ATTACH re-registers from the on-disk meta file —
  * metadata only, zero data movement. Plain DETACH re-attaches on
  * restart; PERMANENTLY survives restarts (ClickHouse semantics). */
class DetachAttachSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exec(q: String) = Engine.execute(spark, q)

  test("detach parks the table; attach restores data, layout and indexes") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.det SYNC")
    exec("""
      CREATE TABLE graft_spec.det (k Int64, x Int64, s String DEFAULT 'd')
      ENGINE=MergeTree() ORDER BY (k)""")
    exec("INSERT INTO graft_spec.det (k, x) SELECT number, number FROM numbers(50)")
    exec("ALTER TABLE graft_spec.det ADD INDEX ix x TYPE minmax")
    exec("ALTER TABLE graft_spec.det MATERIALIZE INDEX ix")
    exec("DETACH TABLE graft_spec.det")
    assert(!spark.catalog.tableExists("graft_spec.det"))
    intercept[Exception](exec("SELECT count() FROM graft_spec.det"))
    // the parked name is reserved: CREATE must refuse, not wipe the data
    val e = intercept[Exception](exec(
      "CREATE TABLE graft_spec.det (a Int64) ENGINE=Memory"))
    assert(e.getMessage.contains("DETACHED"), e.getMessage)
    exec("ATTACH TABLE graft_spec.det")
    assert(exec("SELECT count() AS n FROM graft_spec.det")
      .collect().head.getLong(0) == 50L)
    // the DEFAULT came back with the meta
    exec("INSERT INTO graft_spec.det (k, x) VALUES (100, 1)")
    assert(exec("SELECT s FROM graft_spec.det WHERE k = 100")
      .collect().head.getString(0) == "d")
    // double attach refuses; IF NOT EXISTS is silent
    intercept[Exception](exec("ATTACH TABLE graft_spec.det"))
    exec("ATTACH TABLE IF NOT EXISTS graft_spec.det")
    // detach of a missing table: IF EXISTS silent, bare errors
    exec("DETACH TABLE IF EXISTS graft_spec.det_nope")
    intercept[Exception](exec("DETACH TABLE graft_spec.det_nope"))
    exec("DROP TABLE graft_spec.det SYNC")
  }

  test("plain DETACH re-attaches on restart; PERMANENTLY survives it") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.detp SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.dett SYNC")
    exec("""
      CREATE TABLE graft_spec.dett (k Int64) ENGINE=MergeTree() ORDER BY (k)""")
    exec("INSERT INTO graft_spec.dett VALUES (1), (2)")
    exec("""
      CREATE TABLE graft_spec.detp (k Int64) ENGINE=MergeTree() ORDER BY (k)""")
    exec("INSERT INTO graft_spec.detp VALUES (3)")
    exec("DETACH TABLE graft_spec.dett")
    exec("DETACH TABLE graft_spec.detp PERMANENTLY")
    // 'restart': the lazy warehouse restore runs in a fresh JVM
    CatalogStore.simulateRestart(spark, Nil)
    exec("SELECT 1") // trigger the restore
    assert(exec("SELECT count() AS n FROM graft_spec.dett")
      .collect().head.getLong(0) == 2L,
      "plain DETACH must re-attach after a restart (ClickHouse semantics)")
    assert(!spark.catalog.tableExists("graft_spec.detp"),
      "DETACH PERMANENTLY must survive the restart")
    // and the permanent one still refuses CREATE over its name...
    intercept[Exception](exec(
      "CREATE TABLE graft_spec.detp (a Int64) ENGINE=Memory"))
    // ...until ATTACH brings it back
    exec("ATTACH TABLE graft_spec.detp")
    assert(exec("SELECT count() AS n FROM graft_spec.detp")
      .collect().head.getLong(0) == 1L)
    exec("DROP TABLE graft_spec.detp SYNC")
    exec("DROP TABLE graft_spec.dett SYNC")
  }

  test("DETACH purges projection defs from the on-disk meta (no restart resurrection)") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.detpj SYNC")
    exec("""
      CREATE TABLE graft_spec.detpj (k Int64, grp String)
      ENGINE=MergeTree() ORDER BY (k)""")
    exec("""
      INSERT INTO graft_spec.detpj
      SELECT number, toString(number % 3) FROM numbers(30)""")
    exec("""
      ALTER TABLE graft_spec.detpj ADD PROJECTION p_g
        (SELECT grp, count(), sum(k) GROUP BY grp)""")
    exec("ALTER TABLE graft_spec.detpj MATERIALIZE PROJECTION p_g")
    exec("DETACH TABLE graft_spec.detpj")
    // restart: plain DETACH auto-re-attaches from the on-disk meta —
    // which must NOT carry the projection defs anymore (their store
    // was hard-dropped at DETACH; a resurrected def would make the
    // next INSERT recreate the store with only that batch's partial
    // and GROUP BYs would silently answer wrong aggregates from it)
    CatalogStore.simulateRestart(spark, Nil)
    exec("SELECT 1") // trigger the lazy restore
    assert(spark.catalog.tableExists("graft_spec.detpj"))
    val sysProj = exec("""
      SELECT count() AS n FROM system.projections
      WHERE table = 'graft_spec.detpj'""").collect().head.getLong(0)
    assert(sysProj === 0L,
      "projection defs resurrected from a stale meta file after DETACH")
    exec("""
      INSERT INTO graft_spec.detpj
      SELECT number + 100, toString(number % 3) FROM numbers(30)""")
    val got = exec("""
      SELECT grp, count() AS n, sum(k) AS sk
      FROM graft_spec.detpj GROUP BY grp ORDER BY grp""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // 60 rows total, both batches — a resurrected projection would
    // report only the second batch's 30
    assert(got.map(_._2).sum === 60L, got)
    assert(got.map(_._3).sum === (0 until 30).map(_.toLong).sum +
      (100 until 130).map(_.toLong).sum, got)
    exec("DROP TABLE graft_spec.detpj SYNC")
  }
}
