package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine}

/** MATERIALIZED columns (ClickHouse semantics): computed from their
  * expression on EVERY insert path, never insertable, hidden from
  * `SELECT *` but selectable by name; DESCRIBE/SHOW CREATE carry the
  * declaration; the durable catalog restores the expressions. */
class MaterializedColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exec(q: String) = Engine.execute(spark, q)

  test("materialized columns compute on insert, hide from *, select by name") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.mat SYNC")
    exec("""
      CREATE TABLE graft_spec.mat (
        id Int64, price Float64,
        cents Int64 MATERIALIZED toInt64(floor(price * 100)),
        tag String DEFAULT 'std')
      ENGINE=MergeTree() ORDER BY (id)""")
    // VALUES without a column list: arity is the INSERTABLE columns
    exec("INSERT INTO graft_spec.mat VALUES (1, 1.25, 'a')")
    // column-list subset: default fills, materialized computes
    exec("INSERT INTO graft_spec.mat (id, price) VALUES (2, 2.5)")
    // INSERT ... SELECT (positional over insertable columns)
    exec("INSERT INTO graft_spec.mat SELECT 3, 10.01, 'c'")
    val byName = exec("""
      SELECT id, cents, tag FROM graft_spec.mat ORDER BY id""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(byName === Seq((1L, 125L, "a"), (2L, 250L, "std"), (3L, 1001L, "c")))
    // SELECT * excludes the materialized column
    val star = exec("SELECT * FROM graft_spec.mat")
    assert(star.columns.toSeq === Seq("id", "price", "tag"), star.columns.toSeq)
    // ...including in subqueries
    val sub = exec("SELECT * FROM (SELECT * FROM graft_spec.mat) ORDER BY id")
    assert(sub.columns.toSeq === Seq("id", "price", "tag"))
    // explicitly inserting into it refuses (both SQL forms)
    val e1 = intercept[Exception](
      exec("INSERT INTO graft_spec.mat (id, price, cents) VALUES (9, 1.0, 5)"))
    assert(e1.getMessage.contains("MATERIALIZED"), e1.getMessage)
    val e2 = intercept[Exception](exec(
      "INSERT INTO graft_spec.mat (id, cents) SELECT 9, 5"))
    assert(e2.getMessage.contains("MATERIALIZED"), e2.getMessage)
    // mutations cannot assign it
    val e3 = intercept[Exception](exec(
      "ALTER TABLE graft_spec.mat UPDATE cents = 0 WHERE id = 1"))
    assert(e3.getMessage.contains("MATERIALIZED"), e3.getMessage)
    // DESCRIBE carries the declaration
    val de = exec("DESCRIBE graft_spec.mat").collect()
      .find(_.getString(0) == "cents").get
    assert(de.getString(2) === "MATERIALIZED")
    assert(de.getString(3).contains("floor(price * 100)"), de.getString(3))
    exec("DROP TABLE graft_spec.mat SYNC")
  }

  test("format inserts compute materialized columns; SHOW CREATE round-trips") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.matf SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.matf2 SYNC")
    exec("""
      CREATE TABLE graft_spec.matf (
        id Int64, v Int64, dbl Int64 MATERIALIZED v * 2)
      ENGINE=MergeTree() ORDER BY (id)""")
    exec("INSERT INTO graft_spec.matf FORMAT CSV\n1,10\n2,20")
    exec("INSERT INTO graft_spec.matf (v, id) FORMAT JSONEachRow\n" +
      """{"v": 30, "id": 3}""")
    val rows = exec("SELECT id, dbl FROM graft_spec.matf ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 20L), (2L, 40L), (3L, 60L)))
    // SHOW CREATE renders the MATERIALIZED declaration and the text
    // re-creates an equivalent table (the clone path's contract)
    val stmt = exec("SHOW CREATE TABLE graft_spec.matf")
      .collect().head.getString(0)
    assert(stmt.contains("MATERIALIZED v * 2"), stmt)
    exec(stmt.replace("graft_spec.matf", "graft_spec.matf2"))
    exec("INSERT INTO graft_spec.matf2 (id, v) VALUES (7, 100)")
    assert(exec("SELECT dbl FROM graft_spec.matf2 WHERE id = 7")
      .collect().head.getLong(0) === 200L)
    exec("DROP TABLE graft_spec.matf SYNC")
    exec("DROP TABLE graft_spec.matf2 SYNC")
  }

  test("durable catalog restores materialized expressions across restarts") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.matd SYNC")
    exec("""
      CREATE TABLE graft_spec.matd (
        id Int64, w Int64 MATERIALIZED id * 7)
      ENGINE=MergeTree() ORDER BY (id)""")
    exec("INSERT INTO graft_spec.matd (id) VALUES (1)")
    CatalogStore.simulateRestart(spark, Seq("graft_spec.matd"))
    // post-restart insert must still compute, and * must still hide
    exec("INSERT INTO graft_spec.matd (id) VALUES (2)")
    val rows = exec("SELECT id, w FROM graft_spec.matd ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 7L), (2L, 14L)))
    assert(exec("SELECT * FROM graft_spec.matd").columns.toSeq === Seq("id"))
    exec("DROP TABLE graft_spec.matd SYNC")
  }

  test("ALTER ADD/MODIFY/RENAME/DROP interact correctly with MATERIALIZED") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.mata SYNC")
    exec("""
      CREATE TABLE graft_spec.mata (id Int64, base Int64)
      ENGINE=MergeTree() ORDER BY (id)""")
    exec("INSERT INTO graft_spec.mata VALUES (1, 10)")
    // ADD COLUMN ... MATERIALIZED backfills existing rows eagerly
    exec("ALTER TABLE graft_spec.mata ADD COLUMN m Int64 MATERIALIZED base + 1")
    assert(exec("SELECT m FROM graft_spec.mata WHERE id = 1")
      .collect().head.getLong(0) === 11L)
    exec("INSERT INTO graft_spec.mata (id, base) VALUES (2, 20)")
    assert(exec("SELECT m FROM graft_spec.mata WHERE id = 2")
      .collect().head.getLong(0) === 21L)
    // MODIFY swaps the expression for FUTURE inserts
    exec("ALTER TABLE graft_spec.mata MODIFY COLUMN m MATERIALIZED base * 100")
    exec("INSERT INTO graft_spec.mata (id, base) VALUES (3, 3)")
    assert(exec("SELECT m FROM graft_spec.mata WHERE id = 3")
      .collect().head.getLong(0) === 300L)
    // DROP of a column the materialized expr references refuses
    val e = intercept[Exception](
      exec("ALTER TABLE graft_spec.mata DROP COLUMN base"))
    assert(e.getMessage.contains("MATERIALIZED"), e.getMessage)
    // RENAME of the referenced column rewrites the expression
    exec("ALTER TABLE graft_spec.mata RENAME COLUMN base TO seed")
    exec("INSERT INTO graft_spec.mata (id, seed) VALUES (4, 4)")
    assert(exec("SELECT m FROM graft_spec.mata WHERE id = 4")
      .collect().head.getLong(0) === 400L)
    // dropping the materialized column itself is fine
    exec("ALTER TABLE graft_spec.mata DROP COLUMN m")
    assert(exec("SELECT * FROM graft_spec.mata").columns.toSeq ===
      Seq("id", "seed"))
    exec("DROP TABLE graft_spec.mata SYNC")
  }
}
