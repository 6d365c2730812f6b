package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine}

/** ALIAS and EPHEMERAL columns (ClickHouse semantics).
  *
  * ALIAS: no storage at all — the expression computes at read;
  * selectable by name, hidden from `SELECT *`, never insertable.
  * EPHEMERAL: exists only inside an INSERT — it may be named in an
  * insert column list (or fall back to its own default), other
  * columns' DEFAULT/MATERIALIZED expressions may read it, and nothing
  * stores it.
  *
  * Reference surface: column decorations reach the engine through the
  * generic statement path (/root/reference/main.py:190). */
class AliasEphemeralSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exec(q: String) = Engine.execute(spark, q)

  test("ALIAS columns compute at read, hide from *, refuse inserts") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.ali SYNC")
    exec("""
      CREATE TABLE graft_spec.ali (
        id Int64, price Float64, qty Int64,
        total Float64 ALIAS price * qty,
        total_cents Int64 ALIAS toInt64(floor(total * 100)))
      ENGINE=MergeTree() ORDER BY (id)""")
    exec("INSERT INTO graft_spec.ali VALUES (1, 1.5, 2), (2, 3.25, 4)")
    // select by name — including an alias chained off another alias
    val rows = exec("""
      SELECT id, total, total_cents FROM graft_spec.ali ORDER BY id""")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, 3.0, 300L), (2L, 13.0, 1300L)))
    // WHERE / ORDER BY may use the alias
    assert(exec(
      "SELECT id FROM graft_spec.ali WHERE total > 10 ORDER BY total")
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    // SELECT * excludes aliases — with and without an alias elsewhere
    assert(exec("SELECT * FROM graft_spec.ali").columns.toSeq ===
      Seq("id", "price", "qty"))
    assert(exec("SELECT * FROM graft_spec.ali WHERE total_cents > 0")
      .columns.toSeq === Seq("id", "price", "qty"))
    // inserting into an alias refuses, in both list forms
    val e1 = intercept[Exception](exec(
      "INSERT INTO graft_spec.ali (id, price, qty, total) VALUES (9,1.0,1,9.0)"))
    assert(e1.getMessage.contains("ALIAS"), e1.getMessage)
    val e2 = intercept[Exception](exec(
      "INSERT INTO graft_spec.ali (id, total) SELECT 9, 9.0"))
    assert(e2.getMessage.contains("ALIAS"), e2.getMessage)
    // mutations cannot assign it
    val e3 = intercept[Exception](exec(
      "ALTER TABLE graft_spec.ali UPDATE total = 0 WHERE id = 1"))
    assert(e3.getMessage.contains("no storage"), e3.getMessage)
    // DESCRIBE and SHOW CREATE carry the declarations
    val de = exec("DESCRIBE graft_spec.ali").collect()
      .find(_.getString(0) == "total").get
    assert(de.getString(2) === "ALIAS")
    assert(de.getString(3) === "price * qty")
    val stmt = exec("SHOW CREATE TABLE graft_spec.ali")
      .collect().head.getString(0)
    assert(stmt.contains("ALIAS price * qty"), stmt)
    exec("DROP TABLE graft_spec.ali SYNC")
  }

  test("ALIAS works with joins, aggregates and FINAL merge reads") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.alf SYNC")
    exec("""
      CREATE TABLE graft_spec.alf (
        k Int64, v Int64, ver Int64,
        vsq Int64 ALIAS v * v)
      ENGINE=ReplacingMergeTree(ver) ORDER BY (k)""")
    exec("INSERT INTO graft_spec.alf VALUES (1, 2, 1), (1, 3, 2), (2, 5, 1)")
    // FINAL keeps (1 -> v=3) and (2 -> v=5); alias computes over the
    // merged rows
    val fin = exec(
      "SELECT k, vsq FROM graft_spec.alf FINAL ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fin === Seq((1L, 9L), (2L, 25L)))
    // aggregate over an alias
    assert(exec("SELECT sum(vsq) AS s FROM graft_spec.alf FINAL")
      .collect().head.getLong(0) === 34L)
    exec("DROP TABLE graft_spec.alf SYNC")
  }

  test("EPHEMERAL columns feed MATERIALIZED/DEFAULT and never store") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.eph SYNC")
    exec("""
      CREATE TABLE graft_spec.eph (
        id Int64,
        raw String EPHEMERAL '',
        len Int64 MATERIALIZED length(raw),
        head String DEFAULT substring(raw, 1, 3))
      ENGINE=MergeTree() ORDER BY (id)""")
    // provided through a VALUES column list
    exec("INSERT INTO graft_spec.eph (id, raw) VALUES (1, 'hello world')")
    // provided through a column-list SELECT
    exec("INSERT INTO graft_spec.eph (id, raw) SELECT 2, 'abcdef'")
    // omitted entirely: the ephemeral's own default ('') applies
    exec("INSERT INTO graft_spec.eph (id) VALUES (3)")
    val rows = exec("""
      SELECT id, len, head FROM graft_spec.eph ORDER BY id""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows === Seq((1L, 11L, "hel"), (2L, 6L, "abc"), (3L, 0L, "")))
    // nothing stores the ephemeral: * shows the visible stored set
    // (len is MATERIALIZED, so it hides from * too)
    assert(exec("SELECT * FROM graft_spec.eph").columns.toSeq ===
      Seq("id", "head"))
    // selecting an ephemeral by name fails (no read surface — CH too)
    intercept[Exception](
      exec("SELECT raw FROM graft_spec.eph").collect())
    // DESCRIBE carries the declaration
    val de = exec("DESCRIBE graft_spec.eph").collect()
      .find(_.getString(0) == "raw").get
    assert(de.getString(2) === "EPHEMERAL")
    exec("DROP TABLE graft_spec.eph SYNC")
  }

  test("EPHEMERAL through text formats and SHOW CREATE round-trip") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.ephf SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.ephf2 SYNC")
    exec("""
      CREATE TABLE graft_spec.ephf (
        id Int64,
        seed Int64 EPHEMERAL,
        twice Int64 MATERIALIZED seed * 2)
      ENGINE=MergeTree() ORDER BY (id)""")
    exec("INSERT INTO graft_spec.ephf (id, seed) FORMAT JSONEachRow\n" +
      """{"id": 1, "seed": 21}""")
    exec("INSERT INTO graft_spec.ephf (id, seed) FORMAT CSV\n2,50")
    val rows = exec("SELECT id, twice FROM graft_spec.ephf ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 42L), (2L, 100L)))
    // bare EPHEMERAL (no default) omitted → NULL feeds the expression
    exec("INSERT INTO graft_spec.ephf (id) VALUES (3)")
    assert(exec("SELECT twice FROM graft_spec.ephf WHERE id = 3")
      .collect().head.isNullAt(0))
    // SHOW CREATE renders both declarations; the text re-creates an
    // equivalent table (the clone path's contract)
    val stmt = exec("SHOW CREATE TABLE graft_spec.ephf")
      .collect().head.getString(0)
    assert(stmt.contains("EPHEMERAL"), stmt)
    assert(stmt.contains("MATERIALIZED seed * 2"), stmt)
    exec(stmt.replace("graft_spec.ephf", "graft_spec.ephf2"))
    exec("INSERT INTO graft_spec.ephf2 (id, seed) VALUES (7, 8)")
    assert(exec("SELECT twice FROM graft_spec.ephf2 WHERE id = 7")
      .collect().head.getLong(0) === 16L)
    exec("DROP TABLE graft_spec.ephf SYNC")
    exec("DROP TABLE graft_spec.ephf2 SYNC")
  }

  test("durable catalog restores ALIAS/EPHEMERAL across restarts") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.alid SYNC")
    exec("""
      CREATE TABLE graft_spec.alid (
        id Int64,
        inc Int64 EPHEMERAL 1,
        nxt Int64 MATERIALIZED id + inc,
        dbl Int64 ALIAS id * 2)
      ENGINE=MergeTree() ORDER BY (id)""")
    exec("INSERT INTO graft_spec.alid (id) VALUES (10)")
    CatalogStore.simulateRestart(spark, Seq("graft_spec.alid"))
    exec("INSERT INTO graft_spec.alid (id, inc) VALUES (20, 5)")
    val rows = exec("SELECT id, nxt, dbl FROM graft_spec.alid ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((10L, 11L, 20L), (20L, 25L, 40L)))
    // nxt is MATERIALIZED (hidden), inc EPHEMERAL, dbl ALIAS → * = id
    assert(exec("SELECT * FROM graft_spec.alid").columns.toSeq ===
      Seq("id"))
    exec("DROP TABLE graft_spec.alid SYNC")
  }

  test("ALTER lifecycle: ADD/DROP/RENAME/MODIFY over virtual columns") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.alia SYNC")
    exec("""
      CREATE TABLE graft_spec.alia (id Int64, v Int64)
      ENGINE=MergeTree() ORDER BY (id)""")
    exec("INSERT INTO graft_spec.alia VALUES (1, 10)")
    // ADD an alias — metadata-only, immediately readable over old rows
    exec("ALTER TABLE graft_spec.alia ADD COLUMN v3 Int64 ALIAS v * 3")
    assert(exec("SELECT v3 FROM graft_spec.alia WHERE id = 1")
      .collect().head.getLong(0) === 30L)
    // RENAME the alias itself
    exec("ALTER TABLE graft_spec.alia RENAME COLUMN v3 TO triple")
    assert(exec("SELECT triple FROM graft_spec.alia WHERE id = 1")
      .collect().head.getLong(0) === 30L)
    // RENAME the column the alias reads — the expression rewrites
    exec("ALTER TABLE graft_spec.alia RENAME COLUMN v TO w")
    assert(exec("SELECT triple FROM graft_spec.alia WHERE id = 1")
      .collect().head.getLong(0) === 30L)
    // DROP of the referenced column refuses, naming the dependent
    val e = intercept[Exception](
      exec("ALTER TABLE graft_spec.alia DROP COLUMN w"))
    assert(e.getMessage.contains("ALIAS"), e.getMessage)
    // MODIFY of a virtual column refuses with a pointer
    val e2 = intercept[Exception](
      exec("ALTER TABLE graft_spec.alia MODIFY COLUMN triple Int32"))
    assert(e2.getMessage.contains("ALIAS"), e2.getMessage)
    // a physical ADD clashing with the alias name refuses
    val e3 = intercept[Exception](
      exec("ALTER TABLE graft_spec.alia ADD COLUMN triple Int64"))
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
    // DROP the alias: registry-only, reads of it stop resolving
    exec("ALTER TABLE graft_spec.alia DROP COLUMN triple")
    intercept[Exception](
      exec("SELECT triple FROM graft_spec.alia").collect())
    // ALIAS/EPHEMERAL cannot feed the physical layout
    val e4 = intercept[Exception](exec("""
      CREATE TABLE graft_spec.alia2 (
        id Int64, a Int64 ALIAS id + 1)
      ENGINE=MergeTree() ORDER BY (a)"""))
    assert(e4.getMessage.contains("ALIAS"), e4.getMessage)
    exec("DROP TABLE graft_spec.alia SYNC")
  }
}
