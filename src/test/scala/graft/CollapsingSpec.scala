package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine}

/** CollapsingMergeTree(sign) / VersionedCollapsingMergeTree(sign, ver):
  * the CDC ingest idiom — +1 state rows, -1 cancel rows; FINAL and
  * OPTIMIZE ... FINAL net the sign per sorting key (per (key, version)
  * for the versioned engine) and keep one representative row of the
  * surviving side. */
class CollapsingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exec(q: String) = Engine.execute(spark, q)

  test("FINAL nets sign per key: cancelled keys vanish, negative net keeps a cancel row") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.col1")
    exec("""
      CREATE TABLE graft_spec.col1 (id Int64, v Int64, sign Int8)
      ENGINE=CollapsingMergeTree(sign) ORDER BY (id)""")
    exec("""
      INSERT INTO graft_spec.col1 VALUES
      (1, 10, 1),            -- outstanding state
      (2, 20, 1), (2, 20, -1), -- fully cancelled: must vanish
      (3, 30, -1)            -- orphan cancel: negative net keeps it""")
    val rows = exec("""
      SELECT id, v, sign FROM graft_spec.col1 FINAL ORDER BY id""").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getByte(2).toInt))
      .toSeq == Seq((1L, 10L, 1), (3L, 30L, -1)))
    // without FINAL, reads see the raw unmerged rows (ClickHouse reads
    // active parts as-is)
    assert(exec("SELECT count() AS n FROM graft_spec.col1")
      .collect().head.getLong(0) == 4L)
  }

  test("FINAL works inside a JOIN and composes with another engine's FINAL") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.col2")
    exec("DROP TABLE IF EXISTS graft_spec.col2r")
    exec("""
      CREATE TABLE graft_spec.col2 (id Int64, qty Int64, sign Int8)
      ENGINE=CollapsingMergeTree(sign) ORDER BY (id)""")
    exec("""
      INSERT INTO graft_spec.col2 VALUES
      (1, 100, 1), (2, 200, 1), (2, 200, -1), (3, 300, 1)""")
    exec("""
      CREATE TABLE graft_spec.col2r (id Int64, ver Int64, name String)
      ENGINE=ReplacingMergeTree(ver) ORDER BY (id)""")
    exec("""
      INSERT INTO graft_spec.col2r VALUES
      (1, 1, 'old-a'), (1, 2, 'a'), (3, 1, 'c')""")
    val rows = exec("""
      SELECT c.id AS id, c.qty AS qty, r.name AS name
      FROM graft_spec.col2 FINAL AS c
      JOIN graft_spec.col2r FINAL AS r ON c.id = r.id
      ORDER BY id""").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq((1L, 100L, "a"), (3L, 300L, "c")))
  }

  test("versioned: cancels only annihilate their own version; OPTIMIZE FINAL materializes") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.col3")
    exec("""
      CREATE TABLE graft_spec.col3 (id Int64, v Int64, sign Int8, ver UInt32)
      ENGINE=VersionedCollapsingMergeTree(sign, ver) ORDER BY (id)""")
    // the cancel arrives BEFORE the state it duplicates (out-of-order
    // ingest) — exactly the case the versioned engine exists for
    exec("""
      INSERT INTO graft_spec.col3 VALUES
      (1, 10, -1, 1), (1, 10, 1, 1), (1, 11, 1, 2),
      (2, 20, 1, 1)""")
    val viaFinal = exec("""
      SELECT id, v, ver FROM graft_spec.col3 FINAL ORDER BY id""").collect()
    assert(viaFinal.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 11L, 2L), (2L, 20L, 1L)))
    exec("OPTIMIZE TABLE graft_spec.col3 FINAL")
    // merged in place: a plain read now sees the folded rows
    val merged = exec("""
      SELECT id, v, ver FROM graft_spec.col3 ORDER BY id""").collect()
    assert(merged.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 11L, 2L), (2L, 20L, 1L)))
  }

  test("SHOW CREATE round-trips both engines; metadata survives a restart") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.col4")
    exec("""
      CREATE TABLE graft_spec.col4 (id Int64, v Int64, sign Int8, ver UInt32)
      ENGINE=VersionedCollapsingMergeTree(sign, ver) ORDER BY (id)""")
    val stmt = exec("SHOW CREATE TABLE graft_spec.col4")
      .collect().head.getString(0)
    assert(stmt.contains("VersionedCollapsingMergeTree(sign, ver)"), stmt)
    exec("DROP TABLE IF EXISTS graft_spec.col5")
    exec("""
      CREATE TABLE graft_spec.col5 (id Int64, sign Int8)
      ENGINE=CollapsingMergeTree(sign) ORDER BY (id)""")
    assert(exec("SHOW CREATE TABLE graft_spec.col5")
      .collect().head.getString(0).contains("CollapsingMergeTree(sign)"))
    // restart: the collapsing metadata restores from _graft_meta.json,
    // so FINAL still folds in the fresh JVM
    exec("INSERT INTO graft_spec.col4 VALUES (1, 5, 1, 1), (1, 5, -1, 1)")
    CatalogStore.simulateRestart(spark, Seq("graft_spec.col4"))
    assert(exec("SELECT count() AS n FROM graft_spec.col4 FINAL")
      .collect().head.getLong(0) == 0L,
      "collapsing metadata must survive the restart for FINAL to fold")
    assert(exec("SHOW CREATE TABLE graft_spec.col4").collect().head
      .getString(0).contains("VersionedCollapsingMergeTree(sign, ver)"))
    exec("DROP TABLE IF EXISTS graft_spec.col4 SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.col5 SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.col1 SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.col2 SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.col2r SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.col3 SYNC")
  }

  test("engine argument arity is validated") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.colbad")
    intercept[Exception](exec("""
      CREATE TABLE graft_spec.colbad (id Int64, sign Int8)
      ENGINE=CollapsingMergeTree() ORDER BY (id)"""))
    intercept[Exception](exec("""
      CREATE TABLE graft_spec.colbad (id Int64, sign Int8, ver UInt32)
      ENGINE=VersionedCollapsingMergeTree(sign) ORDER BY (id)"""))
  }
}
