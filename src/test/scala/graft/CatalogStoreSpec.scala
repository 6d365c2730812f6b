package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine}

/** Durable catalog (CatalogStore): DDL must survive a JVM restart the
  * way the reference's persistent chdb session does
  * (/root/reference/main.py:140-150 — `Session(path=...)` answers
  * yesterday's CREATEs today). The restart is simulated faithfully:
  * the table is flipped EXTERNAL and dropped from the in-memory
  * catalog (data untouched — exactly the state a fresh JVM wakes up
  * to), every in-memory registry entry is wiped, and the warehouse is
  * marked unrestored so the next engine statement rescans it. */
class CatalogStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("MergeTree table survives a restart: data, partitions, layout metadata") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.dur")
    Engine.execute(spark, """
      CREATE TABLE graft_t.dur (k Int64, v Int64, d Date)
      ENGINE=MergeTree() PARTITION BY toYYYYMM(d) ORDER BY (k)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.dur VALUES
      (1, 10, '2024-01-15'), (2, 20, '2024-02-20'), (3, 30, '2024-02-21')""")

    CatalogStore.simulateRestart(spark, Seq("graft_t.dur"))
    assert(!spark.sessionState.catalog.tableExists(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_t.dur")),
      "simulated restart should have dropped the catalog entry")

    // first engine statement restores lazily
    val rows = Engine.execute(spark,
      "SELECT _part AS p, sum(v) AS sv FROM graft_t.dur GROUP BY p ORDER BY p")
      .collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((202401, 10L), (202402, 50L)))

    // DESCRIBE and system.tables answer
    val desc = Engine.execute(spark, "DESCRIBE TABLE graft_t.dur").collect()
    assert(desc.map(_.getString(0)).toSet == Set("k", "v", "d", "_part"))
    val listed = Engine.execute(spark,
      "SELECT name FROM system.tables WHERE database = 'graft_t'")
      .collect().map(_.getString(0))
    assert(listed.contains("dur"))

    // the restored TableMeta drives inserts: a new row lands in the
    // right partition and the partition expression still prunes
    Engine.execute(spark,
      "INSERT INTO graft_t.dur VALUES (4, 40, '2024-03-05')")
    val after = Engine.execute(spark,
      "SELECT count() AS n FROM graft_t.dur WHERE _part = 202403").collect()
    assert(after.head.getLong(0) == 1L)

    // restored table keeps managed DROP semantics: data dir goes away
    val loc = java.nio.file.Paths.get(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("graft_t.dur"))
        .location.toString).getPath)
    Engine.execute(spark, "DROP TABLE graft_t.dur")
    assert(!java.nio.file.Files.exists(loc),
      "DROP of a restored table must delete its data like any managed table")
  }

  test("projection and its store survive a restart; the rewrite still fires") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durp")
    Engine.execute(spark, """
      CREATE TABLE graft_t.durp (g String, x Int64)
      ENGINE=MergeTree() ORDER BY (x)""")
    Engine.execute(spark, """
      INSERT INTO graft_t.durp VALUES ('a', 1), ('a', 2), ('b', 5)""")
    Engine.execute(spark, """
      ALTER TABLE graft_t.durp ADD PROJECTION p_g
        (SELECT g, count(), sum(x) GROUP BY g)""")
    Engine.execute(spark, "ALTER TABLE graft_t.durp MATERIALIZE PROJECTION p_g")

    CatalogStore.simulateRestart(spark, Seq("graft_t.durp"))

    val df = Engine.execute(spark, """
      SELECT g, count() AS n, sum(x) AS sx
      FROM graft_t.durp GROUP BY g ORDER BY g""")
    assert(df.queryExecution.analyzed.toString.contains("__proj_p_g"),
      "projection rewrite should fire after the restart")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("a", 2L, 3L), ("b", 1L, 5L)))
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durp")
  }

  test("a mutation's projection invalidation survives a restart (no stale answers)") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.duri")
    Engine.execute(spark, """
      CREATE TABLE graft_t.duri (g String, x Int64)
      ENGINE=MergeTree() ORDER BY (x)""")
    Engine.execute(spark, "INSERT INTO graft_t.duri VALUES ('a', 1), ('b', 5)")
    Engine.execute(spark, """
      ALTER TABLE graft_t.duri ADD PROJECTION p_g
        (SELECT g, sum(x) GROUP BY g)""")
    Engine.execute(spark, "ALTER TABLE graft_t.duri MATERIALIZE PROJECTION p_g")
    // mutation invalidates; the cleared flag must persist
    Engine.execute(spark, "ALTER TABLE graft_t.duri DELETE WHERE g = 'b'")
    CatalogStore.simulateRestart(spark, Seq("graft_t.duri"))
    val df = Engine.execute(spark,
      "SELECT g, sum(x) AS sx FROM graft_t.duri GROUP BY g ORDER BY g")
    assert(!df.queryExecution.analyzed.toString.contains("__proj_p_g"),
      "an invalidated projection must stay invalid across a restart")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L)))
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.duri")
  }

  test("dictionary survives a restart: dictGet answers from the restored registry") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durd_src")
    Engine.execute(spark,
      "CREATE TABLE graft_t.durd_src (id UInt64, nm String) ENGINE=Memory")
    Engine.execute(spark,
      "INSERT INTO graft_t.durd_src VALUES (1, 'one'), (2, 'two')")
    Engine.execute(spark, "DROP DICTIONARY IF EXISTS dur_dict")
    Engine.execute(spark, """
      CREATE DICTIONARY dur_dict (id UInt64, nm String DEFAULT 'none')
      PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 'graft_t.durd_src'))
      LAYOUT(HASHED()) LIFETIME(MIN 0 MAX 300)""")

    CatalogStore.simulateRestart(spark, Seq("graft_t.durd_src"),
      dicts = Seq("dur_dict"))

    val r = Engine.execute(spark, """
      SELECT dictGet('dur_dict', 'nm', toUInt64(2)) AS hit,
             dictGet('dur_dict', 'nm', toUInt64(9)) AS miss""").collect().head
    assert((r.getString(0), r.getString(1)) == ("two", "none"))
    Engine.execute(spark, "DROP DICTIONARY IF EXISTS dur_dict")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durd_src")
  }

  test("materialized view survives a restart: post-restart inserts still fire it") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durmv_src")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durmv_agg")
    Engine.execute(spark,
      "CREATE TABLE graft_t.durmv_src (g String, v Int64) ENGINE=Memory")
    Engine.execute(spark, """
      CREATE MATERIALIZED VIEW graft_t.durmv_agg AS
      SELECT g, count() AS n, sum(v) AS sv FROM graft_t.durmv_src GROUP BY g""")
    Engine.execute(spark, "INSERT INTO graft_t.durmv_src VALUES ('a', 1)")

    CatalogStore.simulateRestart(spark,
      Seq("graft_t.durmv_src", "graft_t.durmv_agg"))

    // the MV trigger was restored: a post-restart insert appends its
    // block aggregate next to the pre-restart one
    Engine.execute(spark,
      "INSERT INTO graft_t.durmv_src VALUES ('a', 10), ('b', 5)")
    val rows = Engine.execute(spark, """
      SELECT g, n, sv FROM graft_t.durmv_agg ORDER BY g, n, sv""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("a", 1L, 1L), ("a", 1L, 10L), ("b", 1L, 5L)))
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durmv_agg")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durmv_src")
  }

  test("rename + restart: the moved projection still answers under the new name") {
    Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durrn")
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durrn2")
    Engine.execute(spark, """
      CREATE TABLE graft_t.durrn (g String, v Int64)
      ENGINE=MergeTree() ORDER BY (v)""")
    Engine.execute(spark, "INSERT INTO graft_t.durrn VALUES ('a', 1), ('b', 2)")
    Engine.execute(spark, """
      ALTER TABLE graft_t.durrn ADD PROJECTION p_g
        (SELECT g, sum(v) GROUP BY g)""")
    Engine.execute(spark, "ALTER TABLE graft_t.durrn MATERIALIZE PROJECTION p_g")
    Engine.execute(spark, "RENAME TABLE graft_t.durrn TO graft_t.durrn2")

    CatalogStore.simulateRestart(spark, Seq("graft_t.durrn2"))

    val df = Engine.execute(spark,
      "SELECT g, sum(v) AS sv FROM graft_t.durrn2 GROUP BY g ORDER BY g")
    assert(df.queryExecution.analyzed.toString.contains("__proj_p_g"),
      "renamed projection should survive the restart under the new name")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 2L)))
    Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durrn2")
  }

  test("kill switch: spark.graft.catalog.persist=false writes no meta file") {
    spark.conf.set("spark.graft.catalog.persist", "false")
    try {
      Engine.execute(spark, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(spark, "DROP TABLE IF EXISTS graft_t.durk")
      Engine.execute(spark,
        "CREATE TABLE graft_t.durk (k Int64) ENGINE=MergeTree() ORDER BY (k)")
      val loc = java.nio.file.Paths.get(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier("graft_t.durk"))
          .location.toString).getPath)
      assert(!java.nio.file.Files.exists(loc.resolve("_graft_meta.json")))
      Engine.execute(spark, "DROP TABLE graft_t.durk")
    } finally spark.conf.unset("spark.graft.catalog.persist")
  }
}
