package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.Engine

/** Special-purpose table engines: Null, Set, Join, Buffer, Merge —
  * ClickHouse semantics over the managed-parquet mapping (see
  * SpecialEngines.scala). */
class SpecialEnginesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exec(q: String) = Engine.execute(spark, q)
  private def count(t: String): Long =
    exec(s"SELECT count() AS n FROM $t").collect().head.getLong(0)

  test("Null engine discards inserts but fires materialized views") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.nsink SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.nagg SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.nmv SYNC")
    exec("CREATE TABLE graft_spec.nsink (k Int64, v Int64) ENGINE=Null")
    exec("""CREATE TABLE graft_spec.nagg (k Int64, sv Int64)
            ENGINE=SummingMergeTree() ORDER BY (k)""")
    exec("""CREATE MATERIALIZED VIEW graft_spec.nmv TO graft_spec.nagg AS
            SELECT k % 3 AS k, sum(v) AS sv FROM graft_spec.nsink
            GROUP BY k % 3""")
    exec("""INSERT INTO graft_spec.nsink
            SELECT number, number * 10 FROM numbers(30)""")
    exec("INSERT INTO graft_spec.nsink VALUES (100, 7), (101, 7)")
    // the sink stays empty; the MV target got both blocks
    assert(count("graft_spec.nsink") == 0L)
    val merged = exec("""SELECT k, sum(sv) AS s FROM graft_spec.nagg
                         GROUP BY k ORDER BY k""").collect()
    // block 1: sum per k%3 over 0..29 (v = 10*n); block 2: k%3 of
    // 100->1 (7), 101->2 (7)
    val expect = (0 until 30).groupBy(_ % 3).view
      .mapValues(_.map(_ * 10L).sum).toMap ++ Map.empty
    assert(merged.length == 3)
    assert(merged.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> expect(0), 1L -> (expect(1) + 7L), 2L -> (expect(2) + 7L)))
    // SHOW CREATE round-trips the engine
    val sc = exec("SHOW CREATE TABLE graft_spec.nsink")
      .collect().head.getString(0)
    assert(sc.contains("ENGINE = Null"), sc)
  }

  test("Set engine: IN works, direct reads refuse, args refuse") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.sset SYNC")
    exec("CREATE TABLE graft_spec.sset (k Int64) ENGINE=Set")
    exec("INSERT INTO graft_spec.sset SELECT number * 2 FROM numbers(5)")
    exec("INSERT INTO graft_spec.sset VALUES (100)")
    val n = exec("""SELECT count() AS n FROM numbers(200)
                    WHERE number IN graft_spec.sset""")
      .collect().head.getLong(0)
    assert(n == 6L) // 0,2,4,6,8,100
    val notIn = exec("""SELECT count() AS n FROM numbers(10)
                        WHERE number NOT IN graft_spec.sset""")
      .collect().head.getLong(0)
    assert(notIn == 5L) // 1,3,5,7,9
    val e = intercept[Exception](exec("SELECT * FROM graft_spec.sset"))
    assert(e.getMessage.contains("storage Set"), e.getMessage)
    intercept[Exception](exec(
      "CREATE TABLE graft_spec.sbad (k Int64) ENGINE=Set(3)"))
  }

  test("IN table works against any known table (ClickHouse accepts it)") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.intab SYNC")
    exec("CREATE TABLE graft_spec.intab (k Int64) ENGINE=Memory")
    exec("INSERT INTO graft_spec.intab VALUES (1), (3), (5)")
    val n = exec("""SELECT count() AS n FROM numbers(10)
                    WHERE number IN graft_spec.intab""")
      .collect().head.getLong(0)
    assert(n == 3L)
  }

  test("Join engine: ANY dedupes by key; joinGet/joinGetOrNull look up") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.jdim SYNC")
    exec("""CREATE TABLE graft_spec.jdim (k Int64, name String, w Float64)
            ENGINE=Join(ANY, LEFT, k)""")
    exec("INSERT INTO graft_spec.jdim VALUES (1, 'one', 1.5), (2, 'two', 2.5)")
    // ANY: a duplicate key is IGNORED (first write wins), both within a
    // block and against stored rows
    exec("INSERT INTO graft_spec.jdim VALUES (2, 'TWO', 9.9), (3, 'three', 3.5), (3, 'THREE', 9.9)")
    assert(count("graft_spec.jdim") == 3L)
    assert(exec("SELECT name FROM graft_spec.jdim WHERE k = 2")
      .collect().head.getString(0) == "two")
    // joinGet: per-row lookup; missing key -> type default
    val rows = exec("""
      SELECT number AS k,
             joinGet('graft_spec.jdim', 'name', number) AS nm,
             joinGetOrNull('graft_spec.jdim', 'w', number) AS w
      FROM numbers(5) ORDER BY k""").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("", "one", "two", "three", ""))
    assert(rows(4).isNullAt(2) && rows(0).isNullAt(2))
    assert(rows(2).getDouble(2) == 2.5)
    // the Join table also serves as a plain join side
    val j = exec("""
      SELECT count() AS n FROM numbers(10) AS l
      INNER JOIN graft_spec.jdim AS r ON l.number = r.k""")
      .collect().head.getLong(0)
    assert(j == 3L)
    // validation: bad strictness / unknown key column refuse
    intercept[Exception](exec(
      "CREATE TABLE graft_spec.jb (k Int64) ENGINE=Join(SOME, LEFT, k)"))
    intercept[Exception](exec(
      "CREATE TABLE graft_spec.jb (k Int64) ENGINE=Join(ANY, LEFT, nope)"))
    // joinGet against a non-Join table refuses
    exec("DROP TABLE IF EXISTS graft_spec.notjoin SYNC")
    exec("CREATE TABLE graft_spec.notjoin (k Int64, v Int64) ENGINE=Memory")
    val e = intercept[Exception](exec(
      "SELECT joinGet('graft_spec.notjoin', 'v', 1)"))
    assert(e.getMessage.contains("not an ENGINE=Join"), e.getMessage)
  }

  test("Join ALL keeps every row per key") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.jall SYNC")
    exec("""CREATE TABLE graft_spec.jall (k Int64, v Int64)
            ENGINE=Join(ALL, INNER, k)""")
    exec("INSERT INTO graft_spec.jall VALUES (1, 10), (1, 11), (2, 20)")
    exec("INSERT INTO graft_spec.jall VALUES (1, 12)")
    assert(count("graft_spec.jall") == 4L)
  }

  test("Buffer engine: reads union destination, max_rows flushes, OPTIMIZE flushes") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.bdst SYNC")
    exec("DROP TABLE IF EXISTS graft_spec.bbuf SYNC")
    exec("""CREATE TABLE graft_spec.bdst (k Int64, v Int64)
            ENGINE=MergeTree() ORDER BY (k)""")
    exec("""CREATE TABLE graft_spec.bbuf (k Int64, v Int64)
            ENGINE=Buffer(graft_spec, bdst, 1, 10, 100, 10, 20, 10000000, 100000000)""")
    // small insert: stays staged (below max_rows=20), reads see it
    exec("INSERT INTO graft_spec.bbuf SELECT number, number FROM numbers(5)")
    assert(count("graft_spec.bdst") == 0L)
    assert(count("graft_spec.bbuf") == 5L) // union face
    // filters aggregate across both sides
    assert(exec("SELECT sum(v) AS s FROM graft_spec.bbuf WHERE k < 3")
      .collect().head.getLong(0) == 3L)
    // crossing max_rows flushes everything staged into the destination
    exec("INSERT INTO graft_spec.bbuf SELECT number, number FROM numbers(100, 20)")
    assert(count("graft_spec.bdst") == 25L)
    assert(count("graft_spec.bbuf") == 25L) // face still shows all rows
    // stage a little more, then OPTIMIZE = manual flush
    exec("INSERT INTO graft_spec.bbuf VALUES (500, 1)")
    assert(count("graft_spec.bdst") == 25L)
    exec("OPTIMIZE TABLE graft_spec.bbuf")
    assert(count("graft_spec.bdst") == 26L)
    assert(count("graft_spec.bbuf") == 26L)
    // destination MVs fire on flushed blocks (a flush IS an insert)
    val sc = exec("SHOW CREATE TABLE graft_spec.bbuf")
      .collect().head.getString(0)
    assert(sc.contains("ENGINE = Buffer(graft_spec, bdst, 1, 10, 100, 10, 20,"), sc)
    intercept[Exception](exec(
      "CREATE TABLE graft_spec.bb (k Int64) ENGINE=Buffer(graft_spec, bdst, 1, 10)"))
  }

  test("Merge engine + merge() function union live members; INSERT refuses") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    Seq("m_one", "m_two", "m_three", "mface").foreach(t =>
      exec(s"DROP TABLE IF EXISTS graft_spec.$t SYNC"))
    exec("CREATE TABLE graft_spec.m_one (k Int64, v Int64) ENGINE=Memory")
    exec("CREATE TABLE graft_spec.m_two (k Int64, v Int64) ENGINE=Memory")
    exec("INSERT INTO graft_spec.m_one SELECT number, 1 FROM numbers(10)")
    exec("INSERT INTO graft_spec.m_two SELECT number, 2 FROM numbers(20)")
    exec("""CREATE TABLE graft_spec.mface (k Int64, v Int64)
            ENGINE=Merge(graft_spec, '^m_')""")
    assert(count("graft_spec.mface") == 30L)
    // a member created AFTER the face joins automatically
    exec("CREATE TABLE graft_spec.m_three (k Int64, v Int64) ENGINE=Memory")
    exec("INSERT INTO graft_spec.m_three VALUES (1, 3)")
    assert(count("graft_spec.mface") == 31L)
    // _table names the member each row came from
    val byTable = exec("""
      SELECT _table, count() AS n FROM graft_spec.mface
      GROUP BY _table ORDER BY _table""").collect()
    assert(byTable.map(r => r.getString(0) -> r.getLong(1)).toSeq ==
      Seq("m_one" -> 10L, "m_three" -> 1L, "m_two" -> 20L))
    // the merge() table function is the ad-hoc form
    assert(exec("SELECT count() AS n FROM merge(graft_spec, '^m_(one|two)$')")
      .collect().head.getLong(0) == 30L)
    val e = intercept[Exception](exec(
      "INSERT INTO graft_spec.mface VALUES (9, 9)"))
    assert(e.getMessage.contains("read-only"), e.getMessage)
    // regex must compile at CREATE
    intercept[Exception](exec(
      "CREATE TABLE graft_spec.mbad (k Int64) ENGINE=Merge(graft_spec, '[')"))
  }

  test("special engines refuse MergeTree layout clauses and survive restarts") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    intercept[Exception](exec(
      "CREATE TABLE graft_spec.nbad (k Int64) ENGINE=Null ORDER BY (k)"))
    // durable catalog: engineSpec persists across a simulated restart
    exec("DROP TABLE IF EXISTS graft_spec.perj SYNC")
    exec("""CREATE TABLE graft_spec.perj (k Int64, v String)
            ENGINE=Join(ANY, LEFT, k)""")
    exec("INSERT INTO graft_spec.perj VALUES (1, 'a')")
    graft.dialect.CatalogStore.simulateRestart(spark,
      Seq("graft_spec.perj"))
    // ANY dedupe still applies after restore (spec came back from disk)
    exec("INSERT INTO graft_spec.perj VALUES (1, 'DUP'), (2, 'b')")
    assert(count("graft_spec.perj") == 2L)
    assert(exec("SELECT joinGet('graft_spec.perj', 'v', 1) AS x")
      .collect().head.getString(0) == "a")
    val sc = exec("SHOW CREATE TABLE graft_spec.perj")
      .collect().head.getString(0)
    assert(sc.contains("ENGINE = Join(ANY, LEFT, k)"), sc)
  }
}
