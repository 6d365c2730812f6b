package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine}

/** AggregatingMergeTree: AggregateFunction(fn, T) columns store
  * partial states in the -State representation; FINAL merges them
  * on read, OPTIMIZE ... FINAL materializes the merge, and the
  * -Merge combinators finalize — ClickHouse's pre-aggregation
  * engine (reference surface main.py:190 via chdb). */
class AggregatingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exec(q: String) = Engine.execute(spark, q)

  test("FINAL merges count/sum/min/max states per sorting key") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.agx SYNC")
    exec("""
      CREATE TABLE graft_spec.agx (
        k Int64,
        c AggregateFunction(count, UInt64),
        s AggregateFunction(sum, Int64),
        lo AggregateFunction(min, Int64),
        hi AggregateFunction(max, Int64))
      ENGINE=AggregatingMergeTree() ORDER BY (k)""")
    // two INSERT batches = two partial rows per key
    exec("""
      INSERT INTO graft_spec.agx
      SELECT number % 2, countState(), sumState(toInt64(number)),
             minState(toInt64(number)), maxState(toInt64(number))
      FROM numbers(10) GROUP BY number % 2""")
    exec("""
      INSERT INTO graft_spec.agx
      SELECT number % 2, countState(), sumState(toInt64(number)),
             minState(toInt64(number)), maxState(toInt64(number))
      FROM numbers(10, 10) GROUP BY number % 2""")
    assert(exec("SELECT count() AS n FROM graft_spec.agx")
      .collect().head.getLong(0) === 4L)
    // FINAL on read: one merged row per key
    val fin = exec("""
      SELECT k, countMerge(c) AS n, sumMerge(s) AS sm,
             minMerge(lo) AS mn, maxMerge(hi) AS mx
      FROM graft_spec.agx FINAL GROUP BY k ORDER BY k""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // numbers 0..19 split by parity: evens 0,2,..,18; odds 1,3,..,19
    assert(fin === Seq((0L, 10L, 90L, 0L, 18L), (1L, 10L, 100L, 1L, 19L)))
    // the row count under FINAL collapses to the key count
    assert(exec("SELECT count() AS n FROM graft_spec.agx FINAL")
      .collect().head.getLong(0) === 2L)
    // OPTIMIZE FINAL materializes the same merge
    exec("OPTIMIZE TABLE graft_spec.agx FINAL")
    assert(exec("SELECT count() AS n FROM graft_spec.agx")
      .collect().head.getLong(0) === 2L)
    val opt = exec("""
      SELECT k, countMerge(c) AS n, sumMerge(s) AS sm
      FROM graft_spec.agx GROUP BY k ORDER BY k""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(opt === Seq((0L, 10L, 90L), (1L, 10L, 100L)))
    exec("DROP TABLE graft_spec.agx SYNC")
  }

  test("avg and uniq states merge (struct partial / HLL sketch union)") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.agu SYNC")
    exec("""
      CREATE TABLE graft_spec.agu (
        k Int64,
        a AggregateFunction(avg, Int64),
        u AggregateFunction(uniq, Int64))
      ENGINE=AggregatingMergeTree() ORDER BY (k)""")
    // overlapping batches: uniq must union, not sum
    exec("""
      INSERT INTO graft_spec.agu
      SELECT 1, avgState(toInt64(number)), uniqState(number)
      FROM numbers(100)""")
    exec("""
      INSERT INTO graft_spec.agu
      SELECT 1, avgState(toInt64(number)), uniqState(number)
      FROM numbers(50, 100)""")
    exec("OPTIMIZE TABLE graft_spec.agu FINAL")
    assert(exec("SELECT count() AS n FROM graft_spec.agu")
      .collect().head.getLong(0) === 1L)
    val r = exec("""
      SELECT avgMerge(a) AS av, uniqMerge(u) AS uq
      FROM graft_spec.agu""").collect().head
    // avg of 0..99 and 50..149 concatenated = (4950 + 9950) / 200
    assert(math.abs(r.getDouble(0) - 74.5) < 1e-9, r.getDouble(0))
    // 0..149 distinct = 150, HLL estimate within 5%
    assert(math.abs(r.getLong(1) - 150L) <= 8, r.getLong(1))
    exec("DROP TABLE graft_spec.agu SYNC")
  }

  test("SHOW CREATE/DESCRIBE render AggregateFunction; catalog restores it") {
    exec("CREATE DATABASE IF NOT EXISTS graft_spec")
    exec("DROP TABLE IF EXISTS graft_spec.agd SYNC")
    exec("""
      CREATE TABLE graft_spec.agd (
        k Int64, s AggregateFunction(sum, Int64))
      ENGINE=AggregatingMergeTree() ORDER BY (k)""")
    val stmt = exec("SHOW CREATE TABLE graft_spec.agd")
      .collect().head.getString(0)
    assert(stmt.contains("ENGINE = AggregatingMergeTree()"), stmt)
    assert(stmt.contains("AggregateFunction(sum, Int64)"), stmt)
    val de = exec("DESCRIBE graft_spec.agd").collect()
      .find(_.getString(0) == "s").get.getString(1)
    assert(de === "AggregateFunction(sum, Int64)", de)
    exec("""
      INSERT INTO graft_spec.agd
      SELECT number % 3, sumState(toInt64(number)) FROM numbers(9)
      GROUP BY number % 3""")
    // restart: the engine's merge behavior must survive
    CatalogStore.simulateRestart(spark, Seq("graft_spec.agd"))
    exec("""
      INSERT INTO graft_spec.agd
      SELECT number % 3, sumState(toInt64(number)) FROM numbers(9)
      GROUP BY number % 3""")
    val fin = exec("""
      SELECT k, sumMerge(s) AS sm FROM graft_spec.agd FINAL
      GROUP BY k ORDER BY k""").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 0+3+6=9, 1+4+7=12, 2+5+8=15, doubled by the two batches
    assert(fin === Seq((0L, 18L), (1L, 24L), (2L, 30L)))
    assert(exec("SELECT count() AS n FROM graft_spec.agd FINAL")
      .collect().head.getLong(0) === 3L)
    // an unsupported state family refuses at CREATE
    val e = intercept[Exception](exec("""
      CREATE TABLE graft_spec.agd2 (
        k Int64, q AggregateFunction(quantile, Float64))
      ENGINE=AggregatingMergeTree() ORDER BY (k)"""))
    assert(e.getMessage.contains("not supported"), e.getMessage)
    exec("DROP TABLE graft_spec.agd SYNC")
  }
}
