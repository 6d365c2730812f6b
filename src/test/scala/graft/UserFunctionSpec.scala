package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect.{CatalogStore, Engine, UserFunctions}

/** SQL-defined UDFs (`CREATE FUNCTION name AS (args) -> expr`):
  * macro expansion at the call site, catalog persistence, and the
  * system.functions face. */
class UserFunctionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exec(q: String) = Engine.execute(spark, q)

  test("create, call (multi-arg, nested, precedence), drop") {
    exec("DROP FUNCTION IF EXISTS uf_lin")
    exec("CREATE FUNCTION uf_lin AS (x, k, b) -> k * x + b")
    val r = exec("""
      SELECT uf_lin(number, 10, 5) AS y,
             uf_lin(uf_lin(number, 2, 0), 3, 1) AS nested,
             uf_lin(number + 1, 2, 0) AS prec
      FROM numbers(3) ORDER BY y""").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(5L, 15L, 25L))
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 7L, 13L))
    // precedence: k * (x) with x = number + 1, never k * number + 1
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 4L, 6L))
    exec("DROP FUNCTION uf_lin")
    intercept[Exception](exec("SELECT uf_lin(1, 2, 3)"))
    exec("DROP FUNCTION IF EXISTS uf_lin") // IF EXISTS: silent
  }

  test("single bare parameter and zero-argument lambdas") {
    exec("DROP FUNCTION IF EXISTS uf_sq")
    exec("DROP FUNCTION IF EXISTS uf_half")
    exec("CREATE FUNCTION uf_sq AS x -> x * x")
    exec("CREATE FUNCTION uf_half AS () -> 0.5")
    val r = exec(
      "SELECT uf_sq(number) AS s, uf_half() AS h FROM numbers(4) ORDER BY s")
      .collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 4L, 9L))
    assert(r.head.getDecimal(1).doubleValue() == 0.5)
    exec("DROP FUNCTION uf_sq")
    exec("DROP FUNCTION uf_half")
  }

  test("definition errors: duplicate, builtin collision, bad arity, recursion") {
    exec("DROP FUNCTION IF EXISTS uf_dup")
    exec("CREATE FUNCTION uf_dup AS (x) -> x + 1")
    intercept[Exception](exec("CREATE FUNCTION uf_dup AS (x) -> x + 2"))
    // IF NOT EXISTS keeps the FIRST definition
    exec("CREATE FUNCTION IF NOT EXISTS uf_dup AS (x) -> x + 100")
    assert(exec("SELECT uf_dup(1) AS v").collect().head.getInt(0) == 2)
    intercept[Exception](exec("CREATE FUNCTION lower AS (x) -> x"))
    intercept[Exception](exec("SELECT uf_dup(1, 2) AS v"))
    // mutual recursion must error out, not hang
    exec("DROP FUNCTION IF EXISTS uf_a")
    exec("DROP FUNCTION IF EXISTS uf_b")
    exec("CREATE FUNCTION uf_a AS (x) -> uf_b(x) + 1")
    exec("CREATE FUNCTION uf_b AS (x) -> uf_a(x) + 1")
    val e = intercept[Exception](exec("SELECT uf_a(1) AS v"))
    assert(e.getMessage.contains("recursive"))
    // DIRECT self-recursion re-matches inside its own expansion (the
    // round counter alone never fires) — the substitution cap must
    // turn it into an error, not a hang
    exec("DROP FUNCTION IF EXISTS uf_self")
    exec("CREATE FUNCTION uf_self AS (x) -> uf_self(x) + 1")
    val e2 = intercept[Exception](exec("SELECT uf_self(1) AS v"))
    assert(e2.getMessage.contains("recursive"))
    Seq("uf_dup", "uf_a", "uf_b", "uf_self")
      .foreach(f => exec(s"DROP FUNCTION $f"))
  }

  test("CREATE OR REPLACE FUNCTION swaps the definition in place") {
    exec("DROP FUNCTION IF EXISTS uf_rep")
    exec("CREATE FUNCTION uf_rep AS (x) -> x + 1")
    assert(exec("SELECT uf_rep(1) AS v").collect().head.getInt(0) == 2)
    exec("CREATE OR REPLACE FUNCTION uf_rep AS (x) -> x * 10")
    assert(exec("SELECT uf_rep(1) AS v").collect().head.getInt(0) == 10)
    // still refuses builtin names even with OR REPLACE
    intercept[Exception](exec("CREATE OR REPLACE FUNCTION lower AS (x) -> x"))
    // a MALFORMED replacement must leave the old definition intact
    // (validation before mutation — ClickHouse semantics)
    intercept[Exception](exec("CREATE OR REPLACE FUNCTION uf_rep AS x + 1"))
    assert(exec("SELECT uf_rep(1) AS v").collect().head.getInt(0) == 10,
      "a failed OR REPLACE must not destroy the existing function")
    exec("DROP FUNCTION uf_rep")
  }

  test("string literals are never expanded; params don't touch strings") {
    exec("DROP FUNCTION IF EXISTS uf_tag")
    exec("CREATE FUNCTION uf_tag AS (x) -> concat('x=(', toString(x), ')')")
    val r = exec(
      "SELECT uf_tag(7) AS a, 'uf_tag(9)' AS lit").collect().head
    assert(r.getString(0) == "x=(7)")
    assert(r.getString(1) == "uf_tag(9)", "calls inside strings must not expand")
    exec("DROP FUNCTION uf_tag")
  }

  test("backslash-escaped quote in a literal doesn't desync the mask") {
    exec("DROP FUNCTION IF EXISTS uf_esc")
    exec("CREATE FUNCTION uf_esc AS (x) -> x * 3")
    // the \' inside the literal must not flip string state: the literal
    // mentioning uf_esc(y) stays verbatim, the REAL call after it expands
    val r = exec(
      """SELECT 'don\'t call uf_esc(9)' AS lit, uf_esc(7) AS v""")
      .collect().head
    assert(r.getString(0) == "don't call uf_esc(9)",
      "literal with \\' must survive expansion untouched")
    assert(r.getInt(1) == 21, "the real call after the \\' literal must expand")
    // doubled-quote form too
    val r2 = exec(
      """SELECT 'it''s uf_esc(1)' AS lit, uf_esc(2) AS v""").collect().head
    assert(r2.getString(0) == "it's uf_esc(1)")
    assert(r2.getInt(1) == 6)
    exec("DROP FUNCTION uf_esc")
  }

  test("parameters substitute simultaneously — no argument capture") {
    exec("DROP FUNCTION IF EXISTS uf_cap")
    exec("CREATE FUNCTION uf_cap AS (x, k) -> k * x")
    exec("CREATE DATABASE IF NOT EXISTS graft_t")
    exec("DROP TABLE IF EXISTS graft_t.ufcap")
    exec("CREATE TABLE graft_t.ufcap (k Int64) ENGINE=Memory")
    exec("INSERT INTO graft_t.ufcap SELECT number FROM numbers(4)")
    // f(k, 2): x:=column k, k:=2 — sequential substitution would capture
    // the substituted column k and produce (2)*((2))=4 for every row;
    // simultaneous substitution yields 2*k = 0,2,4,6
    val r = exec(
      "SELECT uf_cap(k, 2) AS v FROM graft_t.ufcap ORDER BY v").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 6L),
      "argument containing a later parameter's name must not be re-substituted")
    // swapped order as well: f(2, k) = k*2 — same values, proves both slots
    val r2 = exec(
      "SELECT uf_cap(2, k) AS v FROM graft_t.ufcap ORDER BY v").collect()
    assert(r2.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 6L))
    exec("DROP FUNCTION uf_cap")
    exec("DROP TABLE IF EXISTS graft_t.ufcap")
  }

  test("system.functions lists UDFs with origin SQLUserDefined") {
    exec("DROP FUNCTION IF EXISTS uf_vis")
    exec("CREATE FUNCTION uf_vis AS (x) -> x")
    val rows = exec("""
      SELECT name, is_aggregate, origin FROM system.functions
      WHERE name = 'uf_vis'""").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSeq == Seq(("uf_vis", 0, "SQLUserDefined")))
    // builtins carry origin System
    assert(exec("""
      SELECT origin FROM system.functions WHERE name = 'toString'""")
      .collect().head.getString(0) == "System")
    exec("DROP FUNCTION uf_vis")
    assert(exec("""
      SELECT count() AS n FROM system.functions WHERE name = 'uf_vis'""")
      .collect().head.getLong(0) == 0L)
  }

  test("UDFs persist across a restart (durable catalog)") {
    exec("DROP FUNCTION IF EXISTS uf_keep")
    exec("CREATE FUNCTION uf_keep AS (x, y) -> greatest(x, y) * 2")
    CatalogStore.simulateRestart(spark, Nil, udfs = Seq("uf_keep"))
    assert(!UserFunctions.exists("uf_keep"), "forgotten in memory")
    // first engine statement of the 'fresh JVM' restores the catalog
    assert(exec("SELECT uf_keep(3, 4) AS v").collect().head.getAs[Number](0).longValue == 8L)
    exec("DROP FUNCTION uf_keep")
    // the drop persists too: restart must NOT resurrect it
    CatalogStore.simulateRestart(spark, Nil, udfs = Seq("uf_keep"))
    intercept[Exception](exec("SELECT uf_keep(1, 2) AS v"))
  }

  test("UDFs work inside DDL-adjacent paths (ALTER UPDATE expr + condition)") {
    exec("CREATE DATABASE IF NOT EXISTS graft_t")
    exec("DROP TABLE IF EXISTS graft_t.uft")
    exec("CREATE TABLE graft_t.uft (k Int64, v Int64) ENGINE=Memory")
    exec("INSERT INTO graft_t.uft SELECT number, number FROM numbers(10)")
    exec("DROP FUNCTION IF EXISTS uf_big")
    exec("DROP FUNCTION IF EXISTS uf_double")
    exec("CREATE FUNCTION uf_big AS (x) -> x >= 5")
    exec("CREATE FUNCTION uf_double AS (x) -> x * 2")
    exec("ALTER TABLE graft_t.uft UPDATE v = uf_double(v) WHERE uf_big(k)")
    val r = exec("SELECT sum(v) AS s FROM graft_t.uft").collect().head.getLong(0)
    // 0..4 unchanged (sum 10) + 5..9 doubled (sum 70) = 80
    assert(r == 80L)
    exec("DROP FUNCTION uf_big")
    exec("DROP FUNCTION uf_double")
    exec("DROP TABLE IF EXISTS graft_t.uft")
  }
}
