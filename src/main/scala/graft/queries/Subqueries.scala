package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated / quantified subquery tier (SURVEY.md §2.2 P7 extension).
  *
  * The reference exercises scalar correlated subqueries through its SQL
  * surface (chdb executes full ClickHouse SQL; p7_ch_subquery covers the
  * dialect path). This batch evidences the ANSI subquery family TPC-H
  * leans on — correlated scalar-agg in WHERE (Q17), correlated EXISTS
  * with a non-equi outer reference (Q4), EXISTS + NOT EXISTS chained on
  * the same fact table (Q21), uncorrelated scalar + NOT EXISTS (Q22),
  * IN over a grouped HAVING subquery (Q18), null-aware NOT IN, and a
  * LATERAL derived table.
  *
  * Spark-first: each is declared as SQL and Catalyst decorrelates —
  * scalar aggs become an aggregate + (broadcast/shuffle) left outer
  * join on the correlation key, EXISTS/IN become left-semi joins,
  * NOT EXISTS/NOT IN become left-anti (null-aware for NOT IN). At
  * 100 TB every one of these is a keyed join on the fact table's own
  * key — no per-row re-execution, no nested loops (asserted by
  * SubquerySpec's plan checks).
  *
  * Numeric discipline matches Relational.scala: scalar thresholds that
  * gate row membership are computed as round(decimal-sum / count, 6) on
  * BOTH sides, so the admitted row set is engine-independent.
  */
object Subqueries {

  /** Run plain Spark SQL with the fixture tables registered as views.
    * Oracle text is identical — the SQL is in the ANSI intersection of
    * Spark and DuckDB. */
  private def sql(views: String*)(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      views.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(q)
    }

  private val q17 = """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * round(CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6)
        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)"""

  // ---- Spark-side scaled-long forks (r16, see TpchShapes) ---------
  // Oracle keeps the original decimal texts; Spark sums exact cents
  // LONGS and rescales once per group. DOUBLE conversions of long sums
  // < 2^53 round identically to the old decimal->double casts, so the
  // admitted row sets and outputs are value-identical (oracle-gated).
  private val q17spark = """
    SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * round(CAST(sum(CAST(round(l2.l_quantity * 100) AS BIGINT)) AS DOUBLE)
                           / 100.0 / count(*), 6)
        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)"""

  private val q18spark = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DECIMAL(12,2)) AS price,
           CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DECIMAL(20,0)) / 100
                AS DECIMAL(18,2)) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 20000)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY price DESC, o_orderkey LIMIT 20"""

  private val lateralSpark = """
    SELECT o_orderkey, t.max_price, t.n_lines
    FROM orders,
    LATERAL (SELECT CAST(CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DECIMAL(14,0)) / 100
                         AS DECIMAL(12,2)) AS max_price,
                    count(*) AS n_lines
             FROM lineitem WHERE l_orderkey = o_orderkey) AS t
    ORDER BY o_orderkey LIMIT 200"""

  private val q4 = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val q22 = """
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY c_nationkey ORDER BY c_nationkey"""

  private val q18 = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DECIMAL(12,2)) AS price,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 200)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY price DESC, o_orderkey LIMIT 20"""

  private val q21 = """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders      ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10"""

  private val notin = """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    ORDER BY c_custkey"""

  private val lateral = """
    SELECT o_orderkey, t.max_price, t.n_lines
    FROM orders,
    LATERAL (SELECT max(CAST(l_extendedprice AS DECIMAL(12,2))) AS max_price,
                    count(*) AS n_lines
             FROM lineitem WHERE l_orderkey = o_orderkey) AS t
    ORDER BY o_orderkey LIMIT 200"""

  val qs: Seq[Q] = Seq(
    // P12 / TPC-H Q17: correlated scalar agg in WHERE. Decorrelates to
    // per-partkey aggregate + join — one pass over lineitem, not one
    // subquery execution per row.
    Q("p12_scalar_subq_q17", sql("lineitem", "part")(q17spark), Some(q17), bench = true),

    // P13 / TPC-H Q4: correlated EXISTS whose inner predicate references
    // the outer row non-equally (l_shipdate > o_orderdate) → left-semi
    // join with a residual condition.
    Q("p13_exists_q4", sql("orders", "lineitem")(q4), Some(q4)),

    // P14 / TPC-H Q22: uncorrelated scalar threshold + NOT EXISTS →
    // left-anti join; the scalar is a one-row broadcast.
    Q("p14_notexists_q22", sql("customer", "orders")(q22), Some(q22)),

    // P15 / TPC-H Q18: IN over a grouped-HAVING subquery → left-semi
    // join against the aggregated key set.
    Q("p15_in_having_q18", sql("customer", "orders", "lineitem")(q18spark), Some(q18)),

    // P16 / TPC-H Q21: EXISTS and NOT EXISTS chained on the same fact
    // table with inequality correlation — the hardest decorrelation
    // shape in TPC-H (semi + anti join on l_orderkey).
    Q("p18_exists_chain_q21", sql("supplier", "lineitem", "orders")(q21), Some(q21), bench = true),

    // P17: null-aware NOT IN (fixture keys are non-null, so Spark's
    // NullAwareAntiJoin and a plain anti-join agree — semantics still
    // exercised through the null-aware operator).
    Q("p16_notin_nullaware", sql("customer", "orders")(notin), Some(notin)),

    // P19: LATERAL derived table — correlated scalar aggregates exposed
    // as join columns; Catalyst plans it as the same decorrelated
    // aggregate + left outer join as a scalar subquery pair.
    Q("p17_lateral_subq", sql("orders", "lineitem")(lateralSpark), Some(lateral))
  )
}
