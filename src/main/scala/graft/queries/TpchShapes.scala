package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Remaining TPC-H-representative relational shapes, adapted to the
  * fixture's columns (lineitem has no shipmode/receiptdate family).
  * Each exercises a distinct optimizer feature the reference gets for
  * free from ClickHouse and this engine must get from Catalyst:
  *
  *  - Q7: dimension self-join (nation twice) with a disjunctive
  *    cross-table predicate — join-order + broadcast selection.
  *  - Q10: 4-way fact join with top-k on aggregated revenue —
  *    TakeOrderedAndProject over partial aggregation.
  *  - Q14: conditional-aggregate ratio — single scan, no self-join.
  *  - Q19: OR-of-ANDs mixing both join sides — CNF extraction should
  *    still push the per-table residuals (brand IN set, size/qty
  *    bounds) into the scans rather than filtering post-join only.
  *
  * SQL is in the Spark/DuckDB ANSI intersection; the oracle text is
  * identical. Numeric discipline per Relational.scala: decimal sums,
  * one rounded double division for ratios.
  */
object TpchShapes {

  private def sql(views: String*)(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      views.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(q)
    }

  private val q7 = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DECIMAL(18,4)) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  private val q10 = """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  private val q14 = """
    SELECT round(100.0 *
             CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                           ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
           6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'"""

  private val q19 = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""

  // ---- Spark-side scaled-long forks (r16) -------------------------
  // The oracle keeps the original decimal texts above; Spark runs these
  // value-identical rewrites where every money sum is a LONG over
  // exact e2/e4 scaled integers (Tables.cents semantics, proven on g2
  // in r15 §A): round(x*100) recovers exact cents of the 2-decimal
  // fixtures, v4 = cents_price * (100 - cents_disc) is exactly
  // 1e4 * price*(1-disc), and the one rescale per GROUP —
  // CAST(sum AS DECIMAL(24,0)) / 10000 cast back to the DECLARED
  // decimal type — is exact wherever the declared output is
  // representable. DOUBLE ratio columns convert the exact long sum
  // with the same single rounding as the old decimal->double cast
  // (long sums < 2^53, same domain argument as g2's avg columns).
  // Schemas (names + types) are byte-identical to the oracle's.
  private val centsRevenue =
    """CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))"""

  private val q7spark = s"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(sum(v4) AS DECIMAL(24,0)) / 10000 AS DECIMAL(18,4)) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             $centsRevenue AS v4
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  private val q10spark = s"""
    SELECT c_custkey, c_name,
           CAST(CAST(sum($centsRevenue) AS DECIMAL(24,0)) / 10000
                AS DECIMAL(18,4)) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  private val q14spark = s"""
    SELECT round(100.0 *
             (CAST(sum(CASE WHEN p_type = 'PROMO' THEN $centsRevenue
                            ELSE 0 END) AS DOUBLE) / 10000.0)
             / (CAST(sum($centsRevenue) AS DOUBLE) / 10000.0),
           6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'"""

  private val q19spark = s"""
    SELECT CAST(CAST(sum($centsRevenue) AS DECIMAL(24,0)) / 10000
                AS DECIMAL(18,4)) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""

  private val q15spark = s"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(sum($centsRevenue) AS DECIMAL(24,0)) / 10000
                  AS DECIMAL(18,4)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  private val q13 = """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  private val q15 = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  private val q16 = """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 9, 14, 23)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size"""

  private val q20 = """
    SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > (
        SELECT 0.5 * round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                           / count(*), 6)
        FROM lineitem) * 2)
    ORDER BY s_suppkey"""

  val qs: Seq[Q] = Seq(
    // Spark runs the scaled-long forks (see centsRevenue above); the
    // DuckDB oracle keeps the original shared decimal text — results
    // are value- and schema-identical, gated per round.
    Q("j9_volume_q7", sql("supplier", "lineitem", "orders", "customer", "nation")(q7spark),
      Some(q7), bench = true),
    Q("j10_returns_q10", sql("customer", "orders", "lineitem", "nation")(q10spark), Some(q10)),
    Q("g17_promo_ratio_q14", sql("lineitem", "part")(q14spark), Some(q14)),
    Q("p19_or_of_ands_q19", sql("lineitem", "part")(q19spark), Some(q19), bench = true),

    // Q13: outer-join histogram — customers keep their zero-order rows
    // through an ON-clause residual filter, then a second aggregation
    // over the aggregate (two exchanges, both keyed).
    Q("j11_custdist_q13", sql("customer", "orders")(q13), Some(q13)),

    // Q15: CTE reused twice (revenue per supplier + its max) with a
    // scalar-subquery equality — exact-decimal revenue so the max
    // comparison is engine-independent.
    Q("g18_top_supplier_q15", sql("supplier", "lineitem")(q15spark), Some(q15)),

    // Q16: count-distinct suppliers per (brand,size) with a NOT IN
    // blocklist — null-aware anti join feeding a distinct aggregate.
    Q("g19_supplier_cnt_q16", sql("part", "lineitem", "supplier")(q16), Some(q16)),

    // Q20: IN over a grouped-HAVING subquery whose threshold is itself
    // an uncorrelated scalar aggregate (deterministic round(dec/cnt)).
    Q("p20_excess_supp_q20", sql("supplier", "lineitem")(q20), Some(q20))
  )
}
