package graft.queries

import graft.{Q, Tables}
import graft.Tables.{dec, ts}
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** Join tier (SURVEY.md §2.3 J1-J5). All equi-joins are Catalyst
  * built-ins; dimension sides are explicitly broadcast so the 100 TB
  * plan keeps the fact table shuffle-free where possible. ASOF join is
  * the one genuinely custom operator (operators/AsofJoin.scala).
  */
object Joins {

  val qs: Seq[Q] = Seq(

    // J1: 3-way inner equi-join + agg + top-k (TPC-H Q3 shape).
    // NO forced broadcasts: customer/orders scale with SF (at 100 TB a
    // broadcast() hint here would OOM executors), so join strategy is
    // left to Catalyst + AQE — it picks broadcast-hash at small SF and
    // shuffled joins when sides outgrow the threshold. Only fixed-size
    // dims (nation/region, 25/5 rows at ANY scale) get explicit
    // broadcast() in this repo (see g7_rollup).
    Q("j1_join3_tpch3", (s, dir) => {
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderdate") < ts("1999-06-01"))
      val l = Tables.load(s, dir, "lineitem").filter(col("l_shipdate") > ts("1996-03-05"))
      l.join(o.join(c, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        // revenue on exact scaled-long cents (see Tables.cents / g2):
        // identical values wherever decimal(18,4) represents the sum
        .agg((sum(Tables.cents(col("l_extendedprice")) *
            (lit(100L) - Tables.cents(col("l_discount"))))
          .cast("decimal(24,0)") / 10000)
          .cast("decimal(18,4)").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }, Some("""
      SELECT o_orderkey, o_orderdate,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1999-06-01'
        AND l_shipdate  > TIMESTAMP '1996-03-05'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""), bench = true),

    // J1b: LEFT OUTER — customers keep rows with zero orders
    Q("j1_left_join", (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")),

    // J1c: FULL OUTER over pre-aggregated sides
    Q("j1_full_join", (s, dir) => {
      val cn = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("nc"))
      val sn = Tables.load(s, dir, "supplier")
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("ns"))
      cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nk"),
          coalesce(col("nc"), lit(0L)).as("nc"),
          coalesce(col("ns"), lit(0L)).as("ns"))
        .orderBy("nk")
    }, Some("""
      SELECT coalesce(c_nationkey, s_nationkey) AS nk,
             coalesce(nc, 0) AS nc, coalesce(ns, 0) AS ns
      FROM (SELECT c_nationkey, count(*) AS nc FROM customer GROUP BY 1) c
      FULL JOIN (SELECT s_nationkey, count(*) AS ns FROM supplier GROUP BY 1) s
        ON c_nationkey = s_nationkey
      ORDER BY nk""")),

    // J2: CROSS JOIN
    Q("j2_cross", (s, dir) => {
      val r = Tables.load(s, dir, "region").select(col("r_name"))
      val n = Tables.load(s, dir, "nation").select(col("n_name"))
      r.crossJoin(n).orderBy("r_name", "n_name")
    }, Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""")),

    // J3: theta join (equi on region + inequality on key)
    Q("j3_theta", (s, dir) => {
      val n = Tables.load(s, dir, "nation")
      val n1 = n.select(col("n_nationkey").as("a"), col("n_regionkey").as("ra"))
      val n2 = n.select(col("n_nationkey").as("b"), col("n_regionkey").as("rb"))
      n1.join(n2, col("ra") === col("rb") && col("a") < col("b"))
        .select(col("ra").as("rk"), col("a"), col("b"))
        .orderBy("rk", "a", "b")
    }, Some("""
      SELECT n1.n_regionkey AS rk, n1.n_nationkey AS a, n2.n_nationkey AS b
      FROM nation n1 JOIN nation n2
        ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
      ORDER BY rk, a, b""")),

    // J4: LEFT SEMI (EXISTS)
    Q("j4_semi", (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey")).orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey""")),

    // J4b: LEFT ANTI (NOT EXISTS)
    Q("j4_anti", (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey")).orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey""")),

    // J1d: 5-way star join (TPC-H Q5 shape) — fixed-size dims
    // broadcast, fact tables left to AQE
    Q("j6_join5_tpch5", (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey").isNotNull)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        // scaled-long cents revenue (see Tables.cents / g2)
        .agg((sum(Tables.cents(col("l_extendedprice")) *
            (lit(100L) - Tables.cents(col("l_discount"))))
          .cast("decimal(24,0)") / 10000)
          .cast("decimal(18,4)").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }, Some("""
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // J5: ASOF join — for each purchase, latest click at-or-before it by
    // the same user (custom operator, single keyed shuffle)
    Q("j5_asof", (s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"))
      AsofJoin(purchases, clicks, Seq("user_id"), "ts", "ts", rightPrefix = "c_")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("c_click_id").as("click_id"), col("c_ts").as("click_ts"))
        .orderBy("event_id")
    }, Some("""
      SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
             c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""), bench = true),

    // J5b: forward ASOF — nearest FOLLOWING click per purchase
    // (ClickHouse `ASOF JOIN ... ON l.ts <= r.ts` form)
    Q("j5b_asof_forward", (s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"))
      AsofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          rightPrefix = "c_", forward = true)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("c_click_id").as("click_id"), col("c_ts").as("click_ts"))
        .orderBy("event_id")
    }, Some("""
      SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
             c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.event_id""")),

    // J7: ClickHouse ANY LEFT JOIN — at most one right row per left
    // row. ClickHouse's pick is arbitrary; the engine (Ddl.scala
    // rewriteAnyJoin) picks the deterministic least full row per key,
    // which here = min o_orderkey (first, unique column) — the oracle
    // encodes the same pick. One keyed shuffle of the right side only.
    Q("j7_any_join", (s, dir) => {
      graft.dialect.ChContext.setup(s, dir)
      graft.dialect.Engine.execute(s, """
        SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
               o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice
        FROM customer c
        ANY LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        ORDER BY c_custkey LIMIT 200""")
    }, Some("""
      SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
             o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice
      FROM customer c
      LEFT JOIN (SELECT * FROM (SELECT *, row_number() OVER
                   (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
                 FROM orders) WHERE rn = 1) o
        ON c.c_custkey = o.o_custkey
      ORDER BY c_custkey LIMIT 200""")),

    // J8: ASOF JOIN spelled in SQL (the dialect route to the J5
    // operator, Ddl.scala rewriteAsofJoin): subquery sides flatten to
    // views, the ON clause splits into equi-keys + the one inequality,
    // and alias-qualified refs remap onto the operator's output.
    Q("j8_asof_sql", (s, dir) => {
      graft.dialect.ChContext.setup(s, dir)
      graft.dialect.Engine.execute(s, """
        SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
               c.click_id AS click_id, c.ts AS click_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id
                        FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY event_id""")
    }, Some("""
      SELECT p.event_id AS event_id, p.user_id AS user_id,
             CAST(p.ts AS TIMESTAMP) AS ts,
             c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))
  )
}
