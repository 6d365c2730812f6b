package graft.queries

import graft.{Q, Tables}
import graft.Tables.dec
import org.apache.spark.sql.functions._

/** Scale-technique evidence: bucketed co-located joins (SURVEY §4 /
  * the 100 TB brief: "co-locate joins via bucketing"). Both fact
  * tables are written bucketed+sorted on the join key; the join then
  * runs with NO exchange on either side (asserted in BucketingSpec) —
  * at 100 TB this removes the dominant shuffle of every
  * orders⋈lineitem query.
  */
object ScaleOps {

  /** Idempotently create bucketed copies of orders/lineitem. */
  def ensureBucketed(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    s.sql("CREATE DATABASE IF NOT EXISTS graft_b")
    val marker = s"graft_b_${dir.replaceAll("[^a-z0-9]", "_")}"
    if (!s.catalog.tableExists("graft_b.orders_b") ||
        s.conf.getOption(marker).isEmpty) {
      s.sql("DROP TABLE IF EXISTS graft_b.orders_b")
      s.sql("DROP TABLE IF EXISTS graft_b.lineitem_b")
      graft.dialect.Ddl.cleanOrphanLocation(s, "graft_b.orders_b")
      graft.dialect.Ddl.cleanOrphanLocation(s, "graft_b.lineitem_b")
      Tables.load(s, dir, "orders").write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").mode("overwrite").saveAsTable("graft_b.orders_b")
      Tables.load(s, dir, "lineitem").write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").mode("overwrite").saveAsTable("graft_b.lineitem_b")
      s.conf.set(marker, "1")
    }
  }

  /** Two-phase (salted) aggregation: phase 1 aggregates on
    * (key, salt) — splitting any hot key across `salts` reducers —
    * phase 2 merges partials per key. Result is identical to the
    * direct aggregate (the oracle), cost is one extra small shuffle;
    * at 100 TB this is the standard fix when one key holds a double-
    * digit share of rows and a plain groupBy stalls on one task. */
  def saltedAgg(df: org.apache.spark.sql.DataFrame, key: String,
                valueCol: String, saltFrom: String,
                salts: Int): org.apache.spark.sql.DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      // scaled-long cents partials (see Tables.cents / g2): long adds
      // in both phases, one rescale at the end — identical values
      .agg(count(lit(1)).as("__n"),
        sum(graft.Tables.cents(col(valueCol))).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"),
        (sum(col("__s")).cast("decimal(20,0)") / 100)
          .cast("decimal(18,4)").as("sum_value"))

  val qs: Seq[Q] = Seq(

    // G10: salted two-phase aggregation — same answer as the direct
    // groupBy, skew-immune plan
    Q("g10_salted_agg", (s, dir) => {
      saltedAgg(Tables.events(s, dir), "event_type", "value",
          saltFrom = "event_id", salts = 16)
        .orderBy("event_type")
    }, Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // S5b: co-located join over bucketed tables — same result as the
    // plain join, zero join-side shuffles in the plan
    Q("s5_bucketed_join", (s, dir) => {
      ensureBucketed(s, dir)
      s.table("graft_b.orders_b")
        .join(s.table("graft_b.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          // scaled-long cents sum (see Tables.cents / g2)
          (sum(graft.Tables.cents(col("l_extendedprice"))).cast("decimal(20,0)") / 100)
            .cast("decimal(18,2)").as("sum_price"))
        .orderBy("o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_price
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))
  )
}
