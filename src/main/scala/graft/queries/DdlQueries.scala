package graft.queries

import graft.Q
import graft.dialect.{ChContext, Engine}

/** DDL + catalog evidence (SURVEY.md §2.1 S3-S5): Memory/MergeTree
  * table lifecycle driven end-to-end with ClickHouse statements.
  * Oracles are static VALUES / direct-over-parquet equivalents.
  */
object DdlQueries {

  val qs: Seq[Q] = Seq(

    // S3+S5: Memory-engine table, INSERT VALUES + INSERT SELECT
    // (test_suite.py:311-314 lifecycle)
    Q("s3_ddl_memory", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.kv")
      Engine.execute(s,
        "CREATE TABLE graft_t.kv (id UInt32, name String) ENGINE=Memory")
      Engine.execute(s, "INSERT INTO graft_t.kv VALUES (1, 'one'), (2, 'two')")
      Engine.execute(s,
        "INSERT INTO graft_t.kv SELECT number + 10, toString(number) FROM numbers(3)")
      Engine.execute(s, "SELECT id, name FROM graft_t.kv ORDER BY id")
    }, Some("""
      SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (10, '0'), (11, '1'), (12, '2'))
        t(id, name) ORDER BY id""")),

    // S4+S5: MergeTree with PARTITION BY toYYYYMM (test.yml:49 shape);
    // the partition expr materializes as the `_part` column so pruning
    // fires (see DdlSpec's PartitionFilters assertion)
    Q("s4_ddl_mergetree", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.ord")
      Engine.execute(s, """
        CREATE TABLE graft_t.ord (
          o_orderkey Int64, o_totalprice Float64, o_orderdate DateTime)
        ENGINE=MergeTree() PARTITION BY toYYYYMM(o_orderdate)
        ORDER BY (o_orderkey) SETTINGS index_granularity=8192""")
      Engine.execute(s, """
        INSERT INTO graft_t.ord
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders""")
      Engine.execute(s, """
        SELECT _part AS ym, count() AS n,
               sum(CAST(o_totalprice AS Decimal(12,2))) AS sum_price
        FROM graft_t.ord GROUP BY ym ORDER BY ym""")
    }, Some("""
      SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT) AS ym,
             count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_price
      FROM orders GROUP BY 1 ORDER BY ym""")),

    // S4: SAMPLE BY key + SAMPLE k read — the deterministic keyed
    // subset (pmod(key,1000) < k*1000), reproduced verbatim by DuckDB
    Q("s6_sample_by", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.sord")
      Engine.execute(s, """
        CREATE TABLE graft_t.sord (
          o_orderkey Int64, o_custkey Int64, o_totalprice Float64)
        ENGINE=MergeTree() ORDER BY (o_orderkey) SAMPLE BY o_custkey""")
      Engine.execute(s, """
        INSERT INTO graft_t.sord
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders""")
      Engine.execute(s, """
        SELECT count() AS n,
               sum(CAST(o_totalprice AS Decimal(14,2))) AS sp
        FROM graft_t.sord SAMPLE 0.25""")
    }, Some("""
      SELECT count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS sp
      FROM orders WHERE o_custkey % 1000 < 250""")),

    // S3+P5: Enum8 / LowCardinality / UUID / Bool column types land as
    // their SURVEY §1.2 mappings and round-trip values
    Q("s7_ddl_enum", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.et")
      Engine.execute(s, """
        CREATE TABLE graft_t.et (
          id UInt32, status Enum8('new' = 1, 'done' = 2, 'failed' = 3),
          tag LowCardinality(String), uid UUID, ok Bool) ENGINE=Memory""")
      Engine.execute(s, """
        INSERT INTO graft_t.et VALUES
        (1, 'new', 'a', '00000000-0000-0000-0000-000000000001', true),
        (2, 'done', 'b', '00000000-0000-0000-0000-000000000002', false),
        (3, 'new', 'a', '00000000-0000-0000-0000-000000000003', true)""")
      Engine.execute(s, """
        SELECT status, count() AS n, max(ok) AS anyok
        FROM graft_t.et GROUP BY status ORDER BY status""")
    }, Some("""
      SELECT * FROM (VALUES ('done', 1, false), ('new', 2, true))
        t(status, n, anyok) ORDER BY status""")),

    // S4b: Replacing/SummingMergeTree merge semantics — FINAL applies
    // keep-latest / per-key sums on read
    Q("s8_final_merge", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.fr")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.fs")
      Engine.execute(s, """
        CREATE TABLE graft_t.fr (id Int64, v Int64, payload String)
        ENGINE=ReplacingMergeTree(v) ORDER BY id""")
      Engine.execute(s, """
        INSERT INTO graft_t.fr VALUES
        (1, 1, 'old'), (1, 2, 'new'), (2, 1, 'only')""")
      Engine.execute(s, """
        CREATE TABLE graft_t.fs (id Int64, hits Int64)
        ENGINE=SummingMergeTree() ORDER BY id""")
      Engine.execute(s, """
        INSERT INTO graft_t.fs VALUES (1, 10), (1, 5), (2, 7)""")
      Engine.execute(s, """
        SELECT r.id AS id, r.payload AS payload, s.hits AS hits
        FROM graft_t.fr FINAL AS r
        JOIN graft_t.fs FINAL AS s ON r.id = s.id
        ORDER BY id""")
    }, Some("""
      SELECT * FROM (VALUES (1, 'new', 15), (2, 'only', 7))
        t(id, payload, hits) ORDER BY id""")),

    // S4d: CollapsingMergeTree(sign) — the CDC ingest idiom: +1 state
    // rows, -1 cancel rows duplicating them; FINAL nets sign per
    // sorting key, so cancelled keys vanish. The oracle recomputes the
    // fold from orders directly (even keys got a cancel → only odd
    // keys survive, with their state row's values).
    Q("s20_collapsing", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.cps")
      Engine.execute(s, """
        CREATE TABLE graft_t.cps (id Int64, qty Int64, sign Int8)
        ENGINE=CollapsingMergeTree(sign) ORDER BY (id)""")
      Engine.execute(s, """
        INSERT INTO graft_t.cps
        SELECT o_orderkey, toInt64(floor(o_totalprice)), toInt8(1)
        FROM orders""")
      Engine.execute(s, """
        INSERT INTO graft_t.cps
        SELECT o_orderkey, toInt64(floor(o_totalprice)), toInt8(-1)
        FROM orders WHERE o_orderkey % 2 = 0""")
      Engine.execute(s, """
        SELECT id % 7 AS bucket, count() AS n, sum(qty) AS sq
        FROM graft_t.cps FINAL GROUP BY bucket ORDER BY bucket""")
    }, Some("""
      SELECT o_orderkey % 7 AS bucket, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sq
      FROM orders WHERE o_orderkey % 2 = 1
      GROUP BY 1 ORDER BY bucket""")),

    // S4e: VersionedCollapsingMergeTree(sign, ver) — cancels only
    // annihilate the generation (version) they duplicate, so a later
    // re-state under a new version survives regardless of row order.
    // OPTIMIZE ... FINAL materializes the fold (no FINAL on the read):
    // every third customer's gen-1 state is cancelled and re-stated at
    // gen 2 with qty+555; everyone else keeps gen 1.
    Q("s21_versioned_collapsing", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.vcp")
      Engine.execute(s, """
        CREATE TABLE graft_t.vcp (id Int64, qty Int64, sign Int8, ver UInt32)
        ENGINE=VersionedCollapsingMergeTree(sign, ver) ORDER BY (id)""")
      Engine.execute(s, """
        INSERT INTO graft_t.vcp
        SELECT c_custkey, toInt64(floor(c_acctbal * 100)), toInt8(1), 1
        FROM customer""")
      Engine.execute(s, """
        INSERT INTO graft_t.vcp
        SELECT c_custkey, toInt64(floor(c_acctbal * 100)), toInt8(-1), 1
        FROM customer WHERE c_custkey % 3 = 0""")
      Engine.execute(s, """
        INSERT INTO graft_t.vcp
        SELECT c_custkey, toInt64(floor(c_acctbal * 100)) + 555, toInt8(1), 2
        FROM customer WHERE c_custkey % 3 = 0""")
      Engine.execute(s, "OPTIMIZE TABLE graft_t.vcp FINAL")
      Engine.execute(s, """
        SELECT count() AS n, sum(qty) AS sq, sum(ver) AS sv
        FROM graft_t.vcp""")
    }, Some("""
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN c_custkey % 3 = 0
               THEN CAST(floor(c_acctbal * 100) AS BIGINT) + 555
               ELSE CAST(floor(c_acctbal * 100) AS BIGINT) END) AS BIGINT) AS sq,
             CAST(sum(CASE WHEN c_custkey % 3 = 0 THEN 2 ELSE 1 END) AS BIGINT) AS sv
      FROM customer""")),

    // S5c: column DEFAULT expressions — INSERTs omitting a column store
    // the declared expression's value (which may reference the inserted
    // columns — val DEFAULT id * 3 — AND other omitted defaulted
    // columns: val2 DEFAULT val + 1 resolves through the chain,
    // ClickHouse semantics); exercised through BOTH subset-insert forms
    // (column-list VALUES-free SELECT and partial column lists)
    Q("s22_default_columns", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.defq")
      Engine.execute(s, """
        CREATE TABLE graft_t.defq (
          id Int64, status String DEFAULT 'pending',
          val Int64 DEFAULT id * 3, val2 Int64 DEFAULT val + 1, tag String)
        ENGINE=MergeTree() ORDER BY (id)""")
      Engine.execute(s, """
        INSERT INTO graft_t.defq (id)
        SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 1""")
      Engine.execute(s, """
        INSERT INTO graft_t.defq (id, status)
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 10 = 2""")
      Engine.execute(s, """
        SELECT status, count() AS n, sum(val) AS sv, sum(val2) AS sv2,
               countIf(tag IS NULL) AS nuls
        FROM graft_t.defq GROUP BY status ORDER BY status""")
    }, Some("""
      SELECT status, count(*) AS n, CAST(sum(val) AS BIGINT) AS sv,
             CAST(sum(val + 1) AS BIGINT) AS sv2, count(*) AS nuls
      FROM (
        SELECT 'pending' AS status, o_orderkey * 3 AS val FROM orders
        WHERE o_orderkey % 10 = 1
        UNION ALL
        SELECT o_orderstatus AS status, o_orderkey * 3 AS val FROM orders
        WHERE o_orderkey % 10 = 2)
      GROUP BY status ORDER BY status""")),

    // S3d: the decorated-DDL tail (CODEC/COMMENT accepted, DEFAULT
    // live) + CREATE TABLE ... AS <table> structure clone: the clone
    // inherits columns AND defaults, takes a partial-column INSERT,
    // and the default fills from the inserted block
    Q("s23_clone_decorated", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.decob")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.decoc")
      Engine.execute(s, """
        CREATE TABLE graft_t.decob (
          k Int64 CODEC(ZSTD(1)),
          nat Int64 COMMENT 'nation key',
          bal Int64 DEFAULT k % 100)
        ENGINE=MergeTree() ORDER BY (k) COMMENT 'supplier shape'""")
      Engine.execute(s, "CREATE TABLE graft_t.decoc AS graft_t.decob")
      Engine.execute(s, """
        INSERT INTO graft_t.decoc (k, nat)
        SELECT s_suppkey, s_nationkey FROM supplier""")
      Engine.execute(s, """
        SELECT nat % 5 AS g, count() AS n, sum(bal) AS sb
        FROM graft_t.decoc GROUP BY g ORDER BY g""")
    }, Some("""
      SELECT CAST(s_nationkey % 5 AS BIGINT) AS g, count(*) AS n,
             CAST(sum(s_suppkey % 100) AS BIGINT) AS sb
      FROM supplier GROUP BY 1 ORDER BY g""")),

    // S5d: MATERIALIZED columns — computed on every insert path, never
    // insertable, hidden from SELECT * but selectable by name
    // (ClickHouse semantics; reference surface main.py:190 via chdb).
    // `bucket` chains off `cents` (materialized-over-materialized), and
    // the rows land through BOTH insert forms; star_cols pins the
    // SELECT * exclusion (2 visible of 4 physical columns).
    Q("s25_materialized_col", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.matq")
      Engine.execute(s, """
        CREATE TABLE graft_t.matq (
          id Int64, price Float64,
          cents Int64 MATERIALIZED toInt64(floor(price * 100)),
          bucket Int64 MATERIALIZED cents % 10)
        ENGINE=MergeTree() ORDER BY (id)""")
      Engine.execute(s, """
        INSERT INTO graft_t.matq
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0""")
      Engine.execute(s, """
        INSERT INTO graft_t.matq (id, price)
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 1""")
      val starCols =
        Engine.execute(s, "SELECT * FROM graft_t.matq").columns.length
      Engine.execute(s, s"""
        SELECT bucket, count() AS n, sum(cents) AS sc,
               $starCols AS star_cols
        FROM graft_t.matq GROUP BY bucket ORDER BY bucket""")
    }, Some("""
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) % 10 AS bucket,
             count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sc,
             2 AS star_cols
      FROM orders WHERE o_orderkey % 3 IN (0, 1)
      GROUP BY 1 ORDER BY bucket""")),

    // S3e: DETACH/ATTACH TABLE — park the data, forget the catalog
    // entry, re-register from the on-disk meta (metadata-only, zero
    // data movement); the round-trip must read back exactly the
    // parquet-derived truth
    Q("s24_detach_attach", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.da SYNC")
      Engine.execute(s, """
        CREATE TABLE graft_t.da (k Int64, sz Int64)
        ENGINE=MergeTree() ORDER BY (k)""")
      Engine.execute(s,
        "INSERT INTO graft_t.da SELECT p_partkey, p_size FROM part")
      Engine.execute(s, "DETACH TABLE graft_t.da")
      Engine.execute(s, "ATTACH TABLE graft_t.da")
      Engine.execute(s, """
        SELECT count() AS n, sum(sz) AS ss, min(k) AS mk, max(k) AS xk
        FROM graft_t.da""")
    }, Some("""
      SELECT count(*) AS n, CAST(sum(p_size) AS BIGINT) AS ss,
             CAST(min(p_partkey) AS BIGINT) AS mk,
             CAST(max(p_partkey) AS BIGINT) AS xk FROM part""")),

    // S4f: AggregatingMergeTree — AggregateFunction(fn, T) columns hold
    // partial states (the -State representation), fed per-block by a
    // TO-form materialized view; OPTIMIZE ... FINAL merges the stored
    // partials per sorting key (parts=1 pins that the merge actually
    // collapsed the two per-INSERT rows) and the -Merge combinators
    // finalize. The oracle recomputes the aggregates straight from
    // orders.
    Q("s26_aggregating", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.aggmv")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.aggt")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.aggsrc")
      Engine.execute(s, """
        CREATE TABLE graft_t.aggsrc (st String, cents Int64) ENGINE=Memory""")
      Engine.execute(s, """
        CREATE TABLE graft_t.aggt (
          st String,
          cnt AggregateFunction(count, UInt64),
          total AggregateFunction(sum, Int64),
          hi AggregateFunction(max, Int64))
        ENGINE=AggregatingMergeTree() ORDER BY (st)""")
      Engine.execute(s, """
        CREATE MATERIALIZED VIEW graft_t.aggmv TO graft_t.aggt AS
        SELECT st, countState() AS cnt, sumState(cents) AS total,
               maxState(cents) AS hi
        FROM graft_t.aggsrc GROUP BY st""")
      Engine.execute(s, """
        INSERT INTO graft_t.aggsrc
        SELECT o_orderstatus, toInt64(floor(o_totalprice * 100))
        FROM orders WHERE o_orderkey % 4 = 0""")
      Engine.execute(s, """
        INSERT INTO graft_t.aggsrc
        SELECT o_orderstatus, toInt64(floor(o_totalprice * 100))
        FROM orders WHERE o_orderkey % 4 = 1""")
      Engine.execute(s, "OPTIMIZE TABLE graft_t.aggt FINAL")
      Engine.execute(s, """
        SELECT st, countMerge(cnt) AS n, sumMerge(total) AS sc,
               maxMerge(hi) AS mx, count() AS parts
        FROM graft_t.aggt GROUP BY st ORDER BY st""")
    }, Some("""
      SELECT o_orderstatus AS st, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sc,
             CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mx,
             CAST(1 AS BIGINT) AS parts
      FROM orders WHERE o_orderkey % 4 IN (0, 1)
      GROUP BY 1 ORDER BY st""")),

    // S5e: ALIAS columns — no storage, the expression computes at read
    // (chained alias-over-alias included); hidden from SELECT * but
    // usable in WHERE/GROUP BY/aggregates. star_cols pins the exclusion
    // (3 visible of 3 physical columns, 2 aliases invisible).
    Q("s27_alias_col", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.aliq")
      Engine.execute(s, """
        CREATE TABLE graft_t.aliq (
          id Int64, qty Float64, price Float64,
          gross Float64 ALIAS qty * price,
          cents Int64 ALIAS toInt64(floor(gross * 100)))
        ENGINE=MergeTree() ORDER BY (id)""")
      Engine.execute(s, """
        INSERT INTO graft_t.aliq
        SELECT l_orderkey * 10 + l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_orderkey % 5 = 0""")
      val starCols =
        Engine.execute(s, "SELECT * FROM graft_t.aliq").columns.length
      Engine.execute(s, s"""
        SELECT cents % 7 AS bucket, count() AS n, sum(cents) AS sc,
               $starCols AS star_cols
        FROM graft_t.aliq WHERE cents > 100000
        GROUP BY bucket ORDER BY bucket""")
    }, Some("""
      WITH t AS (
        SELECT CAST(floor(l_quantity * l_extendedprice * 100) AS BIGINT)
                 AS cents
        FROM lineitem WHERE l_orderkey % 5 = 0)
      SELECT CAST(cents % 7 AS BIGINT) AS bucket, count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS sc, 3 AS star_cols
      FROM t WHERE cents > 100000
      GROUP BY 1 ORDER BY bucket""")),

    // S5f: EPHEMERAL columns — insert-time-only inputs: provided
    // through a column list (or defaulted when omitted), read by
    // MATERIALIZED/DEFAULT expressions, never stored. The oracle
    // recomputes both derivations straight from orders.
    Q("s28_ephemeral_col", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.ephq")
      Engine.execute(s, """
        CREATE TABLE graft_t.ephq (
          id Int64,
          raw String EPHEMERAL '',
          clen Int64 MATERIALIZED length(raw),
          head String DEFAULT upper(substring(raw, 1, 2)))
        ENGINE=MergeTree() ORDER BY (id)""")
      Engine.execute(s, """
        INSERT INTO graft_t.ephq (id, raw)
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderkey % 3 = 0""")
      Engine.execute(s, """
        INSERT INTO graft_t.ephq (id)
        SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 1""")
      Engine.execute(s, """
        SELECT clen % 5 AS g, count() AS n, sum(clen) AS sc,
               min(head) AS mh
        FROM graft_t.ephq GROUP BY g ORDER BY g""")
    }, Some("""
      WITH t AS (
        SELECT o_orderpriority AS raw FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT '' FROM orders WHERE o_orderkey % 3 = 1)
      SELECT CAST(length(raw) % 5 AS BIGINT) AS g, count(*) AS n,
             CAST(sum(length(raw)) AS BIGINT) AS sc,
             min(upper(substring(raw, 1, 2))) AS mh
      FROM t GROUP BY 1 ORDER BY g""")),

    // S4c: schema-changing ALTERs (DROP/RENAME/MODIFY COLUMN) rewrite
    // the table copy-on-write and RENAME TABLE carries the metadata —
    // the oracle is the equivalent transformation straight over parquet
    Q("s9_alter_reshape", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.al")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.al2")
      Engine.execute(s, """
        CREATE TABLE graft_t.al (k Int64, price Float64, junk Int32)
        ENGINE=MergeTree() ORDER BY (k)""")
      Engine.execute(s, """
        INSERT INTO graft_t.al SELECT o_orderkey, o_totalprice, 1 FROM orders""")
      Engine.execute(s, "ALTER TABLE graft_t.al DROP COLUMN junk")
      Engine.execute(s, "ALTER TABLE graft_t.al RENAME COLUMN price TO total")
      Engine.execute(s, "ALTER TABLE graft_t.al MODIFY COLUMN total Decimal(14,2)")
      Engine.execute(s, "RENAME TABLE graft_t.al TO graft_t.al2")
      Engine.execute(s, """
        SELECT count() AS n, sum(total) AS st, min(k) AS mk
        FROM graft_t.al2""")
    }, Some("""
      SELECT count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS st,
             min(o_orderkey) AS mk FROM orders""")),

    // S5b: partitioned MergeTree ingest shapes — VALUES, inline CSV
    // payload, and SELECT all land with the materialized `_part`
    Q("s10_insert_shapes", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.ish")
      Engine.execute(s, """
        CREATE TABLE graft_t.ish (k Int64, d Date)
        ENGINE=MergeTree() PARTITION BY toYYYYMM(d) ORDER BY (k)""")
      Engine.execute(s,
        "INSERT INTO graft_t.ish VALUES (1, '2024-01-15'), (2, '2024-02-20')")
      Engine.execute(s, "INSERT INTO graft_t.ish FORMAT CSV\n3,2024-03-10")
      Engine.execute(s,
        "INSERT INTO graft_t.ish SELECT 4, toDate('2024-04-05')")
      Engine.execute(s,
        "SELECT _part AS part, k FROM graft_t.ish ORDER BY part")
    }, Some("""
      SELECT CAST(part AS INT) AS part, CAST(k AS BIGINT) AS k
      FROM (VALUES (202401, 1), (202402, 2), (202403, 3), (202404, 4))
        t(part, k) ORDER BY part""")),

    // S11: insert-triggered MATERIALIZED VIEW — each inserted block
    // runs through the view's SELECT and appends (per-block partial
    // aggregates, the AggregatingMergeTree feed pattern); the oracle
    // reproduces the two blocks' aggregates directly from orders
    Q("s11_matview", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.mvq_src")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.mvq_agg")
      Engine.execute(s, """
        CREATE TABLE graft_t.mvq_src (st String, cents Int64) ENGINE=Memory""")
      Engine.execute(s, """
        CREATE MATERIALIZED VIEW graft_t.mvq_agg AS
        SELECT st, count() AS n, sum(cents) AS total
        FROM graft_t.mvq_src GROUP BY st""")
      Engine.execute(s, """
        INSERT INTO graft_t.mvq_src
        SELECT o_orderstatus, CAST(floor(o_totalprice * 100) AS Int64)
        FROM orders WHERE o_orderkey % 4 = 0""")
      Engine.execute(s, """
        INSERT INTO graft_t.mvq_src
        SELECT o_orderstatus, CAST(floor(o_totalprice * 100) AS Int64)
        FROM orders WHERE o_orderkey % 4 = 1""")
      Engine.execute(s,
        "SELECT st, n, total FROM graft_t.mvq_agg ORDER BY st, n, total")
    }, Some("""
      WITH b1 AS (SELECT o_orderstatus AS st, count(*) AS n,
                    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total
                  FROM orders WHERE o_orderkey % 4 = 0 GROUP BY 1),
           b2 AS (SELECT o_orderstatus AS st, count(*) AS n,
                    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total
                  FROM orders WHERE o_orderkey % 4 = 1 GROUP BY 1)
      SELECT st, n, total FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
      ORDER BY st, n, total""")),

    // CTAS: schema comes from the SELECT, engine metadata (ORDER BY)
    // honored, contents land through the MergeTree insert layout
    Q("s13_ctas", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.ctas_agg")
      Engine.execute(s, """
        CREATE TABLE graft_t.ctas_agg ENGINE=MergeTree() ORDER BY (st)
        AS SELECT o_orderstatus AS st, count() AS n,
                  sum(CAST(o_totalprice AS Decimal(14,2))) AS total
           FROM orders GROUP BY st""")
      Engine.execute(s,
        "SELECT st, n, total FROM graft_t.ctas_agg ORDER BY st")
    }, Some("""
      SELECT o_orderstatus AS st, count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(14,2))) AS total
      FROM orders GROUP BY st ORDER BY st""")),

    // S4c: partition lifecycle — the 100 TB retention tier. DROP
    // PARTITION removes a month as a metadata+directory delete (no
    // rewrite); DETACH parks a month under <table>/detached invisible
    // to scans; ATTACH restores it byte-identical. The final per-month
    // rollup must equal orders minus ONLY the dropped month (the
    // detached month came back; oracle recomputes from base parquet).
    Q("s14_partition_ops", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.pord")
      Engine.execute(s, """
        CREATE TABLE graft_t.pord (
          o_orderkey Int64, o_totalprice Float64, o_orderdate DateTime)
        ENGINE=MergeTree() PARTITION BY toYYYYMM(o_orderdate)
        ORDER BY (o_orderkey)""")
      Engine.execute(s, """
        INSERT INTO graft_t.pord
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders""")
      Engine.execute(s, "ALTER TABLE graft_t.pord DROP PARTITION 199506")
      Engine.execute(s, "ALTER TABLE graft_t.pord DETACH PARTITION 199507")
      Engine.execute(s, "ALTER TABLE graft_t.pord ATTACH PARTITION 199507")
      Engine.execute(s, """
        SELECT _part AS ym, count() AS n,
               sum(CAST(o_totalprice AS Decimal(14,2))) AS sum_price
        FROM graft_t.pord GROUP BY ym ORDER BY ym""")
    }, Some("""
      SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT) AS ym,
             count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(14,2))) AS sum_price
      FROM orders
      WHERE year(o_orderdate)*100 + month(o_orderdate) <> 199506
      GROUP BY 1 ORDER BY ym""")),

    // S15: cross-table partition surgery + lightweight DELETE — stage a
    // corrected July 1995 into a scratch table (prices doubled), REPLACE
    // the production partition from it, MOVE August back from a parked
    // table, lightweight-DELETE a key range. The oracle recomputes the
    // surviving rows arithmetically from `orders`.
    Q("s15_partition_surgery", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      for (t <- Seq("psur", "psur_fix", "psur_park"))
        Engine.execute(s, s"DROP TABLE IF EXISTS graft_t.$t")
      for (t <- Seq("psur", "psur_fix", "psur_park"))
        Engine.execute(s, s"""
          CREATE TABLE graft_t.$t (
            o_orderkey Int64, o_totalprice Float64, o_orderdate DateTime)
          ENGINE=MergeTree() PARTITION BY toYYYYMM(o_orderdate)
          ORDER BY (o_orderkey)""")
      Engine.execute(s, """
        INSERT INTO graft_t.psur
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE toYYYYMM(o_orderdate) IN (199507, 199509)""")
      Engine.execute(s, """
        INSERT INTO graft_t.psur_fix
        SELECT o_orderkey, o_totalprice * 2, o_orderdate FROM orders
        WHERE toYYYYMM(o_orderdate) = 199507""")
      Engine.execute(s, """
        INSERT INTO graft_t.psur_park
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE toYYYYMM(o_orderdate) = 199508""")
      Engine.execute(s,
        "ALTER TABLE graft_t.psur REPLACE PARTITION 199507 FROM graft_t.psur_fix")
      Engine.execute(s,
        "ALTER TABLE graft_t.psur_park MOVE PARTITION 199508 TO TABLE graft_t.psur")
      Engine.execute(s, "DELETE FROM graft_t.psur WHERE o_orderkey % 10 = 0")
      Engine.execute(s, """
        SELECT _part AS ym, count() AS n,
               sum(CAST(o_totalprice AS Decimal(16,2))) AS sum_price
        FROM graft_t.psur GROUP BY ym ORDER BY ym""")
    }, Some("""
      SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT) AS ym,
             count(*) AS n,
             sum(CAST(CASE WHEN month(o_orderdate) = 7
                           THEN o_totalprice * 2
                           ELSE o_totalprice END AS DECIMAL(16,2))) AS sum_price
      FROM orders
      WHERE year(o_orderdate) = 1995 AND month(o_orderdate) IN (7, 8, 9)
        AND o_orderkey % 10 <> 0
      GROUP BY 1 ORDER BY ym""")),

    // S16: table PROJECTION — per-part materialized aggregate with
    // automatic merge rewrite. First half of orders is back-filled via
    // MATERIALIZE, second half lands as a per-INSERT partial; the final
    // GROUP BY must read the projection STORE (require() guards that
    // the rewrite actually fired) and still match DuckDB's direct
    // aggregate over all of orders.
    Q("s16_projection", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.pjord")
      Engine.execute(s, """
        CREATE TABLE graft_t.pjord (
          o_orderkey Int64, o_orderpriority String, o_orderdate DateTime)
        ENGINE=MergeTree() ORDER BY (o_orderkey)""")
      Engine.execute(s, "ALTER TABLE graft_t.pjord DROP PROJECTION IF EXISTS p_pri")
      Engine.execute(s, """
        INSERT INTO graft_t.pjord
        SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        WHERE o_orderkey % 2 = 0""")
      Engine.execute(s, """
        ALTER TABLE graft_t.pjord ADD PROJECTION p_pri
          (SELECT o_orderpriority, count(), sum(o_orderkey),
                  min(o_orderkey), max(o_orderkey)
           GROUP BY o_orderpriority)""")
      Engine.execute(s, "ALTER TABLE graft_t.pjord MATERIALIZE PROJECTION p_pri")
      Engine.execute(s, """
        INSERT INTO graft_t.pjord
        SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        WHERE o_orderkey % 2 = 1""")
      val df = Engine.execute(s, """
        SELECT o_orderpriority, count() AS n, sum(o_orderkey) AS sk,
               min(o_orderkey) AS mnk, max(o_orderkey) AS mxk
        FROM graft_t.pjord GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      require(df.queryExecution.analyzed.toString.contains("__proj_p_pri"),
        "projection rewrite did not fire")
      df
    }, Some("""
      SELECT o_orderpriority, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sk,
             min(o_orderkey) AS mnk, max(o_orderkey) AS mxk
      FROM orders GROUP BY 1 ORDER BY 1""")),

    // S16b: avg/uniq projection partials — avg materializes as the
    // (sum, count) pair (ClickHouse avgState; exact for integral
    // columns), uniq as a per-part DataSketches HLL sketch merged at
    // read (uniqState). Both halves of the table land as per-INSERT
    // partials after MATERIALIZE back-fills the first. require() pins
    // the rewrite to the store. avg compares exactly against DuckDB;
    // uniq is an estimator, so its driver-gated row is the g4-style
    // derived bound: |merged-sketch estimate − exact| <= 15% * exact
    // (the exact side computed independently from orders).
    Q("s16b_projection_avg_uniq", (s, dir) => {
      import org.apache.spark.sql.functions.{abs, col}
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.pjau")
      Engine.execute(s, """
        CREATE TABLE graft_t.pjau (
          o_orderkey Int64, o_orderpriority String, o_custkey Int64)
        ENGINE=MergeTree() ORDER BY (o_orderkey)""")
      Engine.execute(s, """
        INSERT INTO graft_t.pjau
        SELECT o_orderkey, o_orderpriority, o_custkey FROM orders
        WHERE o_orderkey % 2 = 0""")
      Engine.execute(s, """
        ALTER TABLE graft_t.pjau ADD PROJECTION p_au
          (SELECT o_orderpriority, count(), avg(o_orderkey), uniq(o_custkey)
           GROUP BY o_orderpriority)""")
      Engine.execute(s, "ALTER TABLE graft_t.pjau MATERIALIZE PROJECTION p_au")
      Engine.execute(s, """
        INSERT INTO graft_t.pjau
        SELECT o_orderkey, o_orderpriority, o_custkey FROM orders
        WHERE o_orderkey % 2 = 1""")
      val df = Engine.execute(s, """
        SELECT o_orderpriority, count() AS n, avg(o_orderkey) AS avg_key,
               uniq(o_custkey) AS u
        FROM graft_t.pjau GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      require(df.queryExecution.analyzed.toString.contains("__proj_p_au"),
        "avg/uniq projection rewrite did not fire")
      val exact = graft.Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(org.apache.spark.sql.functions.countDistinct(col("o_custkey"))
          .as("exact_u"))
      df.join(exact, "o_orderpriority")
        .select(col("o_orderpriority"), col("n"), col("avg_key"),
          (abs(col("u") - col("exact_u")) <= col("exact_u") * 0.15)
            .as("uniq_within_15pct"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n, avg(o_orderkey) AS avg_key,
             TRUE AS uniq_within_15pct
      FROM orders GROUP BY 1 ORDER BY 1""")),

    // S17: data-skipping index — four INSERT batches land four disjoint
    // `band` ranges in four file sets; a minmax ADD INDEX +
    // MATERIALIZE lets the band predicate read ONLY batch 2's files
    // (require() guards that pruning actually fired: kept < total).
    // The oracle recomputes batch 2 arithmetically from orders.
    Q("s17_skip_index", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.skord")
      Engine.execute(s, """
        CREATE TABLE graft_t.skord (
          o_orderkey Int64, band Int64, o_totalprice Float64)
        ENGINE=MergeTree() ORDER BY (o_orderkey)""")
      for (i <- 0 to 3)
        Engine.execute(s, s"""
          INSERT INTO graft_t.skord
          SELECT o_orderkey, o_custkey + $i * 10000000, o_totalprice
          FROM orders WHERE o_orderkey % 4 = $i""")
      Engine.execute(s, """
        ALTER TABLE graft_t.skord ADD INDEX ix_band band
        TYPE minmax GRANULARITY 4""")
      Engine.execute(s, "ALTER TABLE graft_t.skord MATERIALIZE INDEX ix_band")
      val df = Engine.execute(s, """
        SELECT count() AS n,
               sum(CAST(o_totalprice AS Decimal(16,2))) AS sp,
               min(o_orderkey) AS mn, max(o_orderkey) AS mx
        FROM graft_t.skord
        WHERE band >= 20000000 AND band < 30000000""")
      df.queryExecution.optimizedPlan // force the optimizer (incl. the rule)
      require(graft.plans.SkipIndexPrune.lastPruneFor("graft_t.skord")
        .exists { case (kept, total) => kept < total },
        "skip-index pruning did not fire")
      df
    }, Some("""
      SELECT count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(16,2))) AS sp,
             min(o_orderkey) AS mn, max(o_orderkey) AS mx
      FROM orders WHERE o_orderkey % 4 = 2""")),

    // S17b: ngram-bloom text index — batch 1 carries a marker token in
    // its comments, batch 0 does not; after ngrambf_v1 MATERIALIZE a
    // `LIKE '%marker%'` must read only batch 1's files (require()
    // gated) and still match DuckDB's recomputation over orders.
    Q("s17b_ngrambf_like", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.skcom")
      Engine.execute(s, """
        CREATE TABLE graft_t.skcom (o_orderkey Int64, c String)
        ENGINE=MergeTree() ORDER BY (o_orderkey)""")
      Engine.execute(s, """
        INSERT INTO graft_t.skcom
        SELECT o_orderkey, concat('plain record ', o_orderstatus, ' ',
                                  toString(o_orderkey))
        FROM orders WHERE o_orderkey % 2 = 0""")
      Engine.execute(s, """
        INSERT INTO graft_t.skcom
        SELECT o_orderkey, concat('marked zqwhale record ', o_orderstatus,
                                  ' ', toString(o_orderkey))
        FROM orders WHERE o_orderkey % 2 = 1""")
      Engine.execute(s, """
        ALTER TABLE graft_t.skcom ADD INDEX ix_ng c
        TYPE ngrambf_v1(4, 16384, 2, 0) GRANULARITY 1""")
      Engine.execute(s, "ALTER TABLE graft_t.skcom MATERIALIZE INDEX ix_ng")
      val df = Engine.execute(s, """
        SELECT count() AS n, min(o_orderkey) AS mn, max(o_orderkey) AS mx
        FROM graft_t.skcom WHERE c LIKE '%zqwhale%'""")
      df.queryExecution.optimizedPlan
      require(graft.plans.SkipIndexPrune.lastPruneFor("graft_t.skcom")
        .exists { case (kept, total) => kept < total },
        "ngram-bloom pruning did not fire")
      df
    }, Some("""
      SELECT count(*) AS n, min(o_orderkey) AS mn, max(o_orderkey) AS mx
      FROM orders WHERE o_orderkey % 2 = 1""")),

    // S18: durable catalog — DDL survives a restart like the
    // reference's persistent chdb session (main.py:140-150). The entry
    // creates+loads a partitioned MergeTree table, simulates a JVM
    // restart (catalog entry dropped, data untouched, registries
    // wiped), and the follow-up statements must answer from the
    // lazily-restored catalog: the SELECT sees all rows, and a
    // post-restart INSERT proves the restored PARTITION BY metadata
    // still routes rows (the oracle recomputes both halves from orders).
    Q("s18_durable_catalog", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.dur18")
      Engine.execute(s, """
        CREATE TABLE graft_t.dur18 (
          o_orderkey Int64, o_totalprice Float64, o_orderdate DateTime)
        ENGINE=MergeTree() PARTITION BY toYYYYMM(o_orderdate)
        ORDER BY (o_orderkey)""")
      Engine.execute(s, """
        INSERT INTO graft_t.dur18
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE o_orderkey % 2 = 0""")
      graft.dialect.CatalogStore.simulateRestart(s, Seq("graft_t.dur18"))
      Engine.execute(s, """
        INSERT INTO graft_t.dur18
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE o_orderkey % 2 = 1""")
      Engine.execute(s, """
        SELECT _part AS ym, count() AS n,
               sum(CAST(o_totalprice AS Decimal(14,2))) AS sum_price
        FROM graft_t.dur18 GROUP BY ym ORDER BY ym""")
    }, Some("""
      SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT) AS ym,
             count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(14,2))) AS sum_price
      FROM orders GROUP BY 1 ORDER BY ym""")),

    // S19: DROP stages into the warehouse trash, UNDROP restores the
    // table (rows + MergeTree metadata) inside ClickHouse's 480 s
    // grace window; SYNC is the immediate hard delete. The oracle
    // reproduces what the restored table must still answer.
    Q("s19_undrop", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.ud19 SYNC")
      Engine.execute(s, """
        CREATE TABLE graft_t.ud19 (c_custkey Int64, c_acctbal Float64)
        ENGINE=MergeTree() ORDER BY (c_custkey)""")
      Engine.execute(s, """
        INSERT INTO graft_t.ud19
        SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0""")
      Engine.execute(s, "DROP TABLE graft_t.ud19")
      val trashed = Engine.execute(s, """
        SELECT count() AS n FROM system.dropped_tables
        WHERE database = 'graft_t' AND table = 'ud19'""")
        .collect().head.getLong(0)
      require(trashed == 1L, s"expected 1 trash entry for ud19, got $trashed")
      Engine.execute(s, "UNDROP TABLE graft_t.ud19")
      Engine.execute(s, """
        SELECT count() AS n,
               sum(CAST(c_acctbal AS Decimal(14,2))) AS bal
        FROM graft_t.ud19""")
    }, Some("""
      SELECT count(*) AS n, sum(CAST(c_acctbal AS DECIMAL(14,2))) AS bal
      FROM customer WHERE c_custkey % 3 = 0""")),

    // External dictionary: CREATE DICTIONARY over nation, then the
    // dictGet/dictHas/dictGetOrDefault lookup family against supplier
    // keys — present keys resolve, absent keys (+100) fall back to the
    // declared DEFAULT / the explicit default. The oracle reproduces
    // each lookup as a correlated scalar subquery against nation.
    Q("s12_dictionary", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "DROP DICTIONARY IF EXISTS dim_nation")
      Engine.execute(s, """
        CREATE DICTIONARY dim_nation (
          n_nationkey UInt64,
          n_name String DEFAULT 'unknown',
          n_regionkey UInt64)
        PRIMARY KEY n_nationkey
        SOURCE(CLICKHOUSE(TABLE 'nation'))
        LAYOUT(HASHED()) LIFETIME(MIN 0 MAX 300)""")
      Engine.execute(s, """
        SELECT dictGet('dim_nation', 'n_name', s_nationkey) AS nation,
               dictGetInt64('dim_nation', 'n_regionkey', s_nationkey) AS region_id,
               dictHas('dim_nation', s_nationkey) AS present,
               dictGet('dim_nation', 'n_name', s_nationkey + 100) AS dflt,
               dictGetOrDefault('dim_nation', 'n_name', s_nationkey + 100, 'n/a') AS fallback,
               count() AS n
        FROM supplier
        GROUP BY nation, region_id, present, dflt, fallback
        ORDER BY nation""")
    }, Some("""
      SELECT coalesce((SELECT n_name FROM nation
                       WHERE n_nationkey = s_nationkey), 'unknown') AS nation,
             CAST(coalesce((SELECT n_regionkey FROM nation
                            WHERE n_nationkey = s_nationkey), 0) AS BIGINT) AS region_id,
             CAST(CASE WHEN EXISTS(SELECT 1 FROM nation
                                   WHERE n_nationkey = s_nationkey)
                  THEN 1 ELSE 0 END AS SMALLINT) AS present,
             coalesce((SELECT n_name FROM nation
                       WHERE n_nationkey = s_nationkey + 100), 'unknown') AS dflt,
             coalesce((SELECT n_name FROM nation
                       WHERE n_nationkey = s_nationkey + 100), 'n/a') AS fallback,
             count(*) AS n
      FROM supplier GROUP BY 1, 2, 3, 4, 5 ORDER BY nation""")),

    // S6a: ENGINE=Null + MV fan-out — the classic ClickHouse ingestion
    // idiom: INSERT into a schema-only sink, materialized views compute
    // per-block partials into a SummingMergeTree, the sink stores
    // nothing. The oracle recomputes the aggregate straight from orders
    // (block splits cannot show through a summed GROUP BY) and pins the
    // sink at zero rows.
    Q("s29_null_mv", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.nmv")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.nsink")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.nagg")
      Engine.execute(s,
        "CREATE TABLE graft_t.nsink (k Int64, cents Int64) ENGINE=Null")
      Engine.execute(s, """
        CREATE TABLE graft_t.nagg (g Int64, n Int64, cents Int64)
        ENGINE=SummingMergeTree() ORDER BY (g)""")
      Engine.execute(s, """
        CREATE MATERIALIZED VIEW graft_t.nmv TO graft_t.nagg AS
        SELECT k % 7 AS g, count() AS n, sum(cents) AS cents
        FROM graft_t.nsink GROUP BY k % 7""")
      Engine.execute(s, """
        INSERT INTO graft_t.nsink
        SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS Int64)
        FROM orders WHERE o_orderkey % 2 = 0""")
      Engine.execute(s, """
        INSERT INTO graft_t.nsink
        SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS Int64)
        FROM orders WHERE o_orderkey % 2 = 1""")
      Engine.execute(s, """
        SELECT g, sum(n) AS n, sum(cents) AS cents,
               (SELECT count() FROM graft_t.nsink) AS sink_rows
        FROM graft_t.nagg GROUP BY g ORDER BY g""")
    }, Some("""
      SELECT CAST(o_orderkey % 7 AS BIGINT) AS g, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(0 AS BIGINT) AS sink_rows
      FROM orders GROUP BY 1 ORDER BY g""")),

    // S6b: ENGINE=Buffer — staged writes transparently union with the
    // destination on read; OPTIMIZE is the manual flush. The final
    // aggregate runs through the buffer face after one flushed and one
    // still-staged insert, so it covers both sides of the union.
    Q("s30_buffer", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.bbuf")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.bdst")
      Engine.execute(s, """
        CREATE TABLE graft_t.bdst (k Int64, cents Int64)
        ENGINE=MergeTree() ORDER BY (k)""")
      Engine.execute(s, """
        CREATE TABLE graft_t.bbuf (k Int64, cents Int64)
        ENGINE=Buffer(graft_t, bdst, 1, 10, 600, 1000, 100000, 10000000, 100000000)""")
      Engine.execute(s, """
        INSERT INTO graft_t.bbuf
        SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS Int64)
        FROM orders WHERE o_orderkey % 3 = 0""")
      Engine.execute(s, "OPTIMIZE TABLE graft_t.bbuf") // flush to bdst
      Engine.execute(s, """
        INSERT INTO graft_t.bbuf
        SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS Int64)
        FROM orders WHERE o_orderkey % 3 = 1""") // stays staged
      Engine.execute(s, """
        SELECT k % 11 AS g, count() AS n, sum(cents) AS cents
        FROM graft_t.bbuf GROUP BY k % 11 ORDER BY g""")
    }, Some("""
      SELECT CAST(o_orderkey % 11 AS BIGINT) AS g, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderkey % 3 IN (0, 1)
      GROUP BY 1 ORDER BY g""")),

    // S6c: ENGINE=Set + `x IN set_table` (the only read path a Set
    // storage supports) — membership pushes into the orders scan as a
    // semi-join.
    Q("s31_set_in", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.vip")
      Engine.execute(s, "CREATE TABLE graft_t.vip (k Int64) ENGINE=Set")
      Engine.execute(s, """
        INSERT INTO graft_t.vip
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""")
      Engine.execute(s, """
        SELECT o_orderpriority AS pri, count() AS n,
               CAST(sum(floor(o_totalprice)) AS Int64) AS t
        FROM orders WHERE o_custkey IN graft_t.vip
        GROUP BY pri ORDER BY pri""")
    }, Some("""
      SELECT o_orderpriority AS pri, count(*) AS n,
             CAST(sum(floor(o_totalprice)) AS BIGINT) AS t
      FROM orders WHERE o_custkey IN
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      GROUP BY 1 ORDER BY pri""")),

    // S6d: ENGINE=Join(ANY, LEFT, k) + joinGet point lookups — ANY
    // ignores re-inserted keys (first write wins), a missing key yields
    // the value column's type default. Catalyst decorrelates the
    // lookups into plain left joins (no per-row probe).
    Q("s32_join_engine", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Engine.execute(s, "DROP TABLE IF EXISTS graft_t.jnat")
      Engine.execute(s, """
        CREATE TABLE graft_t.jnat (k Int64, nname String)
        ENGINE=Join(ANY, LEFT, k)""")
      Engine.execute(s, """
        INSERT INTO graft_t.jnat SELECT n_nationkey, n_name FROM nation""")
      // duplicate-key re-insert: ANY ignores it
      Engine.execute(s, """
        INSERT INTO graft_t.jnat
        SELECT n_nationkey, concat('DUP_', n_name) FROM nation""")
      Engine.execute(s, """
        SELECT joinGet('graft_t.jnat', 'nname', s_nationkey) AS nation,
               joinGet('graft_t.jnat', 'nname', s_nationkey + 100) AS missing,
               count() AS n
        FROM supplier GROUP BY nation, missing ORDER BY nation""")
    }, Some("""
      SELECT coalesce((SELECT n_name FROM nation
                       WHERE n_nationkey = s_nationkey), '') AS nation,
             '' AS missing, count(*) AS n
      FROM supplier GROUP BY 1, 2 ORDER BY nation""")),

    // S6e: ENGINE=Merge(db, 'regex') — one read-only face over every
    // member table, re-resolved per query, with the `_table` virtual
    // column naming each row's origin.
    Q("s33_merge_engine", (s, dir) => {
      ChContext.setup(s, dir)
      Engine.execute(s, "CREATE DATABASE IF NOT EXISTS graft_t")
      Seq("evm", "ev_a", "ev_b").foreach(t =>
        Engine.execute(s, s"DROP TABLE IF EXISTS graft_t.$t"))
      Engine.execute(s,
        "CREATE TABLE graft_t.ev_a (k Int64, cents Int64) ENGINE=Memory")
      Engine.execute(s,
        "CREATE TABLE graft_t.ev_b (k Int64, cents Int64) ENGINE=Memory")
      Engine.execute(s, """
        INSERT INTO graft_t.ev_a
        SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS Int64)
        FROM orders WHERE o_orderkey % 2 = 0""")
      Engine.execute(s, """
        INSERT INTO graft_t.ev_b
        SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS Int64)
        FROM orders WHERE o_orderkey % 2 = 1""")
      Engine.execute(s, """
        CREATE TABLE graft_t.evm (k Int64, cents Int64)
        ENGINE=Merge(graft_t, '^ev_[ab]$')""")
      Engine.execute(s, """
        SELECT _table AS src, count() AS n, sum(cents) AS cents
        FROM graft_t.evm GROUP BY _table ORDER BY src""")
    }, Some("""
      SELECT src, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM (SELECT 'ev_a' AS src, o_totalprice FROM orders
            WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT 'ev_b' AS src, o_totalprice FROM orders
            WHERE o_orderkey % 2 = 1)
      GROUP BY 1 ORDER BY src"""))
  )
}
