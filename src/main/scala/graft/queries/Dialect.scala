package graft.queries

import graft.Q
import graft.dialect.ChContext

/** End-to-end ClickHouse-dialect evidence (SURVEY.md §2.2 P4/P6, §2.7
  * F1-F8): each query is the reference's SQL shape fed through the
  * transpiler + function registry, hash-checked against DuckDB.
  */
object Dialect {

  private def ch(chSql: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, dir) => ChContext.sql(s, dir, chSql)

  val qs: Seq[Q] = Seq(

    // F1/P1: literal matrix + version() (test_suite.py:141-146)
    Q("f1_ch_literals", ch("""
      SELECT 1 AS one, 'test' AS str, 3.14 AS pi,
             version() AS ver, toString(42) AS s42,
             if(1, 'y', 'n') AS cond
      FORMAT TSV"""),
      Some("""
      SELECT 1 AS one, 'test' AS str, 3.14 AS pi,
             '25.5.2' AS ver, '42' AS s42, 'y' AS cond""")),

    // S1/P4/F3: numbers() + ternary truthiness + toString + intDiv
    // (test_suite.py:323-336, index.html:729)
    Q("f2_ch_numbers", ch("""
      SELECT number, toString(number) AS s,
             number % 2 ? number : NULL AS odd_or_null,
             intDiv(number, 3) AS d3,
             plus(number, 10) AS p10
      FROM numbers(10) ORDER BY number"""),
      Some("""
      SELECT range AS number, CAST(range AS VARCHAR) AS s,
             CASE WHEN range % 2 <> 0 THEN range END AS odd_or_null,
             range // 3 AS d3, range + 10 AS p10
      FROM range(10) ORDER BY number""")),

    // F4: date functions over orders (toYYYYMM is the ClickBench
    // MergeTree partition expr, test.yml:49)
    Q("f3_ch_datetime", ch("""
      SELECT toYYYYMM(o_orderdate) AS ym,
             toYear(o_orderdate) AS y, toMonth(o_orderdate) AS m,
             count() AS n
      FROM orders GROUP BY ym, y, m ORDER BY ym"""),
      Some("""
      SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT) AS ym,
             CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m, count(*) AS n
      FROM orders GROUP BY 1, 2, 3 ORDER BY ym""")),

    // F2: string function family over customer
    Q("f4_ch_strings", ch("""
      SELECT c_custkey, lcase(c_name) AS lname,
             lengthUTF8(c_name) AS len,
             position(c_name, '0') AS pos0,
             arrayStringConcat(splitByChar('#', c_name), '|') AS parts,
             startsWith(c_name, 'Customer') AS is_cust,
             replaceRegexpAll(c_name, '[0-9]', 'N') AS name_mask
      FROM customer ORDER BY c_custkey LIMIT 200"""),
      Some("""
      SELECT c_custkey, lower(c_name) AS lname,
             CAST(length(c_name) AS INT) AS len,
             CAST(strpos(c_name, '0') AS INT) AS pos0,
             array_to_string(string_split(c_name, '#'), '|') AS parts,
             starts_with(c_name, 'Customer') AS is_cust,
             regexp_replace(c_name, '[0-9]', 'N', 'g') AS name_mask
      FROM customer ORDER BY c_custkey LIMIT 200""")),

    // G8/G9: ClickHouse aggregate-name family incl. -If combinators
    Q("f5_ch_aggfuncs", ch("""
      SELECT c_nationkey,
             uniqExact(c_custkey) AS n_exact,
             countIf(c_acctbal > 0) AS n_pos,
             sumIf(c_custkey, c_acctbal > 0) AS sum_pos_keys,
             argMax(c_name, c_acctbal) AS richest,
             arrayStringConcat(arraySort(groupUniqArray(c_mktsegment)), ',') AS segs,
             round(quantile(0.5)(c_acctbal), 4) AS med_bal
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""),
      Some("""
      SELECT c_nationkey,
             count(DISTINCT c_custkey) AS n_exact,
             count(*) FILTER (WHERE c_acctbal > 0) AS n_pos,
             CAST(sum(c_custkey) FILTER (WHERE c_acctbal > 0) AS BIGINT) AS sum_pos_keys,
             arg_max(c_name, c_acctbal) AS richest,
             array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segs,
             round(quantile_cont(c_acctbal, 0.5), 4) AS med_bal
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // F6: array family — range/has/indexOf/arrayConcat/arrayUniq
    // (index.html:729 uses range(number) AS arr)
    Q("f6_ch_arrays", ch("""
      SELECT number, arrayStringConcat(range(number % 4 + 1), ',') AS arr,
             has(range(number % 4 + 1), 2) AS has2,
             indexOf(range(number % 4 + 1), 0) AS idx0,
             arrayUniq(arrayConcat(range(2), range(2))) AS u
      FROM numbers(8) ORDER BY number"""),
      Some("""
      SELECT range AS number, array_to_string(range(0, range % 4 + 1), ',') AS arr,
             list_contains(range(0, range % 4 + 1), 2) AS has2,
             CAST(list_position(range(0, range % 4 + 1), 0) AS BIGINT) AS idx0,
             CAST(len(list_distinct(range(0,2) || range(0,2))) AS INT) AS u
      FROM range(8) ORDER BY number""")),

    // F8: JSON extraction family over events.props
    Q("f8_ch_json", ch("""
      SELECT event_id,
             JSONExtractInt(props, 'k') AS k,
             JSONExtractString(props, 'k') AS ks,
             JSONHas(props, 'k') AS has_k,
             JSONHas(props, 'missing') AS has_missing
      FROM events ORDER BY event_id LIMIT 1000"""),
      Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             json_extract_string(props, '$.k') AS ks,
             json_extract_string(props, '$.k') IS NOT NULL AS has_k,
             json_extract_string(props, '$.missing') IS NOT NULL AS has_missing
      FROM events ORDER BY event_id LIMIT 1000""")),

    // F4b: date arithmetic / formatting family
    Q("f10_ch_datefns", ch("""
      SELECT o_orderkey,
             addDays(o_orderdate, 3) AS plus3,
             subtractDays(o_orderdate, 1) AS minus1,
             dateDiff('day', o_orderdate, addDays(o_orderdate, 10)) AS dd,
             formatDateTime(o_orderdate, '%Y-%m-%d') AS fmt,
             toDayOfWeek(o_orderdate) AS dow
      FROM orders ORDER BY o_orderkey LIMIT 300"""),
      Some("""
      SELECT o_orderkey,
             CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS plus3,
             CAST(o_orderdate - INTERVAL 1 DAY AS DATE) AS minus1,
             datediff('day', o_orderdate, o_orderdate + INTERVAL 10 DAY) AS dd,
             strftime(o_orderdate, '%Y-%m-%d') AS fmt,
             CAST(isodow(o_orderdate) AS INT) AS dow
      FROM orders ORDER BY o_orderkey LIMIT 300""")),

    // G6b: WITH TOTALS through the dialect (totals row = empty
    // grouping set, NULL group key)
    Q("g6b_ch_totals", ch("""
      SELECT c_mktsegment, count() AS n
      FROM customer GROUP BY c_mktsegment WITH TOTALS
      ORDER BY c_mktsegment"""),
      Some("""
      SELECT c_mktsegment, count(*) AS n
      FROM customer GROUP BY GROUPING SETS ((c_mktsegment), ())
      ORDER BY c_mktsegment""")),

    // O4: ClickHouse-only LIMIT n BY clause through the dialect engine
    Q("o4b_ch_limit_by", (s, dir) => {
      graft.dialect.ChContext.setup(s, dir)
      graft.dialect.Engine.execute(s, """
        SELECT o_orderstatus, o_orderkey, o_orderdate
        FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC
        LIMIT 2 BY o_orderstatus""")
    }, Some("""
      SELECT o_orderstatus, o_orderkey, o_orderdate FROM (
        SELECT o_orderstatus, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_orderdate DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 2
      ORDER BY o_orderdate DESC, o_orderkey""")),

    // F8b: ClickHouse lambda higher-order functions (lambda-first arg
    // order; Spark parses the `x -> ...` lambda syntax natively)
    Q("f9_ch_lambda", ch("""
      SELECT number,
             arrayStringConcat(arrayMap(x -> x * 2, range(number + 1)), ',') AS doubled,
             arrayStringConcat(arrayFilter(x -> x % 2 = 0, range(number + 1)), ',') AS evens,
             arrayExists(x -> x = 3, range(number + 1)) AS has3,
             arrayCount(x -> x % 2 = 1, range(number + 1)) AS n_odd,
             arraySum(x -> x * x, range(number + 1)) AS sum_sq
      FROM numbers(6) ORDER BY number"""),
      Some("""
      SELECT range AS number,
             array_to_string(list_transform(range(0, range + 1), x -> x * 2), ',') AS doubled,
             array_to_string(list_filter(range(0, range + 1), x -> x % 2 = 0), ',') AS evens,
             len(list_filter(range(0, range + 1), x -> x = 3)) > 0 AS has3,
             CAST(len(list_filter(range(0, range + 1), x -> x % 2 = 1)) AS BIGINT) AS n_odd,
             CAST(list_sum(list_transform(range(0, range + 1), x -> x * x)) AS DOUBLE) AS sum_sq
      FROM range(6) ORDER BY number""")),

    // F2b: second string family — pads/repeat/reverse/arrayStringConcat
    Q("f12_ch_strings2", ch("""
      SELECT number,
             leftPad(toString(number), 5, '0') AS padded,
             repeat('ab', CAST(number % 3 AS Int32)) AS rep,
             reverse(toString(number * 111)) AS rev,
             arrayStringConcat(range(number % 3 + 1), '-') AS joined,
             trimBoth('  x  ') AS trimmed
      FROM numbers(6) ORDER BY number"""),
      Some("""
      SELECT range AS number,
             lpad(CAST(range AS VARCHAR), 5, '0') AS padded,
             repeat('ab', CAST(range % 3 AS INT)) AS rep,
             reverse(CAST(range * 111 AS VARCHAR)) AS rev,
             array_to_string(range(0, range % 3 + 1), '-') AS joined,
             trim('  x  ') AS trimmed
      FROM range(6) ORDER BY number""")),

    // F8c: arrayJoin as a row generator in the projection
    // (ClickHouse's lateral explode; index.html:729 family)
    Q("f11_ch_arrayjoin", ch("""
      SELECT number, arrayJoin(range(number % 3 + 1)) AS j
      FROM numbers(5) ORDER BY number, j"""),
      Some("""
      SELECT range AS number, unnest(range(0, range % 3 + 1)) AS j
      FROM range(5) ORDER BY number, j""")),

    // O7: ORDER BY ... WITH FILL — ClickHouse gap-filling sort (no
    // Spark analog; custom operator, graft.operators.WithFill)
    Q("o7_with_fill", (s, dir) => {
      graft.dialect.ChContext.setup(s, dir)
      graft.dialect.Engine.execute(s, """
        SELECT yr, n FROM (
          SELECT toYear(o_orderdate) AS yr, count() AS n
          FROM orders GROUP BY yr)
        ORDER BY yr WITH FILL FROM 1990 TO 2010""")
    }, Some("""
      WITH c AS (SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n
                 FROM orders GROUP BY 1),
           g AS (SELECT CAST(unnest(generate_series(1990, 2009)) AS INT) AS yr)
      SELECT g.yr AS yr, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      FROM g LEFT JOIN c USING (yr) ORDER BY yr""")),

    // O7b: multi-key WITH FILL — the grid fills within every distinct
    // prefix-key combination (ClickHouse per-group fill semantics)
    Q("o7b_with_fill_multi", (s, dir) => {
      graft.dialect.ChContext.setup(s, dir)
      graft.dialect.Engine.execute(s, """
        SELECT g, m, n FROM (
          SELECT number % 2 AS g, number % 5 AS m, count() AS n
          FROM numbers(20) WHERE number % 7 != 0 GROUP BY g, m)
        ORDER BY g, m WITH FILL FROM 0 TO 6""")
    }, Some("""
      WITH c AS (SELECT range % 2 AS g, range % 5 AS m, count(*) AS n
                 FROM range(20) WHERE range % 7 <> 0 GROUP BY 1, 2),
           grid AS (SELECT DISTINCT c.g AS g, gs.m AS m
                    FROM c, (SELECT unnest(generate_series(0, 5)) AS m) gs)
      SELECT grid.g AS g, grid.m AS m, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      FROM grid LEFT JOIN c USING (g, m) ORDER BY g, m""")),

    // P1b: `SELECT * EXCEPT col` star modifier (paren-less ClickHouse
    // form; the parenthesized form is Spark-native)
    Q("p8_star_except", ch("""
      SELECT * EXCEPT text FROM documents ORDER BY doc_id LIMIT 50"""),
      Some("""
      SELECT doc_id, lang, source, n_chars FROM documents
      ORDER BY doc_id LIMIT 50""")),

    // G16: GROUP BY ALL — group on every non-aggregate select item
    // (ClickHouse and Spark both resolve it natively; evidence row)
    Q("g16_ch_group_by_all", ch("""
      SELECT o_orderstatus, o_orderpriority, count() AS n
      FROM orders GROUP BY ALL
      ORDER BY o_orderstatus, o_orderpriority"""),
      Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY ALL
      ORDER BY o_orderstatus, o_orderpriority""")),

    // G10+: behavioral/funnel analytics family (ClickHouse-distinctive
    // aggregates over the events stream; docs-faithful, see
    // functions/Funnel.scala). retention: r[0]=cond1 ever, r[i]=cond1
    // AND cond(i+1) both ever — serialized to text for the compare
    // boundary (list cells can't be hash-sorted).
    Q("g17_retention", ch("""
      SELECT user_id,
             arrayStringConcat(
               arrayMap(x -> toString(x),
                 retention(event_type = 'view', event_type = 'click',
                           event_type = 'purchase')), ',') AS r
      FROM events GROUP BY user_id ORDER BY user_id"""),
      Some("""
      SELECT user_id, concat_ws(',', v, v*c, v*p) AS r
      FROM (SELECT user_id,
              max(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS v,
              max(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS c,
              max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p
            FROM events GROUP BY user_id)
      ORDER BY user_id""")),

    // windowFunnel: max view->click->purchase level per user, every
    // step within 1h of the CHAIN-START view, strictly increasing ts
    // (strict_increase pins the oracle's strict EXISTS-chain exactly).
    // Known tie caveat (ADVICE r10, applies to st8 too): windowFunnel's
    // latest-start carry overwrites the chain start on each later cond-1
    // event — ClickHouse behavior — while this EXISTS oracle is purely
    // existential. The two can diverge only when a user has a cond-1 and
    // a cond-2 event at the SAME timestamp under strict_increase
    // (view@t1, view@t5, click@t5: carry 1, oracle 2). The driver
    // fixtures' per-user event timestamps never tie on funnel step
    // pairs, so the oracle is exact here; the engine's own semantics
    // are pinned independently in FunnelSpec (incl. equal-ts refusal).
    Q("g18_window_funnel", ch("""
      SELECT lvl, count() AS users FROM (
        SELECT user_id,
               windowFunnel(3600, 'strict_increase')(
                 ts, event_type = 'view', event_type = 'click',
                 event_type = 'purchase') AS lvl
        FROM events GROUP BY user_id)
      GROUP BY lvl ORDER BY lvl"""),
      Some("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      lv AS (SELECT u.user_id,
        CASE
          WHEN EXISTS (SELECT 1 FROM events v, events c, events p
                 WHERE v.user_id = u.user_id AND c.user_id = u.user_id
                   AND p.user_id = u.user_id
                   AND v.event_type = 'view' AND c.event_type = 'click'
                   AND p.event_type = 'purchase'
                   AND c.ts > v.ts AND p.ts > c.ts
                   AND c.ts <= v.ts + INTERVAL 3600 SECOND
                   AND p.ts <= v.ts + INTERVAL 3600 SECOND) THEN 3
          WHEN EXISTS (SELECT 1 FROM events v, events c
                 WHERE v.user_id = u.user_id AND c.user_id = u.user_id
                   AND v.event_type = 'view' AND c.event_type = 'click'
                   AND c.ts > v.ts
                   AND c.ts <= v.ts + INTERVAL 3600 SECOND) THEN 2
          WHEN EXISTS (SELECT 1 FROM events v
                 WHERE v.user_id = u.user_id
                   AND v.event_type = 'view') THEN 1
          ELSE 0 END AS lvl
        FROM u)
      SELECT lvl, count(*) AS users FROM lv GROUP BY lvl ORDER BY lvl"""),
      bench = true),

    // sequenceMatch: signup somewhere before a purchase (any events
    // between; the time-ordered chain the pattern engine searches)
    Q("g19_sequence_match", ch("""
      SELECT user_id,
             sequenceMatch('(?1).*(?2)')(
               ts, event_type = 'signup', event_type = 'purchase') AS m
      FROM events GROUP BY user_id ORDER BY user_id"""),
      Some("""
      SELECT ev.user_id,
        CASE WHEN EXISTS (SELECT 1 FROM events s, events p
               WHERE s.user_id = ev.user_id AND p.user_id = ev.user_id
                 AND s.event_type = 'signup' AND p.event_type = 'purchase'
                 AND p.ts > s.ts) THEN 1 ELSE 0 END AS m
      FROM (SELECT DISTINCT user_id FROM events) ev ORDER BY user_id""")),

    // sequenceCount with an adjacency pattern: view IMMEDIATELY
    // followed by click within the user's view/click subsequence
    // (adjacent one-hot matches cannot overlap, so the non-overlapping
    // greedy count equals the lead()-pair count the oracle takes)
    Q("g20_sequence_count", ch("""
      SELECT user_id,
             sequenceCount('(?1)(?2)')(
               ts, event_type = 'view', event_type = 'click') AS c
      FROM events GROUP BY user_id ORDER BY user_id"""),
      Some("""
      SELECT ev.user_id, CAST(coalesce(p.c, 0) AS BIGINT) AS c
      FROM (SELECT DISTINCT user_id FROM events) ev
      LEFT JOIN (
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'view' AND nxt = 'click') AS c
        FROM (SELECT user_id, event_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, CASE event_type WHEN 'view' THEN 1 ELSE 2 END) AS nxt
              FROM events WHERE event_type IN ('view', 'click'))
        GROUP BY user_id) p ON p.user_id = ev.user_id
      ORDER BY ev.user_id""")),

    // uniqUpTo(N): exact distinct count saturating at N+1 — the
    // bounded-state cardinality probe (state <= N+1 values per group
    // at any scale)
    Q("g21_uniq_upto", ch("""
      SELECT event_type, uniqUpTo(10)(user_id) AS u
      FROM events GROUP BY event_type ORDER BY event_type"""),
      Some("""
      SELECT event_type,
             CAST(least(count(DISTINCT user_id), 11) AS BIGINT) AS u
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // G-extras: -Distinct aliases, Pearson corr (Spark builtin through
    // the dialect), groupArraySorted(n), topKWeighted(k) — the
    // weighted space-saving sketch is EXACT here (7 distinct line
    // numbers << capacity), so DuckDB reproduces it as a plain
    // weight-ordered top-2
    Q("g22_agg_extras", ch("""
      SELECT l_returnflag,
             countDistinct(l_suppkey) AS cd,
             sumDistinct(l_linenumber) AS sd,
             round(corr(l_quantity, l_extendedprice), 3) + 0 AS cor,
             arrayStringConcat(arrayMap(x -> toString(x),
               groupArraySorted(3)(l_linenumber)), ',') AS g3,
             arrayStringConcat(arrayMap(x -> toString(x),
               topKWeighted(2)(l_linenumber, CAST(l_quantity AS Int64))), ',') AS tk
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
      WITH wk AS (SELECT l_returnflag, l_linenumber,
                    sum(CAST(l_quantity AS BIGINT)) AS w
                  FROM lineitem GROUP BY 1, 2),
      tk AS (SELECT l_returnflag,
               string_agg(CAST(l_linenumber AS VARCHAR), ','
                 ORDER BY w DESC, CAST(l_linenumber AS VARCHAR)) FILTER (rk <= 2) AS tk
             FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                     ORDER BY w DESC, CAST(l_linenumber AS VARCHAR)) AS rk
                   FROM wk)
             GROUP BY l_returnflag)
      SELECT l.l_returnflag,
             count(DISTINCT l.l_suppkey) AS cd,
             CAST(sum(DISTINCT l.l_linenumber) AS BIGINT) AS sd,
             round(corr(l.l_quantity, l.l_extendedprice), 3) + 0 AS cor,
             array_to_string(list_sort(list(l.l_linenumber))[1:3], ',') AS g3,
             any_value(tk.tk) AS tk
      FROM lineitem l JOIN tk ON tk.l_returnflag = l.l_returnflag
      GROUP BY l.l_returnflag ORDER BY l.l_returnflag""")),

    // sequenceMatch time constraint: view IMMEDIATELY followed (in the
    // view/purchase subsequence) by a purchase no more than 15 minutes
    // later — (?t<=900) bounds the gap between the two matched events
    Q("g23_sequence_time", ch("""
      SELECT user_id,
             sequenceMatch('(?1)(?t<=900)(?2)')(
               ts, event_type = 'view', event_type = 'purchase') AS m
      FROM events GROUP BY user_id ORDER BY user_id"""),
      Some("""
      SELECT ev.user_id, CASE WHEN EXISTS (
        SELECT 1 FROM (
          SELECT user_id, event_type, ts,
                 lead(event_type) OVER w AS nt, lead(ts) OVER w AS nts
          FROM events WHERE event_type IN ('view', 'purchase')
          WINDOW w AS (PARTITION BY user_id
            ORDER BY ts, CASE event_type WHEN 'view' THEN 1 ELSE 2 END)
        ) x WHERE x.user_id = ev.user_id AND x.event_type = 'view'
            AND x.nt = 'purchase'
            AND x.nts - x.ts <= INTERVAL 900 SECOND) THEN 1 ELSE 0 END AS m
      FROM (SELECT DISTINCT user_id FROM events) ev ORDER BY ev.user_id""")),

    // deltaSumTimestamp (positive consecutive deltas in event-time
    // order), sumCount tuple, boundingRatio slope — per user over the
    // events stream; single-event users excluded (0/0 slope)
    Q("g24_delta_bounding", ch("""
      SELECT user_id,
             round(deltaSumTimestamp(value, ts), 4) AS ds,
             round(tupleElement(sumCount(value), 1), 4) AS s,
             tupleElement(sumCount(value), 2) AS c,
             round(boundingRatio(event_id, value), 6) + 0 AS br
      FROM events GROUP BY user_id HAVING count() >= 2
      ORDER BY user_id"""),
      Some("""
      WITH l AS (SELECT user_id,
                   value - lag(value) OVER (PARTITION BY user_id
                     ORDER BY ts, value) AS dd
                 FROM events),
      dsum AS (SELECT user_id,
                 sum(CASE WHEN dd > 0 THEN dd ELSE 0 END) AS ds
               FROM l GROUP BY user_id),
      ag AS (SELECT user_id, sum(value) s, count(value) c,
               arg_max(value, event_id) ymax, arg_min(value, event_id) ymin,
               max(event_id) xmax, min(event_id) xmin, count(*) n
             FROM events GROUP BY user_id)
      SELECT ag.user_id, round(coalesce(dsum.ds, 0), 4) AS ds,
             round(ag.s, 4) AS s, ag.c AS c,
             round((ag.ymax - ag.ymin) / (ag.xmax - ag.xmin), 6) + 0 AS br
      FROM ag LEFT JOIN dsum ON dsum.user_id = ag.user_id
      WHERE ag.n >= 2 ORDER BY ag.user_id""")),

    // F31: vector distance/norm family over the embeddings table —
    // ZipWith/ArrayAggregate compositions (codegen'd, no UDF); every
    // vector pairs with a deterministic partner and DuckDB recomputes
    // all seven measures from indexed unnest
    Q("f31_vector_fns", ch("""
      SELECT a.vec_id,
             round(dotProduct(a.embedding, b.embedding), 4) + 0 AS dp,
             round(L2Norm(a.embedding), 4) AS n2,
             round(L1Distance(a.embedding, b.embedding), 4) AS d1,
             round(L2Distance(a.embedding, b.embedding), 4) AS d2,
             round(LinfDistance(a.embedding, b.embedding), 4) AS dinf,
             round(cosineDistance(a.embedding, b.embedding), 6) + 0 AS cd,
             round(arraySum(normalizeL2(a.embedding)), 4) + 0 AS nsum
      FROM embeddings a JOIN embeddings b ON b.vec_id = (a.vec_id + 7) % 500
      ORDER BY a.vec_id"""),
      Some("""
      WITH p AS (SELECT a.vec_id, a.embedding ea, b.embedding eb
                 FROM embeddings a JOIN embeddings b
                   ON b.vec_id = (a.vec_id + 7) % 500),
      u AS (SELECT vec_id, CAST(ea[i] AS DOUBLE) x, CAST(eb[i] AS DOUBLE) y
            FROM p, LATERAL (SELECT unnest(generate_series(1, len(ea))) AS i) g)
      SELECT vec_id,
             round(sum(x*y), 4) + 0 AS dp,
             round(sqrt(sum(x*x)), 4) AS n2,
             round(sum(abs(x-y)), 4) AS d1,
             round(sqrt(sum((x-y)*(x-y))), 4) AS d2,
             round(max(abs(x-y)), 4) AS dinf,
             round(1 - sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) + 0 AS cd,
             round(sum(x) / sqrt(sum(x*x)), 4) + 0 AS nsum
      FROM u GROUP BY vec_id ORDER BY vec_id""")),

    // F33: hasToken — whole-token membership over the alphanumeric
    // tokenizer (the same split the tokenbf_v1 skip index blooms, so
    // the prune rule answers this predicate from the index). 'URGENT'
    // is a whole token of '1-URGENT'; 'URG' is not.
    Q("f33_hastoken", ch("""
      SELECT o_orderpriority,
             hasToken(o_orderpriority, 'URGENT') AS whole,
             hasToken(o_orderpriority, 'URG') AS partial,
             count() AS n
      FROM orders GROUP BY o_orderpriority, whole, partial
      ORDER BY o_orderpriority"""),
      Some("""
      SELECT o_orderpriority,
             list_contains(string_split_regex(o_orderpriority,
               '[^A-Za-z0-9_]+'), 'URGENT') AS whole,
             list_contains(string_split_regex(o_orderpriority,
               '[^A-Za-z0-9_]+'), 'URG') AS partial,
             count(*) AS n
      FROM orders GROUP BY 1, 2, 3 ORDER BY o_orderpriority""")),

    // F32: arrayAUC — per-row ROC AUC over (score, alternating-label)
    // pairs; the oracle recomputes the Mann-Whitney pair statistic
    // exactly (ties counted half)
    Q("f32_array_auc", ch("""
      SELECT vec_id,
             round(arrayAUC(embedding,
               arrayMap(x -> x % 2, range(64))), 6) AS auc
      FROM embeddings ORDER BY vec_id"""),
      Some("""
      WITH u AS (SELECT vec_id, CAST(embedding[i] AS DOUBLE) s, (i-1) % 2 lab
                 FROM embeddings,
                      LATERAL (SELECT unnest(generate_series(1, 64)) i) g),
      pairs AS (SELECT p.vec_id,
                  CASE WHEN p.s > q.s THEN 1.0
                       WHEN p.s = q.s THEN 0.5 ELSE 0.0 END AS u01
                FROM u p JOIN u q ON q.vec_id = p.vec_id
                WHERE p.lab = 1 AND q.lab = 0)
      SELECT vec_id, round(sum(u01) / (32.0 * 32.0), 6) AS auc
      FROM pairs GROUP BY vec_id ORDER BY vec_id""")),

    // G25: adaptive histogram (Ben-Haim/Tong streaming sketch). The
    // bin placement is sketch-defined, so the gate checks the exact
    // invariants instead: bin count == N, heights sum EXACTLY to the
    // row count, outer bounds cover min/max
    Q("g25_histogram", (s, dir) => {
      graft.dialect.ChContext.setup(s, dir)
      graft.dialect.Engine.execute(s, """
        SELECT histogram(10)(value) AS h, min(value) AS mn, max(value) AS mx
        FROM events""")
        .selectExpr("size(h) AS nb",
          "round(aggregate(h, cast(0 AS DOUBLE), (a, x) -> a + x.height), 4) AS total",
          "element_at(h, 1).lower <= mn AND element_at(h, size(h)).upper >= mx AS bounds_ok")
    }, Some("""
      SELECT 10 AS nb, round(CAST(count(value) AS DOUBLE), 4) AS total,
             TRUE AS bounds_ok
      FROM events""")),

    // O7c: WITH FILL ... INTERPOLATE (col AS col) — synthesized grid
    // rows carry the last real value forward per prefix group instead
    // of the type default
    Q("o7c_with_fill_interpolate", (s, dir) => {
      graft.dialect.ChContext.setup(s, dir)
      graft.dialect.Engine.execute(s, """
        SELECT g, m, n FROM (
          SELECT number % 2 AS g, number % 5 AS m, count() AS n
          FROM numbers(20) WHERE number % 7 != 0 AND number % 5 < 3
          GROUP BY g, m)
        ORDER BY g, m WITH FILL FROM 0 TO 6 INTERPOLATE (n AS n)""")
    }, Some("""
      WITH c AS (SELECT range % 2 AS g, range % 5 AS m, count(*) AS n
                 FROM range(20) WHERE range % 7 <> 0 AND range % 5 < 3
                 GROUP BY 1, 2),
           grid AS (SELECT DISTINCT c.g AS g, gs.m AS m
                    FROM c, (SELECT unnest(generate_series(0, 5)) AS m) gs),
           j AS (SELECT grid.g AS g, grid.m AS m, c.n AS n
                 FROM grid LEFT JOIN c USING (g, m))
      SELECT g, m, CAST(coalesce(last_value(n IGNORE NULLS) OVER (
               PARTITION BY g ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS n
      FROM j ORDER BY g, m""")),

    // P1c: `SELECT * REPLACE (expr AS col)` star modifier — same
    // column set with the replaced values (the transpile moves the
    // replaced columns to the end of the star expansion)
    Q("p9_star_replace", ch("""
      SELECT * REPLACE (n_chars * 2 AS n_chars, upper(lang) AS lang)
      FROM documents ORDER BY doc_id LIMIT 20"""),
      Some("""
      SELECT doc_id, text, upper(lang) AS lang, source,
             CAST(n_chars * 2 AS BIGINT) AS n_chars
      FROM documents ORDER BY doc_id LIMIT 20""")),

    // P10: `* EXCEPT (...) APPLY(f)` — schema-expanded at analysis
    // time like ClickHouse; result columns carry CH's `f(col)` names
    Q("p10_star_apply", ch("""
      SELECT * EXCEPT (n_comment) APPLY(max) FROM nation"""),
      Some("""
      SELECT max(n_nationkey) AS "max(n_nationkey)",
             max(n_name) AS "max(n_name)",
             max(n_regionkey) AS "max(n_regionkey)"
      FROM nation""")),

    // P11: COLUMNS('re') selects by regex, with and without APPLY
    Q("p11_columns_regex", ch("""
      SELECT COLUMNS('_(name|regionkey)$') APPLY(count) FROM nation"""),
      Some("""
      SELECT count(n_name) AS "count(n_name)",
             count(n_regionkey) AS "count(n_regionkey)"
      FROM nation""")),

    // O10: QUALIFY — the post-window filter; rewritten to compute the
    // condition inside a subquery and filter outside (window aliases
    // referenced by the condition are inlined)
    Q("o10_qualify", ch("""
      SELECT number % 3 AS g, number,
             row_number() OVER (PARTITION BY number % 3 ORDER BY number DESC) AS rn
      FROM numbers(20)
      QUALIFY rn <= 2
      ORDER BY g, number"""),
      Some("""
      SELECT range % 3 AS g, range AS number,
             CAST(row_number() OVER (PARTITION BY range % 3 ORDER BY range DESC) AS INT) AS rn
      FROM range(20)
      QUALIFY rn <= 2
      ORDER BY g, number""")),

    // F8e: ARRAY JOIN of multiple parallel arrays (zip semantics —
    // all arrays iterate in lockstep, sized like the first)
    Q("f14b_ch_arrayjoin_zip", ch("""
      SELECT number, a, b FROM numbers(4)
      ARRAY JOIN range(number + 1) AS a,
                 arrayMap(x -> x * 10 + 1, range(number + 1)) AS b
      ORDER BY number, a"""),
      Some("""
      SELECT range AS number, unnest(range(0, range + 1)) AS a,
             unnest(list_transform(range(0, range + 1), x -> x * 10 + 1)) AS b
      FROM range(4) ORDER BY number, a""")),

    // F8d: ARRAY JOIN clause form (lateral flatten; the arrayJoin()
    // function form is f11)
    Q("f14_ch_arrayjoin_clause", ch("""
      SELECT number, j FROM numbers(5) ARRAY JOIN range(number % 3 + 1) AS j
      ORDER BY number, j"""),
      Some("""
      SELECT range AS number, unnest(range(0, range % 3 + 1)) AS j
      FROM range(5) ORDER BY number, j""")),

    // O2b: ClickHouse LIMIT offset,n + trailing SETTINGS (dropped)
    Q("o8_ch_limit_offset", ch("""
      SELECT number FROM numbers(100) ORDER BY number
      LIMIT 10, 5 SETTINGS max_threads = 4"""),
      Some("""
      SELECT range AS number FROM range(100) ORDER BY number
      LIMIT 5 OFFSET 10""")),

    // G8c: -Array combinators — flatten-then-aggregate across rows
    Q("g14_array_combinators", ch("""
      SELECT number % 2 AS g,
             countArray(range(number + 1)) AS total_elems,
             max(arraySum(range(number + 1))) AS per_row_demo,
             sumArray(range(number + 1)) AS total_sum,
             round(avgArray(range(number + 1)), 6) AS avg_elem
      FROM numbers(6) GROUP BY g ORDER BY g"""),
      Some("""
      SELECT g,
             CAST(sum(n_elems) AS BIGINT) AS total_elems,
             CAST(max(row_sum) AS DOUBLE) AS per_row_demo,
             CAST(sum(row_sum) AS DOUBLE) AS total_sum,
             round(sum(row_sum) / sum(n_elems), 6) AS avg_elem
      FROM (SELECT range % 2 AS g,
                   len(range(0, range + 1)) AS n_elems,
                   CAST(list_sum(list_transform(range(0, range + 1), x -> x)) AS DOUBLE) AS row_sum
            FROM range(6))
      GROUP BY g ORDER BY g""")),

    // F7b: URL function family — parse a constructed URL and compare
    // against the directly-constructed truth
    Q("f16_ch_url", ch("""
      SELECT doc_id,
             domain(concat('https://www.', lang, '.example.com/p/',
                           toString(doc_id), '?q=', lang)) AS d,
             path(concat('https://www.', lang, '.example.com/p/',
                         toString(doc_id), '?q=', lang)) AS p,
             extractURLParameter(concat('https://www.', lang, '.example.com/p/',
                                        toString(doc_id), '?q=', lang), 'q') AS qp
      FROM documents ORDER BY doc_id LIMIT 100"""),
      Some("""
      SELECT doc_id, 'www.' || lang || '.example.com' AS d,
             '/p/' || CAST(doc_id AS VARCHAR) AS p, lang AS qp
      FROM documents ORDER BY doc_id LIMIT 100""")),

    // F9c: bit-manipulation family over the numbers source
    Q("f17_ch_bitops", ch("""
      SELECT number,
             bitAnd(number, 12) AS ba, bitOr(number, 5) AS bo,
             bitXor(number, 9) AS bx, bitShiftLeft(number, 2) AS sl,
             bitShiftRight(number, 1) AS sr
      FROM numbers(50) ORDER BY number"""),
      Some("""
      SELECT range AS number,
             range & 12 AS ba, range | 5 AS bo,
             xor(range, 9) AS bx, range << 2 AS sl, range >> 1 AS sr
      FROM range(50) ORDER BY number""")),

    // G5b: HAVING through the dialect
    Q("g11_ch_having", ch("""
      SELECT o_custkey, count() AS n,
             sum(CAST(o_totalprice AS Decimal(12,2))) AS spend
      FROM orders GROUP BY o_custkey HAVING count() >= 12
      ORDER BY o_custkey"""),
      Some("""
      SELECT o_custkey, count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
      FROM orders GROUP BY o_custkey HAVING count(*) >= 12
      ORDER BY o_custkey""")),

    // P7: correlated scalar subquery
    Q("p7_ch_subquery", ch("""
      SELECT c_custkey,
             (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      FROM customer ORDER BY c_custkey LIMIT 500"""),
      Some("""
      SELECT c_custkey,
             (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      FROM customer ORDER BY c_custkey LIMIT 500""")),

    // P1b: Map/tuple literals — the Play kitchen-sink shapes
    // (index.html:729), serialized to JSON for the compare
    Q("f13_ch_map", ch("""
      SELECT number,
             toJSONString(CAST((['hello', 'world'], [number, number % 2])
                          AS Map(String, UInt64))) AS mj,
             tupleElement(tuple(number, toString(number)), 2) AS ts
      FROM numbers(10) ORDER BY number"""),
      Some("""
      SELECT range AS number,
             CAST(to_json(map(['hello', 'world'], [range, range % 2])) AS VARCHAR) AS mj,
             CAST(range AS VARCHAR) AS ts
      FROM range(10) ORDER BY number""")),

    // G8b: -State/-Merge two-phase aggregation — states computed at a
    // fine grouping, merged at a coarser one (the scalable two-level
    // pattern; exact combinators so DuckDB can oracle it)
    Q("g12_state_merge", ch("""
      SELECT l_returnflag,
             countMerge(cs) AS n,
             sumMerge(ss) AS qty,
             minMerge(ms) AS min_qty,
             maxMerge(xs) AS max_qty,
             round(avgMerge(avs), 4) AS avg_qty
      FROM (
        SELECT l_returnflag, l_linestatus,
               countState() AS cs,
               sumState(CAST(l_quantity AS Decimal(12,2))) AS ss,
               minState(CAST(l_quantity AS Decimal(12,2))) AS ms,
               maxState(CAST(l_quantity AS Decimal(12,2))) AS xs,
               avgState(l_quantity) AS avs
        FROM lineitem GROUP BY l_returnflag, l_linestatus)
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
      SELECT l_returnflag,
             CAST(sum(cs) AS BIGINT) AS n,
             CAST(sum(ss) AS DOUBLE) AS qty,
             CAST(min(ms) AS DOUBLE) AS min_qty,
             CAST(max(xs) AS DOUBLE) AS max_qty,
             round(sum(avs_s) / sum(avs_c), 4) AS avg_qty
      FROM (
        SELECT l_returnflag, l_linestatus,
               count(*) AS cs,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS ss,
               min(CAST(l_quantity AS DECIMAL(12,2))) AS ms,
               max(CAST(l_quantity AS DECIMAL(12,2))) AS xs,
               sum(CAST(l_quantity AS DOUBLE)) AS avs_s,
               count(l_quantity) AS avs_c
        FROM lineitem GROUP BY l_returnflag, l_linestatus)
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // G9d: topK heavy hitters — space-saving sketch (exact here:
    // cardinality 5 << sketch capacity, so the oracle is the true
    // count-ordered top 3 per group)
    Q("g13_topk", ch("""
      SELECT o_orderstatus,
             arrayStringConcat(topK(3)(o_orderpriority), ',') AS top_prio
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      Some("""
      WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
                 FROM orders GROUP BY 1, 2),
           r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
      SELECT o_orderstatus,
             array_to_string(list(o_orderpriority ORDER BY cnt DESC, o_orderpriority), ',') AS top_prio
      FROM r WHERE rn <= 3
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""), bench = true),

    // G9e: statistical aggregate family (rounded: double moments are
    // accumulation-order dependent across parallel partials)
    Q("g15_stats", ch("""
      SELECT l_returnflag,
             round(stddevPop(CAST(l_quantity AS Float64)), 6) AS sd_pop,
             round(stddevSamp(CAST(l_quantity AS Float64)), 6) AS sd_samp,
             round(varPop(CAST(l_quantity AS Float64)), 4) AS v_pop,
             round(covarPop(CAST(l_quantity AS Float64),
                            CAST(l_discount AS Float64)), 6) AS cv_pop
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
      SELECT l_returnflag,
             round(stddev_pop(CAST(l_quantity AS DOUBLE)), 6) AS sd_pop,
             round(stddev_samp(CAST(l_quantity AS DOUBLE)), 6) AS sd_samp,
             round(var_pop(CAST(l_quantity AS DOUBLE)), 4) AS v_pop,
             round(covar_pop(CAST(l_quantity AS DOUBLE),
                             CAST(l_discount AS DOUBLE)), 6) AS cv_pop
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // P5: CAST with ClickHouse type names
    Q("f7_ch_cast", ch("""
      SELECT number, CAST(number AS UInt8) AS u8,
             CAST(number AS Int64) AS i64,
             CAST(number AS Float64) AS f64,
             CAST(number * 1000000000 AS UInt64) AS u64
      FROM numbers(5) ORDER BY number"""),
      Some("""
      SELECT range AS number, CAST(range AS SMALLINT) AS u8,
             CAST(range AS BIGINT) AS i64, CAST(range AS DOUBLE) AS f64,
             CAST(range * 1000000000 AS DECIMAL(20,0)) AS u64
      FROM range(5) ORDER BY number""")),

    // F18: tier-2 date/time family (quarter/weekday grids, ts arithmetic)
    Q("f18_ch_datetime2", ch("""
      SELECT number,
             toInt64(toQuarter(addDays(toDate('2024-01-01'), toInt32(number * 40)))) AS q,
             toInt64(toDayOfYear(addDays(toDate('2024-01-01'), toInt32(number * 40)))) AS doy,
             toMonday(addDays(toDate('2024-01-01'), toInt32(number * 40))) AS mon,
             toStartOfQuarter(addDays(toDate('2024-01-01'), toInt32(number * 40))) AS soq,
             toStartOfWeek(addDays(toDate('2024-01-01'), toInt32(number * 40))) AS sow,
             addHours(toDateTime('2024-03-01 10:00:00'), number) AS ah,
             subtractMinutes(toDateTime('2024-03-01 10:00:00'), number * 7) AS sm,
             toStartOfFiveMinutes(addMinutes(toDateTime('2024-03-01 10:01:00'),
                                             number * 3)) AS s5,
             yesterday() < today() AS y
      FROM numbers(20) ORDER BY number"""),
      Some("""
      WITH n AS (SELECT range AS num FROM range(20)),
      d AS (SELECT num, DATE '2024-01-01' + INTERVAL (num * 40) DAY AS dd FROM n)
      SELECT num AS number,
             CAST(quarter(dd) AS BIGINT) AS q,
             CAST(dayofyear(dd) AS BIGINT) AS doy,
             CAST(date_trunc('week', dd) AS DATE) AS mon,
             CAST(date_trunc('quarter', dd) AS DATE) AS soq,
             CAST(date_trunc('week', dd + INTERVAL 1 DAY) - INTERVAL 1 DAY AS DATE) AS sow,
             TIMESTAMP '2024-03-01 10:00:00' + INTERVAL (num) HOUR AS ah,
             TIMESTAMP '2024-03-01 10:00:00' - INTERVAL (num * 7) MINUTE AS sm,
             make_timestamp((CAST(epoch(TIMESTAMP '2024-03-01 10:01:00'
               + INTERVAL (num * 3) MINUTE) AS BIGINT) // 300) * 300 * 1000000) AS s5,
             true AS y
      FROM d ORDER BY number""")),

    // F19: OrZero/OrNull try-conversions + parseDateTimeBestEffort
    Q("f19_ch_typeconv", ch("""
      SELECT number,
             toInt32OrNull(if(number % 3 = 0, 'x', toString(number))) AS i_n,
             toInt64OrZero(if(number % 3 = 0, 'x', toString(number))) AS i_z,
             toFloat64OrNull(concat(toString(number), '.5')) AS f_n,
             toString(toDateOrNull(if(number % 2 = 0, '2024-01-15', 'nope'))) AS d_n,
             parseDateTimeBestEffort(toString(1700000000 + number)) AS ts_u,
             parseDateTimeBestEffortOrNull('2024-02-29 12:30:00') AS ts_iso
      FROM numbers(12) ORDER BY number"""),
      Some("""
      WITH n AS (SELECT range AS num FROM range(12))
      SELECT num AS number,
             TRY_CAST(CASE WHEN num % 3 = 0 THEN 'x'
                           ELSE CAST(num AS VARCHAR) END AS INTEGER) AS i_n,
             COALESCE(TRY_CAST(CASE WHEN num % 3 = 0 THEN 'x'
                               ELSE CAST(num AS VARCHAR) END AS BIGINT), 0) AS i_z,
             TRY_CAST(CAST(num AS VARCHAR) || '.5' AS DOUBLE) AS f_n,
             CAST(TRY_CAST(CASE WHEN num % 2 = 0 THEN '2024-01-15'
                           ELSE 'nope' END AS DATE) AS VARCHAR) AS d_n,
             make_timestamp((1700000000 + num) * 1000000) AS ts_u,
             TIMESTAMP '2024-02-29 12:30:00' AS ts_iso
      FROM n ORDER BY number""")),

    // F20: tier-2 array family (min/max/avg/product, push/pop,
    // cumulative sums, differences) — arrays serialized for the compare
    Q("f20_ch_arrays2", ch("""
      SELECT number,
             toInt64(arrayMin(range(1, number + 2))) AS mn,
             toInt64(arrayMax(range(1, number + 2))) AS mx,
             round(arrayAvg(range(1, number + 2)), 6) AS av,
             round(arrayProduct(range(1, number + 2)), 2) AS pr,
             arrayStringConcat(arrayMap(x -> toString(x),
               arrayPushBack(range(3), number)), ',') AS pb,
             arrayStringConcat(arrayMap(x -> toString(x),
               arrayPopFront(range(1, number + 2))), ',') AS pf,
             arrayStringConcat(arrayMap(x -> toString(toInt64(x)),
               arrayCumSum(range(1, number + 2))), ',') AS cs,
             arrayStringConcat(arrayMap(x -> toString(x),
               arrayDifference(range(1, number + 2))), ',') AS df
      FROM numbers(8) ORDER BY number"""),
      Some("""
      WITH n AS (SELECT range AS num FROM range(8)),
      a AS (SELECT num, range(1, num + 2) AS l FROM n)
      SELECT num AS number,
             CAST(list_min(l) AS BIGINT) AS mn,
             CAST(list_max(l) AS BIGINT) AS mx,
             round(list_avg(l), 6) AS av,
             round(CAST(list_product(l) AS DOUBLE), 2) AS pr,
             array_to_string(list_append(range(3), num), ',') AS pb,
             COALESCE(array_to_string(l[2:], ','), '') AS pf,
             array_to_string(list_transform(range(1, len(l) + 1),
               i -> CAST(list_sum(l[1:i]) AS BIGINT)), ',') AS cs,
             array_to_string(list_transform(range(1, len(l) + 1),
               i -> CASE WHEN i = 1 THEN 0 ELSE l[i] - l[i-1] END), ',') AS df
      FROM a ORDER BY number""")),

    // F21: tier-2 strings + IPv4 + URL-cut
    Q("f21_ch_strings3", ch("""
      SELECT number,
             mid('hello world', 2, 5) AS m,
             base64Encode(toString(number * 1000)) AS b64,
             base64Decode(base64Encode('graft')) AS rt,
             arrayStringConcat(splitByWhitespace('a  b c'), '|') AS sw,
             toInt64(countMatches(concat('a,b,c,', toString(number)), ',')) AS cm,
             IPv4NumToString(toUInt32(16909060 + number)) AS ip,
             IPv4StringToNum('1.2.3.4') AS ipn,
             cutQueryString(concat('http://x.com/p?q=', toString(number))) AS cq,
             cutQueryStringAndFragment(concat('http://x.com/p?q=1#f',
                                              toString(number))) AS cqf
      FROM numbers(5) ORDER BY number"""),
      Some("""
      WITH n AS (SELECT range AS num FROM range(5))
      SELECT num AS number,
             substring('hello world', 2, 5) AS m,
             to_base64(CAST(CAST(num * 1000 AS VARCHAR) AS BLOB)) AS b64,
             'graft' AS rt,
             'a|b|c' AS sw,
             CAST(len(regexp_extract_all('a,b,c,' || CAST(num AS VARCHAR), ','))
                  AS BIGINT) AS cm,
             CAST((16909060 + num) // 16777216 % 256 AS VARCHAR) || '.' ||
             CAST((16909060 + num) // 65536 % 256 AS VARCHAR) || '.' ||
             CAST((16909060 + num) // 256 % 256 AS VARCHAR) || '.' ||
             CAST((16909060 + num) % 256 AS VARCHAR) AS ip,
             16909060 AS ipn,
             'http://x.com/p' AS cq,
             'http://x.com/p' AS cqf
      FROM n ORDER BY number""")),

    // F23: ClickHouse scalar WITH (expr AS ident) + mixed standard CTE
    Q("f23_ch_scalar_with", ch("""
      WITH 3 AS k, k * 10 AS lim,
           big AS (SELECT number FROM numbers(100) WHERE number >= lim)
      SELECT k AS kk, count(*) AS n_small, (SELECT count(*) FROM big) AS n_big
      FROM numbers(100) WHERE number < k"""),
      Some("""
      SELECT 3 AS kk,
             (SELECT count(*) FROM range(100) WHERE range < 3) AS n_small,
             (SELECT count(*) FROM range(100) WHERE range >= 30) AS n_big""")),

    // F24: toStartOfInterval time-buckets (day-time + year-month
    // grids) vs DuckDB's time_bucket
    Q("f24_ch_interval", ch("""
      SELECT number,
             toStartOfInterval(addMinutes(toDateTime('2024-03-01 00:02:00'),
               number * 11), INTERVAL 15 MINUTE) AS m15,
             toStartOfInterval(addHours(toDateTime('2024-03-01 00:02:00'),
               number * 7), INTERVAL 6 HOUR) AS h6,
             toStartOfInterval(addDays(toDate('2024-01-15'),
               toInt32(number * 23)), INTERVAL 2 MONTH) AS mo2,
             toStartOfInterval(addDays(toDate('2024-01-15'),
               toInt32(number * 45)), INTERVAL 1 QUARTER) AS q1
      FROM numbers(16) ORDER BY number"""),
      Some("""
      WITH n AS (SELECT range AS num FROM range(16))
      SELECT num AS number,
             time_bucket(INTERVAL 15 MINUTE,
               TIMESTAMP '2024-03-01 00:02:00' + INTERVAL (num * 11) MINUTE) AS m15,
             time_bucket(INTERVAL 6 HOUR,
               TIMESTAMP '2024-03-01 00:02:00' + INTERVAL (num * 7) HOUR) AS h6,
             CAST(time_bucket(INTERVAL 2 MONTH,
               DATE '2024-01-15' + INTERVAL (num * 23) DAY) AS DATE) AS mo2,
             CAST(time_bucket(INTERVAL 3 MONTH,
               DATE '2024-01-15' + INTERVAL (num * 45) DAY) AS DATE) AS q1
      FROM n ORDER BY number""")),

    // F25: sumMap per-key array aggregation (serialized for compare;
    // DuckDB reproduces via zipped unnest + group + ordered string_agg)
    Q("f25_ch_summap", ch("""
      SELECT number % 4 AS g,
             arrayStringConcat(arrayMap(x -> toString(x),
               tupleElement(sumMap(
                 [number % 3, number % 5 + 10], [1, 2]), 1)), ',') AS ks,
             arrayStringConcat(arrayMap(x -> toString(x),
               tupleElement(sumMap(
                 [number % 3, number % 5 + 10], [1, 2]), 2)), ',') AS vs
      FROM numbers(40) GROUP BY g ORDER BY g"""),
      Some("""
      WITH n AS (SELECT range AS num FROM range(40)),
      p AS (SELECT num % 4 AS g, unnest([num % 3, num % 5 + 10]) AS k,
                   unnest([1, 2]) AS v FROM n),
      s AS (SELECT g, k, sum(v) AS sv FROM p GROUP BY g, k)
      SELECT g, string_agg(CAST(k AS VARCHAR), ',' ORDER BY k) AS ks,
             string_agg(CAST(sv AS VARCHAR), ',' ORDER BY k) AS vs
      FROM s GROUP BY g ORDER BY g""")),

    // F26: JSON introspection + MySQL-token date parsing
    Q("f26_ch_json2", ch("""
      SELECT number,
             toInt64(JSONLength(concat('[1,2,', toString(number), ']'))) AS jl,
             arrayStringConcat(JSONExtractKeys(
               concat('{"a":1,"k', toString(number), '":2}')), ',') AS jk,
             parseDateTime(concat('2024-03-0', toString(number % 9 + 1),
               ' 10:30:00'), '%Y-%m-%d %H:%M:%S') AS pd,
             parseDateTimeOrNull('garbage', '%Y-%m-%d') AS bad
      FROM numbers(6) ORDER BY number"""),
      Some("""
      WITH n AS (SELECT range AS num FROM range(6))
      SELECT num AS number,
             CAST(json_array_length('[1,2,' || CAST(num AS VARCHAR) || ']')
                  AS BIGINT) AS jl,
             array_to_string(json_keys('{"a":1,"k' || CAST(num AS VARCHAR) ||
               '":2}'), ',') AS jk,
             strptime('2024-03-0' || CAST(num % 9 + 1 AS VARCHAR) ||
               ' 10:30:00', '%Y-%m-%d %H:%M:%S') AS pd,
             CAST(NULL AS TIMESTAMP) AS bad
      FROM n ORDER BY number""")),

    // F27: dateDiff boundary-crossing counts (ClickHouse == DuckDB
    // date_diff semantics), dateName text parts, extractAll matches
    Q("f27_ch_datediff", ch("""
      SELECT o_orderkey,
             dateDiff('day', toDate('1995-06-15'), o_orderdate) AS dd,
             dateDiff('week', toDate('1995-06-15'), o_orderdate) AS dw,
             dateDiff('month', toDate('1995-06-15'), o_orderdate) AS dm,
             dateDiff('quarter', toDate('1995-06-15'), o_orderdate) AS dq,
             dateDiff('year', toDate('1995-06-15'), o_orderdate) AS dy,
             age('month', toDate('1995-06-15'), o_orderdate) AS am,
             age('year', toDate('1995-06-15'), o_orderdate) AS ay,
             dateName('month', o_orderdate) AS mn,
             dateName('weekday', o_orderdate) AS wd,
             arrayStringConcat(extractAll(o_orderpriority, '[0-9]+'), ',') AS nums
      FROM orders ORDER BY o_orderkey LIMIT 200"""),
      Some("""
      SELECT o_orderkey,
             date_diff('day', DATE '1995-06-15', o_orderdate) AS dd,
             date_diff('week', DATE '1995-06-15', o_orderdate) AS dw,
             date_diff('month', DATE '1995-06-15', o_orderdate) AS dm,
             date_diff('quarter', DATE '1995-06-15', o_orderdate) AS dq,
             date_diff('year', DATE '1995-06-15', o_orderdate) AS dy,
             date_sub('month', DATE '1995-06-15', o_orderdate) AS am,
             date_sub('year', DATE '1995-06-15', o_orderdate) AS ay,
             monthname(o_orderdate) AS mn,
             dayname(o_orderdate) AS wd,
             COALESCE(array_to_string(regexp_extract_all(o_orderpriority, '[0-9]+'), ','), '') AS nums
      FROM orders ORDER BY o_orderkey LIMIT 200""")),

    // F28: misc tail — Shannon entropy (custom mergeable aggregate,
    // graft.functions.EntropyAgg, vs DuckDB's same-named log2
    // aggregate), anyHeavy (heavy hitter -> deterministic mode),
    // positionUTF8, finite guards, and the functional toInterval*
    // constructors (incl. month-end clamping)
    Q("f28_ch_misc", ch("""
      SELECT number % 3 AS g,
             round(entropy(number % 4), 6) AS ent,
             anyHeavy(if(number % 2 = 0, 7, number)) AS heavy,
             positionUTF8('hello world',
               if(g = 0, 'o', if(g = 1, 'world', 'zz'))) AS pos,
             reverseUTF8(toString(min(number) * 123 + 45)) AS rev,
             ifNotFinite(CAST('Infinity' AS Float64), -1.0) AS nofin,
             toInt32(isFinite(1.5)) AS fin,
             toInt32(isInfinite(CAST('Infinity' AS Float64))) AS inf0,
             toInt32(isNaN(CAST('NaN' AS Float64))) AS nan0,
             toDate(toDate('2024-01-10') + toIntervalDay(toInt32(g * 5 + 1))) AS dplus,
             toDate(toDate('2024-01-10') + toIntervalWeek(toInt32(g))) AS wplus,
             toDate(toDate('2024-01-31') + toIntervalMonth(toInt32(g))) AS mplus,
             toDate(toDate('2024-01-10') + toIntervalQuarter(toInt32(g))) AS qplus
      FROM numbers(50) GROUP BY g ORDER BY g"""),
      Some("""
      WITH n AS (SELECT range AS num FROM range(50))
      SELECT num % 3 AS g,
             round(entropy(num % 4), 6) AS ent,
             CAST(mode(CASE WHEN num % 2 = 0 THEN 7 ELSE num END) AS BIGINT) AS heavy,
             CAST(strpos('hello world',
               CASE WHEN num % 3 = 0 THEN 'o'
                    WHEN num % 3 = 1 THEN 'world' ELSE 'zz' END) AS INT) AS pos,
             reverse(CAST(min(num) * 123 + 45 AS VARCHAR)) AS rev,
             CAST(-1.0 AS DOUBLE) AS nofin,
             CAST(isfinite(1.5) AS INT) AS fin,
             CAST(isinf(CAST('Infinity' AS DOUBLE)) AS INT) AS inf0,
             CAST(isnan(CAST('NaN' AS DOUBLE)) AS INT) AS nan0,
             CAST(DATE '2024-01-10' + (num % 3 * 5 + 1) * INTERVAL 1 DAY AS DATE) AS dplus,
             CAST(DATE '2024-01-10' + (num % 3) * INTERVAL 7 DAY AS DATE) AS wplus,
             CAST(DATE '2024-01-31' + (num % 3) * INTERVAL 1 MONTH AS DATE) AS mplus,
             CAST(DATE '2024-01-10' + (num % 3 * 3) * INTERVAL 1 MONTH AS DATE) AS qplus
      FROM n GROUP BY g ORDER BY g""")),

    // W5: named WINDOW clause — Spark's parser has no WINDOW clause, so
    // the transpiler inlines each definition at its OVER use sites
    // (Transpiler.rewriteNamedWindows); DuckDB runs the clause natively
    Q("w5_named_window", ch("""
      SELECT number,
             sum(number) OVER w1 AS cum,
             round(avg(number) OVER w2, 4) AS ctr_avg,
             row_number() OVER w1 AS rn,
             max(number) OVER w3 AS grp_max
      FROM numbers(30)
      WINDOW w1 AS (ORDER BY number ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (ORDER BY number ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING),
             w3 AS (PARTITION BY number % 3 ORDER BY number)
      ORDER BY number"""),
      Some("""
      SELECT range AS number,
             CAST(sum(range) OVER w1 AS BIGINT) AS cum,
             round(avg(range) OVER w2, 4) AS ctr_avg,
             row_number() OVER w1 AS rn,
             max(range) OVER w3 AS grp_max
      FROM range(30)
      WINDOW w1 AS (ORDER BY range ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (ORDER BY range ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING),
             w3 AS (PARTITION BY range % 3 ORDER BY range)
      ORDER BY number""")),

    // F22: tier-2 aggregates (weighted mean, Kahan sum, popcount;
    // skewPop via DuckDB's sample-skew correction factor)
    Q("f22_ch_aggs2", ch("""
      SELECT l_returnflag,
             round(avgWeighted(CAST(l_extendedprice AS Float64),
                               CAST(l_quantity AS Float64)), 4) AS aw,
             round(sumKahan(l_discount), 4) AS sk,
             round(skewPop(CAST(l_quantity AS Float64)), 4) + 0 AS sp,
             toInt64(bitCount(count())) AS bc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
      SELECT l_returnflag,
             round(sum(CAST(l_extendedprice AS DOUBLE) * CAST(l_quantity AS DOUBLE))
                   / sum(CAST(l_quantity AS DOUBLE)), 4) AS aw,
             round(sum(CAST(l_discount AS DOUBLE)), 4) AS sk,
             round(skewness(CAST(l_quantity AS DOUBLE))
                   * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0)), 4) + 0 AS sp,
             CAST(bit_count(count(*)) AS BIGINT) AS bc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
    ,

    // O11: WITH RECURSIVE — ClickHouse 24.4+ surface; Spark 4 executes
    // it natively (UnionLoop), DuckDB is the oracle
    Q("o11_recursive_cte", ch("""
      WITH RECURSIVE fib AS (
        SELECT 1 AS i, toInt64(0) AS a, toInt64(1) AS b
        UNION ALL
        SELECT i + 1, b, a + b FROM fib WHERE i < 15)
      SELECT i, a AS fib FROM fib ORDER BY i"""),
      Some("""
      WITH RECURSIVE fib AS (
        SELECT 1 AS i, CAST(0 AS BIGINT) AS a, CAST(1 AS BIGINT) AS b
        UNION ALL
        SELECT i + 1, b, a + b FROM fib WHERE i < 15)
      SELECT i, a AS fib FROM fib ORDER BY i""")),

    // F30: array fold/count combinators, separator concat, in-frame
    // window names
    Q("f30_ch_arrays2", ch("""
      SELECT number AS n,
             arrayFold((acc, x) -> acc + x, range(number + 1),
                       toInt64(0)) AS fold_sum,
             countEqual([1, 2, 1, 3, 1], 1) AS ce,
             concatWithSeparator('-', toString(number), 'x') AS cw,
             size(emptyArrayString()) AS ea,
             lagInFrame(number, 1, toInt64(-1)) OVER (ORDER BY number) AS lg
      FROM numbers(10) ORDER BY n"""),
      Some("""
      SELECT number AS n,
             CAST((number * (number + 1)) // 2 AS BIGINT) AS fold_sum,
             CAST(3 AS BIGINT) AS ce,
             number::VARCHAR || '-' || 'x' AS cw,
             0 AS ea,
             lag(number, 1, -1) OVER (ORDER BY number) AS lg
      FROM (SELECT unnest(range(10)) AS number) ORDER BY n""")),

    // F29: bar() histogram rendering + transform() value decode — the
    // ClickHouse-tutorial pair. The oracle rebuilds bar's published
    // output (full blocks + one eighth-block char) from the same
    // total-eighths arithmetic, and transform as CASE
    Q("f29_ch_bar", ch("""
      SELECT l_linenumber AS k, count() AS n,
             bar(count(), 0, 20000, 20) AS b,
             transform(l_linenumber, [1, 2, 3],
                       ['one', 'two', 'three'], 'many') AS w
      FROM lineitem GROUP BY k ORDER BY k"""),
      Some("""
      WITH g AS (SELECT l_linenumber AS k, count(*) AS n
                 FROM lineitem GROUP BY 1),
           e AS (SELECT k, n,
                   CAST(round(least(greatest(((n / 20000.0) - 0)
                     * 20, 0), 20) * 8) AS INT) AS te FROM g)
      SELECT k, n,
             repeat('█', te // 8) ||
               (['','▏','▎','▍','▌','▋','▊','▉'])[(te % 8) + 1] AS b,
             CASE k WHEN 1 THEN 'one' WHEN 2 THEN 'two'
                    WHEN 3 THEN 'three' ELSE 'many' END AS w
      FROM e ORDER BY k""")),

    // §2.9: SQL-defined UDFs — `CREATE FUNCTION name AS (args) -> expr`
    // (ClickHouse 25.5 executable UDFs through the delegation point
    // main.py:190). Macros expand at the call site, so the oracle is
    // the hand-inlined expression; covers multi-arg, single-arg,
    // UDF-calling-UDF nesting and precedence-safe substitution.
    Q("f34_create_function", (s, dir) => {
      graft.dialect.ChContext.setup(s, dir)
      graft.dialect.Engine.execute(s, "DROP FUNCTION IF EXISTS graft_lin")
      graft.dialect.Engine.execute(s,
        "CREATE FUNCTION graft_lin AS (x, k, b) -> k * x + b")
      graft.dialect.Engine.execute(s, "DROP FUNCTION IF EXISTS graft_isodd")
      graft.dialect.Engine.execute(s,
        "CREATE FUNCTION graft_isodd AS x -> x % 2 = 1")
      graft.dialect.Engine.execute(s, """
        SELECT number,
               graft_lin(number, 2, 1) AS y,
               graft_isodd(number) AS odd,
               graft_lin(graft_lin(number, 2, 0), 3, 4) AS nested,
               graft_lin(number + 1, number, 2) AS prec
        FROM numbers(10) ORDER BY number""")
    }, Some("""
      SELECT range AS number,
             range * 2 + 1 AS y,
             range % 2 = 1 AS odd,
             (range * 2) * 3 + 4 AS nested,
             range * (range + 1) + 2 AS prec
      FROM range(10) ORDER BY number""")),

    // G4 tail: quantileExact / quantilesExact / quantileTiming — the
    // EXACT rule (sorted values, 0-based index min(floor(p*n), n-1),
    // ClickHouse AggregateFunctionQuantileExact), distinct from the
    // interpolated percentile that answers quantile(); the oracle
    // reproduces the same rank arithmetic in DuckDB rather than
    // trusting any builtin's rounding convention.
    Q("g26_quantile_exact", ch("""
      SELECT c_nationkey,
             CAST(quantileExact(0.5)(c_acctbal) AS Float64) AS med,
             CAST(quantileExact(0.25)(c_acctbal) AS Float64) AS q1,
             quantileTiming(0.9)(c_custkey % 20000) AS t90,
             CAST(arrayElement(quantilesExact(0.1, 0.9)(c_acctbal), 2) AS Float64) AS p90,
             CAST(quantileExactLow(0.5)(c_acctbal) AS Float64) AS med_lo,
             CAST(quantileExactHigh(0.5)(c_acctbal) AS Float64) AS med_hi
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""),
      Some("""
      SELECT c_nationkey,
             CAST(list_sort(list(c_acctbal))[LEAST(CAST(floor(0.5 * count(c_acctbal)) AS INT), CAST(count(c_acctbal) AS INT) - 1) + 1] AS DOUBLE) AS med,
             CAST(list_sort(list(c_acctbal))[LEAST(CAST(floor(0.25 * count(c_acctbal)) AS INT), CAST(count(c_acctbal) AS INT) - 1) + 1] AS DOUBLE) AS q1,
             CAST(list_sort(list(c_custkey % 20000))[LEAST(CAST(floor(0.9 * count(*)) AS INT), CAST(count(*) AS INT) - 1) + 1] AS DOUBLE) AS t90,
             CAST(list_sort(list(c_acctbal))[LEAST(CAST(floor(0.9 * count(c_acctbal)) AS INT), CAST(count(c_acctbal) AS INT) - 1) + 1] AS DOUBLE) AS p90,
             CAST(list_sort(list(c_acctbal))[CAST(floor(0.5 * (count(c_acctbal) - 1)) AS INT) + 1] AS DOUBLE) AS med_lo,
             CAST(list_sort(list(c_acctbal))[CAST(ceil(0.5 * (count(c_acctbal) - 1)) AS INT) + 1] AS DOUBLE) AS med_hi
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""))
  )
}
