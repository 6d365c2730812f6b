package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ClickHouse-SQL → Spark-SQL source transpiler (SURVEY.md §7 step 1).
  *
  * Textual rewrites mirroring the reference's own query shapes:
  *   - FORMAT-clause extraction (reference strips it the same way
  *     before delegating: /root/reference/main.py:534-546)
  *   - numbers(N) table function → range(N)
  *     (/root/reference/test/test_suite.py:323-336)
  *   - ternary `cond ? a : b` with ClickHouse nonzero-truthiness
  *     (/root/reference/public/index.html:729)
  *   - parameterized aggregates quantile(p)(x) → percentile(x, p)
  *   - bare `count()` → `count(*)`
  *   - ClickHouse type names in CAST (SURVEY §1.2 mapping)
  *
  * Function-name coverage lives in [[ChFunctions]] (registered on the
  * session, resolved by Catalyst — no text rewrite needed for those).
  */
object Transpiler {

  private val formatRe =
    "(?is)\\s+FORMAT\\s+([A-Za-z0-9]+)\\s*;?\\s*$".r

  /** Split off a trailing FORMAT clause; returns (sql, format). */
  def extractFormat(sql: String): (String, Option[String]) =
    formatRe.findFirstMatchIn(sql) match {
      case Some(m) => (sql.substring(0, m.start), Some(m.group(1)))
      case None => (sql.stripSuffix(";"), None)
    }


  /** Split a GROUP BY key list on depth-0 commas ("a, f(x, y), b"). */
  private def splitTopLevelCommas(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0; var start = 0
    s.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i).trim; start = i + 1
        case _ => ()
      }
    }
    out += s.substring(start).trim
    out.result().filter(_.nonEmpty)
  }

  /** Structural map regex-only SQL surgery is blind to: paren depth
    * before each char, plus whether the char sits inside a
    * single-quoted literal. Handles both ClickHouse escape forms inside
    * literals — backslash (`'O\'Brien'`) and doubling (`'O''Brien'`) —
    * which a naive quote-toggle would invert, flipping every keyword
    * match after the escape in/out of string state. */
  private def depthMap(sql: String): (Array[Int], Array[Boolean]) = {
    val depth = new Array[Int](sql.length + 1)
    val inStr = new Array[Boolean](sql.length + 1)
    var d = 0
    var s = false
    var i = 0
    while (i < sql.length) {
      depth(i) = d
      inStr(i) = s
      val c = sql.charAt(i)
      if (s) c match {
        case '\\' if i + 1 < sql.length => // escaped char: consume it
          depth(i + 1) = d; inStr(i + 1) = true; i += 1
        case '\'' if i + 1 < sql.length && sql.charAt(i + 1) == '\'' =>
          depth(i + 1) = d; inStr(i + 1) = true; i += 1 // doubled quote
        case '\'' => s = false
        case _ => ()
      }
      else c match {
        case '\'' => s = true
        case '(' | '[' => d += 1
        case ')' | ']' => d -= 1
        case _ => ()
      }
      i += 1
    }
    depth(sql.length) = d
    (depth, inStr)
  }

  /** Every `GROUP BY <keys> WITH TOTALS` modifier in the statement:
    * (gbStart, keysStart, totStart, totEnd, depth). The owning GROUP BY
    * is the LAST one before the modifier at the SAME paren depth with no
    * shallower scope boundary between them (same subquery); keyword
    * matches inside string literals never count. A `WITH totals AS ...`
    * CTE matches the keyword regex but has no owning GROUP BY, so it
    * yields no span. */
  private def totalsSpans(sql: String): Seq[(Int, Int, Int, Int, Int)] = {
    val (depth, inStr) = depthMap(sql)
    val gbs = "(?is)\\bGROUP\\s+BY\\b".r.findAllMatchIn(sql).toSeq
      .filterNot(m => inStr(m.start))
    "(?is)\\bWITH\\s+TOTALS\\b".r.findAllMatchIn(sql).toSeq
      .filterNot(m => inStr(m.start))
      .flatMap { t =>
        val d = depth(t.start)
        gbs.filter(g => g.end <= t.start && depth(g.start) == d &&
            (g.end until t.start).forall(i => depth(i) >= d))
          .lastOption.map(g => (g.start, g.end, t.start, t.end, d))
      }
  }

  /** `GROUP BY k WITH TOTALS` protocol split: (main query without the
    * TOTALS modifier, totals-row-only query). Servers run the two parts
    * and emit the totals row separately (native packet 7 / JSON
    * `totals` member), while the dialect's inline GROUPING SETS rewrite
    * stays the library-call behavior. The totals query keeps the
    * select-list analyzable via GROUPING SETS ((k), ()) and filters to
    * the empty grouping set with HAVING grouping(k)=1; an existing
    * HAVING is AND-folded (= totals_mode=after_having_exclusive; the
    * no-HAVING common case is exact).
    *
    * All clause anchors are DEPTH-0 matches: a GROUP BY inside a
    * derived table, or an ORDER BY/LIMIT inside a HAVING subquery,
    * must never be mistaken for the outer query's clause (a lazy regex
    * did exactly that). A WITH TOTALS nested inside a subquery returns
    * None — the inline GROUPING SETS rewrite handles it downstream. */
  def splitTotals(sql: String): Option[(String, String)] =
    totalsSpans(sql).filter(_._5 == 0).lastOption.map {
      case (gbStart, keysStart, totStart, totEnd, _) =>
        val keys = sql.substring(keysStart, totStart).trim
        // empty grouping set = all grouping-id bits set (2^n - 1);
        // zero-arg grouping_id() resolves in HAVING where per-column
        // grouping(k) would re-reference raw columns the aggregate no
        // longer outputs
        val cond =
          s"grouping_id() = ${(1L << splitTopLevelCommas(keys).length) - 1}"
        val gs = s"GROUP BY GROUPING SETS (($keys), ())"
        val after = sql.substring(totEnd)
        val (da, ia) = depthMap(after)
        def firstDepth0(pat: String): Option[Int] =
          pat.r.findAllMatchIn(after)
            .find(m => da(m.start) == 0 && !ia(m.start)).map(_.start)
        // the totals row ignores the outer ORDER BY/LIMIT (ClickHouse
        // computes totals over ALL rows regardless of LIMIT; and a Sort
        // above the HAVING can't re-resolve raw grouping columns anyway)
        // — but a trailing SETTINGS clause applies to BOTH passes
        val settingsPos = firstDepth0("(?is)\\bSETTINGS\\b")
        val tailStart = (firstDepth0("(?is)\\bORDER\\s+BY\\b") ++
          firstDepth0("(?is)\\bLIMIT\\b") ++ settingsPos)
          .minOption.getOrElse(after.length)
        val settingsTail = settingsPos.map(p => " " + after.substring(p).trim)
          .getOrElse("")
        val havingM = "(?is)^\\s*HAVING\\b".r.findFirstMatchIn(after)
        val totalsSql = havingM match {
          case Some(h) =>
            val havingText = after.substring(h.end, tailStart).trim
            sql.substring(0, gbStart) + gs +
              s" HAVING ($havingText) AND $cond" + settingsTail
          case None =>
            sql.substring(0, gbStart) + gs + s" HAVING $cond" + settingsTail
        }
        val mainSql = sql.substring(0, gbStart) + s"GROUP BY $keys" + after
        (mainSql, totalsSql)
    }

  private val typeNames = Seq(
    "UInt8" -> "SMALLINT", "UInt16" -> "INT", "UInt32" -> "BIGINT",
    "UInt64" -> "DECIMAL(20,0)", "Int8" -> "TINYINT", "Int16" -> "SMALLINT",
    "Int32" -> "INT", "Int64" -> "BIGINT", "Float32" -> "FLOAT",
    "Float64" -> "DOUBLE", "DateTime" -> "TIMESTAMP")

  /** ClickHouse type names → Spark DDL type names (word-bounded).
    * Composite wrappers are converted structurally: Array(T) →
    * ARRAY<T>, Map(K,V) → MAP<K,V>, Tuple(a T, ...) → STRUCT<a: T, ...>,
    * Nullable(T) → T (Spark fields are nullable by default),
    * LowCardinality(T) → T (a dictionary-encoding hint; parquet
    * dictionary-encodes automatically). Enum8/Enum16 ('a' = 1, ...)
    * store the string labels (SURVEY §1.2): the name→code map is a
    * storage detail clients never see in results. */
  def mapTypeNames(s: String): String = {
    var r = s
    "(?i)FixedString\\s*\\(\\s*\\d+\\s*\\)".r.findFirstIn(r)
      .foreach(fs => r = r.replace(fs, "STRING"))
    r = "(?i)\\bDateTime64\\s*\\(\\s*\\d+\\s*(?:,\\s*'[^']*'\\s*)?\\)".r
      .replaceAllIn(r, "TIMESTAMP")
    r = r.replaceAll("\\bDate32\\b", "DATE")
    r = stripCallLike(r, "Enum(?:8|16)?", _ => "STRING")
    r = rewriteCompositeTypes(r)
    typeNames.foreach { case (ch, sp) => r = r.replaceAll(s"\\b$ch\\b", sp) }
    r = r.replaceAll("\\bUUID\\b", "STRING")
    r = r.replaceAll("\\bBool\\b", "BOOLEAN")
    r.replaceAll("\\bString\\b", "STRING")
  }

  /** Replace every `name(...)` (parens balanced, strings respected)
    * with `emit(inner)`. Used for type forms whose argument list may
    * contain nested parens or quoted literals (Enum values). */
  private def stripCallLike(s0: String, name: String,
                            emit: String => String): String = {
    val re = s"(?i)\\b$name\\s*\\(".r
    var s = s0
    var m = re.findFirstMatchIn(s)
    while (m.isDefined) {
      val mm = m.get
      val close = matchingParen(s, mm.end - 1)
      if (close < 0) return s
      s = s.substring(0, mm.start) + emit(s.substring(mm.end, close)) +
        s.substring(close + 1)
      m = re.findFirstMatchIn(s)
    }
    s
  }

  /** Structural Array(..)/Map(..)/Tuple(..)/Nullable(..) → Spark DDL
    * angle-bracket syntax, innermost-first so nesting works. */
  private def rewriteCompositeTypes(s: String): String = {
    val re = "(?i)\\b(Array|Map|Tuple|Nullable|LowCardinality)\\s*\\(([^()]*)\\)".r
    var r = s
    var changed = true
    while (changed) {
      changed = false
      r = re.replaceAllIn(r, m => {
        changed = true
        val inner = m.group(2).trim
        java.util.regex.Matcher.quoteReplacement(m.group(1).toLowerCase match {
          case "array" => s"ARRAY<$inner>"
          case "map" => s"MAP<$inner>"
          case "nullable" | "lowcardinality" => inner
          case "tuple" =>
            val fields = inner.split(",").map(_.trim).zipWithIndex.map {
              case (f, i) =>
                // "name Type" or bare "Type" (positional -> _1, _2 ...)
                val parts = f.split("\\s+", 2)
                if (parts.length == 2) s"${parts(0)}: ${parts(1)}"
                else s"_${i + 1}: $f"
            }
            s"STRUCT<${fields.mkString(", ")}>"
        })
      })
    }
    r
  }

  /** Nested-column prefixes registered by DDL (lowercased bare name).
    * `ParsedParams Nested(Key1 String, ...)` expands to parallel array
    * columns literally named `ParsedParams.Key1` (SURVEY §1.2 mapping,
    * reference hits DDL test.yml:49); ClickHouse query text keeps the
    * dotted access, which Spark would resolve as a struct path — known
    * nested refs are backticked into a single identifier instead. */
  /** Nested prefix (lowercased) → its field names in declaration
    * order. Registered by Ddl.createTable at Nested(...) expansion;
    * consulted by rewriteNestedRefs and by ARRAY JOIN prefix
    * expansion. */
  private[graft] val nestedColumns =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  private def rewriteNestedRefs(s: String): String =
    if (nestedColumns.isEmpty) s
    else "(?<![`\\w.])(\\w+)\\.(\\w+)".r.replaceAllIn(s, m =>
      if (nestedColumns.contains(m.group(1).toLowerCase))
        java.util.regex.Matcher.quoteReplacement(s"`${m.group(1)}.${m.group(2)}`")
      else m.matched)

  /** ClickHouse SQL text → Spark SQL text (FORMAT clause must already
    * be stripped). */
  /** ClickHouse's scalar WITH form — `WITH <expr> AS <ident>, ...
    * SELECT ...` — aliases an expression, not a subquery (the standard
    * `ident AS (subquery)` CTE form passes through untouched, and both
    * may mix in one clause). Spark has no equivalent, so scalar items
    * are substituted textually: every word-boundary occurrence of the
    * alias outside string literals becomes `(expr)`. */
  private def rewriteScalarWith(sql: String): String = {
    val m = "(?is)^(\\s*)WITH\\s+".r.findFirstMatchIn(sql).getOrElse(return sql)
    // split the clause items at top level (quote/paren aware) and find
    // where the WITH clause ends (the top-level SELECT keyword)
    var i = m.end
    var depth = 0
    var inStr = false
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    var itemStart = i
    var selectAt = -1
    while (i < sql.length && selectAt < 0) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          items += sql.substring(itemStart, i); itemStart = i + 1
        case 's' | 'S' if depth == 0 &&
            sql.regionMatches(true, i, "SELECT", 0, 6) &&
            (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1))) &&
            (i + 6 >= sql.length || !Character.isLetterOrDigit(sql.charAt(i + 6))) =>
          selectAt = i
        case _ => ()
      }
      i += 1
    }
    if (selectAt < 0) return sql // not a WITH ... SELECT; leave as-is
    items += sql.substring(itemStart, selectAt)
    val cteRe = "(?is)^\\s*[\\w`]+\\s+AS\\s*\\(.*\\)\\s*$".r
    val scalarRe = "(?is)^\\s*(.*\\S)\\s+AS\\s+`?(\\w+)`?\\s*$".r
    val (ctes, scalars) = items.partition(it => cteRe.findFirstIn(it).isDefined)
    if (scalars.isEmpty) return sql
    // substitute outside string literals only; guard like
    // substituteSelectAliases: no qualified refs (t.k), no backticked
    // occurrences, and never a function-call name (alias followed by '(')
    def subst(in: String, alias: String, expr: String): String = {
      val parts = in.split("'", -1)
      parts.indices.foreach { k =>
        if (k % 2 == 0)
          parts(k) = parts(k).replaceAll(
            "(?<![.\\w`])" + java.util.regex.Pattern.quote(alias) +
              "\\b(?![`(])(?!\\s*\\()",
            java.util.regex.Matcher.quoteReplacement(s"($expr)"))
      }
      parts.mkString("'")
    }
    // earlier scalar aliases are visible in later scalar exprs
    val subs = scalars.foldLeft(Vector.empty[(String, String)]) { (acc, it) =>
      it match {
        case scalarRe(expr0, alias) =>
          val expr = acc.foldLeft(expr0.trim) {
            case (e, (a2, e2)) => subst(e, a2, e2)
          }
          acc :+ (alias -> expr)
        case _ => return sql // unrecognized item; don't half-rewrite
      }
    }
    var rest = sql.substring(selectAt)
    var kept = ctes.map(_.trim)
    subs.foreach { case (alias, expr) =>
      rest = subst(rest, alias, expr)
      kept = kept.map(subst(_, alias, expr)) // and in later CTE bodies
    }
    m.group(1) +
      (if (kept.nonEmpty) s"WITH ${kept.mkString(", ")} " else "") + rest
  }

  def transpile(chSql: String): String = {
    var s = chSql
    // SQL UDFs (CREATE FUNCTION ... AS (x) -> expr) are macros: expand
    // call sites first, so every later rewrite sees plain expressions
    s = UserFunctions.expand(s)
    // special-purpose engines (Null/Set/Join/Buffer/Merge): joinGet,
    // merge() expansion, `IN table`, Buffer/Merge read faces — string
    // rewrites guarded by cheap probes, no-ops for plain queries
    s = SpecialEngines.rewriteReads(s)
    s = rewriteNamedWindows(s)
    s = rewriteScalarWith(s)
    s = rewriteBracketArrays(s)
    s = rewriteCasts(s)
    s = rewriteNestedRefs(s)
    s = "(?i)\\bnumbers\\s*\\(\\s*([0-9]+)\\s*\\)".r.replaceAllIn(s,
      m => s"(SELECT id AS number FROM range(${m.group(1)}))")
    // two-arg ClickHouse form numbers(offset, count): rows
    // offset..offset+count-1 — also what lets the bench fixture load in
    // bounded chunks (each INSERT shuffles only its slice)
    s = "(?i)\\bnumbers\\s*\\(\\s*([0-9]+)\\s*,\\s*([0-9]+)\\s*\\)".r
      .replaceAllIn(s, m => {
        val off = java.lang.Long.parseLong(m.group(1))
        val cnt = java.lang.Long.parseLong(m.group(2))
        s"(SELECT id AS number FROM range($off, ${off + cnt}))"
      })
    // cluster()/remote() collapse to the local table: single-node, the
    // local table IS every shard (GLOBAL-join semantics are n/a, J6)
    s = ("(?i)\\bcluster(?:AllReplicas)?\\s*\\(\\s*'[^']*'\\s*,\\s*" +
      "([\\w`.]+)\\s*\\)").r.replaceAllIn(s, m => m.group(1))
    s = ("(?i)\\bremote(?:Secure)?\\s*\\(\\s*'[^']*'\\s*,\\s*" +
      "([\\w`.]+)\\s*(?:,\\s*'[^']*'\\s*)*\\)").r
      .replaceAllIn(s, m => m.group(1))
    // interval units Spark lacks: QUARTER → months, WEEK → days
    s = "(?i)\\bINTERVAL\\s+(\\d+)\\s+QUARTER(S)?\\b".r.replaceAllIn(s,
      m => s"INTERVAL ${m.group(1).toLong * 3} MONTH")
    s = "(?i)\\bINTERVAL\\s+(\\d+)\\s+WEEK(S)?\\b".r.replaceAllIn(s,
      m => s"INTERVAL ${m.group(1).toLong * 7} DAY")
    // the "infinite" system.numbers table: a long lazy Range — LIMIT
    // pushes into the scan (LocalLimit over Range reads only what it
    // needs), matching the only sane way clients use it
    s = "(?i)\\bsystem\\.numbers\\b".r.replaceAllIn(s,
      "(SELECT id AS number FROM range(9223372036854775807))")
    s = "(?i)\\bcount\\s*\\(\\s*\\)".r.replaceAllIn(s, "count(*)")
    // parameterized aggregates fn(param)(arg) -> plain two-arg calls;
    // the arg group is paren-matched so it may nest arbitrarily
    def rewriteParameterized(sql0: String, chName: String,
                             emit: (String, String) => String): String = {
      // params: bare tokens or single-quoted strings — the strings may
      // contain parens (sequenceMatch('(?1).*(?2)')), so parens are
      // only excluded OUTSIDE quotes
      val re = s"(?i)\\b$chName\\s*\\(((?:[^()']|'[^']*')*)\\)\\s*\\(".r
      var sql = sql0
      var m = re.findFirstMatchIn(sql)
      while (m.isDefined) {
        val mm = m.get
        val close = matchingParen(sql, mm.end - 1)
        if (close < 0) m = None
        else {
          val arg = sql.substring(mm.end, close)
          sql = sql.substring(0, mm.start) + emit(mm.group(1).trim, arg) +
            sql.substring(close + 1)
          m = re.findFirstMatchIn(sql)
        }
      }
      sql
    }
    // quantileExact family: ClickHouse's exact rule is nth_element at
    // 0-based index min(floor(p*n), n-1) of the sorted values
    // (AggregateFunctionQuantileExact — NOT the interpolated
    // percentile). Exactness requires materializing the group's values
    // (ClickHouse's own quantileExact does too); quantile() below stays
    // the scale path.
    def exactRank(p: String, arg: String): String =
      s"(CASE WHEN count($arg) > 0 THEN element_at(array_sort(collect_list($arg)), " +
        s"cast(least(floor(($p) * count($arg)), count($arg) - 1) as int) + 1) END)"
    s = rewriteParameterized(s, "quantilesExact",
      (ps, arg) => "array(" +
        ps.split(",").map(p => exactRank(p.trim, arg)).mkString(", ") + ")")
    // quantiles(p1,p2,..)(x) -> percentile(x, array(p1,p2,..))
    s = rewriteParameterized(s, "quantiles",
      (ps, arg) => s"percentile($arg, array($ps))")
    // Low/High: element at floor/ceil of p*(n-1) — ClickHouse's
    // python-median_low/median_high analogs (docs: quantileExactLow /
    // quantileExactHigh), distinct from plain quantileExact's
    // floor(p*n) nth_element rule
    def exactLowHigh(p: String, arg: String, f: String): String =
      s"(CASE WHEN count($arg) > 0 THEN element_at(array_sort(collect_list($arg)), " +
        s"cast($f(($p) * (count($arg) - 1)) as int) + 1) END)"
    s = rewriteParameterized(s, "quantileExactLow",
      (p, arg) => exactLowHigh(p, arg, "floor"))
    s = rewriteParameterized(s, "quantileExactHigh",
      (p, arg) => exactLowHigh(p, arg, "ceil"))
    s = rewriteParameterized(s, "quantileExact", exactRank)
    // quantileTiming: mapped to the exact rank rule over round+clamp to
    // [0, 30000] ms, double result (CH: Float32). INTENTIONAL
    // DIVERGENCE at large state: ClickHouse's QuantileTiming is only
    // exact while the state is small (<=5670 values / values <=1024);
    // beyond that it coarsens to 16 ms bins. Here the answer stays
    // exact at every scale — a strictly tighter result than the
    // upstream sketch, never a different distribution model.
    s = rewriteParameterized(s, "quantileTiming", (p, arg) =>
      s"cast(${exactRank(p,
        s"least(greatest(round(cast(($arg) as double)), 0D), 30000D)")} as double)")
    // quantile(p)(x) -> percentile(x, p)
    s = rewriteParameterized(s, "quantile",
      (p, arg) => s"percentile($arg, $p)")
    // topK(k)(x) -> topKAgg(x, k) (space-saving sketch aggregate)
    s = rewriteParameterized(s, "topKWeighted",
      (k, arg) => s"topKWeightedAgg($arg, $k)")
    s = rewriteParameterized(s, "topK", (k, arg) => s"topKAgg($arg, $k)")
    // groupArraySorted(n)(x): the n smallest values, sorted
    s = rewriteParameterized(s, "groupArraySorted",
      (n, arg) => s"slice(arraySort(groupArray($arg)), 1, $n)")
    s = rewriteParameterized(s, "histogram",
      (n, arg) => s"histogramAgg($n, $arg)")
    // windowFunnel(W[, modes...])(ts, c1, ..) -> flat aggregate; modes
    // pack into one literal bitmask (1=strict_increase, 2=strict_order,
    // 4=strict_deduplication)
    s = rewriteParameterized(s, "windowFunnel", (p, arg) => {
      val parts = p.split(",").map(_.trim)
      val flags =
        (if (parts.exists(_.contains("strict_increase"))) 1 else 0) |
        (if (parts.exists(_.contains("strict_order"))) 2 else 0) |
        (if (parts.exists(x => x.contains("strict_dedup") ||
             x.contains("strict_deduplication"))) 4 else 0)
      s"windowFunnelAgg(${parts.head}, $flags, $arg)"
    })
    s = rewriteParameterized(s, "sequenceMatch",
      (pat, arg) => s"sequenceMatchAgg($pat, $arg)")
    s = rewriteParameterized(s, "sequenceCount",
      (pat, arg) => s"sequenceCountAgg($pat, $arg)")
    // uniqUpTo(N)(x): exact distinct count saturating at N+1
    s = rewriteParameterized(s, "uniqUpTo",
      (n, arg) => s"least(uniqExact($arg), ${n.trim.toLong + 1})")
    // type names (word-bounded, case-sensitive like ClickHouse);
    // parameterized DateTime64(p[,tz]) first (word-boundary can't see it)
    s = "(?i)\\bDateTime64\\s*\\(\\s*\\d+\\s*(?:,\\s*'[^']*'\\s*)?\\)".r
      .replaceAllIn(s, "TIMESTAMP")
    s = s.replaceAll("\\bDate32\\b", "DATE")
    typeNames.foreach { case (ch, sp) =>
      s = s.replaceAll(s"\\b$ch\\b", sp)
    }
    // EXTRACT(unit FROM ts) -> date_part('unit', ts): ClickHouse has
    // BOTH extract(haystack, re) (regex, in the registry) and the SQL
    // EXTRACT(part FROM date) form, disambiguated by its parser; the
    // registry name shadows Spark's grammar form, so the date form is
    // rewritten away before parsing
    s = "(?i)\\bextract\\s*\\(\\s*(\\w+)\\s+FROM\\s+".r.replaceAllIn(s,
      m => s"date_part('${m.group(1).toUpperCase}', ")
    // dateDiff('day', a, b) -> chDateDiff (the parser special-cases the
    // dateDiff name before registry lookup, so it needs a rename; the
    // registry builder counts UNIT BOUNDARIES crossed, ClickHouse
    // semantics — Spark's timestampdiff counts elapsed complete units,
    // which disagrees for month/quarter/year)
    s = "(?i)\\bdateDiff\\s*\\(\\s*'(\\w+)'\\s*,".r.replaceAllIn(s,
      m => s"chDateDiff('${m.group(1).toLowerCase}',")
    // age('unit', a, b) — ClickHouse's ELAPSED-complete-units
    // counterpart of dateDiff — is exactly Spark's timestampdiff
    s = "(?i)\\bage\\s*\\(\\s*'(\\w+)'\\s*,".r.replaceAllIn(s,
      m => s"timestampdiff(${m.group(1).toUpperCase},")
    // GROUP BY k WITH TOTALS -> GROUPING SETS ((k), ()) — the totals
    // row is the empty grouping set (reference protocol TOTALS packet,
    // main.py:61; SURVEY §2.4 G6). Depth-aware spans (any nesting
    // level, spliced right-to-left so indices stay valid): a lazy
    // regex here latched onto a GROUP BY inside a derived table and
    // emitted unbalanced GROUPING SETS for valid queries.
    s = totalsSpans(s).sortBy(-_._1).foldLeft(s) {
      case (acc, (gbStart, keysStart, totStart, totEnd, _)) =>
        val keys = acc.substring(keysStart, totStart).trim
        acc.substring(0, gbStart) +
          s"GROUP BY GROUPING SETS (($keys), ())" + acc.substring(totEnd)
    }
    s = rewriteArrayJoin(s)
    // `* EXCEPT col` (paren-less ClickHouse form) -> `* EXCEPT (col)`;
    // the parenthesized form is Spark-native syntax and passes through.
    // Negative lookahead keeps the EXCEPT set operator (followed by
    // SELECT/ALL/DISTINCT or an opening paren) untouched.
    s = "(?i)\\*\\s+EXCEPT\\s+(?!\\(|SELECT\\b|ALL\\b|DISTINCT\\b)(`?\\w+`?)".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"* EXCEPT (${m.group(1)})"))
    s = rewriteStarReplace(s)
    s = rewriteQualify(s)
    // PREWHERE is ClickHouse's manual pushdown hint; Catalyst pushes
    // predicates itself, so it merges into WHERE (both present -> AND)
    "(?is)\\bPREWHERE\\s+(.+?)(\\s+WHERE\\s+)(.+?)(\\s+GROUP\\s+BY|\\s+ORDER\\s+BY|\\s+LIMIT|\\s*$)".r
      .findFirstMatchIn(s).foreach { m =>
        s = s.substring(0, m.start) +
          s" WHERE (${m.group(1).trim}) AND (${m.group(3).trim})" + m.group(4) +
          s.substring(m.end)
      }
    s = "(?i)\\bPREWHERE\\b".r.replaceAllIn(s, "WHERE")
    // FINAL (merge-on-read de-dup hint) and GLOBAL (distributed-join
    // modifier) are storage/topology hints with no Spark analog — drop
    s = "(?i)\\bFINAL\\b(?=\\s|$)".r.replaceAllIn(s, " ")
    s = "(?i)\\bGLOBAL\\s+(?=(ANY\\s+|ALL\\s+)?(INNER|LEFT|RIGHT|FULL|CROSS|JOIN|IN|NOT))".r
      .replaceAllIn(s, "")
    // trailing SETTINGS name=value[, ...] — per-query knobs clients
    // append; a useful subset is honored upstream (Engine.query calls
    // extractSettings first), the rest accepted and dropped here
    s = settingsRe.replaceAllIn(s, "")
    // ClickHouse `LIMIT offset, n` -> standard LIMIT n OFFSET offset
    s = "(?i)\\bLIMIT\\s+(\\d+)\\s*,\\s*(\\d+)".r
      .replaceAllIn(s, m => s"LIMIT ${m.group(2)} OFFSET ${m.group(1)}")
    // SAMPLE 0.1 -> TABLESAMPLE (10 PERCENT) (SURVEY §4 mapping).
    // Fallback for tables with no SAMPLE BY key: Engine.query rewrites
    // keyed tables to the deterministic subset BEFORE this runs.
    s = "(?i)\\bSAMPLE\\s+(0?\\.\\d+)".r.replaceAllIn(s,
      m => s"TABLESAMPLE (${(m.group(1).toDouble * 100).round} PERCENT)")
    s = rewriteTernaries(s)
    s
  }

  /** Standard-SQL / ClickHouse named `WINDOW w AS (spec)[, w2 AS ...]`
    * clause (between HAVING and ORDER BY). Spark's parser has no WINDOW
    * clause, so each definition is inlined at its `OVER w` use sites and
    * the clause itself removed. Runs per clause occurrence, so nested
    * subqueries each resolve their own window names (inner clauses are
    * found first because the scan restarts after every splice). */
  private def rewriteNamedWindows(sql0: String): String = {
    val openRe = "(?is)\\bWINDOW\\s+(\\w+)\\s+AS\\s*\\(".r
    var s = sql0
    var guard = 0
    var m = openRe.findFirstMatchIn(s)
    while (m.isDefined && guard < 32) {
      guard += 1
      val mm = m.get
      var defs = List.empty[(String, String)]
      var cursor = mm.start
      var name = mm.group(1)
      var open = mm.end - 1
      var ok = true
      var end = cursor
      var continue = true
      while (continue) {
        val close = matchingParen(s, open)
        if (close < 0) { ok = false; continue = false }
        else {
          defs ::= (name -> s.substring(open + 1, close))
          end = close + 1
          // another comma-separated definition?
          val more = "(?is)^\\s*,\\s*(\\w+)\\s+AS\\s*\\(".r
            .findFirstMatchIn(s.substring(end))
          more match {
            case Some(n) =>
              name = n.group(1); open = end + n.end - 1
            case None => continue = false
          }
        }
      }
      if (!ok) return s
      // Scope of these names is the enclosing SELECT block only: a
      // sibling scope (another UNION branch) may define the same window
      // name, so the OVER-substitution must not cross a same-depth set
      // operator or the enclosing parens.
      // shared string-aware structural map (a paren-only local copy
      // miscounted depth for quoted literals containing parens)
      val (depthAt, inStrAt) = depthMap(s)
      val myDepth = depthAt(cursor)
      val scopeStart = "(?i)\\bSELECT\\b".r
        .findAllMatchIn(s.substring(0, cursor))
        .filter(x => depthAt(x.start) == myDepth && !inStrAt(x.start))
        .map(_.start).toList.lastOption.getOrElse(0)
      var scopeEnd = s.length
      var j = end
      while (j < s.length && scopeEnd == s.length) {
        if (s.charAt(j) == ')' && depthAt(j) == myDepth && !inStrAt(j))
          scopeEnd = j
        j += 1
      }
      "(?i)\\b(UNION|INTERSECT|EXCEPT)\\b".r
        .findAllMatchIn(s.substring(end, scopeEnd))
        .find(x => depthAt(end + x.start) == myDepth && !inStrAt(end + x.start))
        .foreach(x => scopeEnd = end + x.start)
      val rest0 = s.substring(0, cursor) + s.substring(end)
      val segEnd = scopeEnd - (end - cursor)
      var seg = rest0.substring(scopeStart, segEnd)
      defs.foreach { case (w, spec) =>
        seg = s"(?i)\\bOVER\\s+$w\\b".r.replaceAllIn(seg,
          java.util.regex.Matcher.quoteReplacement(s"OVER ($spec)"))
      }
      s = rest0.substring(0, scopeStart) + seg + rest0.substring(segEnd)
      m = openRe.findFirstMatchIn(s)
    }
    s
  }

  /** First depth-0, outside-string occurrence of keyword `kw` (word-
    * bounded, case-insensitive) at or after `from`; -1 if none. */
  private def keywordAtDepth0(s: String, kw: String, from: Int = 0): Int = {
    var depth = 0; var inStr = false; var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ if depth == 0 && s.regionMatches(true, i, kw, 0, kw.length) &&
          (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
          (i + kw.length >= s.length || !isIdentChar(s.charAt(i + kw.length))) =>
          return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '`'

  /** `SELECT * REPLACE (expr AS col, ...)` (ClickHouse star modifier):
    * Spark has no REPLACE, so it becomes `* EXCEPT (cols...), expr AS
    * col, ...` — same column SET and values; the replaced columns move
    * to the end of the star expansion (position-sensitive callers
    * should list columns explicitly). Composes with a following EXCEPT. */
  private def rewriteStarReplace(sql: String): String = {
    val m = "(?i)\\*\\s+REPLACE\\s*\\(".r.findFirstMatchIn(sql)
      .getOrElse(return sql)
    val open = m.end - 1
    val close = matchingParen(sql, open)
    if (close < 0) return sql
    val items = splitTopLevel(sql.substring(open + 1, close), ',').map(_.trim)
    val names = items.flatMap(it =>
      "(?is)\\s+AS\\s+`?(\\w+)`?\\s*$".r.findFirstMatchIn(it).map(_.group(1)))
    if (names.length != items.length) return sql // not all `expr AS col`
    val rebuilt = s"* EXCEPT (${names.mkString(", ")}), ${items.mkString(", ")}"
    rewriteStarReplace(
      sql.substring(0, m.start) + rebuilt + sql.substring(close + 1))
  }

  /** `QUALIFY cond` — the post-window filter (ClickHouse, DuckDB,
    * Snowflake all have it; Spark doesn't). The condition becomes an
    * extra projected column inside a subquery and the filter moves
    * outside:
    * `SELECT list FROM ... QUALIFY c [tail]` ->
    * `SELECT * EXCEPT (__q) FROM (SELECT list, (c) AS __q FROM ...)
    *  WHERE __q [tail]`.
    * Select-list aliases referenced by the condition are inlined first
    * (Spark's lateral column alias cannot see window-expression
    * aliases). Top-level statements only — a QUALIFY inside a subquery
    * fails loudly in the parser rather than silently mis-filtering. */
  private def rewriteQualify(s: String): String = {
    val qIdx = keywordAtDepth0(s, "QUALIFY")
    if (qIdx < 0) return s
    val selIdx = keywordAtDepth0(s, "SELECT")
    if (selIdx < 0 || selIdx > qIdx) return s
    val listStart = selIdx + "SELECT".length
    val fromIdx = keywordAtDepth0(s, "FROM", listStart)
    if (fromIdx < 0 || fromIdx > qIdx) return s
    val selectList = s.substring(listStart, fromIdx).trim
    if (selectList.toUpperCase.startsWith("DISTINCT")) return s
    val mid = s.substring(fromIdx, qIdx) // FROM ... [WHERE/GROUP/HAVING]
    var condEnd = s.length
    for (kw <- Seq("ORDER", "LIMIT", "SETTINGS", "UNION", "INTO", "FORMAT")) {
      val i = keywordAtDepth0(s, kw, qIdx + "QUALIFY".length)
      if (i >= 0 && i < condEnd) condEnd = i
    }
    var cond = s.substring(qIdx + "QUALIFY".length, condEnd).trim
    val tail = s.substring(condEnd)
    // inline computed select aliases the condition references
    val aliasRe = "(?is)^(.*\\S)\\s+AS\\s+`?(\\w+)`?\\s*$".r
    splitTopLevel(selectList, ',').map(_.trim).foreach { it =>
      aliasRe.findFirstMatchIn(it).foreach { x =>
        val (alias, expr) = (x.group(2), x.group(1).trim)
        if (!expr.equalsIgnoreCase(alias))
          cond = substOutsideStrings(cond,
            "(?<![.\\w`])" + java.util.regex.Pattern.quote(alias) + "\\b(?!\\s*\\()",
            java.util.regex.Matcher.quoteReplacement(s"($expr)"))
      }
    }
    s.substring(0, selIdx) +
      s"SELECT * EXCEPT (__q) FROM (SELECT $selectList, ($cond) AS __q " +
      s"$mid) __qualify WHERE __q" +
      (if (tail.nonEmpty) " " + tail else "")
  }

  private val settingsRe =
    "(?is)\\bSETTINGS\\s+\\w+\\s*=\\s*[^,\\s]+(\\s*,\\s*\\w+\\s*=\\s*[^,\\s]+)*\\s*$".r

  /** Split a trailing `SETTINGS k=v[, ...]` clause off a statement:
    * (sql without the clause, lowercased name → unquoted value).
    * ClickHouse passes these to the engine (reference relays them to
    * chdb, main.py:190); [[graft.dialect.Engine]] honors a subset. */
  def extractSettings(sql: String): (String, Map[String, String]) =
    settingsRe.findFirstMatchIn(sql) match {
      case Some(m) =>
        val kvs = m.matched.replaceFirst("(?is)^\\s*SETTINGS\\s+", "")
          .split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2).map(_.trim)
            k.toLowerCase -> v.stripPrefix("'").stripSuffix("'")
          }.toMap
        (sql.substring(0, m.start) + sql.substring(m.end), kvs)
      case None => (sql, Map.empty)
    }

  /** ClickHouse resolves SELECT-list aliases everywhere in the
    * statement (`SELECT round(x,2) AS y FROM t WHERE y > 0`); Spark
    * resolves them in GROUP/ORDER but not WHERE/HAVING-with-aggregate.
    * This produces the alias-substituted form: every computed
    * `expr AS alias` from the TOP-LEVEL select list is inlined as
    * `(expr)` into the clause tail (after FROM, outside strings,
    * unqualified references only). Returns None when there is nothing
    * to substitute. Callers use it as an UNRESOLVED_COLUMN retry, so a
    * query Spark already resolves never changes meaning. */
  private[graft] def substituteSelectAliases(sql: String): Option[String] = {
    val head = "(?is)^(\\s*SELECT\\s+(?:DISTINCT\\s+)?)".r
      .findFirstMatchIn(sql).getOrElse(return None)
    // top-level FROM ends the select list
    val body = sql.substring(head.end)
    var i = 0
    var depth = 0
    var inStr = false
    var fromAt = -1
    while (i < body.length && fromAt < 0) {
      val c = body.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'f' | 'F' if depth == 0 &&
            body.regionMatches(true, i, "FROM", 0, 4) &&
            (i == 0 || !Character.isLetterOrDigit(body.charAt(i - 1))) &&
            (i + 4 >= body.length || !Character.isLetterOrDigit(body.charAt(i + 4))) =>
          fromAt = i
        case _ => ()
      }
      i += 1
    }
    if (fromAt < 0) return None
    val selectList = body.substring(0, fromAt)
    var tail = body.substring(fromAt)
    val aliasRe = "(?is)^(.*\\S)\\s+AS\\s+`?(\\w+)`?\\s*$".r
    val pairs = splitTopLevel(selectList, ',').map(_.trim).flatMap { it =>
      aliasRe.findFirstMatchIn(it).map(x => (x.group(2), x.group(1).trim))
    }.filter { case (a, e) => !e.equalsIgnoreCase(a) } // computed only
    if (pairs.isEmpty) return None
    pairs.foreach { case (alias, expr) =>
      tail = substOutsideStrings(tail,
        "(?<![.\\w`])" + java.util.regex.Pattern.quote(alias) + "\\b(?!\\s*\\()",
        java.util.regex.Matcher.quoteReplacement(s"($expr)"))
    }
    Some(sql.substring(0, head.end) + selectList + tail)
  }

  private val arrayJoinRe =
    ("(?is)\\b(LEFT\\s+)?ARRAY\\s+JOIN\\s+(.+?)" +
      "(?=\\s+(WHERE|PREWHERE|GROUP|ORDER|LIMIT|HAVING|SETTINGS|UNION)\\b|\\s*$)").r

  /** Cut `s` at the first unbalanced ')' or depth-0 relational-JOIN
    * keyword — the ARRAY JOIN clause ends there when it sits inside a
    * subquery (`FROM (SELECT ... ARRAY JOIN a AS x) s`) or is followed
    * by a table join. Returns (clause, untouched tail). */
  private def splitClauseTail(s: String): (String, String) = {
    val joinKw = "(?is)^(?:(?:INNER|LEFT|RIGHT|FULL|CROSS|SEMI|ANTI)\\s+)?JOIN\\b".r
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' =>
          if (depth == 0) return (s.substring(0, i), s.substring(i))
          depth -= 1
        case _ if depth == 0 && c.isWhitespace &&
          joinKw.findFirstIn(s.substring(i + 1)).isDefined =>
          return (s.substring(0, i), s.substring(i))
        case _ =>
      }
      i += 1
    }
    (s, "")
  }

  /** ClickHouse `[LEFT] ARRAY JOIN e1 AS n1[, e2 AS n2 ...]`
    * (lateral flatten; the arrayJoin()-the-function form is handled by
    * the registry). One array → LATERAL VIEW explode (explode_outer
    * for LEFT, which keeps empty-array rows). Several arrays →
    * ClickHouse zip semantics (parallel iteration, all arrays sized
    * like the first): LATERAL VIEW inline over an array of
    * named_structs built per index, so each alias becomes a generated
    * column with no reference rewriting. */
  private[dialect] def rewriteArrayJoin(sql: String): String = {
    // loop (not replaceAllIn): bare items need reference qualification
    // in the surrounding text, outside the matched clause
    var out = sql
    var start = 0
    var m = arrayJoinRe.findFirstMatchIn(out)
    var guard = 0
    while (m.isDefined && guard < 16) {
      guard += 1
      val (replaced, subs) = rewriteOneArrayJoin(m.get)
      if (replaced == m.get.matched) { start = m.get.end; m = None }
      else {
        var before = out.substring(0, m.get.start)
        var after = out.substring(m.get.start + m.get.matched.length)
        subs.foreach { case (re, rep) =>
          val qr = java.util.regex.Matcher.quoteReplacement(rep)
          before = substOutsideStrings(before, re, qr)
          after = substOutsideStrings(after, re, qr)
        }
        out = before + replaced + after
        start = before.length + replaced.length
      }
      m = arrayJoinRe.findFirstMatchIn(out)
        .filter(_.start >= start) // don't re-visit what we produced
    }
    out
  }

  /** Regex-substitute outside single-quoted string literals. */
  private def substOutsideStrings(in: String, re: String, rep: String): String = {
    val parts = in.split("'", -1)
    parts.indices.foreach { k =>
      if (k % 2 == 0) parts(k) = parts(k).replaceAll(re, rep)
    }
    parts.mkString("'")
  }

  /** One ARRAY JOIN clause → (replacement text, reference
    * substitutions to apply OUTSIDE the clause). Forms:
    *   - `expr AS alias, ...`  — no substitutions needed
    *   - bare column `X`       — explode under the lateral-view alias;
    *     outside references qualify as `graft_aj.X` (a same-named
    *     generated column is AMBIGUOUS_REFERENCE otherwise)
    *   - bare Nested prefix    — expands to the prefix's parallel
    *     `` `X.f` `` arrays (zip semantics, ClickHouse's own model);
    *     dotted refs qualify as `` graft_aj.`X.f` `` */
  private def rewriteOneArrayJoin(m: scala.util.matching.Regex.Match)
      : (String, Seq[(String, String)]) = {
      val outer = m.group(1) != null
      val (clause, tail) = splitClauseTail(m.group(2))
      val itemRe = "(?is)^(.+?)\\s+AS\\s+(\\w+)$".r
      val bareRe = "(?is)^`?(\\w+)`?$".r
      val subs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val items = splitTopLevel(clause.trim, ',').map(_.trim)
        .map { it =>
          itemRe.findFirstMatchIn(it)
            .map(x => Seq((x.group(1), x.group(2))))
            .orElse(bareRe.findFirstMatchIn(it).map { x =>
              val name = x.group(1)
              nestedColumns.get(name.toLowerCase) match {
                case Some(fields) =>
                  fields.foreach { f =>
                    subs += (("(?<!\\.)" +
                      java.util.regex.Pattern.quote(s"`$name.$f`"),
                      s"graft_aj.`$name.$f`"))
                  }
                  fields.map(f => (s"`$name.$f`", s"$name.$f"))
                case None =>
                  // skip qualified refs (x.name), backticked spans, and
                  // alias definitions (AS name) — those declare, not use
                  subs += (("(?<![.\\w`])(?<!(?i:\\bAS)\\s{1,20})" +
                    java.util.regex.Pattern.quote(name) + "\\b(?!\\s*`)",
                    s"graft_aj.$name"))
                  Seq((name, name))
              }
            })
        }
      if (items.exists(_.isEmpty)) (m.matched, Nil) // unsupported: leave as-is
      else {
        val cols = items.flatten.flatten
        val rewritten =
          if (cols.length == 1) {
            val fn = if (outer) "explode_outer" else "explode"
            s"LATERAL VIEW $fn(${cols.head._1}) graft_aj AS ${cols.head._2}"
          } else {
            // ClickHouse zip semantics, all arrays indexed like the
            // first. The first array is evaluated ONCE (bound as a
            // lambda variable — Catalyst inlines plain aliases and
            // would re-evaluate a heavy expression per reference);
            // shorter/longer later arrays null-pad/truncate where
            // ClickHouse raises a size-mismatch error (documented
            // divergence: the fill value is NULL, not an error).
            val fn = if (outer) "inline_outer" else "inline"
            val restFields = cols.tail.map { case (e, n) => s"'$n', ($e)[graft_i]" }
            val fields = (s"'${cols.head._2}', graft_a[graft_i]" +: restFields)
              .mkString(", ")
            val zipped = s"transform(sequence(0, size(graft_a) - 1), " +
              s"graft_i -> named_struct($fields))"
            // sequence(0, -1) counts DOWN; guard the empty-array case
            s"LATERAL VIEW $fn(transform(array(${cols.head._1}), " +
              s"graft_a -> if(size(graft_a) < 1, array(), $zipped))[0]) graft_aj"
          }
        (rewritten + tail, subs.toSeq)
      }
  }

  /** `['a', 'b']` array literals → `array('a', 'b')`. A `[` directly
    * after an identifier/closing paren/bracket/string is a subscript
    * (`m['key']`, `arr[1]`) and is left alone. */
  private[dialect] def rewriteBracketArrays(s: String): String = {
    val sb = new StringBuilder
    val stack = scala.collection.mutable.Stack[Boolean]() // true = converted
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; sb.append(c)
        case '[' =>
          // subscripts (`m['k']`, `arr[1]`) directly follow their base
          // expression with no whitespace; array literals don't
          val p = if (sb.nonEmpty) sb.charAt(sb.length - 1) else ' '
          val subscript = p.isLetterOrDigit || p == '_' || p == ')' || p == ']' || p == '\''
          stack.push(!subscript)
          if (subscript) sb.append('[') else sb.append("array(")
        case ']' =>
          if (stack.nonEmpty && stack.pop()) sb.append(')') else sb.append(']')
        case other => sb.append(other)
      }
      i += 1
    }
    sb.toString
  }

  /** Index of the `)`/`]` closing the opener at `open`; -1 if none. */
  private[dialect] def matchingParen(s: String, open: Int): Int = {
    var depth = 0; var inStr = false; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Split at top-level (depth-0, outside strings) occurrences of `sep`. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case `sep` if depth == 0 => parts += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += s.substring(start)
    parts.toSeq
  }

  /** Start index of the last top-level ` AS ` inside a CAST body. */
  private def lastTopLevelAs(s: String): Int = {
    var depth = 0; var inStr = false; var i = 0; var last = -1
    while (i < s.length - 3) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ =>
          if (depth == 0 && c.isWhitespace &&
            s.regionMatches(true, i + 1, "AS", 0, 2) &&
            i + 3 < s.length && s.charAt(i + 3).isWhitespace) last = i
      }
      i += 1
    }
    last
  }

  /** Rewrite CAST targets: composite ClickHouse types become Spark DDL
    * syntax, and the ClickHouse tuple-of-arrays-to-Map idiom
    * `CAST((keys, values) AS Map(K, V))` (reference Play sample,
    * index.html:729) becomes `map_from_arrays(keys, values)` with an
    * element-wise map cast. */
  private[dialect] def rewriteCasts(sql: String): String = {
    val m = "(?i)\\bCAST\\s*\\(".r.findFirstMatchIn(sql)
    m match {
      case None => sql
      case Some(mm) =>
        val open = mm.end - 1
        val close = matchingParen(sql, open)
        if (close < 0) return sql
        val inner = rewriteCasts(sql.substring(open + 1, close))
        val asIdx = lastTopLevelAs(inner)
        val rebuilt =
          if (asIdx < 0) s"CAST($inner)"
          else {
            val expr = inner.substring(0, asIdx).trim
            val tpe = rewriteCompositeTypes(inner.substring(asIdx + 4).trim)
            if (tpe.toUpperCase.startsWith("MAP<") &&
                expr.startsWith("(") && expr.endsWith(")")) {
              val parts = splitTopLevel(expr.substring(1, expr.length - 1), ',')
              if (parts.length == 2)
                s"CAST(map_from_arrays(${parts(0).trim}, ${parts(1).trim}) AS $tpe)"
              else s"CAST($expr AS $tpe)"
            } else s"CAST($expr AS $tpe)"
          }
        sql.substring(0, mm.start) + rebuilt + rewriteCasts(sql.substring(close + 1))
    }
  }

  private val withFillRe =
    ("(?is)^(.*)\\bORDER\\s+BY\\s+([\\w`.,\\s]+?)\\s+WITH\\s+FILL\\s+" +
      "FROM\\s+(-?\\d+)\\s+TO\\s+(-?\\d+)(?:\\s+STEP\\s+(-?\\d+))?" +
      "(?:\\s+INTERPOLATE\\s*\\(([^)]*)\\))?\\s*$").r

  /** `ORDER BY [k1, k2, ...,] col WITH FILL FROM a TO b [STEP s]`:
    * returns (inner sql, prefix keys with asc flag, (fill col, asc),
    * from, to, step). WITH FILL attaches to the last sort key; keys
    * before it become per-group prefixes (ClickHouse fills the grid
    * within every distinct prefix combination). Each key keeps its
    * ASC/DESC direction — the fill operator re-sorts after the union,
    * so the ORDER BY is stripped from the inner query entirely
    * (sorting twice is pure waste at scale). Only plain column keys
    * qualify (expressions fall through to the single-statement path
    * and fail loudly rather than mis-fill). */
  def withFillParts(sql: String)
      : Option[(String, Seq[(String, Boolean)], (String, Boolean), Long, Long, Long, Seq[String])] =
    withFillRe.findFirstMatchIn(sql).flatMap { m =>
      val dirRe = "(?i)\\s+(ASC|DESC)$".r
      val keys = m.group(2).split(",").map(_.trim.replace("`", "")).toSeq
        .map { k =>
          val asc = !dirRe.findFirstMatchIn(k)
            .exists(_.group(1).equalsIgnoreCase("DESC"))
          (dirRe.replaceAllIn(k, ""), asc)
        }
      // INTERPOLATE items: the carry-forward forms `col` / `col AS col`
      // are supported; a general `col AS expr` (sequential per-gap
      // re-evaluation) is not — fall through so the parser fails
      // loudly rather than mis-fill
      val interpItems = Option(m.group(6)).map(
        _.split(",").map(_.trim.replace("`", "")).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      val interp = interpItems.map { it =>
        "(?is)^(\\w+)(?:\\s+AS\\s+(\\w+))?$".r.findFirstMatchIn(it) match {
          case Some(x) if x.group(2) == null || x.group(2) == x.group(1) =>
            Some(x.group(1))
          case _ => None
        }
      }
      if (keys.exists { case (k, _) => !k.matches("[\\w.]+") } ||
          interp.exists(_.isEmpty)) None
      else Some((m.group(1), keys.init, keys.last,
        m.group(3).toLong, m.group(4).toLong,
        Option(m.group(5)).map(_.toLong).getOrElse(1L),
        interp.flatten))
    }

  private val limitByRe =
    "(?is)^(.*?)\\s+LIMIT\\s+(\\d+)\\s+BY\\s+(.+?)(\\s+LIMIT\\s+(\\d+))?\\s*$".r

  /** ClickHouse `LIMIT n BY cols`: first n rows per distinct cols,
    * ordered by the query's ORDER BY. Returns None if the statement has
    * no LIMIT BY clause. */
  def limitByParts(sql: String): Option[(String, Int, Seq[String], Option[Int])] =
    limitByRe.findFirstMatchIn(sql).map { m =>
      val cols = m.group(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      (m.group(1), m.group(2).toInt, cols, Option(m.group(5)).map(_.toInt))
    }

  /** Rewrite every top-level `cond ? a : b` into if(...). The condition
    * gets a ClickHouse-truthiness wrap (`<> 0`) unless it already looks
    * boolean (contains a comparison/logic operator at depth 0).
    */
  private[dialect] def rewriteTernaries(sql: String): String = {
    val s = sql
    val qm = findOutsideStrings(s, '?')
    if (qm < 0) return s
    val colon = findAtSameDepth(s, ':', from = qm + 1)
    if (colon < 0) return s
    val condStart = boundaryBefore(s, qm)
    val elseEnd = boundaryAfter(s, colon + 1)
    val cond = s.substring(condStart, qm).trim
    val thenB = s.substring(qm + 1, colon).trim
    val elseB = s.substring(colon + 1, elseEnd).trim
    val condSql = if (looksBoolean(cond)) cond else s"($cond) <> 0"
    val rewritten = s.substring(0, condStart) +
      s"if($condSql, $thenB, $elseB)" + s.substring(elseEnd)
    rewriteTernaries(rewritten)
  }

  private def looksBoolean(cond: String): Boolean =
    "(?i)(=|<|>|!=|<>|\\bLIKE\\b|\\bIN\\b|\\bAND\\b|\\bOR\\b|\\bNOT\\b|\\bIS\\b|\\bBETWEEN\\b|\\bEXISTS\\b)"
      .r.findFirstIn(cond).isDefined

  /** Index of first `ch` outside string literals (any paren depth). */
  private def findOutsideStrings(s: String, ch: Char, from: Int = 0): Int = {
    var inStr = false; var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == ch) return i
      i += 1
    }
    -1
  }

  /** Index of first `ch` at the same paren depth as `from`, outside
    * strings; -1 if the enclosing group closes first. */
  private def findAtSameDepth(s: String, ch: Char, from: Int): Int = {
    var depth = 0; var inStr = false; var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => if (depth == 0) return -1 else depth -= 1
        case `ch` if depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private val clauseKw =
    Seq("SELECT", "WHERE", "WHEN", "THEN", "ELSE", "BY", "HAVING", "ON")

  /** Start of the expression containing position `at`: after the last
    * depth-0 comma / opening paren / clause keyword. */
  private def boundaryBefore(s: String, at: Int): Int = {
    var depth = 0; var inStr = false; var i = at - 1; var best = 0
    while (i >= 0 && best == 0) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case ')' | ']' => depth += 1
        case '(' | '[' => if (depth == 0) best = i + 1 else depth -= 1
        case ',' if depth == 0 => best = i + 1
        case _ =>
      }
      i -= 1
    }
    val prefix = s.substring(best, at)
    val kwRe = ("(?is).*\\b(" + clauseKw.mkString("|") + ")\\b").r
    kwRe.findFirstMatchIn(prefix) match {
      case Some(m) => best + m.end
      case None => best
    }
  }

  /** End of the expression starting at `from`: first depth-0 comma,
    * closing paren, or clause keyword (AS/FROM/ORDER/...). */
  private def boundaryAfter(s: String, from: Int): Int = {
    val endKw = "(?is)^\\s*(AS|FROM|ORDER|GROUP|WHERE|LIMIT|HAVING|UNION|WHEN|THEN|ELSE|END)\\b".r
    var depth = 0; var inStr = false; var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => if (depth == 0) return i else depth -= 1
        case ',' if depth == 0 => return i
        case _ if depth == 0 && c.isWhitespace &&
          endKw.findFirstIn(s.substring(i)).isDefined => return i
        case _ =>
      }
      i += 1
    }
    s.length
  }

  /** Run ClickHouse-dialect SQL on a session (fixture tables must
    * already be registered as views — see [[ChContext]]). */
  def sql(spark: SparkSession, chSql: String): DataFrame = {
    ChFunctions.register(spark)
    val (bare, _) = extractFormat(chSql)
    spark.sql(transpile(expandStarModifiers(spark, bare)))
  }

  /** ClickHouse star modifiers that need schema expansion:
    * `* [EXCEPT (a, b)] APPLY(f)` and `COLUMNS('re') [APPLY(f)]`.
    * Like ClickHouse, expansion happens at analysis time: the FROM
    * clause's first table resolves through the catalog and the modifier
    * span is replaced with the expanded column list (APPLY wraps each
    * column as `f(col)` — ClickHouse's own result names). Statements
    * whose FROM cannot be resolved pass through untouched. `_part`
    * (the MergeTree partition materialization) never expands. */
  def expandStarModifiers(spark: SparkSession, sql: String): String = {
    val starApplyRe =
      ("(?is)\\*\\s*(?:EXCEPT\\s*\\(([^)]*)\\)\\s*)?APPLY\\s*\\(\\s*" +
        "([A-Za-z_][\\w]*)\\s*\\)").r
    val columnsRe =
      ("(?is)\\bCOLUMNS\\s*\\(\\s*'([^']+)'\\s*\\)" +
        "(?:\\s*APPLY\\s*\\(\\s*([A-Za-z_][\\w]*)\\s*\\))?").r
    if (starApplyRe.findFirstIn(sql).isEmpty &&
        columnsRe.findFirstIn(sql).isEmpty) return sql
    val cols: Seq[String] =
      "(?is)\\bFROM\\s+([\\w`.]+)".r.findFirstMatchIn(sql)
        .flatMap { m =>
          scala.util.Try(spark.table(m.group(1).replace("`", ""))
            .schema.fieldNames.toSeq).toOption
        }.getOrElse(return sql)
        .filterNot(_ == "_part")
    def applied(selected: Seq[String], fn: String): String =
      selected.map(c => s"$fn(`$c`) AS `$fn($c)`").mkString(", ")
    var out = starApplyRe.replaceAllIn(sql, m => {
      val except = Option(m.group(1)).toSeq
        .flatMap(_.split(",")).map(_.trim.replace("`", "").toLowerCase)
        .filter(_.nonEmpty).toSet
      java.util.regex.Matcher.quoteReplacement(
        applied(cols.filterNot(c => except(c.toLowerCase)), m.group(2)))
    })
    out = columnsRe.replaceAllIn(out, m => {
      val re = m.group(1).r
      val matched = cols.filter(c => re.findFirstIn(c).isDefined)
      java.util.regex.Matcher.quoteReplacement(Option(m.group(2)) match {
        case Some(fn) => applied(matched, fn)
        case None => matched.map(c => s"`$c`").mkString(", ")
      })
    })
    out
  }
}

/** Registers the fixture parquet tables as temp views so ClickHouse-
  * dialect SQL can reference them by name. */
object ChContext {
  def setup(spark: SparkSession, dir: String): Unit = {
    ChFunctions.register(spark)
    setupViews(spark, dir)
  }

  /** Temp views are session-scoped — per-user sessions re-register.
    * Re-registration for the SAME dir is skipped (queries call setup
    * per run; re-creating 10 views each time is pure overhead). */
  def setupViews(spark: SparkSession, dir: String): Unit = {
    val marker = "graft.views.dir"
    if (spark.conf.getOption(marker).contains(dir)) return
    graft.Tables.names.foreach { t =>
      graft.Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    graft.Tables.events(spark, dir).createOrReplaceTempView("events")
    setupSystemTables(spark)
    spark.conf.set(marker, dir)
  }

  /** Live catalog frames behind system.databases/tables/columns —
    * built on demand so post-DDL state is visible (Engine.query
    * substitutes them like system.parts; the setup-time snapshots below
    * only serve sessions that bypass the engine). Catalog metadata
    * only — a handful of driver-side rows, not data. */
  def databasesLive(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.catalog.listDatabases().select("name")

  /** (database, table) across ALL databases — `SHOW TABLES` only sees
    * the current one. Temp views list under database "" once. */
  private def allTables(spark: SparkSession): Seq[(String, String)] = {
    val dbs = spark.catalog.listDatabases().collect().map(_.name).toSeq
    dbs.flatMap { db =>
      spark.catalog.listTables(db).collect().toSeq.map { t =>
        (Option(t.database).getOrElse(""), t.name)
      }
    }.distinct
  }

  def tablesLive(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    allTables(spark).map { case (db, t) =>
      val norm = s"${if (db.isEmpty) "default" else db}.$t".toLowerCase
      val meta = Ddl.metaOf(norm)
      val engine = meta match {
        case Some(m) if m.engineSpec.nonEmpty =>
          m.engineSpec.get.takeWhile(_.isLetter)
        case Some(m) if m.replacingVer.nonEmpty => "ReplacingMergeTree"
        case Some(m) if m.summingCols.nonEmpty => "SummingMergeTree"
        case Some(m) if m.collapsing.exists(_._2.isEmpty) => "CollapsingMergeTree"
        case Some(m) if m.collapsing.nonEmpty => "VersionedCollapsingMergeTree"
        case Some(m) if m.aggregating => "AggregatingMergeTree"
        case Some(m) if m.partitionExpr.nonEmpty || m.orderBy.nonEmpty ||
            m.sampleBy.nonEmpty || m.ttl.nonEmpty => "MergeTree"
        case Some(_) => "Memory"
        case None => "View" // temp views + foreign registrations
      }
      (db, t, engine, meta.flatMap(_.tableComment).getOrElse(""))
    }.toDF("database", "name", "engine", "comment")
  }

  /** Per-column catalog (ClickHouse system.columns shape the Play UI
    * and DBeaver-style clients probe for completion). */
  def columnsLive(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val colRows = allTables(spark).flatMap { case (db, t) =>
      val full = if (db.isEmpty) s"`$t`" else s"`$db`.`$t`"
      try spark.table(full).schema.fields.toSeq.zipWithIndex.map {
        case (f, i) =>
          (if (db.isEmpty) "default" else db, t, f.name,
            graft.formats.ChTypeNames.fieldName(f), (i + 1).toLong)
      } catch { case _: Throwable => Seq.empty }
    }
    colRows.toDF("database", "table", "name", "type", "position")
  }

  /** Minimal `system.*` surface ClickHouse clients probe (the Play UI
    * reads server settings, reference index.html; SURVEY §7 scopes this
    * to stubs). databases/tables are snapshots taken at setup time —
    * enough for client handshake probes, not a live catalog. */
  /** One snapshot write per JVM: the catalog is SHARED across sessions
    * (sharedState) but file-listing caches are per-session, so a
    * re-snapshot from session B (drop + delete files + rewrite) crashes
    * session A's next read with FAILED_READ_FILE against the deleted
    * part files. The engine substitutes LIVE frames for
    * databases/tables/columns anyway — these parquet snapshots serve
    * only engine-bypassing readers, for whom first-setup state is the
    * documented contract. */
  private val systemSnapshotsDone =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  def setupSystemTables(spark: SparkSession): Unit = {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS system")
    if (!spark.catalog.tableExists("system.one"))
      spark.sql("CREATE OR REPLACE VIEW system.one AS SELECT 0 AS dummy")
    if (systemSnapshotsDone.getAndSet(true)) return
    // snapshots materialize as tiny managed tables (persistent views
    // cannot reference the temp catalog state they are built from);
    // drop stale metadata AND leftover warehouse dirs from prior JVMs
    // (the in-memory catalog forgets them, the location survives)
    def snapshot(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS system.$name")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"system.db/$name")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
      df.write.mode("overwrite").saveAsTable(s"system.$name")
      // a prior snapshot's file listing may be cached in plans that
      // already referenced the table (another server session, a cached
      // view) — stale entries throw FAILED_READ_FILE on the next read
      spark.catalog.refreshTable(s"system.$name")
    }
    snapshot("databases", databasesLive(spark))
    snapshot("tables", tablesLive(spark))
    snapshot("columns", columnsLive(spark))
    // function inventory (Play UI autocomplete: SELECT name FROM
    // system.functions)
    snapshot("functions", ChFunctions.functionInventory
      .map { case (n, agg) => (n, if (agg) 1 else 0) }
      .toDF("name", "is_aggregate"))
    if (!spark.catalog.tableExists("system.settings"))
      spark.sql("""
        CREATE OR REPLACE VIEW system.settings AS
        SELECT * FROM VALUES
          ('max_threads', '32', ''),
          ('session_timezone', 'UTC', ''),
          ('readonly', '0', '')
        AS t(name, value, description)""")
  }

  def sql(spark: SparkSession, dir: String, chSql: String): DataFrame = {
    setup(spark, dir)
    Transpiler.sql(spark, chSql)
  }
}
