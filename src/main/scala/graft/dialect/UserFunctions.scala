package graft.dialect

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** SQL-defined user functions — ClickHouse
  * `CREATE FUNCTION name AS (a, b) -> expr` / `DROP FUNCTION name`
  * (reference surface: the delegation point main.py:190; ClickHouse
  * 25.5 ships executable SQL UDFs).
  *
  * Model: a UDF here is a dialect-level MACRO, exactly like
  * ClickHouse's own SQL UDFs — the body is substituted at the call
  * site during query analysis, so the expanded expression plans and
  * codegens as if the user had written it inline. Nothing is
  * interpreted per-row and nothing blocks whole-stage codegen: at
  * 100 TB a UDF call costs the same as its hand-inlined expansion.
  *
  * Expansion is textual but string-aware and paren-matched: call
  * arguments and the substituted body are parenthesized (precedence-
  * safe), parameters substitute only at identifier boundaries outside
  * string literals, and UDFs may call other UDFs — expansion iterates
  * to a fixpoint with a depth cap that turns accidental recursion into
  * an error instead of a hang.
  *
  * Definitions persist in `<warehouse>/_graft_catalog/functions.json`
  * (the dictionaries/matviews pattern) and restore with the durable
  * catalog; `system.functions` lists them with origin
  * 'SQLUserDefined'.
  */
object UserFunctions {

  case class Udf(name: String, params: Seq[String], body: String)

  private val registry = TrieMap.empty[String, Udf]

  def all: Seq[Udf] = registry.values.toList.sortBy(_.name)

  def exists(name: String): Boolean =
    registry.contains(name.replace("`", "").toLowerCase)

  /** `orReplace` swaps the definition ATOMICALLY: validation (builtin
    * guard, lambda parse) happens before the registry is touched, so a
    * malformed replacement leaves the old function intact — ClickHouse
    * CREATE OR REPLACE semantics. */
  def create(spark: SparkSession, name0: String, lambda: String,
             ifNotExists: Boolean, orReplace: Boolean = false): Unit = {
    val name = name0.replace("`", "").trim
    val key = name.toLowerCase
    if (!orReplace && registry.contains(key)) {
      if (ifNotExists) return
      throw new IllegalArgumentException(
        s"function $name already exists (DROP FUNCTION it first)")
    }
    if (isBuiltin(name))
      throw new IllegalArgumentException(
        s"cannot create function $name: a built-in function with this name exists")
    val (params, body) = parseLambda(name, lambda)
    registry.put(key, Udf(name, params, body))
    CatalogStore.saveFunctions(spark)
  }

  def drop(spark: SparkSession, name0: String, ifExists: Boolean): Unit = {
    val key = name0.replace("`", "").trim.toLowerCase
    if (registry.remove(key).isEmpty && !ifExists)
      throw new IllegalArgumentException(s"function $name0 does not exist")
    CatalogStore.saveFunctions(spark)
  }

  /** Both the dialect registry AND Spark's own builtins: a UDF named
    * `lower` would macro-expand every lower() call in every query —
    * shadowing a builtin is never acceptable. */
  private def isBuiltin(name: String): Boolean =
    ChFunctions.functionInventory.exists(_._1.equalsIgnoreCase(name)) ||
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
        .functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name.toLowerCase))

  /** Durable-catalog restore path (no re-save). A persisted name that
    * collides with a builtin is skipped — heals catalogs written
    * before the guard covered Spark's own registry. */
  private[dialect] def restore(name: String, params: Seq[String],
                               body: String): Unit =
    if (!isBuiltin(name))
      registry.putIfAbsent(name.toLowerCase, Udf(name, params, body))

  private[graft] def forgetInMemory(name: String): Unit =
    registry.remove(name.replace("`", "").toLowerCase)

  /** `(a, b) -> expr`, `x -> expr`, `() -> expr`. */
  private def parseLambda(name: String, s0: String): (Seq[String], String) = {
    val s = s0.trim
    val arrow = topLevelArrow(s)
    if (arrow < 0) throw new IllegalArgumentException(
      s"CREATE FUNCTION $name: body must be a lambda `(args) -> expression`")
    val head = s.substring(0, arrow).trim
    val body = s.substring(arrow + 2).trim
    if (body.isEmpty) throw new IllegalArgumentException(
      s"CREATE FUNCTION $name: empty body")
    val params: Seq[String] =
      if (head.startsWith("(") && head.endsWith(")"))
        head.substring(1, head.length - 1).split(",").toSeq
          .map(_.trim.replace("`", "")).filter(_.nonEmpty)
      else if (head.isEmpty) Seq.empty
      else Seq(head.replace("`", ""))
    params.foreach { p =>
      if (!p.matches("[A-Za-z_][\\w]*")) throw new IllegalArgumentException(
        s"CREATE FUNCTION $name: bad parameter name '$p'")
    }
    if (params.map(_.toLowerCase).distinct.length != params.length)
      throw new IllegalArgumentException(
        s"CREATE FUNCTION $name: duplicate parameter names")
    (params, body)
  }

  /** index of the FIRST `->` at paren depth 0 outside strings, or -1 */
  private def topLevelArrow(s: String): Int = {
    val mask = stringMask(s)
    var i = 0; var depth = 0
    while (i < s.length - 1) {
      if (!mask(i)) {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && c == '-' && s.charAt(i + 1) == '>') return i
      }
      i += 1
    }
    -1
  }

  /** true at positions inside (or delimiting) single-quoted strings.
    * Handles both ClickHouse escape forms — backslash (`'O\'Brien'`)
    * and doubling (`'O''Brien'`) — like Transpiler.depthMap; a naive
    * quote-toggle would desync after `\'` and flip every position after
    * it in/out of string state, letting macro expansion fire inside a
    * literal (or skip a real call). */
  private def stringMask(s: String): Array[Boolean] = {
    val in = new Array[Boolean](s.length)
    var i = 0; var q = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (q) {
        in(i) = true
        c match {
          case '\\' if i + 1 < s.length =>
            in(i + 1) = true; i += 1 // escaped char: consume it
          case '\'' if i + 1 < s.length && s.charAt(i + 1) == '\'' =>
            in(i + 1) = true; i += 1 // doubled quote
          case '\'' => q = false
          case _ => ()
        }
      } else if (c == '\'') { in(i) = true; q = true }
      i += 1
    }
    in
  }

  private def matchingParen(s: String, open: Int, mask: Array[Boolean]): Int = {
    var i = open; var depth = 0
    while (i < s.length) {
      if (!mask(i)) {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return i }
      }
      i += 1
    }
    -1
  }

  private def splitTopLevelCommas(s: String): Seq[String] = {
    val mask = stringMask(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      if (!mask(i)) {
        val c = s.charAt(i)
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (c == ',' && depth == 0) {
          out += s.substring(start, i); start = i + 1
        }
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Substitute ALL parameters SIMULTANEOUSLY (identifier-boundary,
    * outside strings) with their parenthesized arguments — one pass over
    * the original body, never over substituted text. Sequential
    * substitution would capture: with `(x, k) -> k * x`, the call
    * `f(k, 2)` against a table column `k` first rewrites x→(k), then the
    * second pass rewrites THAT k→(2), silently producing (2)*((2))
    * instead of (2)*(k). ClickHouse substitutes argument ASTs
    * simultaneously; a single alternation pass is the textual
    * equivalent. */
  private def substParams(body: String, params: Seq[String],
                          args: Seq[String]): String = {
    if (params.isEmpty) return body
    val argFor: Map[String, String] =
      params.zip(args).map { case (p, a) => p.toLowerCase -> a }.toMap
    val re = ("(?i)(?<![\\w`])(" +
      params.map(java.util.regex.Pattern.quote).mkString("|") +
      ")(?![\\w`])").r
    val mask = stringMask(body)
    val sb = new StringBuilder
    var last = 0
    re.findAllMatchIn(body).foreach { m =>
      if (!mask(m.start)) {
        sb.append(body.substring(last, m.start))
          .append('(').append(argFor(m.group(1).toLowerCase)).append(')')
        last = m.end
      }
    }
    sb.append(body.substring(last))
    sb.toString
  }

  /** Macro-expand every registered UDF call in `sql0`, to a fixpoint
    * (UDFs may call UDFs). The depth cap makes accidental recursion a
    * clear error. No-op (and zero-cost) when no UDFs are defined. */
  def expand(sql0: String): String = {
    if (registry.isEmpty) return sql0
    var sql = sql0
    var rounds = 0
    // every SUBSTITUTION counts, not just outer rounds: a directly
    // self-recursive body re-matches inside its own expansion within
    // the inner loop, which never returns to the round counter — only
    // a per-substitution cap turns that into an error instead of an
    // unboundedly growing string
    var subs = 0
    def bumpSubs(): Unit = {
      subs += 1
      if (subs > 500) throw new IllegalArgumentException(
        "SQL UDF expansion exceeded 500 substitutions — recursive " +
          "CREATE FUNCTION definitions are not supported")
    }
    var changed = true
    while (changed) {
      changed = false
      rounds += 1
      if (rounds > 16) throw new IllegalArgumentException(
        "SQL UDF expansion exceeded depth 16 — recursive CREATE FUNCTION definitions are not supported")
      registry.values.foreach { udf =>
        val re = ("(?i)(?<![\\w`.])" +
          java.util.regex.Pattern.quote(udf.name) + "\\s*\\(").r
        var searchFrom = 0
        var continue = true
        while (continue) {
          val mask = stringMask(sql)
          re.findFirstMatchIn(sql.substring(searchFrom)) match {
            case None => continue = false
            case Some(m0) =>
              val start = searchFrom + m0.start
              val openParen = searchFrom + m0.end - 1
              if (mask(start)) searchFrom = start + 1
              else {
                val close = matchingParen(sql, openParen, mask)
                if (close < 0) { continue = false }
                else {
                  val args = splitTopLevelCommas(
                    sql.substring(openParen + 1, close))
                  if (args.length != udf.params.length)
                    throw new IllegalArgumentException(
                      s"function ${udf.name} expects ${udf.params.length} " +
                        s"argument(s), got ${args.length}")
                  val expanded = substParams(udf.body, udf.params, args)
                  sql = sql.substring(0, start) + "(" + expanded + ")" +
                    sql.substring(close + 1)
                  bumpSubs()
                  changed = true
                  searchFrom = start
                }
              }
          }
        }
      }
    }
    sql
  }

  /** `system.functions` live face: built-ins + SQL UDFs with origin. */
  def snapshot(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (ChFunctions.functionInventory.map { case (n, agg) =>
      (n, if (agg) 1 else 0, "System")
    } ++ all.map(u => (u.name, 0, "SQLUserDefined")))
      .toDF("name", "is_aggregate", "origin")
  }
}
