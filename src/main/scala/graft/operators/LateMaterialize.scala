package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}
import scala.util.Try

/** Lazy (late) materialization for top-k over wide tables — the
  * ClickHouse 25.4 "lazy materialization" optimization, re-expressed
  * Spark-first. The reference delegates such queries wholesale
  * (main.py:190); ClickBench's Q23 (`SELECT * FROM hits WHERE URL LIKE
  * '%google%' ORDER BY EventTime LIMIT 10`) is the canonical shape.
  *
  * A single-pass plan decodes EVERY projected column of EVERY filtered
  * row just to throw all but n away at the top-k. At 100 TB that is the
  * difference between reading ~10 rows' pages and reading the whole
  * table's 105 columns. Two passes instead:
  *
  *   1. top-k on a NARROW scan: only the sort keys (Catalyst prunes the
  *      parquet scan to those columns + the filter's) — the n winning
  *      key tuples come back to the driver (bounded by n <= 1000, the
  *      same driver-side contract as a broadcast threshold);
  *   2. refetch matching rows with an Or-of-EqualNullSafe key predicate
  *      appended to the WHERE — a compile-time literal filter, so it
  *      reaches the parquet scan as PushedFilters (row-group stats +
  *      column-index page skipping), unlike a semi-join or an
  *      InSubquery, which Spark cannot push below a scan.
  *
  * Any full-sort-tuple tie at the boundary pulls ALL tied rows in phase
  * 2 and the final ORDER BY + LIMIT trims again — any n-subset among
  * exact ties is a correct answer for the original query too.
  *
  * Applied textually on the transpiled single-table shape (no
  * joins/grouping/subqueries); anything else keeps the original plan.
  */
object LateMaterialize {

  /** Rewrite threshold: only fire when the projection is wide and the
    * phase-1 scan is narrow — otherwise two passes cost more than one. */
  private val MaxK = 1000
  private val MinProjCols = 16
  private val MaxKeyCols = 10

  private val shapeRe =
    ("(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+([\\w`.]+)\\s+WHERE\\s+(.*?)" +
      "\\s+ORDER\\s+BY\\s+(.+?)\\s+LIMIT\\s+(\\d+)\\s*$").r

  // phase 1 and 2 must see identical data and predicates: bail on
  // anything non-deterministic or time-dependent between two jobs
  private val nonDeterministicRe =
    ("(?i)\\b(rand|rand64|randCanonical|generateUUIDv4|uuid|now|today|" +
      "yesterday|current_timestamp|current_date|monotonically_increasing_id)\\s*\\(").r

  private val identRe = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Try the two-phase plan for a transpiled Spark-SQL SELECT; None when
    * the shape or the economics don't fit (caller runs the text as-is). */
  def maybeRun(spark: SparkSession, sql: String): Option[DataFrame] = {
    val m = shapeRe.findFirstMatchIn(sql).getOrElse(return None)
    val (proj, tbl, cond, orderBy) =
      (m.group(1), m.group(2), m.group(3), m.group(4))
    val n = m.group(5).toInt
    if (n > MaxK || n == 0) return None
    // single-table SELECT only: any embedded SELECT, grouping, join or
    // set op means the FROM-WHERE-ORDER-LIMIT reading above is wrong
    val upper = sql.toUpperCase
    val body = upper.substring(upper.indexOf("SELECT") + 6)
    if (body.contains("SELECT") || upper.contains("DISTINCT") ||
        Seq("GROUP BY", " HAVING ", " JOIN ", " UNION ", " OFFSET ",
          "LATERAL", " WINDOW ").exists(upper.contains))
      return None
    // window invocations (e.g. `row_number() OVER (...)`) would be
    // re-evaluated over only the refetched rows in phase 2 — bail out
    if ("(?i)\\bOVER\\s*\\(".r.findFirstIn(sql).isDefined) return None
    if (nonDeterministicRe.findFirstIn(sql).isDefined) return None

    val base = Try(spark.table(tbl)).getOrElse(return None)
    val tableCols = base.columns.toSet
    // every sort item must be a plain table column (+ optional direction)
    val items = splitTopLevel(orderBy).map { it =>
      val mm = "(?is)^\\s*(`?)([\\w.]+)`?\\s*(ASC|DESC)?\\s*$".r
        .findFirstMatchIn(it).getOrElse(return None)
      (mm.group(2), Option(mm.group(3)).exists(_.equalsIgnoreCase("DESC")))
    }
    if (items.isEmpty || !items.forall(i => tableCols.contains(i._1)))
      return None
    val keyCols = items.map(_._1).distinct
    val condCols = identRe.findAllIn(cond).toSet.intersect(tableCols)
    if ((keyCols.toSet ++ condCols).size > MaxKeyCols) return None
    // economics: wide projection, narrow phase-1
    val projCols = identRe.findAllIn(proj).toSet.intersect(tableCols)
    if (projCols.size < MinProjCols && !proj.contains("*")) return None

    val orderSql = items
      .map { case (c, desc) => s"`$c`${if (desc) " DESC" else ""}" }
      .mkString(", ")
    val phase1 = spark.sql(
      s"SELECT ${keyCols.map(c => s"`$c`").mkString(", ")} FROM $tbl " +
        s"WHERE $cond ORDER BY $orderSql LIMIT $n")
    val keys = phase1.collect()
    if (keys.isEmpty) return Some(spark.sql(sql).limit(0))
    // Or-of-EqualNullSafe on the winning tuples: literal at compile
    // time, so DataSourceStrategy hands the whole chain to parquet
    val keyPred: Column = keys.toSeq
      .map { r =>
        keyCols.zipWithIndex
          .map { case (c, i) => col(c) <=> lit(r.get(i)) }
          .reduce(_ && _)
      }
      .reduce(_ || _)
    // Build phase 2 directly on the DataFrame, aliased to the bare
    // table name so table-qualified projections (`SELECT t.a ...`)
    // still resolve — the old temp-view rename broke those every time
    // (the caller's Try silently fell back to single-pass, paying the
    // narrow scan for nothing), and leaked a view into the catalog.
    val bare = tbl.replace("`", "").split('.').last
    val sortCols = items.map { case (c, desc) =>
      if (desc) col(c).desc else col(c).asc }
    Some(base.filter(expr(cond) && keyPred).alias(bare)
      .selectExpr(splitTopLevel(proj): _*)
      .orderBy(sortCols: _*)
      .limit(n))
  }

  /** Split on top-level commas (parens guard function-call commas). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ => ()
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
