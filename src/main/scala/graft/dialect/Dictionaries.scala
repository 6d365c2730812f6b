package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** ClickHouse external dictionaries: `CREATE DICTIONARY ... PRIMARY KEY
  * k SOURCE(CLICKHOUSE(TABLE 'src')) LAYOUT(...) LIFETIME(...)` plus the
  * `dictGet` / `dictGetOrDefault` / `dictHas` lookup functions. The
  * reference passes the statements through to its embedded engine
  * (/root/reference/main.py:190); the dialect shapes are ClickHouse's
  * documented ones.
  *
  * Spark-first mapping: a FLAT/HASHED-layout dictionary is BY DEFINITION
  * a fully RAM-resident dimension table — ClickHouse materializes it in
  * memory on every server. The lookup therefore compiles to
  * `ElementAt(<map literal>, key)`: a native, codegen'd Catalyst
  * expression whose map ships to executors inside the broadcast task
  * binary — the same bytes-on-the-wire shape as the hash side of a
  * broadcast join, shipped once per executor, not per row or per task.
  * Loads are lazy (first lookup after CREATE) and cached;
  * `SYSTEM RELOAD DICTIONARY` drops the cache so the next lookup
  * re-reads the source (the LIFETIME refresh contract, pull-based).
  *
  * Guardrail: a dictionary that exceeds [[maxEntries]] keys refuses to
  * load — at that size the right Spark plan is a broadcast/shuffle JOIN
  * against the source table, not an in-plan literal, and the error says
  * so. Dimension tables (the intended use) sit orders of magnitude
  * below the cap.
  */
object Dictionaries {

  /** Attribute: name, declared ClickHouse type, optional DEFAULT
    * expression text (ClickHouse returns it for absent keys). */
  case class Attr(name: String, chType: String, default: Option[String])

  /** @param spark the session the dictionary was created through —
    *              lazy loads read the source table via it.
    * @param range `RANGE(MIN lo MAX hi)` columns for RANGE_HASHED
    *              layouts — enables the 4-arg `dictGet(d, a, key, at)`
    *              validity-interval lookup. */
  /** @param lifetime `LIFETIME(MIN a MAX b)` in seconds — (n, n) for
    *                  the single-value form, None/0 = static (never
    *                  refreshes, ClickHouse LIFETIME(0)). */
  case class Meta(name: String, keyCol: String, attrs: Seq[Attr],
                  source: String, spark: SparkSession,
                  range: Option[(String, String)] = None,
                  lifetime: Option[(Long, Long)] = None)

  private val dicts = TrieMap.empty[String, Meta] // lowercased bare name
  /** (dict, attr) -> (map literal, key spark type, value spark type) */
  private val cache =
    TrieMap.empty[(String, String), (Expression, DataType, DataType)]
  /** dict -> whether the source fits the in-plan literal cap (probed
    * once with a distributed limit+count, never a driver collect). */
  private val fitsCache = TrieMap.empty[String, Boolean]

  /** Literal-map cap; var so specs/ops can tune the literal↔join
    * crossover. Above it, lookups compile to a correlated scalar
    * subquery = a Catalyst join (broadcast under the threshold, shuffle
    * beyond — size-based, the scale-correct fallback). 1M is the
    * driver-safe ceiling: the map is collected to the driver AND
    * embedded as a `Literal` in the expression tree, so a 10M cap
    * meant multi-GB driver heap plus an enormous task binary and a
    * codegen fallback — the join path handles anything larger at no
    * correctness cost. */
  @volatile var maxEntries: Int = 1 * 1000 * 1000

  /** dict → millis of the last successful source materialization
    * (`system.dictionaries.last_successful_update_time`); private[graft]
    * so specs can backdate it instead of sleeping through a LIFETIME. */
  private[graft] val loadTimes = TrieMap.empty[String, Long]

  def create(spark: SparkSession, name: String, keyCol: String,
             attrs: Seq[Attr], source: String, ifNotExists: Boolean,
             range: Option[(String, String)] = None,
             lifetime: Option[(Long, Long)] = None): Unit = {
    val key = bare(name)
    if (dicts.contains(key) && ifNotExists) return
    dicts.put(key, Meta(key, keyCol, attrs, source, spark, range, lifetime))
    attrs.foreach { a =>
      cache.remove((key, a.name.toLowerCase))
      rangeCache.remove((key, a.name.toLowerCase))
    }
    fitsCache.remove(key)
  }

  def drop(name: String, ifExists: Boolean): Unit = {
    val removed = dicts.remove(bare(name))
    if (removed.isEmpty && !ifExists)
      throw new IllegalArgumentException(s"Dictionary $name does not exist")
    removed.foreach { m =>
      m.attrs.foreach { a =>
        cache.remove((m.name, a.name.toLowerCase))
        rangeCache.remove((m.name, a.name.toLowerCase))
      }
      loadTimes.remove(m.name)
    }
  }

  /** `SYSTEM RELOAD DICTIONARY name` / `... DICTIONARIES`: the next
    * lookup re-collects the source. */
  def invalidate(name: Option[String]): Unit = name match {
    case Some(n) =>
      val k = bare(n)
      cache.keys.filter(_._1 == k).foreach(cache.remove)
      rangeCache.keys.filter(_._1 == k).foreach(rangeCache.remove)
      fitsCache.remove(k)
    case None => cache.clear(); rangeCache.clear(); fitsCache.clear()
  }

  def names: Seq[String] = dicts.keys.toSeq.sorted

  /** All registered dictionaries (durable-catalog persistence). */
  private[dialect] def all: Seq[Meta] = dicts.values.toSeq.sortBy(_.name)

  /** Restart simulation: forget the in-memory registration WITHOUT
    * touching the persisted catalog file (so restore brings it back). */
  private[dialect] def forgetInMemory(name: String): Unit = {
    val k = bare(name)
    dicts.remove(k)
    cache.keys.filter(_._1 == k).foreach(cache.remove)
    rangeCache.keys.filter(_._1 == k).foreach(rangeCache.remove)
    fitsCache.remove(k)
    loadTimes.remove(k)
  }

  /** LIFETIME staleness (the pull model, checked at expression build —
    * never per row): when the newest materialization is older than
    * LIFETIME's MAX seconds, the lookup drops the cache so the source
    * re-reads lazily — exactly what SYSTEM RELOAD DICTIONARY does, on a
    * timer. LIFETIME(0) or no LIFETIME = static dictionary. */
  private def ensureFresh(m: Meta): Unit =
    for ((_, maxSec) <- m.lifetime if maxSec > 0;
         ts <- loadTimes.get(m.name)
         if System.currentTimeMillis() - ts > maxSec * 1000L)
      invalidate(Some(m.name))

  def exists(name: String): Boolean = dicts.contains(bare(name))

  /** system.dictionaries live frame (columns clients read by name —
    * real tooling polls `last_successful_update_time` against
    * `lifetime_max` to alert on stale dictionaries). */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    dicts.values.toSeq.sortBy(_.name)
      .map { m =>
        val loaded = m.attrs.exists(a =>
          cache.contains((m.name, a.name.toLowerCase)) ||
            rangeCache.contains((m.name, a.name.toLowerCase)))
        (m.name, m.keyCol, m.attrs.map(_.name).mkString(","),
          m.source, if (loaded) "LOADED" else "NOT_LOADED",
          m.lifetime.map(_._1).getOrElse(0L),
          m.lifetime.map(_._2).getOrElse(0L),
          loadTimes.get(m.name).map(new java.sql.Timestamp(_)).orNull)
      }
      .toDF("name", "key", "attribute_names", "source", "status",
        "lifetime_min", "lifetime_max", "last_successful_update_time")
  }

  // ---- expression builders (registered under dictGet* in ChFunctions) ----

  /** `dictGet('dict', 'attr', key)` → declared DEFAULT (or the type's
    * zero value) for absent keys, ClickHouse semantics. The 4-arg form
    * `dictGet(d, a, key, at)` is the RANGE_HASHED validity-interval
    * lookup (requires a `RANGE(MIN lo MAX hi)` declaration). */
  def dictGet(args: Seq[Expression]): Expression = {
    require(args.length == 3 || args.length == 4,
      "dictGet(dict, attr, key[, range_at]) takes 3 or 4 arguments")
    val (m, attr) = resolve(args(0), args(1))
    ensureFresh(m)
    if (args.length == 4) {
      // beyond-cap RANGE_HASHED sources degrade to a correlated
      // subquery too — the 4-arg early-return used to bypass the
      // fitsLiteral check and throw the cap error
      if (!fitsLiteral(m)) {
        val (sub, valDt) = rangedSubqueryLookup(m, attr, args(2), args(3))
        return Coalesce(Seq(sub, defaultFor(m, attr, valDt)))
      }
      return rangedGet(m, attr, args(2), args(3))
    }
    if (!fitsLiteral(m)) {
      val (sub, _, valDt) = subqueryLookup(m, attr, args(2))
      return Coalesce(Seq(sub, defaultFor(m, attr, valDt)))
    }
    val (mapLit, keyDt, valDt) = loadedMap(m, attr)
    Coalesce(Seq(ElementAt(mapLit, Cast(args(2), keyDt), None, false),
      defaultFor(m, attr, valDt)))
  }

  /** RANGE_HASHED lookup: the map carries key → array of
    * (lo, hi, value) structs; the row whose [lo, hi] interval covers
    * `at` wins (a fold, so overlaps resolve to the LAST covering row —
    * ClickHouse picks an arbitrary covering row). Still a map literal:
    * codegen'd, no join, one ship per executor. */
  private def rangedGet(m: Meta, attr: String, keyE: Expression,
                        atE: Expression): Expression = {
    val (loCol, hiCol) = m.range.getOrElse(throw new IllegalArgumentException(
      s"Dictionary ${m.name} has no RANGE(MIN .. MAX ..) declaration"))
    val (mapLit, keyDt, valDt, rangeDt) = loadedRangeMap(m, attr, loCol, hiCol)
    val ranges = ElementAt(mapLit, Cast(keyE, keyDt), None, false)
    val at = Cast(atE, rangeDt)
    val acc = UnresolvedNamedLambdaVariable(Seq("__graft_rh_acc"))
    val s = UnresolvedNamedLambdaVariable(Seq("__graft_rh_s"))
    val out = UnresolvedNamedLambdaVariable(Seq("__graft_rh_out"))
    val hit = And(
      GreaterThanOrEqual(at, UnresolvedExtractValue(s, Literal("lo"))),
      LessThanOrEqual(at, UnresolvedExtractValue(s, Literal("hi"))))
    val folded = ArrayAggregate(ranges, Cast(Literal(null), valDt),
      LambdaFunction(If(hit, UnresolvedExtractValue(s, Literal("v")), acc),
        Seq(acc, s)),
      LambdaFunction(out, Seq(out)))
    Coalesce(Seq(folded, defaultFor(m, attr, valDt)))
  }

  /** `dictGetOrDefault('dict', 'attr', key, default)`. */
  def dictGetOrDefault(args: Seq[Expression]): Expression = {
    require(args.length == 4,
      "dictGetOrDefault(dict, attr, key, default) takes 4 arguments")
    val (m, attr) = resolve(args(0), args(1))
    ensureFresh(m)
    if (!fitsLiteral(m)) {
      val (sub, _, valDt) = subqueryLookup(m, attr, args(2))
      return Coalesce(Seq(sub, Cast(args(3), valDt)))
    }
    val (mapLit, keyDt, valDt) = loadedMap(m, attr)
    Coalesce(Seq(ElementAt(mapLit, Cast(args(2), keyDt), None, false),
      Cast(args(3), valDt)))
  }

  /** `dictGetOrNull('dict', 'attr', key)`. */
  def dictGetOrNull(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      "dictGetOrNull(dict, attr, key) takes 3 arguments")
    val (m, attr) = resolve(args(0), args(1))
    ensureFresh(m)
    if (!fitsLiteral(m)) return subqueryLookup(m, attr, args(2))._1
    val (mapLit, keyDt, _) = loadedMap(m, attr)
    ElementAt(mapLit, Cast(args(2), keyDt), None, false)
  }

  /** `dictHas('dict', key)` → UInt8 0/1 like ClickHouse. */
  def dictHas(args: Seq[Expression]): Expression = {
    require(args.length == 2, "dictHas(dict, key) takes 2 arguments")
    val m = meta(litStr(args(0), "dictHas"))
    ensureFresh(m)
    if (!fitsLiteral(m)) {
      // EXISTS over the source: the subquery rewrites to a semi join
      val (keyF, _) = sourceFields(m, m.attrs.head.name.toLowerCase)
      return Cast(org.apache.spark.sql.catalyst.expressions.Exists(
        keyedFilterPlan(m, keyF, args(1))), ShortType)
    }
    // key presence must not depend on a value being non-null: probe the
    // key array, not the looked-up value
    val (mapLit, keyDt, _) = loadedMap(m, m.attrs.head.name.toLowerCase)
    Cast(ArrayContains(MapKeys(mapLit), Cast(args(1), keyDt)), ShortType)
  }

  /** Typed variants (dictGetString/UInt64/...) — same lookup, cast to
    * the requested type. */
  def dictGetTyped(t: DataType)(args: Seq[Expression]): Expression =
    Cast(dictGet(args), t)

  // ---- internals ----

  private def bare(name: String): String = {
    val n = name.replace("`", "").toLowerCase
    n.substring(n.lastIndexOf('.') + 1)
  }

  private def litStr(e: Expression, fn: String): String = e match {
    case Literal(s, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: dictionary and attribute names must be string literals")
  }

  private def meta(name: String): Meta =
    dicts.getOrElse(bare(name), throw new IllegalArgumentException(
      s"Dictionary ${bare(name)} does not exist"))

  private def resolve(dictE: Expression, attrE: Expression): (Meta, String) = {
    val m = meta(litStr(dictE, "dictGet"))
    val attr = litStr(attrE, "dictGet").toLowerCase
    if (!m.attrs.exists(_.name.toLowerCase == attr))
      throw new IllegalArgumentException(
        s"Dictionary ${m.name} has no attribute $attr " +
          s"(has: ${m.attrs.map(_.name).mkString(", ")})")
    (m, attr)
  }

  /** One distributed limit+count per dictionary: does the source fit the
    * in-plan literal? No rows ever reach the driver here. */
  private def fitsLiteral(m: Meta): Boolean =
    fitsCache.getOrElseUpdate(m.name, {
      val src = m.spark.table(m.source.replace("`", ""))
      src.limit(maxEntries + 1).count() <= maxEntries
    })

  private def sourceFields(m: Meta, attr: String): (StructField, StructField) = {
    val src = m.spark.table(m.source.replace("`", ""))
    def field(c: String) = src.schema.fields.find(_.name.equalsIgnoreCase(c))
      .getOrElse(throw new IllegalArgumentException(
        s"Dictionary ${m.name}: column $c not in ${m.source}"))
    (field(m.keyCol), field(attr))
  }

  /** `Filter(__graft_dict_key = key, Project(key AS .., val AS ..))`
    * over the source relation — the correlated subquery body. The
    * projection renames columns so outer attributes can never
    * accidentally capture source columns of the same name. */
  /** The builder runs after the outer expression's children resolved,
    * so outer columns arrive as resolved AttributeReferences — they
    * must be marked OuterReference explicitly (the analyzer only
    * auto-wraps UNresolved names). The single home for that contract. */
  private def outerRefs(e: Expression): Expression = e.transform {
    case a: AttributeReference => OuterReference(a)
  }

  /** `Filter(__graft_dict_key = key [AND extraPred],
    * Project(key, val, extra..))` over the source relation — the
    * correlated subquery body shared by the flat and ranged beyond-cap
    * fallbacks. The projection renames columns so outer attributes can
    * never accidentally capture source columns of the same name;
    * `extraPred` must reference the renamed aliases and pre-wrap its
    * outer columns with [[outerRefs]]. */
  private def keyedFilterPlan(m: Meta, keyF: StructField,
                              keyE: Expression,
                              valF: Option[StructField] = None,
                              extraCols: Seq[(String, String)] = Nil,
                              extraPred: Option[Expression] = None) = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    val rel = UnresolvedRelation(
      m.source.replace("`", "").split('.').toIndexedSeq)
    val cols = Alias(UnresolvedAttribute(Seq(keyF.name)), "__graft_dict_key")() +:
      (valF.toSeq.map(f =>
        Alias(UnresolvedAttribute(Seq(f.name)), "__graft_dict_val")()) ++
        extraCols.map { case (src, alias) =>
          Alias(UnresolvedAttribute(Seq(src)), alias)() })
    val keyCond: Expression =
      EqualTo(UnresolvedAttribute(Seq("__graft_dict_key")),
        Cast(outerRefs(keyE), keyF.dataType))
    Filter(extraPred.map(And(keyCond, _)).getOrElse(keyCond),
      Project(cols, rel))
  }

  /** Beyond-cap lookup: a correlated scalar subquery
    * `(SELECT max(val) FROM src WHERE key = <outer key>)`. Catalyst's
    * RewriteCorrelatedScalarSubquery turns it into a left outer join —
    * broadcast when the source fits the threshold, shuffle hash/SMJ
    * beyond, picked by size the way a 100 TB plan should be. max() is
    * exact under the dictionary unique-key contract. */
  private def subqueryLookup(m: Meta, attr: String,
                             keyE: Expression): (Expression, DataType, DataType) = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val (keyF, valF) = sourceFields(m, attr)
    val agg = Aggregate(Nil,
      Seq(Alias(org.apache.spark.sql.catalyst.expressions.aggregate
        .Max(UnresolvedAttribute(Seq("__graft_dict_val")))
        .toAggregateExpression(), "__graft_dict_v")()),
      keyedFilterPlan(m, keyF, keyE, Some(valF)))
    (org.apache.spark.sql.catalyst.expressions.ScalarSubquery(agg),
      keyF.dataType, valF.dataType)
  }

  /** Beyond-cap RANGE_HASHED lookup: a correlated scalar subquery
    * `(SELECT max_by(val, lo) FROM src WHERE key = <k> AND lo <= <at>
    * AND hi >= <at>)` — the covering interval with the greatest lower
    * bound wins (deterministic under overlap; ClickHouse picks an
    * arbitrary covering row). Decorrelates to an aggregate + join like
    * the flat fallback. */
  private def rangedSubqueryLookup(m: Meta, attr: String, keyE: Expression,
                                   atE: Expression): (Expression, DataType) = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val (loCol, hiCol) = m.range.getOrElse(throw new IllegalArgumentException(
      s"Dictionary ${m.name} has no RANGE(MIN .. MAX ..) declaration"))
    val (keyF, valF) = sourceFields(m, attr)
    val loDt = sourceFields(m, loCol)._2.dataType
    val at = () => Cast(outerRefs(atE), loDt)
    val rangePred = And(
      LessThanOrEqual(UnresolvedAttribute(Seq("__graft_dict_lo")), at()),
      GreaterThanOrEqual(UnresolvedAttribute(Seq("__graft_dict_hi")), at()))
    val filtered = keyedFilterPlan(m, keyF, keyE, Some(valF),
      extraCols = Seq(loCol -> "__graft_dict_lo", hiCol -> "__graft_dict_hi"),
      extraPred = Some(rangePred))
    val agg = Aggregate(Nil,
      Seq(Alias(org.apache.spark.sql.catalyst.expressions.aggregate
        .MaxBy(UnresolvedAttribute(Seq("__graft_dict_val")),
          UnresolvedAttribute(Seq("__graft_dict_lo")))
        .toAggregateExpression(), "__graft_dict_v")()),
      filtered)
    (org.apache.spark.sql.catalyst.expressions.ScalarSubquery(agg),
      valF.dataType)
  }

  /** Collect `SELECT key, attr FROM source` into a map literal (cached).
    * Dimension-scale by contract — see the class doc guardrail. */
  private def loadedMap(m: Meta, attr: String): (Expression, DataType, DataType) =
    cache.getOrElseUpdate((m.name, attr), {
      val src = m.spark.table(m.source.replace("`", ""))
      val keyF = src.schema.fields.find(_.name.equalsIgnoreCase(m.keyCol))
        .getOrElse(throw new IllegalArgumentException(
          s"Dictionary ${m.name}: key column ${m.keyCol} not in ${m.source}"))
      val valF = src.schema.fields.find(_.name.equalsIgnoreCase(attr))
        .getOrElse(throw new IllegalArgumentException(
          s"Dictionary ${m.name}: attribute $attr not in ${m.source}"))
      val rows = src.select(keyF.name, valF.name).limit(maxEntries + 1)
        .collect()
      if (rows.length > maxEntries)
        throw new IllegalArgumentException(
          s"Dictionary ${m.name} exceeds $maxEntries entries; at that " +
            "size JOIN the source table instead of a dictionary lookup")
      val kv = rows.iterator.filter(!_.isNullAt(0))
        .map(r => r.get(0) -> r.get(1)).toMap
      val lit = Literal.create(kv,
        MapType(keyF.dataType, valF.dataType, valueContainsNull = true))
      loadTimes.put(m.name, System.currentTimeMillis())
      (lit, keyF.dataType, valF.dataType)
    })

  private val rangeCache =
    TrieMap.empty[(String, String), (Expression, DataType, DataType, DataType)]

  /** Collect `SELECT key, lo, hi, attr FROM source` into a map of
    * (lo, hi, v) struct arrays per key (cached; invalidate drops it
    * via the attr-keyed cache sharing the (dict, attr) key space). */
  private def loadedRangeMap(m: Meta, attr: String, loCol: String,
                             hiCol: String): (Expression, DataType, DataType, DataType) =
    rangeCache.getOrElseUpdate((m.name, attr), {
      val src = m.spark.table(m.source.replace("`", ""))
      def field(c: String) = src.schema.fields
        .find(_.name.equalsIgnoreCase(c))
        .getOrElse(throw new IllegalArgumentException(
          s"Dictionary ${m.name}: column $c not in ${m.source}"))
      val (keyF, loF, hiF, valF) =
        (field(m.keyCol), field(loCol), field(hiCol), field(attr))
      val rows = src.select(keyF.name, loF.name, hiF.name, valF.name)
        .limit(maxEntries + 1).collect()
      if (rows.length > maxEntries)
        throw new IllegalArgumentException(
          s"Dictionary ${m.name} exceeds $maxEntries entries; at that " +
            "size JOIN the source table instead of a dictionary lookup")
      val structDt = StructType(Seq(
        StructField("lo", loF.dataType), StructField("hi", hiF.dataType),
        StructField("v", valF.dataType)))
      val kv = rows.iterator.filter(!_.isNullAt(0)).toSeq
        .groupBy(_.get(0))
        .map { case (k, rs) =>
          k -> rs.map(r =>
            org.apache.spark.sql.Row(r.get(1), r.get(2), r.get(3)))
        }
      val lit = Literal.create(kv,
        MapType(keyF.dataType, ArrayType(structDt), valueContainsNull = false))
      loadTimes.put(m.name, System.currentTimeMillis())
      (lit, keyF.dataType, valF.dataType, loF.dataType)
    })

  /** ClickHouse's absent-key result: the attribute's declared DEFAULT,
    * else the type's zero value ('' / 0 / epoch). */
  private def defaultFor(m: Meta, attr: String, valDt: DataType): Expression =
    m.attrs.find(_.name.toLowerCase == attr).flatMap(_.default) match {
      case Some(text) =>
        Cast(m.spark.sessionState.sqlParser.parseExpression(text), valDt)
      case None => valDt match {
        case StringType => Literal("")
        case _: NumericType => Cast(Literal(0), valDt)
        case DateType => Literal(0, DateType) // 1970-01-01 in days-since-epoch
        case TimestampType => Cast(Literal(0L), TimestampType)
        case BooleanType => Literal(false)
        case _ => Literal(null, valDt)
      }
    }
}
