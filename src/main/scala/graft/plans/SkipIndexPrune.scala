package graft.plans

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import graft.dialect.SkipIndexes
import graft.dialect.SkipIndexes.{Bloom, FileStats, MinMax, NgramBf, SetN, TokenBf}

/** Plan-time file pruning through data-skipping indexes
  * (`ALTER TABLE ... ADD INDEX ... TYPE minmax|set(n)|bloom_filter`) —
  * the consult side of [[graft.dialect.SkipIndexes]], structured like
  * [[PartitionPruneFromDate]]: a Filter directly over a scan of an
  * indexed table is inspected for top-level conjuncts on indexed
  * columns, each file's stats decide whether the file can possibly
  * match, and files that provably cannot are dropped from the scan's
  * FileIndex. Partition pruning handles `_part`; parquet row-group
  * stats handle the ORDER BY prefix; this closes the remaining gap —
  * selective predicates on non-sort, non-partition columns, which
  * otherwise read every file of every partition.
  *
  * Soundness: a file is excluded only when a conjunct is FALSE for
  * every row the stats admit (minmax range disjoint, value absent from
  * the exact set, bloom test negative — bloom has false POSITIVES
  * only, so a negative is definitive). Files absent from the manifest
  * are always kept, so a stale manifest can only cost performance,
  * never rows. The rewrite strictly shrinks the listing under the
  * SAME filter, which still evaluates row-by-row on what remains.
  *
  * The whole decision is a driver-side map lookup over the in-memory
  * manifest — no job runs at plan time (ClickHouse reads its skip
  * marks the same way, during query analysis).
  */
object SkipIndexPrune extends Rule[LogicalPlan] {

  /** Kill switch (spec/bench A/B): `SkipIndexPrune.enabled = false`. */
  @volatile var enabled = true

  /** Last pruning decision per table: (kept files, total indexed-or-not
    * files) — observability for specs and the s17 oracle's require(). */
  private val lastPrune =
    scala.collection.concurrent.TrieMap.empty[String, (Int, Int)]
  def lastPruneFor(table: String): Option[(Int, Int)] =
    lastPrune.get(table.toLowerCase)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Order two EXTERNAL values of the same column type; None = types
    * this rule does not reason about (then the file is kept). */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: java.math.BigDecimal, y: Number) =>
      Some(x.compareTo(new java.math.BigDecimal(y.toString)))
    case (x: Number, y: java.math.BigDecimal) =>
      Some(new java.math.BigDecimal(x.toString).compareTo(y))
    case (x: Number, y: Number) =>
      Some(new java.math.BigDecimal(x.toString)
        .compareTo(new java.math.BigDecimal(y.toString)))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: java.sql.Date, y: java.sql.Date) => Some(x.compareTo(y))
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => Some(x.compareTo(y))
    case _ => None
  }

  private def eq(a: Any, b: Any): Boolean = cmp(a, b).contains(0)

  /** Can a row with value `v` (external) exist in a file with `st`,
    * under predicate kind `op`? Conservative: unknown => true. */
  private sealed trait Pred
  private case class PEq(v: Any) extends Pred
  private case class PIn(vs: Seq[Any]) extends Pred
  private case class PGt(v: Any, orEqual: Boolean) extends Pred // attr > / >= v
  private case class PLt(v: Any, orEqual: Boolean) extends Pred // attr < / <= v
  /** a guaranteed substring of the column (LIKE '%s%' / Contains /
    * StartsWith / EndsWith) — answered by the token/ngram blooms */
  private case class PContains(s: String) extends Pred

  private def filePossible(ix: SkipIndexes.Index, st: FileStats,
                           p: Pred): Boolean = ix.kind match {
    case MinMax =>
      val lo = st.lo.orNull
      val hi = st.hi.orNull
      if (lo == null || hi == null) true
      else p match {
        case PEq(v) =>
          cmp(lo, v).forall(_ <= 0) && cmp(hi, v).forall(_ >= 0)
        case PIn(vs) => vs.exists(v =>
          cmp(lo, v).forall(_ <= 0) && cmp(hi, v).forall(_ >= 0))
        case PGt(v, orEq) =>
          cmp(hi, v).forall(c => if (orEq) c >= 0 else c > 0)
        case PLt(v, orEq) =>
          cmp(lo, v).forall(c => if (orEq) c <= 0 else c < 0)
      }
    case SetN(_) => st.values match {
      case None => true // overflowed: no information
      case Some(vs) => p match {
        case PEq(v) => vs.exists(eq(_, v))
        case PIn(qs) => qs.exists(q => vs.exists(eq(_, q)))
        case _ => true // set indexes answer equality only
      }
    }
    case Bloom(_, nh) => st.bloom match {
      case None => true
      case Some(bits) => p match {
        case PEq(v) =>
          hashOf(v).forall(SkipIndexes.bloomMightContain(bits, _, nh))
        case PIn(qs) => qs.exists(q =>
          hashOf(q).forall(SkipIndexes.bloomMightContain(bits, _, nh)))
        case _ => true
      }
    }
    case TokenBf(_, nh) => st.bloom match {
      case None => true
      case Some(bits) =>
        // ALL the guaranteed tokens must be present; an empty token
        // list (fragment with no interior token) gives no information
        def allTokens(ts: Seq[String]): Boolean = ts.forall(t =>
          hashOf(t).forall(SkipIndexes.bloomMightContain(bits, _, nh)))
        p match {
          case PEq(v: String) => allTokens(SkipIndexes.tokensOf(v))
          case PIn(qs) => qs.exists {
            case q: String => allTokens(SkipIndexes.tokensOf(q))
            case _ => true
          }
          case PContains(s) => allTokens(SkipIndexes.interiorTokensOf(s))
          case _ => true
        }
    }
    case NgramBf(n, _, nh) => st.bloom match {
      case None => true
      case Some(bits) =>
        def allGrams(s: String): Boolean = SkipIndexes.ngramsOf(s, n)
          .forall(g => hashOf(g).forall(
            SkipIndexes.bloomMightContain(bits, _, nh)))
        p match {
          case PEq(v: String) => allGrams(v)
          case PIn(qs) => qs.exists {
            case q: String => allGrams(q); case _ => true
          }
          case PContains(s) => allGrams(s)
          case _ => true
        }
    }
  }

  /** xxhash64 of the EXTERNAL value exactly as the manifest build
    * hashed the column (`xxhash64(col)` — internal value, seed 42). */
  private def hashOf(external: Any): Option[Long] = {
    val lit = try Literal(external) catch { case _: Throwable => return None }
    try Some(new XxHash64(Seq(lit)).eval(null).asInstanceOf[Long])
    catch { case _: Throwable => None }
  }

  /** Extract the indexed-column predicates among the conjuncts.
    * Matches plain `attr OP literal` shapes only (a Cast on the attr
    * means the literal is in another type's space — skip, stay sound). */
  private def predsFor(col: String, conjs: Seq[Expression],
                       colType: org.apache.spark.sql.types.DataType): Seq[Pred] = {
    def ext(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(col)
      case _ => false
    }
    conjs.flatMap {
      case EqualTo(a, l: Literal) if isCol(a) && l.dataType == colType =>
        Seq(PEq(ext(l)))
      case EqualTo(l: Literal, a) if isCol(a) && l.dataType == colType =>
        Seq(PEq(ext(l)))
      case In(a, vs) if isCol(a) && vs.forall {
          case l: Literal => l.dataType == colType; case _ => false } =>
        Seq(PIn(vs.map { case l: Literal => ext(l) }))
      case InSet(a, vs) if isCol(a) =>
        // InSet holds INTERNAL values of the child's type
        Seq(PIn(vs.toSeq.map(v =>
          CatalystTypeConverters.convertToScala(v, colType))))
      case GreaterThan(a, l: Literal) if isCol(a) && l.dataType == colType =>
        Seq(PGt(ext(l), orEqual = false))
      case GreaterThanOrEqual(a, l: Literal) if isCol(a) && l.dataType == colType =>
        Seq(PGt(ext(l), orEqual = true))
      case LessThan(a, l: Literal) if isCol(a) && l.dataType == colType =>
        Seq(PLt(ext(l), orEqual = false))
      case LessThanOrEqual(a, l: Literal) if isCol(a) && l.dataType == colType =>
        Seq(PLt(ext(l), orEqual = true))
      case GreaterThan(l: Literal, a) if isCol(a) && l.dataType == colType =>
        Seq(PLt(ext(l), orEqual = false))
      case GreaterThanOrEqual(l: Literal, a) if isCol(a) && l.dataType == colType =>
        Seq(PLt(ext(l), orEqual = true))
      case LessThan(l: Literal, a) if isCol(a) && l.dataType == colType =>
        Seq(PGt(ext(l), orEqual = false))
      case LessThanOrEqual(l: Literal, a) if isCol(a) && l.dataType == colType =>
        Seq(PGt(ext(l), orEqual = true))
      // substring guarantees for the token/ngram blooms. The optimizer
      // has already simplified LIKE '%x%' / 'x%' / '%x' into these.
      case Contains(a, Literal(s, _)) if isCol(a) && s != null =>
        Seq(PContains(s.toString))
      case StartsWith(a, Literal(s, _)) if isCol(a) && s != null =>
        Seq(PContains(s.toString))
      case EndsWith(a, Literal(s, _)) if isCol(a) && s != null =>
        Seq(PContains(s.toString))
      case _ => Nil
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case f @ Filter(cond, rel: LogicalRelation)
          if rel.catalogTable.isDefined &&
            rel.relation.isInstanceOf[HadoopFsRelation] &&
            !rel.relation.asInstanceOf[HadoopFsRelation]
              .location.isInstanceOf[PrunedFileIndex] =>
        val id = rel.catalogTable.get.identifier
        val key = s"${id.database.getOrElse("default")}.${id.table}"
        val ixs = SkipIndexes.indexesOf(key)
        if (ixs.isEmpty) f
        else {
          val hfs = rel.relation.asInstanceOf[HadoopFsRelation]
          val conjs = conjuncts(cond)
          // per index: the set of manifest files its stats EXCLUDE
          val excluded = ixs.iterator.flatMap { ix =>
            rel.output.find(_.name.equalsIgnoreCase(ix.column)) match {
              case Some(attr) =>
                val ps = predsFor(attr.name, conjs, attr.dataType)
                if (ps.isEmpty) Iterator.empty
                else ix.stats.iterator.collect {
                  case (file, st)
                      if !ps.forall(p => filePossible(ix, st, p)) => file
                }
              case None => Iterator.empty
            }
          }.toSet
          if (excluded.isEmpty) f
          else {
            val pruned = new PrunedFileIndex(hfs.location, excluded)
            lastPrune.put(key.toLowerCase,
              (pruned.inputFiles.length, hfs.location.inputFiles.length))
            Filter(cond, rel.copy(relation =
              hfs.copy(location = pruned)(hfs.sparkSession)))
          }
        }
    }
}

/** A FileIndex that hides a fixed set of files from an underlying
  * index — what the skip-index decision materializes into the plan.
  * Everything else (partitions, sizes, refresh) delegates. */
class PrunedFileIndex(underlying: FileIndex, excluded: Set[String])
    extends FileIndex {
  private def keep(path: String): Boolean =
    !excluded.contains(SkipIndexes.normPath(path))
  override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
    underlying.rootPaths
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(d => d.copy(files = d.files.filter(fs => keep(fs.getPath.toString))))
      .filter(_.files.nonEmpty)
  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(keep)
  override def refresh(): Unit = underlying.refresh()
  override def sizeInBytes: Long = underlying.sizeInBytes
  override def partitionSchema: StructType = underlying.partitionSchema
}
