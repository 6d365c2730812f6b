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

  /** Bytes the pruning decision kept vs the table's total — the
    * IO-reduction signal for scans whose wall-clock sits under the
    * fixed-cost floor at small scale (driver-side file metadata, no
    * data read). */
  private val lastPruneBytes =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
  def lastPruneBytesFor(table: String): Option[(Long, Long)] =
    lastPruneBytes.get(table.toLowerCase)

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
  /** hasToken(col, t): t must appear as a WHOLE token — stronger than
    * PContains (the token bloom tests it directly, no interior-only
    * conservatism) */
  private case class PToken(t: String) extends Pred
  /** multiSearchAny(col, [s...]): at least ONE of the substrings is
    * present — a file survives if ANY needle is possible */
  private case class PAnyContains(ss: Seq[String]) extends Pred

  private def filePossible(ix: SkipIndexes.Index, st: FileStats,
                           p: Pred,
                           dt: org.apache.spark.sql.types.DataType): Boolean =
    ix.kind match {
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
        case _ => true // substring preds: minmax gives no information
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
          hashOf(v, dt).forall(SkipIndexes.bloomMightContain(bits, _, nh))
        case PIn(qs) => qs.exists(q =>
          hashOf(q, dt).forall(SkipIndexes.bloomMightContain(bits, _, nh)))
        case _ => true
      }
    }
    case TokenBf(_, nh) => st.bloom match {
      case None => true
      case Some(bits) =>
        // ALL the guaranteed tokens must be present; an empty token
        // list (fragment with no interior token) gives no information
        def allTokens(ts: Seq[String]): Boolean = ts.forall(t =>
          hashOf(t, org.apache.spark.sql.types.StringType)
            .forall(SkipIndexes.bloomMightContain(bits, _, nh)))
        p match {
          case PEq(v: String) => allTokens(SkipIndexes.tokensOf(v))
          case PIn(qs) => qs.exists {
            case q: String => allTokens(SkipIndexes.tokensOf(q))
            case _ => true
          }
          case PContains(s) => allTokens(SkipIndexes.interiorTokensOf(s))
          // a hasToken argument that is itself one clean token tests
          // the bloom directly; anything else gives no information
          case PToken(t) if SkipIndexes.tokensOf(t) == Seq(t) =>
            allTokens(Seq(t))
          case PAnyContains(ss) =>
            ss.exists(s => allTokens(SkipIndexes.interiorTokensOf(s)))
          case _ => true
        }
    }
    case NgramBf(n, _, nh) => st.bloom match {
      case None => true
      case Some(bits) =>
        def allGrams(s: String): Boolean = SkipIndexes.ngramsOf(s, n)
          .forall(g => hashOf(g, org.apache.spark.sql.types.StringType)
            .forall(SkipIndexes.bloomMightContain(bits, _, nh)))
        p match {
          case PEq(v: String) => allGrams(v)
          case PIn(qs) => qs.exists {
            case q: String => allGrams(q); case _ => true
          }
          case PContains(s) => allGrams(s)
          case PToken(t) => allGrams(t)
          case PAnyContains(ss) => ss.exists(allGrams)
          case _ => true
        }
    }
  }

  /** xxhash64 of the EXTERNAL value exactly as the manifest build
    * hashed the column (`xxhash64(col)` — internal value of the
    * COLUMN's type, seed 42). `Literal.create(v, dt)` pins the probe
    * to the column's type space: a bare `Literal(v)` would re-infer
    * the type and e.g. hash a Decimal(20,2) probe as a small-precision
    * unscaled long while the build side hashed the wide byte form —
    * every bloom test negative, every indexed file wrongly pruned. */
  private def hashOf(external: Any,
                     dt: org.apache.spark.sql.types.DataType): Option[Long] = {
    val lit = try Literal.create(external, dt)
      catch { case _: Throwable => return None }
    try Some(new XxHash64(Seq(lit)).eval(null).asInstanceOf[Long])
    catch { case _: Throwable => None }
  }

  /** Extract the indexed-column predicates among the conjuncts.
    * Matches plain `attr OP literal` shapes only (a Cast on the attr
    * means the literal is in another type's space — skip, stay sound). */
  /** The manifest key an expression addresses: a plain column, or
    * lower(col)/upper(col) — the probe consults ONLY an index built
    * over the exact same wrapper (Index.exprKey). */
  private def colKey(e: Expression): Option[(String,
      org.apache.spark.sql.types.DataType)] = e match {
    case ar: AttributeReference => Some((ar.name.toLowerCase, ar.dataType))
    case Lower(ar: AttributeReference) =>
      Some((s"lower(${ar.name.toLowerCase})", ar.dataType))
    case Upper(ar: AttributeReference) =>
      Some((s"upper(${ar.name.toLowerCase})", ar.dataType))
    case _ => None
  }

  private type Leaf = (String, org.apache.spark.sql.types.DataType, Pred)
  private def leafPred(e: Expression): Option[Leaf] = {
    def ext(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    def mk(a: Expression, l: Literal, p: Pred): Option[Leaf] =
      colKey(a) match {
        case Some((key, dt)) if l.dataType == dt => Some((key, dt, p))
        case _ => None
      }
    e match {
      case EqualTo(a, l: Literal) => mk(a, l, PEq(ext(l)))
      case EqualTo(l: Literal, a) => mk(a, l, PEq(ext(l)))
      case In(a, vs) if colKey(a).isDefined && vs.nonEmpty && vs.forall {
          case l: Literal => l.dataType == colKey(a).get._2; case _ => false } =>
        Some((colKey(a).get._1, colKey(a).get._2,
          PIn(vs.map { case l: Literal => ext(l) })))
      case InSet(a, vs) if colKey(a).isDefined =>
        // InSet holds INTERNAL values of the child's type
        Some((colKey(a).get._1, colKey(a).get._2, PIn(vs.toSeq.map(v =>
          CatalystTypeConverters.convertToScala(v, colKey(a).get._2)))))
      case GreaterThan(a, l: Literal) => mk(a, l, PGt(ext(l), orEqual = false))
      case GreaterThanOrEqual(a, l: Literal) => mk(a, l, PGt(ext(l), orEqual = true))
      case LessThan(a, l: Literal) => mk(a, l, PLt(ext(l), orEqual = false))
      case LessThanOrEqual(a, l: Literal) => mk(a, l, PLt(ext(l), orEqual = true))
      case GreaterThan(l: Literal, a) => mk(a, l, PLt(ext(l), orEqual = false))
      case GreaterThanOrEqual(l: Literal, a) => mk(a, l, PLt(ext(l), orEqual = true))
      case LessThan(l: Literal, a) => mk(a, l, PGt(ext(l), orEqual = false))
      case LessThanOrEqual(l: Literal, a) => mk(a, l, PGt(ext(l), orEqual = true))
      // substring guarantees for the token/ngram blooms. The optimizer
      // has already simplified LIKE '%x%' / 'x%' / '%x' into these.
      case Contains(a, Literal(s, _)) if colKey(a).isDefined && s != null =>
        Some((colKey(a).get._1, colKey(a).get._2, PContains(s.toString)))
      case StartsWith(a, Literal(s, _)) if colKey(a).isDefined && s != null =>
        Some((colKey(a).get._1, colKey(a).get._2, PContains(s.toString)))
      case EndsWith(a, Literal(s, _)) if colKey(a).isDefined && s != null =>
        Some((colKey(a).get._1, colKey(a).get._2, PContains(s.toString)))
      // hasToken(col, 't') — the dialect compiles it to whole-token
      // membership over the SAME separator class the index tokenizes
      case ArrayContains(
          StringSplit(a, Literal(sep, _), _),
          Literal(tok, _))
          if colKey(a).isDefined && sep != null &&
            sep.toString == SkipIndexes.TokenSep && tok != null =>
        Some((colKey(a).get._1, colKey(a).get._2, PToken(tok.toString)))
      // multiSearchAny(col, ['a','b',...]) — the dialect compiles it
      // to exists(needles, n -> contains(col, n)); with a literal
      // needle array the file needs at least ONE possible needle
      case ArrayExists(arr,
          LambdaFunction(Contains(a, _: NamedLambdaVariable), _, _), _)
          if colKey(a).isDefined =>
        val needles: Option[Seq[String]] = arr match {
          case CreateArray(items, _)
              if items.forall {
                case Literal(s, _) => s != null; case _ => false } =>
            Some(items.map { case Literal(s, _) => s.toString })
          case Literal(ad: org.apache.spark.sql.catalyst.util.ArrayData,
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType, _)) =>
            val vs = ad.toObjectArray(org.apache.spark.sql.types.StringType)
            if (vs.forall(_ != null)) Some(vs.map(_.toString).toSeq) else None
          case _ => None
        }
        needles.filter(_.nonEmpty)
          .map(ss => (colKey(a).get._1, colKey(a).get._2, PAnyContains(ss)))
      case _ => None
    }
  }

  /** Tri-state evaluation of a predicate tree against ONE file's
    * stats: Some(false) = provably no row of this file satisfies it;
    * None = cannot tell (the conservative default). AND is false if
    * either side is false; OR only if BOTH are — so
    * `x = 1 OR x = 5000` still prunes files whose stats admit neither,
    * which flat conjunct-extraction missed. NOT stays None: negating
    * "maybe" proves nothing, and the leaf matchers answer the negated
    * forms directly where they can. */
  private def evalMaybe(e: Expression, file: String,
                        ixByCol: Map[String, List[SkipIndexes.Index]])
      : Option[Boolean] = e match {
    case And(l, r) =>
      if (evalMaybe(l, file, ixByCol).contains(false) ||
          evalMaybe(r, file, ixByCol).contains(false)) Some(false) else None
    case Or(l, r) =>
      if (evalMaybe(l, file, ixByCol).contains(false) &&
          evalMaybe(r, file, ixByCol).contains(false)) Some(false) else None
    case leaf => leafPred(leaf) match {
      case Some((col, dt, p)) =>
        val impossible = ixByCol.getOrElse(col, Nil).exists(ix =>
          ix.stats.get(file).exists(st => !filePossible(ix, st, p, dt)))
        if (impossible) Some(false) else None
      case None => None
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
          // only columns that are BOTH indexed and output by this scan
          // participate (a same-named column of another table must not)
          val outCols = rel.output.map(_.name.toLowerCase).toSet
          val ixByCol = ixs.filter(ix => outCols(ix.column.toLowerCase))
            .groupBy(_.exprKey)
          val allFiles = ixs.iterator.flatMap(_.stats.keysIterator).toSet
          val excluded = allFiles.filter(file =>
            evalMaybe(cond, file, ixByCol).contains(false))
          if (excluded.isEmpty) f
          else {
            val pruned = new PrunedFileIndex(hfs.location, excluded)
            lastPrune.put(key.toLowerCase,
              (pruned.inputFiles.length, hfs.location.inputFiles.length))
            try {
              def bytes(ix: FileIndex): Long =
                ix.listFiles(Nil, Nil).iterator
                  .flatMap(_.files).map(_.getLen).sum
              lastPruneBytes.put(key.toLowerCase,
                (bytes(pruned), bytes(hfs.location)))
            } catch { case _: Throwable => () }
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
