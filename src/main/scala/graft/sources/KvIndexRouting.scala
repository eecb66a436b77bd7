package graft.sources

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-SURFACE AUTOMATIC INDEX ROUTING — the Phoenix-optimizer behavior
  * lifted into Catalyst: a plain SQL range predicate over the PIVOTED
  * VIEW of one qualifier's current value,
  *
  * {{{
  *   SELECT rowKey, value FROM (
  *     SELECT rowKey, decode(max_by_ts(value, ts), 'UTF-8') AS value
  *     FROM kv_cells WHERE family = 'f' AND qualifier = 'click'
  *     GROUP BY rowKey)
  *   WHERE CAST(value AS BIGINT) >= 9000 AND CAST(value AS BIGINT) < 12000
  * }}}
  *
  * is recognized by this `Rule[LogicalPlan]` and — when a maintained
  * [[KvIndex]] exists on `(family, qualifier)` AND the manifest-stat cost
  * estimate says the range is selective ([[KvIndex.rangeIsSelective]],
  * the [[KvIndex.autoLookup]] call lifted into the planner) — rewritten
  * to the VERIFIED index lookup: pruned index range scan + bloom-pruned
  * candidate gets, instead of the full family scan the plan spells.
  *
  * Correctness boundary — why the rewrite can never change an answer:
  *  - the original `Filter` stays ON TOP of the spliced lookup, so the
  *    lookup only has to produce a SUPERSET of the rows the predicate
  *    selects (it produces exactly the [lo, hi) rows); bounds the
  *    extractor cannot map (IS NOT NULL debris, extra conjuncts) simply
  *    stay residual;
  *  - bounds are extracted only from conjuncts whose comparison
  *    semantics PROVABLY match the index's collation: integral
  *    `CAST(value AS BIGINT/INT)` comparisons for a decimal-mode
  *    (`pad > 0`) index — numeric order IS padded-string order for the
  *    canonical digit strings decimal mode enforces — and raw string
  *    comparisons (`>=` / `<` only) for a string-mode index. A
  *    mismatched collation (string compare against a decimal index)
  *    never routes;
  *  - the matched subtree must be EXACTLY the LWW pivot shape (one
  *    grouping key = rowKey, one aggregate = utf8-decoded
  *    [[graft.functions.MaxByTsAgg]], inner filter = exactly the
  *    family + qualifier equalities, relation = a plain current
  *    `graft-kv` read). Time travel, CDC feeds, snapshots, extra
  *    predicates below the aggregate, or extra aggregates all refuse —
  *    including the internal plans of [[KvIndex.lookup]] itself, whose
  *    verification filter carries a rowKey `IN` (loop-proof by shape).
  *
  * One decimal-mode behavior difference is the TYPED CONTRACT, not a
  * bug: a base table holding a non-digit or over-width value under a
  * decimal index fails the routed lookup LOUDLY ([[KvIndex]] class doc)
  * where the raw scan would silently null it out of a CAST — the same
  * refusal [[KvIndex.autoLookup]] makes, now reachable from SQL.
  *
  * Installation: [[KvIndexRouting.install]] appends the rule to the
  * session's `experimental.extraOptimizations` (the post-pushdown "User
  * Provided Optimizers" batch); [[graft.GraftExtensions]] also injects
  * it as a pre-CBO rule for `withExtensions`-built sessions. Both
  * positions may see either the pre-pushdown `DataSourceV2Relation` or
  * the post-pushdown `DataSourceV2ScanRelation`; the matcher accepts
  * both. The rewrite decision is NEVER load-bearing: any internal error
  * (filesystem hiccup, unreadable index meta) logs and falls back to
  * the unrouted plan.
  *
  * Scale shape: the cost probe is two driver-side manifest replays
  * (zero data I/O); a routed query reads O(candidates) instead of
  * O(table) — the Phoenix global-index trade, safe because read-time
  * verification absorbs index staleness.
  */
case class KvIndexRouting(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper with Logging {

  import KvIndexRouting._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(EnabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(cond, child) =>
        pivotShape(child) match {
          case Some(shape) =>
            try route(cond, shape).map(Filter(cond, _)).getOrElse(f)
            catch {
              case NonFatal(e) =>
                logWarning(s"graft-kv index routing: falling back to the " +
                  s"unrouted scan of ${shape.path} (${e.getMessage})")
                f
            }
          case None => f
        }
    }
  }

  /** The matched LWW-pivot subtree: table path, predicate column, and
    * the two output attributes the splice must preserve the identity of.
    */
  private case class PivotShape(path: String, family: String,
      qualifier: String, keyOut: Attribute, valOut: Attribute)

  /** Match `Aggregate([rowKey], [rowKey, decode(max_by_ts(value, ts))],
    * Filter(family = lit AND qualifier = lit, kv-relation))` — modulo
    * attribute-only Projects — and nothing else.
    */
  private def pivotShape(plan: LogicalPlan): Option[PivotShape] = plan match {
    case Aggregate(Seq(g: AttributeReference), aggExprs, aggChild, _)
        if aggExprs.length == 2 =>
      for {
        keyOut <- aggExprs.collectFirst {
          case a: AttributeReference if a.exprId == g.exprId => a: Attribute
          case al @ Alias(a: AttributeReference, _) if a.exprId == g.exprId =>
            al.toAttribute
        }
        (valOut, vAttr, tsAttr) <- aggExprs.collectFirst {
          case al @ Alias(w, _) =>
            decodedMaxByTs(w).map { case (v, t) => (al.toAttribute, v, t) }
        }.flatten
        (path, fam, qual, relOut) <- scanShape(stripProjects(aggChild))
        if attrIn(g, "rowKey", relOut) && attrIn(vAttr, "value", relOut) &&
          attrIn(tsAttr, "ts", relOut)
      } yield PivotShape(path, fam, qual, keyOut, valOut)
    case _ => None
  }

  private def attrIn(a: AttributeReference, name: String,
      out: Seq[Attribute]): Boolean =
    out.exists(o => o.exprId == a.exprId && o.name == name)

  /** Unwrap the exact "utf8 string of the LWW binary" shape — the ONLY
    * wrapper whose output semantics equal [[KvIndex.lookup]]'s `value`
    * column. Accepts the analyzed `StringDecode`, its RuntimeReplaceable
    * replacement (`StaticInvoke(StringDecode.decode, ...)` — what the
    * optimized plan holds), and a plain binary→string Cast.
    */
  private def decodedMaxByTs(e: Expression)
      : Option[(AttributeReference, AttributeReference)] = {
    def utf8(cs: Expression): Boolean = cs match {
      case Literal(s: UTF8String, StringType) =>
        s.toString.equalsIgnoreCase("utf-8")
      case _ => false
    }
    val inner = e match {
      case sd: StringDecode if utf8(sd.charset) => Some(sd.bin)
      case si: StaticInvoke
          if si.staticObject == classOf[StringDecode] &&
            si.functionName == "decode" && si.arguments.length >= 2 &&
            utf8(si.arguments(1)) =>
        Some(si.arguments.head)
      case c: Cast if c.dataType == StringType &&
          c.child.dataType == BinaryType => Some(c.child)
      case _ => None
    }
    inner.flatMap {
      case AggregateExpression(
          graft.functions.MaxByTsAgg(v: AttributeReference,
            t: AttributeReference, _, _), _, false, None, _) => Some((v, t))
      case _ => None
    }
  }

  private def stripProjects(plan: LogicalPlan): LogicalPlan = plan match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
  }

  /** Match the filtered plain-current kv relation; returns (path, family,
    * qualifier, relation output). The filter must be EXACTLY the two
    * equalities — any extra conjunct (a rowKey `IN` from a lookup's own
    * verification read, a ts bound) means the subtree answers a
    * different question and must not route.
    */
  private def scanShape(plan: LogicalPlan)
      : Option[(String, String, String, Seq[Attribute])] = plan match {
    case Filter(cond, rel) =>
      for {
        path <- relPath(rel)
        fq <- famQual(splitConjunctivePredicates(cond), rel.output)
      } yield (path, fq._1, fq._2, rel.output)
    case _ => None
  }

  private def relPath(plan: LogicalPlan): Option[String] = plan match {
    case r: DataSourceV2ScanRelation => r.scan match {
      case ks: KvScan => ks.routablePath
      case _ => None
    }
    case r: DataSourceV2Relation => r.table match {
      case t: KvCellTable
          if r.options.keySet().asScala.forall(k =>
            k.equalsIgnoreCase("path") || k.equalsIgnoreCase("paths")) =>
        t.routablePath
      case _ => None
    }
    case _ => None
  }

  private def famQual(conjuncts: Seq[Expression], out: Seq[Attribute])
      : Option[(String, String)] = {
    def eqLit(e: Expression): Option[(String, String)] = e match {
      case EqualTo(a: AttributeReference, Literal(s: UTF8String, StringType))
          if out.exists(_.exprId == a.exprId) => Some((a.name, s.toString))
      case EqualTo(Literal(s: UTF8String, StringType), a: AttributeReference)
          if out.exists(_.exprId == a.exprId) => Some((a.name, s.toString))
      case _ => None
    }
    // `IsNotNull(family/qualifier)` conjuncts are optimizer-inferred FROM
    // the equalities (InferFiltersFromConstraints) — implied, so dropping
    // them keeps the match exact. Any other extra conjunct still refuses.
    val material = conjuncts.filterNot {
      case IsNotNull(a: AttributeReference) =>
        (a.name == "family" || a.name == "qualifier") &&
          out.exists(_.exprId == a.exprId)
      case _ => false
    }
    val eqs = material.map(eqLit)
    if (material.length != 2 || eqs.exists(_.isEmpty)) None
    else {
      val m = eqs.flatten.toMap
      for {f <- m.get("family"); q <- m.get("qualifier") if m.size == 2}
        yield (f, q)
    }
  }

  /** The rewrite proper: find a matching index, extract collation-safe
    * bounds, make the manifest-stat cost call, splice the verified
    * lookup. None = keep the plan (which IS the correct scan plan).
    */
  private def route(cond: Expression, s: PivotShape): Option[LogicalPlan] = {
    val table = new Path(s.path)
    val fs = table.getFileSystem(session.sessionState.newHadoopConf())
    val maxSel = session.conf.get(MaxSelectivityKey, "0.2").toDouble
    for {
      // composite indexes are inner joins of their components — wrong
      // row set for a single-qualifier pivot; never route through one
      m <- KvIndex.list(fs, table)
        .find(i => i.family == s.family && i.qualifier == s.qualifier &&
          !i.composite)
      (lo, hi) <- bounds(splitConjunctivePredicates(cond), s.valOut, m.pad)
      if KvIndex.rangeIsSelective(session, fs, table, m, lo, hi, maxSel)
    } yield {
      logInfo(s"graft-kv index routing: serving value range [$lo, $hi) on " +
        s"${s.path} (${s.family}, ${s.qualifier}) through index '${m.name}'")
      val lp = KvIndex.lookup(session, s.path, m.name, lo, hi)
        .queryExecution.optimizedPlan
      // Same-exprId aliases keep every upstream reference (the retained
      // Filter above, anything else built over the view) valid.
      Project(Seq(
        Alias(lp.output.head, s.keyOut.name)(exprId = s.keyOut.exprId),
        Alias(lp.output(1), s.valOut.name)(exprId = s.valOut.exprId)), lp)
    }
  }

  /** Extract a [lo, hi) value range from the conjuncts that compare the
    * view's value column in the index's OWN collation (class doc). Both
    * bounds must materialize (decimal mode floors a missing lo at 0 —
    * values are canonical non-negative decimals), fit the declared
    * width, and leave a non-empty range; otherwise no routing.
    */
  private def bounds(conjuncts: Seq[Expression], v: Attribute,
      pad: Int): Option[(String, String)] = {
    def isV(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == v.exprId
      case _ => false
    }
    if (pad > 0) {
      def castOfV(e: Expression): Boolean = e match {
        case c: Cast if isV(c.child) && (c.dataType == LongType ||
          c.dataType == IntegerType || c.dataType == ShortType) => true
        case _ => false
      }
      def litLong(e: Expression): Option[Long] = e match {
        case Literal(x: Long, LongType) => Some(x)
        case Literal(x: Int, IntegerType) => Some(x.toLong)
        case Literal(x: Short, ShortType) => Some(x.toLong)
        case _ => None
      }
      var lo = 0L // decimal values are non-negative: 0 is an exact floor
      var hi = Option.empty[Long]
      def addLo(x: Long): Unit = lo = math.max(lo, x)
      def addHi(x: Long): Unit = hi = Some(hi.fold(x)(math.min(_, x)))
      def excl(x: Long): Unit = if (x < Long.MaxValue) addLo(x + 1)
      def incl(x: Long): Unit = if (x < Long.MaxValue) addHi(x + 1)
      conjuncts.foreach {
        case GreaterThanOrEqual(l, r) if castOfV(l) => litLong(r).foreach(addLo)
        case GreaterThan(l, r) if castOfV(l) => litLong(r).foreach(excl)
        case LessThan(l, r) if castOfV(l) => litLong(r).foreach(addHi)
        case LessThanOrEqual(l, r) if castOfV(l) => litLong(r).foreach(incl)
        case EqualTo(l, r) if castOfV(l) =>
          litLong(r).foreach { x => addLo(x); incl(x) }
        case EqualTo(l, r) if castOfV(r) =>
          litLong(l).foreach { x => addLo(x); incl(x) }
        // literal-first spellings mirror
        case GreaterThanOrEqual(l, r) if castOfV(r) => litLong(l).foreach(incl)
        case GreaterThan(l, r) if castOfV(r) => litLong(l).foreach(addHi)
        case LessThan(l, r) if castOfV(r) => litLong(l).foreach(excl)
        case LessThanOrEqual(l, r) if castOfV(r) => litLong(l).foreach(addLo)
        case _ => ()
      }
      hi.filter(h => h > lo && h >= 1).flatMap { h =>
        val (ls, hs) = (lo.toString, h.toString)
        if (ls.length <= pad && hs.length <= pad) Some((ls, hs)) else None
      }
    } else {
      // String collation: only the two exact-[lo, hi) spellings are
      // provably range-equivalent; >/<= on strings have no closed-form
      // exclusive twin, so they stay residual and block routing.
      var lo = Option.empty[String]
      var hi = Option.empty[String]
      def litStr(e: Expression): Option[String] = e match {
        case Literal(s: UTF8String, StringType) => Some(s.toString)
        case _ => None
      }
      def addLo(x: String): Unit = lo = Some(lo.fold(x)(l => if (x > l) x else l))
      def addHi(x: String): Unit = hi = Some(hi.fold(x)(h => if (x < h) x else h))
      conjuncts.foreach {
        case GreaterThanOrEqual(l, r) if isV(l) => litStr(r).foreach(addLo)
        case LessThan(l, r) if isV(l) => litStr(r).foreach(addHi)
        case LessThanOrEqual(l, r) if isV(r) => litStr(l).foreach(addLo)
        case GreaterThan(l, r) if isV(r) => litStr(l).foreach(addHi)
        case _ => ()
      }
      for {l <- lo; h <- hi if h > l} yield (l, h)
    }
  }
}

object KvIndexRouting {

  val EnabledKey = "spark.graft.kv.index.routing.enabled"
  val MaxSelectivityKey = "spark.graft.kv.index.routing.maxSelectivity"

  /** Idempotently append the rule to the session's experimental
    * optimizations — the runtime installation path for sessions not
    * built `withExtensions` (the injected form rides
    * [[graft.GraftExtensions]]).
    */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[KvIndexRouting]))
      spark.experimental.extraOptimizations = cur :+ KvIndexRouting(spark)
  }
}
