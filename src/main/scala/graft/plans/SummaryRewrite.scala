package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Divide, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Materialized-view rewrite (aggregate navigation): an `Aggregate`
  * whose grouping and measures are all answerable from a REGISTERED
  * summary table is rewritten to a projection over that summary — the
  * classic warehouse optimization (Calcite/OLAP "aggregate
  * navigation"), and the third custom `Rule[LogicalPlan]` next to
  * [[WidenNarrowScans]] and [[BucketedRangeJoin]]. At 100 TB this is
  * the difference between answering a dashboard query from a
  * |groups|-row summary and re-scanning the fact table.
  *
  * Soundness model:
  *  - a summary is registered AT THE GRANULARITY of the rewrite (one
  *    row per group-tuple value), so measures map column-for-column —
  *    no re-aggregation and therefore no algebraic-vs-holistic
  *    pitfalls. Groupings may be MULTI-column; a grouping that equals
  *    the grain maps column-for-column, and a grouping that is a
  *    STRICT SUBSET of a grain rolls the summary up (re-aggregation of
  *    algebraic measures over the grain partition — see [[rollup]]).
  *    A WHERE clause qualifies iff it is deterministic, subquery-free,
  *    and references GRAIN columns only — such a predicate keeps or
  *    drops whole grain groups, so replaying it over the summary rows
  *    is exact; any other predicate declines the rewrite;
  *  - supported measures are COUNT(*), SUM/MIN/MAX of a raw column
  *    (no DISTINCT, no FILTER clauses — anything else disqualifies the
  *    whole aggregate and the fact scan runs as written), and AVG of
  *    an INTEGRAL raw column answered as the registered SUM/COUNT pair
  *    (`sum/n` in double arithmetic is bit-identical to Spark's
  *    `Average` for integral inputs, whose buffer accumulates the
  *    integer sum exactly in doubles below 2^53; fractional inputs are
  *    declined — their sum is order-sensitive in floating point);
  *  - a registered entry re-verifies its source's content fingerprint
  *    (a file stat) on every rewrite and declines on mismatch, so a
  *    corpus regenerated at the same path can never be answered from
  *    the pre-regeneration summary, even before the ensure* builder
  *    re-registers ([[graft.ops.Scale.ensureLineitemSummary]]);
  *  - a summary location can be a fixed path (`_SUCCESS`-guarded: a
  *    swept scratch dir declines instead of throwing at planning
  *    time) or a versioned pointer store's committed manifest
  *    ([[SummaryLocation.PointerStore]]) — resolved at rewrite time,
  *    so the rule only ever serves the committed version of a
  *    stream-maintained snapshot, never a torn or superseded one;
  *  - the replacement projection preserves the original output
  *    attribute ids, so parent operators resolve unchanged; the
  *    summary relation itself is instantiated fresh per rewrite
  *    (`newInstance`), so two rewrites in one plan never collide on
  *    attribute ids, while the file listing/schema work is cached per
  *    resolved path.
  *
  * Opt-in (`spark.graft.summaryRewrite.enabled=true`), like the other
  * graft rules: correctness never depends on it — the rewritten plan
  * must (and q240/q241/q242/q244's oracles prove it does) return
  * bit-identical rows.
  */
case class SummaryRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import SummaryRewrite._

  private def enabled: Boolean =
    spark.conf.getOption(EnabledKey).contains("true")

  /** The single file-relation root under attribute-only projections and
    * Filters, plus the filter conditions collected on the way down, if
    * the subtree is exactly that shape. A predicate COMMUTES with the
    * grain partition iff it references only grain columns (it then
    * keeps or drops whole grain groups), so the caller checks the
    * collected conditions' columns against the candidate grain and
    * replays them over the summary rows.
    */
  private def sourceOf(plan: LogicalPlan)
      : Option[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression])] =
    plan match {
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) => sourceOf(c)
      case Filter(cond, c) => sourceOf(c).map { case (s, cs) => (s, cond +: cs) }
      case r: LogicalRelation =>
        r.relation match {
          case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
            Some((fs.location.rootPaths.head.toString, Nil))
          case _ => None
        }
      case _ => None
    }

  private def measureOf(ae: AggregateExpression): Option[Measure] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Count(Seq(Literal(1, _))) => Some(CountStar)
      case Count(Seq(a: AttributeReference)) => Some(CountCol(a.name))
      case s: Sum => s.child match {
        case a: AttributeReference => Some(SumCol(a.name))
        case _ => None
      }
      case m: Min => m.child match {
        case a: AttributeReference => Some(MinCol(a.name))
        case _ => None
      }
      case m: Max => m.child match {
        case a: AttributeReference => Some(MaxCol(a.name))
        case _ => None
      }
      case _ => None
    }

  /** The analyzed summary relation for a resolved path — listing and
    * schema work cached, with three review-driven guards:
    *  - the cache key carries a LISTING FINGERPRINT of the summary dir
    *    (per-file name/length/mtime — one cheap listFiles), so a
    *    summary REBUILT at the same path (scratch swept mid-JVM, then
    *    re-materialized) gets a fresh listing instead of the pre-sweep
    *    file index, even on filesystems whose mtime granularity is
    *    coarser than the sweep-and-rebuild window;
    *  - the cache is per-session through a WeakHashMap, and the cached
    *    plans are held through SoftReferences: an analyzed relation
    *    strongly references its own session, so holding it strongly
    *    would pin the WeakHashMap key forever (the javadoc'd
    *    value-references-key trap) — soft values let the collector
    *    clear a discarded session's plans under memory pressure, after
    *    which the key itself is reclaimable; a cleared live entry just
    *    re-reads (a miss, never a correctness event);
    *  - each session's cache is a 64-entry LRU, so a PointerStore
    *    store committing new versions forever (each version = a new
    *    resolved path) cannot grow the cache without bound the way it
    *    grows — and GCs — version dirs on disk.
    */
  private def summaryRel(sumPath: String): LogicalPlan = {
    // the FULL listing string, not a 32-bit hash of it: a hashCode
    // collision between the pre- and post-rebuild listings at the same
    // path would silently serve the stale cached file index (the
    // listing is a handful of part files — the key stays small)
    val stamp = {
      val fs = Option(new java.io.File(sumPath).listFiles()).toSeq.flatten
      fs.sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .mkString("|")
    }
    val cache = relCaches.synchronized {
      relCaches.computeIfAbsent(spark, _ =>
        new java.util.LinkedHashMap[(String, String), java.lang.ref.SoftReference[LogicalPlan]](
          16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[(String, String), java.lang.ref.SoftReference[LogicalPlan]])
              : Boolean = size > 64
        })
    }
    val key = (sumPath, stamp)
    val cached = cache.synchronized { Option(cache.get(key)).flatMap(r => Option(r.get)) }
    val analyzed = cached.getOrElse {
      val p = spark.read.parquet(sumPath).queryExecution.analyzed
      cache.synchronized {
        cache.put(key, new java.lang.ref.SoftReference(p)): Unit
      }
      p
    }
    // fresh exprIds per use so two rewrites in one plan (e.g. a
    // self-join of the same rewritten aggregate) never alias each
    // other's attributes
    analyzed.transformUp { case lr: LogicalRelation => lr.newInstance() }
  }

  private def attrOf(rel: LogicalPlan)(name: String): Option[AttributeReference] =
    rel.output.collectFirst { case a: AttributeReference if a.name == name => a }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || (registry.isEmpty && joinRegistry.isEmpty &&
      chainRegistry.isEmpty && compositeJoinRegistry.isEmpty)) plan
    else plan.transformUp {
      case agg @ Aggregate(groupings, resultExprs, child, _)
          if groupings.forall(_.isInstanceOf[AttributeReference]) =>
        val gAttrs = groupings.map(_.asInstanceOf[AttributeReference])
        val gNames = gAttrs.map(_.name).toSet
        singleTablePath(child, gAttrs, gNames, resultExprs)
          .orElse(joinPath(child, gAttrs, gNames, resultExprs))
          .orElse(chainPath(child, gAttrs, gNames, resultExprs))
          .getOrElse(agg)
    }

  private def singleTablePath(child: LogicalPlan,
      gAttrs: Seq[AttributeReference], gNames: Set[String],
      resultExprs: Seq[NamedExpression]): Option[LogicalPlan] =
    for {
      (src, conds) <- sourceOf(child)
      // predicates qualify only when deterministic, subquery-free,
      // and over grain columns exclusively (checked per entry)
      if conds.forall(c => c.deterministic &&
        c.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isEmpty)
      predCols = conds.flatMap(_.references.toSeq.map(_.name)).toSet
      entries <- Option(registry.get(src))
      live = entries.filter(_.stillFresh()) // stale ⇒ never served
      rewritten <- selectAndRewrite(live, gAttrs, gNames, resultExprs,
        conds, predCols)
    } yield rewritten

  /** Aggregate over an INNER single-key equi-join of two registered
    * sources, answered from a registered join-MV. Conservative
    * qualification: each join side must be a bare (projected) scan —
    * the only side-filters tolerated are the `IsNotNull(joinKey)`
    * constraints Catalyst infers from the join condition itself, which
    * an inner equi-join makes semantically vacuous (null keys never
    * match) — the join condition must be exactly the registered key
    * equality (either orientation; inner joins commute), and the two
    * sides must share NO column name, so every name-based
    * grain/measure mapping is unambiguous.
    */
  private def joinPath(child: LogicalPlan,
      gAttrs: Seq[AttributeReference], gNames: Set[String],
      resultExprs: Seq[NamedExpression]): Option[LogicalPlan] = {
    // a join side qualifies when every conjunct on it is either the
    // vacuous IsNotNull(joinKey) Catalyst infers from the inner equi
    // condition (dropped — null keys never match anyway) or a
    // deterministic, subquery-free predicate that survives to be
    // grain-checked and replayed over the summary rows (a WHERE on the
    // dimension side, e.g. c_mktsegment = 'X', keeps or drops whole
    // grain groups exactly like the single-table filter path)
    def sideWithConds(side: LogicalPlan, keyNames: Set[String])
        : Option[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression])] =
      sourceOf(side).flatMap { case (src, conds) =>
        val split = conds.flatMap(splitConjunctivePredicates)
        val residual = split.filterNot {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(
            a: AttributeReference) => keyNames.contains(a.name)
          case _ => false
        }
        if (residual.forall(c => c.deterministic &&
            c.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isEmpty))
          Some((src, residual))
        else None
      }
    // the side's FULL relation schema, not the column-pruned output:
    // the disjointness guard below must see every column the source
    // table could contribute — a pruned Project can hide a duplicated
    // name and let a measure bind to the WRONG table's aggregate
    def fullSchemaOf(side: LogicalPlan): Option[Set[String]] = side match {
      case Project(_, c) => fullSchemaOf(c)
      case Filter(_, c) => fullSchemaOf(c)
      case r: LogicalRelation => Some(r.relation.schema.fieldNames.toSet)
      case _ => None
    }
    child match {
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        joinPath(c, gAttrs, gNames, resultExprs)
      case org.apache.spark.sql.catalyst.plans.logical.Join(l, r,
          org.apache.spark.sql.catalyst.plans.Inner, Some(cond), _) =>
        // the condition must be PURE column equalities (one → the
        // single-key registry, two+ → the composite-key registry); any
        // other conjunct (a range, a non-equi, an expression key) means
        // the query's join grain is not the registered one — decline
        val eqs = splitConjunctivePredicates(cond).map {
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
            x: AttributeReference, y: AttributeReference) => Some((x, y))
          case _ => None
        }
        // orient each equality's sides onto the join's children
        val oriented = eqs.map(_.flatMap { case (x, y) =>
          if (l.outputSet.contains(x) && r.outputSet.contains(y)) Some((x, y))
          else if (l.outputSet.contains(y) && r.outputSet.contains(x)) Some((y, x))
          else None
        })
        if (oriented.exists(_.isEmpty)) None
        else {
          val pairs = oriented.flatten
          for {
            // unambiguous name-mapping requires disjoint side schemas —
            // of the underlying TABLES, not the pruned join children
            lSchema <- fullSchemaOf(l)
            rSchema <- fullSchemaOf(r)
            if lSchema.intersect(rSchema).isEmpty
            (ls, lconds) <- sideWithConds(l, pairs.map(_._1.name).toSet)
            (rs, rconds) <- sideWithConds(r, pairs.map(_._2.name).toSet)
            conds = lconds ++ rconds
            predCols = conds.flatMap(_.references.toSeq.map(_.name)).toSet
            candidates = pairs match {
              case Seq((lk, rk)) =>
                Option(joinRegistry.get((ls, rs))).getOrElse(Nil)
                  .filter(e => e.leftKey == lk.name && e.rightKey == rk.name) ++
                  Option(joinRegistry.get((rs, ls))).getOrElse(Nil)
                    .filter(e => e.leftKey == rk.name && e.rightKey == lk.name)
              case _ =>
                // composite key: the query's oriented pair SET must equal
                // the registered pair set exactly (order-insensitive —
                // conjunct order is optimizer noise; but a PARTIAL match,
                // a crossed pairing, or an extra equality all decline:
                // they join at a different grain than the materialization)
                val fwd = pairs.map(p => (p._1.name, p._2.name)).toSet
                Option(compositeJoinRegistry.get((ls, rs))).getOrElse(Nil)
                  .filter(_.keyPairs.toSet == fwd) ++
                  Option(compositeJoinRegistry.get((rs, ls))).getOrElse(Nil)
                    .filter(_.keyPairs.map(_.swap).toSet == fwd)
            }
            live = candidates.filter(_.stillFresh())
            rewritten <- selectAndRewrite(live, gAttrs, gNames, resultExprs,
              conds, predCols)
          } yield rewritten
        }
      case _ => None
    }
  }

  /** Aggregate over a LEFT-DEEP LINEAR CHAIN of inner single-key
    * equi-joins of three or more registered sources (e.g. lineitem ⋈
    * orders ⋈ customer), answered from a registered chain-MV — the
    * n-way generalization of [[joinPath]]. Qualification stays
    * conservative: every side must be a bare (projected) scan whose
    * only tolerated side-filters are the vacuous `IsNotNull(key)`
    * constraints Catalyst infers from the inner equi conditions plus
    * deterministic grain-only predicates (replayed over the summary
    * rows); the chain's source sequence and per-position key-pair
    * NAME SETS must match a registered chain exactly, forward or fully
    * reversed (inner joins commute — the same chain built from either
    * end); and all side schemas must be pairwise disjoint so every
    * name-based mapping is unambiguous. Any other association (a
    * right-deep or bushy tree), any non-equi or multi-key condition,
    * or a key pair that differs from the registered chain declines.
    */
  private def chainPath(child: LogicalPlan,
      gAttrs: Seq[AttributeReference], gNames: Set[String],
      resultExprs: Seq[NamedExpression]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, IsNotNull}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // flatten a left-deep tree of inner single-equi joins into its leaf
    // sides (left to right) and the oriented key pair joining each new
    // right side to the accumulated left subtree
    def leaves(p: LogicalPlan)
        : Option[(Seq[LogicalPlan], Seq[(AttributeReference, AttributeReference)])] =
      p match {
        case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
          leaves(c)
        case Join(l, r, Inner,
            Some(EqualTo(x: AttributeReference, y: AttributeReference)), _) =>
          leaves(l).flatMap { case (ls, pairs) =>
            val oriented =
              if (l.outputSet.contains(x) && r.outputSet.contains(y)) Some((x, y))
              else if (l.outputSet.contains(y) && r.outputSet.contains(x)) Some((y, x))
              else None
            oriented.map(o => (ls :+ r, pairs :+ o))
          }
        case other => Some((Seq(other), Nil))
      }
    def fullSchemaOf(side: LogicalPlan): Option[Set[String]] = side match {
      case Project(_, c) => fullSchemaOf(c)
      case Filter(_, c) => fullSchemaOf(c)
      case r: LogicalRelation => Some(r.relation.schema.fieldNames.toSet)
      case _ => None
    }
    for {
      (sides, pairs) <- leaves(child)
      if sides.length >= 3 && pairs.length == sides.length - 1
      schemas = sides.map(fullSchemaOf)
      if schemas.forall(_.isDefined)
      schemaSets = schemas.map(_.get)
      // pairwise-disjoint side schemas keep name mappings unambiguous
      if schemaSets.combinations(2).forall(p => p.head.intersect(p(1)).isEmpty)
      // every join-key name, for the per-side vacuous-IsNotNull filter
      keyNames = pairs.flatMap(p => Seq(p._1.name, p._2.name)).toSet
      resolved = sides.map(sourceOf)
      if resolved.forall(_.isDefined)
      sidesConds = resolved.map(_.get)
      residuals = sidesConds.map { case (_, cs) =>
        cs.flatMap(splitConjunctivePredicates).filterNot {
          case IsNotNull(a: AttributeReference) => keyNames.contains(a.name)
          case _ => false
        }
      }
      if residuals.flatten.forall(c => c.deterministic &&
        c.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isEmpty)
      conds = residuals.flatten
      predCols = conds.flatMap(_.references.toSeq.map(_.name)).toSet
      srcSeq = sidesConds.map(_._1)
      pairSets = pairs.map(p => Set(p._1.name, p._2.name))
      candidates = {
        def matching(sources: Seq[String], sets: Seq[Set[String]]) =
          Option(chainRegistry.get(sources)).getOrElse(Nil).filter(e =>
            e.keyPairs.length == sets.length &&
              e.keyPairs.zip(sets).forall { case ((a, b), s) => Set(a, b) == s })
        matching(srcSeq, pairSets) ++
          matching(srcSeq.reverse, pairSets.reverse)
      }
      live = candidates.filter(_.stillFresh())
      rewritten <- selectAndRewrite(live, gAttrs, gNames, resultExprs,
        conds, predCols)
    } yield rewritten
  }

  /** Shared entry selection: exact grain first (measures map
    * column-for-column), then ROLL-UP — a grouping that is a strict
    * subset of a grain, INCLUDING the empty grouping (a global
    * dashboard aggregate), re-aggregates the |grain|-row summary (sum
    * of counts, sum of sums, min of mins, max of maxs — algebraic, so
    * re-aggregation is exact) — still summary-sized work vs a fact
    * scan. Smallest qualifying grain wins. Collected grain-column
    * predicates replay over the summary rows in either mode.
    */
  private def selectAndRewrite(live: Seq[RegisteredSummary],
      gAttrs: Seq[AttributeReference], gNames: Set[String],
      resultExprs: Seq[NamedExpression],
      conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      predCols: Set[String]): Option[LogicalPlan] = {
    def qualifies(e: RegisteredSummary) = predCols.subsetOf(e.groupCols.toSet)
    val direct = live.find(e => e.groupCols.toSet == gNames && qualifies(e))
      .flatMap(e => e.location.resolve()
        .flatMap(p => rewrite(e, p, gAttrs, resultExprs, conds)))
    direct.orElse {
      live.filter(e => gNames.subsetOf(e.groupCols.toSet) &&
          e.groupCols.toSet != gNames && qualifies(e))
        .sortBy(_.groupCols.size)
        .view
        .flatMap(e => e.location.resolve()
          .flatMap(p => rollup(e, p, gAttrs, resultExprs, conds)))
        .headOption
    }
  }

  /** Remap a fact-side predicate onto the summary's attributes (by
    * name, with type equality), declining if any referenced column is
    * missing from the summary schema.
    */
  private def remapCond(summaryAttr: String => Option[AttributeReference])(
      cond: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    var ok = true
    val out = cond.transform {
      case a: AttributeReference =>
        summaryAttr(a.name).filter(_.dataType == a.dataType) match {
          case Some(sa) => sa
          case None => ok = false; a
        }
    }
    if (ok) Some(out) else None
  }

  /** The summary relation with the query's grain predicates replayed
    * over its rows — the base both rewrite modes build on.
    */
  private def filteredRel(rel: LogicalPlan,
      summaryAttr: String => Option[AttributeReference],
      conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[LogicalPlan] =
    if (conds.isEmpty) Some(rel)
    else {
      val remapped = conds.map(remapCond(summaryAttr))
      if (remapped.forall(_.isDefined))
        Some(Filter(remapped.map(_.get).reduce(
          org.apache.spark.sql.catalyst.expressions.And), rel))
      else None
    }

  private def rewrite(entry: RegisteredSummary, sumPath: String,
      gAttrs: Seq[AttributeReference],
      resultExprs: Seq[NamedExpression],
      conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Option[LogicalPlan] = {
    val rel0 = summaryRel(sumPath)
    val summaryAttr = attrOf(rel0) _
    val relOpt = filteredRel(rel0, summaryAttr, conds)
    if (relOpt.isEmpty) return None
    val rel = relOpt.get
    val gByExprId = gAttrs.map(a => a.exprId -> a).toMap
    val mapped: Seq[Option[NamedExpression]] = resultExprs.map {
      case a: AttributeReference if gByExprId.contains(a.exprId) =>
        summaryAttr(a.name)
          .filter(_.dataType == a.dataType)
          .map(sa => Alias(sa, a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name) =>
        ae.aggregateFunction match {
          // AVG over an integral raw column ⇒ the summary's SUM and
          // PER-COLUMN COUNT pair divided in double arithmetic —
          // exactly Average's own evaluate expression for integral
          // inputs. The denominator must be COUNT(col), not COUNT(*):
          // Average ignores nulls, so a summary can only answer AVG if
          // it carries the column's own non-null count.
          case avg: Average if !ae.isDistinct && ae.filter.isEmpty =>
            avg.child match {
              case a: AttributeReference if Seq(ByteType, ShortType,
                  IntegerType, LongType).contains(a.dataType) =>
                for {
                  sumName <- entry.measures.get(SumCol(a.name))
                  cntName <- entry.measures.get(CountCol(a.name))
                  sa <- summaryAttr(sumName)
                  ca <- summaryAttr(cntName)
                  if ae.dataType == DoubleType
                } yield Alias(
                  Divide(Cast(sa, DoubleType), Cast(ca, DoubleType)),
                  name)(exprId = al.exprId)
              case _ => None
            }
          case _ =>
            for {
              m <- measureOf(ae)
              colName <- entry.measures.get(m)
              sa <- summaryAttr(colName)
              // paranoia: the summary column must carry the exact result
              // type the aggregate would have produced
              if sa.dataType == ae.dataType
            } yield Alias(sa, name)(exprId = al.exprId)
        }
      case _ => None
    }
    if (mapped.forall(_.isDefined)) Some(Project(mapped.map(_.get), rel))
    else None
  }

  /** Roll-up rewrite: the query groups by a strict SUBSET of the
    * summary's grain, so the summary is re-aggregated at the coarser
    * grain — sound because every supported measure is algebraic over
    * the grain partition:
    *  - COUNT(*)        ⇒ SUM(summary.count)
    *  - SUM(x)          ⇒ SUM(summary.sum_x)
    *  - MIN(x)/MAX(x)   ⇒ MIN/MAX of the summary min/max columns
    *  - AVG(x) integral ⇒ SUM(sum_x) / SUM(count) in double arithmetic
    *  - COUNT(DISTINCT g) for g IN the grain ⇒ COUNT(DISTINCT
    *    summary.g) — the grain column's distinct values per coarse
    *    group are exactly its distinct values among the group's
    *    summary rows (and the distinct runs over |grain| rows, not the
    *    fact table)
    * Anything else declines the whole aggregate. The re-aggregation
    * itself is |grain|-rows-sized — the plan keeps an Aggregate, but
    * over the summary relation instead of the fact scan.
    */
  private def rollup(entry: RegisteredSummary, sumPath: String,
      gAttrs: Seq[AttributeReference],
      resultExprs: Seq[NamedExpression],
      conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Option[LogicalPlan] = {
    val rel0 = summaryRel(sumPath)
    val summaryAttr = attrOf(rel0) _
    val relOpt = filteredRel(rel0, summaryAttr, conds)
    if (relOpt.isEmpty) return None
    val rel = relOpt.get
    val gByExprId = gAttrs.map(a => a.exprId -> a).toMap
    def measureAttr(m: Measure): Option[AttributeReference] =
      entry.measures.get(m).flatMap(summaryAttr)
    val mapped: Seq[Option[NamedExpression]] = resultExprs.map {
      case a: AttributeReference if gByExprId.contains(a.exprId) =>
        summaryAttr(a.name)
          .filter(_.dataType == a.dataType)
          .map(sa => Alias(sa, a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name) if ae.filter.isEmpty =>
        val replacement: Option[org.apache.spark.sql.catalyst.expressions.Expression] =
          ae.aggregateFunction match {
            case Count(Seq(Literal(1, _))) if !ae.isDistinct =>
              // coalesce for the GLOBAL (empty-grouping) roll-up over
              // an empty summary: COUNT over an empty fact table is 0,
              // but SUM over the empty summary is NULL. Grouped
              // roll-ups never hit the null (their groups exist);
              // globals must
              measureAttr(CountStar).map(sa => Coalesce(Seq(
                Sum(sa).toAggregateExpression(), Literal(0L))))
            case c: Count if ae.isDistinct => c.children match {
              case Seq(a: AttributeReference) if entry.groupCols.contains(a.name) =>
                summaryAttr(a.name).filter(_.dataType == a.dataType)
                  .map(sa => Count(sa).toAggregateExpression(isDistinct = true))
              case _ => None
            }
            case Count(Seq(a: AttributeReference)) if !ae.isDistinct =>
              // COUNT(col) rolls up by summing the per-grain non-null
              // counts the summary carries (coalesced for the global-
              // over-empty case, as above)
              measureAttr(CountCol(a.name)).map(sa => Coalesce(Seq(
                Sum(sa).toAggregateExpression(), Literal(0L))))
            case s: Sum if !ae.isDistinct => s.child match {
              case a: AttributeReference =>
                measureAttr(SumCol(a.name)).map(sa => Sum(sa).toAggregateExpression())
              case _ => None
            }
            case m: Min => m.child match {
              case a: AttributeReference =>
                measureAttr(MinCol(a.name)).map(sa => Min(sa).toAggregateExpression())
              case _ => None
            }
            case m: Max => m.child match {
              case a: AttributeReference =>
                measureAttr(MaxCol(a.name)).map(sa => Max(sa).toAggregateExpression())
              case _ => None
            }
            case avg: Average if !ae.isDistinct => avg.child match {
              case a: AttributeReference if Seq(ByteType, ShortType,
                  IntegerType, LongType).contains(a.dataType) && ae.dataType == DoubleType =>
                for {
                  ssum <- measureAttr(SumCol(a.name))
                  // COUNT(col), not COUNT(*): Average ignores nulls
                  scnt <- measureAttr(CountCol(a.name))
                } yield Divide(
                  Cast(Sum(ssum).toAggregateExpression(), DoubleType),
                  Cast(Sum(scnt).toAggregateExpression(), DoubleType))
              case _ => None
            }
            case _ => None
          }
        replacement
          // the re-aggregated measure must produce the exact result
          // type the original aggregate declared
          .filter(_.dataType == ae.dataType)
          .map(e => Alias(e, name)(exprId = al.exprId))
      case _ => None
    }
    if (mapped.forall(_.isDefined)) {
      val gSummaryAttrs = gAttrs.map(a => summaryAttr(a.name))
      if (gSummaryAttrs.forall(_.isDefined))
        Some(Aggregate(gSummaryAttrs.map(_.get), mapped.map(_.get), rel))
      else None
    } else None
  }
}

object SummaryRewrite {
  val EnabledKey = "spark.graft.summaryRewrite.enabled"

  sealed trait Measure
  case object CountStar extends Measure
  /** COUNT(col) — the column's NON-NULL count; also AVG's denominator.
    *
    * AVG registration contract: the rewrite answers AVG(x) as
    * SumCol(x)/CountCol(x) in double arithmetic, which is bit-identical
    * to Spark's `Average` only while every served group's |sum| stays
    * below 2^53 (`Average` accumulates integral inputs exactly in a
    * double buffer up to that bound; beyond it the fact-scan plan's own
    * low bits become accumulation-order-dependent while the rewritten
    * exact-long division stays exact — they can differ in the last
    * ulp). Builders registering a Sum/Count pair must assert the bound
    * at materialization time (see `Scale.assertAvgRewriteSafe`) so an
    * oversized corpus fails the build loudly instead of diverging by a
    * low bit at query time.
    */
  case class CountCol(name: String) extends Measure
  case class SumCol(name: String) extends Measure
  case class MinCol(name: String) extends Measure
  case class MaxCol(name: String) extends Measure

  /** Where a summary's rows live — resolved at REWRITE time, so the
    * rule never plans against a path that has since disappeared or
    * been superseded.
    */
  sealed trait SummaryLocation { def resolve(): Option[String] }
  object SummaryLocation {
    /** A one-shot materialization: valid iff its `_SUCCESS` marker
      * still exists (a swept scratch dir declines the rewrite instead
      * of throwing at planning time).
      */
    case class FixedPath(path: String) extends SummaryLocation {
      override def resolve(): Option[String] =
        if (new java.io.File(path, "_SUCCESS").exists()) Some(path) else None
    }
    /** A versioned snapshot store (the streaming upsert sink's layout):
      * the highest one-line manifest names the committed version dir
      * ([[graft.store.ManifestStore.pointerCurrent]] — the put-if-absent
      * pointer-store protocol; no CURRENT file since r16). Only that
      * version is ever served — a refresh's new version becomes visible
      * exactly at the manifest link, and a torn (uncommitted) version
      * is unreachable by construction.
      */
    case class PointerStore(root: String) extends SummaryLocation {
      override def resolve(): Option[String] =
        graft.store.ManifestStore
          .pointerCurrent(java.nio.file.Paths.get(root))
          .map(v => new java.io.File(root, v))
          .filter(_.isDirectory).map(_.toString)
    }
  }

  /** What every registered summary exposes to the rewrite machinery:
    * where it lives, its (possibly multi-column) grain, which summary
    * column answers which measure, and a freshness probe — re-checked
    * on every rewrite (a cheap file stat comparing the source's
    * content fingerprint against the one captured at registration), so
    * a regenerated corpus is never answered from the pre-regeneration
    * summary.
    */
  sealed trait RegisteredSummary {
    def location: SummaryLocation
    def groupCols: Seq[String]
    def measures: Map[Measure, String]
    def stillFresh: () => Boolean
  }

  /** A summary over ONE source table. */
  case class Summary(location: SummaryLocation, groupCols: Seq[String],
      measures: Map[Measure, String], stillFresh: () => Boolean = () => true)
    extends RegisteredSummary

  /** A summary over an INNER equi-JOIN of two source tables — the
    * join-MV. `leftKey`/`rightKey` name the single-column equi keys the
    * materialization joined on; a query's join qualifies only when its
    * sides resolve to the registered source pair (either orientation —
    * inner joins commute) and its condition is exactly that key
    * equality.
    */
  case class JoinSummary(leftKey: String, rightKey: String,
      location: SummaryLocation, groupCols: Seq[String],
      measures: Map[Measure, String], stillFresh: () => Boolean = () => true)
    extends RegisteredSummary

  /** source root path → registered summaries (several grains may
    * summarize one source; process-wide, like the rule registry any
    * session-attached MV catalog would consult). Registering a grain
    * that already exists for the source replaces it.
    */
  private[plans] val registry =
    new java.util.concurrent.ConcurrentHashMap[String, List[Summary]]

  /** A summary over a LEFT-DEEP LINEAR CHAIN of inner single-key
    * equi-joins of 3+ source tables (e.g. lineitem ⋈ orders ⋈
    * customer) — the multi-way join-MV. `keyPairs(i)` names the
    * equi-key pair that joined source i+1 into the chain; a query
    * qualifies only when its flattened chain matches the registered
    * source sequence and per-position key pairs exactly (forward or
    * fully reversed).
    */
  case class ChainSummary(keyPairs: Seq[(String, String)],
      location: SummaryLocation, groupCols: Seq[String],
      measures: Map[Measure, String], stillFresh: () => Boolean = () => true)
    extends RegisteredSummary

  /** A summary over an INNER equi-join of two source tables on a
    * COMPOSITE key — 2+ column pairs ANDed (e.g. a (partkey, suppkey)
    * bridge). A query qualifies only when its conjunct set of oriented
    * column equalities matches `keyPairs` exactly as a SET (conjunct
    * order is optimizer noise); a partial key match, a crossed pairing,
    * or an extra equality all decline — they join at a different grain
    * than the materialization and would be wrong to serve.
    */
  case class CompositeJoinSummary(keyPairs: Seq[(String, String)],
      location: SummaryLocation, groupCols: Seq[String],
      measures: Map[Measure, String], stillFresh: () => Boolean = () => true)
    extends RegisteredSummary

  /** (left source root, right source root) → registered join summaries. */
  private[plans] val joinRegistry =
    new java.util.concurrent.ConcurrentHashMap[(String, String), List[JoinSummary]]

  /** (left source root, right source root) → registered COMPOSITE-key
    * join summaries.
    */
  private[plans] val compositeJoinRegistry =
    new java.util.concurrent.ConcurrentHashMap[(String, String), List[CompositeJoinSummary]]

  /** ordered source-root chain → registered chain summaries. */
  private[plans] val chainRegistry =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], List[ChainSummary]]

  /** Per-session caches of analyzed summary relations (see
    * [[SummaryRewrite.summaryRel]] for the key/eviction/soft-value
    * contract): WeakHashMap so a collected session drops its
    * relations; inner 64-entry LRU keyed by (path, dir-listing
    * fingerprint), values soft so they never strongly pin the session
    * key.
    */
  private[plans] val relCaches =
    new java.util.WeakHashMap[SparkSession,
      java.util.LinkedHashMap[(String, String), java.lang.ref.SoftReference[LogicalPlan]]]

  def register(sourcePath: String, summary: Summary): Unit =
    registry.compute(sourcePath, (_, prev) =>
      summary :: Option(prev).getOrElse(Nil)
        .filterNot(_.groupCols.toSet == summary.groupCols.toSet)): Unit

  def registerChain(sources: Seq[String], summary: ChainSummary): Unit =
    chainRegistry.compute(sources, (_, prev) =>
      summary :: Option(prev).getOrElse(Nil)
        .filterNot(e => e.groupCols.toSet == summary.groupCols.toSet &&
          e.keyPairs == summary.keyPairs)): Unit

  def registerJoin(leftSrc: String, rightSrc: String, summary: JoinSummary): Unit =
    joinRegistry.compute((leftSrc, rightSrc), (_, prev) =>
      summary :: Option(prev).getOrElse(Nil)
        .filterNot(e => e.groupCols.toSet == summary.groupCols.toSet &&
          e.leftKey == summary.leftKey && e.rightKey == summary.rightKey)): Unit

  def registerCompositeJoin(leftSrc: String, rightSrc: String,
      summary: CompositeJoinSummary): Unit =
    compositeJoinRegistry.compute((leftSrc, rightSrc), (_, prev) =>
      summary :: Option(prev).getOrElse(Nil)
        .filterNot(e => e.groupCols.toSet == summary.groupCols.toSet &&
          e.keyPairs.toSet == summary.keyPairs.toSet)): Unit

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[SummaryRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SummaryRewrite(spark)
  }
}
