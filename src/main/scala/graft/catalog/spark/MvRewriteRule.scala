package graft.catalog.spark

import scala.util.Try

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, Expression, KnownNotNull, Literal, PredicateHelper, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project, Sort, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.catalog.SnapshotCatalog

/** Automatic MATERIALIZED-VIEW QUERY REWRITE (aggregate navigation): a
  * user aggregate over a base table is answered from a FRESH materialized
  * view's backing table instead — without the user referencing the view —
  * whenever the backing provably contains the answer. The classic
  * warehouse optimization (Oracle query rewrite, Calcite/BigQuery
  * "materialized view smart tuning"): at 100 TB it turns a full fact-table
  * scan + shuffle into a read of a few thousand pre-aggregated rows.
  *
  * Soundness model — a rewrite fires only when ALL of:
  *  - the query is a single `Aggregate` over (attribute-only projections /
  *    filters over) an INNER-JOIN FOREST of up to [[MvRewriteRule.MaxJoinLeaves]]
  *    DISTINCT snapcat relations (one relation, fact-dim, or an N-way
  *    star/snowflake), deterministic, no subqueries. An inner join reads
  *    as `σ(cond)(A × B)`, so ON-clause vs WHERE vs pushed-down conjunct
  *    placement never matters — all placements normalize into ONE
  *    conjunct set over the leaf multiset, and leaf pairing is by table
  *    identity (which is why a self-join refuses: no unambiguous rebase).
  *    Trees containing an OUTER / SEMI / ANTI join (r13) take a STRICT
  *    shape lane instead: filters do not commute with those joins, so the
  *    query's join tree must be IDENTICAL to the view body's (structure,
  *    join types, per-node ON conjunct sets, in-tree filters), with only
  *    the filters ABOVE the top join subject to the usual subsumption —
  *    once trees are equal the backing pre-aggregates the exact same
  *    relational expression, and the service matrix below is join-type
  *    agnostic;
  *  - a materialized view over THE SAME relation set has its recorded
  *    base pins (`mv.base.<db>.<t>`) equal to BOTH the snapshots the
  *    query's scans serve and the tables' current snapshots — i.e. the
  *    backing reflects exactly the data the scans would see (the extra
  *    current-id check closes the mid-refresh window where the backing is
  *    already ahead of the pins);
  *  - the view body's conjuncts (join conditions included) are a SUBSET
  *    of the query's (matched semantically after re-basing the body onto
  *    the query's leaves), and every residual query conjunct references
  *    only the view's group-key columns — those re-apply on the backing;
  *  - the query's group columns are a subset of the view's group-key
  *    OUTPUTS, and every query aggregate derives from the view's visible
  *    outputs or its hidden `__mv_*` partials (sum/count decompositions):
  *      exact group match  → served per-row from the backing;
  *      strict subset      → re-aggregated (ROLLUP): count → sum of the
  *        stored counts, sum → sum of sums, min/max → min/max of extrema,
  *        avg → sum(__mv_s)/sum(__mv_c); DISTINCT aggregates serve
  *        per-row on exact group match, and at coarser groupings (the
  *        plain-rollup AND grouping-sets paths) from the per-(group,
  *        value) copy-count SIDECAR — raw distinct state does not
  *        compose, but the sidecar stores exactly the value sets a
  *        distinct rollup unions; no sidecar → honest refusal.
  * Everything else passes through untouched — the rewrite is a pure
  * optimization with no fallback semantics to reason about.
  *
  * Runs as the FIRST post-hoc resolution rule: the query's relation is
  * still a clean V2 scan (pre-MoR-substitution), and the emitted backing
  * read is analyzed through the normal pipeline, so a backing carrying
  * its own merge-on-read shards from incremental refreshes still merges.
  * Output attributes are re-aliased to the original aggregate's expr-ids,
  * so parent operators (HAVING, ORDER BY, projections) resolve untouched.
  * Session kill-switch: `spark.graft.mv.rewrite.enabled=false`.
  */
class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean = Try(spark.sessionState.conf
    .getConfString("spark.graft.mv.rewrite.enabled", "true")).getOrElse("true") == "true"

  /** Opt-in BOUNDED-STALENESS rewrites (the BigQuery `max_staleness`
    * trade): when true, a CURRENT-state scan may be answered from an MV
    * whose pins lag the table — the query reads the view's last
    * refreshed state instead of live data. Exactness is deliberately
    * given up by the session that sets this; time-travel scans still
    * require the exact pin (a historical answer must be the historical
    * truth). Default false: rewrites are invisible-correct. */
  private def allowStale: Boolean = Try(spark.sessionState.conf
    .getConfString("spark.graft.mv.rewrite.allow-stale", "false"))
    .getOrElse("false") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRewriteRule.substitutionSuppressed || !enabled) plan
    else plan.transformUpWithSubqueries {
      case agg: Aggregate if agg.child.isInstanceOf[Expand] =>
        rewriteGroupingSets(agg).getOrElse(agg)
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
      case f: Filter => rewriteTopK(f).getOrElse(f)
    }

  /** The scan forest under an aggregate: conjuncts collected through
    * filters, attribute-only projections, and INNER joins (for which
    * `σ(cond)(A × B)` is an equivalent reading — so ON-clause, WHERE, and
    * pushed-down placements all normalize into ONE conjunct set) down to
    * the V2 relation leaves. */
  private def scanForest(p: LogicalPlan)
      : Option[(Seq[Expression], Seq[DataSourceV2Relation])] =
    p match {
      case SubqueryAlias(_, c) => scanForest(c)
      case Filter(cond, c) =>
        scanForest(c).map { case (cs, r) => (splitConjunctivePredicates(cond) ++ cs, r) }
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => scanForest(c)
      case j: Join if j.joinType == Inner || j.joinType == Cross =>
        for {
          (lc, lr) <- scanForest(j.left)
          (rc, rr) <- scanForest(j.right)
        } yield (j.condition.toSeq.flatMap(splitConjunctivePredicates) ++ lc ++ rc,
          lr ++ rr)
      case r: DataSourceV2Relation => Some((Seq.empty, Seq(r)))
      case _ => None
    }

  // ---- the OUTER-JOIN lane (r13): strict shape matching ------------------
  //
  // Inner conjuncts normalize (σ(cond)(A × B) placement-independence), but
  // an outer/semi/anti join does NOT commute with its filters — so queries
  // containing one match a view only when the two join TREES are IDENTICAL:
  // same structure, same join types, same leaf tables position by position,
  // per-node ON conjunct sets semantically equal, and any filter INSIDE the
  // tree equal at the same node. Filters ABOVE the top join keep the usual
  // subsumption rule (σ commutes with Γ through group-key residuals). Once
  // trees are equal the backing is Γ_keys(σ_bodyTop(J)) for the exact same
  // relational expression J the query computes — so the exact / rollup
  // service matrix is join-type agnostic from here on.
  private sealed trait JoinTree
  private case class TLeaf(rel: DataSourceV2Relation) extends JoinTree
  private case class TFilter(conj: Seq[Expression], child: JoinTree) extends JoinTree
  private case class TNode(jt: JoinType, left: JoinTree, right: JoinTree,
      cond: Seq[Expression]) extends JoinTree

  private sealed trait QueryShape {
    def rels: Seq[DataSourceV2Relation]
    def allConjuncts: Seq[Expression]
  }
  private case class InnerShape(conj: Seq[Expression],
      rels: Seq[DataSourceV2Relation]) extends QueryShape {
    def allConjuncts: Seq[Expression] = conj
  }
  private case class OuterShape(topConj: Seq[Expression], tree: JoinTree,
      rels: Seq[DataSourceV2Relation]) extends QueryShape {
    def allConjuncts: Seq[Expression] = topConj ++ treeConjuncts(tree)
  }

  private def supportedJoinType(jt: JoinType): Boolean = jt match {
    case Inner | Cross | LeftOuter | RightOuter | FullOuter |
         LeftSemi | LeftAnti => true
    case _ => false
  }

  private def buildTree(p: LogicalPlan): Option[JoinTree] = p match {
    case SubqueryAlias(_, c) => buildTree(c)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => buildTree(c)
    case Filter(cond, c) =>
      buildTree(c).map(TFilter(splitConjunctivePredicates(cond), _))
    // RIGHT OUTER normalizes to LEFT OUTER with swapped children — the
    // same relational expression (output attribute set is by exprId, so
    // column order is irrelevant) — so `dim RIGHT JOIN fact` matches a
    // `fact LEFT JOIN dim` view body
    case j: Join if j.joinType == RightOuter =>
      for { l <- buildTree(j.left); r <- buildTree(j.right) }
        yield TNode(LeftOuter, r, l,
          j.condition.toSeq.flatMap(splitConjunctivePredicates))
    case j: Join if supportedJoinType(j.joinType) =>
      for { l <- buildTree(j.left); r <- buildTree(j.right) }
        yield TNode(j.joinType, l, r, j.condition.toSeq.flatMap(splitConjunctivePredicates))
    case r: DataSourceV2Relation => Some(TLeaf(r))
    case _ => None
  }

  /** Peel top-level filters/aliases/projections into the subsumable
    * conjunct set, then build the strict join tree below. Only used when
    * the tree actually contains a non-inner join — pure inner forests take
    * the flexible [[scanForest]] lane. */
  private def outerSplit(p: LogicalPlan): Option[(Seq[Expression], JoinTree)] =
    p match {
      case SubqueryAlias(_, c) => outerSplit(c)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => outerSplit(c)
      case Filter(cond, c) =>
        outerSplit(c).map { case (cs, t) =>
          (splitConjunctivePredicates(cond) ++ cs, t) }
      case _ => buildTree(p).map((Seq.empty[Expression], _))
    }

  private def leavesOf(t: JoinTree): Seq[DataSourceV2Relation] = t match {
    case TLeaf(r) => Seq(r)
    case TFilter(_, c) => leavesOf(c)
    case TNode(_, l, r, _) => leavesOf(l) ++ leavesOf(r)
  }

  private def treeConjuncts(t: JoinTree): Seq[Expression] = t match {
    case TLeaf(_) => Seq.empty
    case TFilter(cs, c) => cs ++ treeConjuncts(c)
    case TNode(_, l, r, cs) => cs ++ treeConjuncts(l) ++ treeConjuncts(r)
  }

  private def hasOuter(t: JoinTree): Boolean = t match {
    case TLeaf(_) => false
    case TFilter(_, c) => hasOuter(c)
    case TNode(jt, l, r, _) =>
      (jt != Inner && jt != Cross) || hasOuter(l) || hasOuter(r)
  }

  /** Semantic multiset equality of two conjunct sets. */
  private def conjSetEq(a: Seq[Expression], b: Seq[Expression]): Boolean = {
    if (a.length != b.length) return false
    val rem = b.toBuffer
    a.forall { x =>
      val i = rem.indexWhere(_.semanticEquals(x))
      if (i < 0) false else { rem.remove(i); true }
    }
  }

  /** Structural tree equality: query tree vs REBASED body tree. */
  private def treeEq(q: JoinTree, b: JoinTree,
      reb: Expression => Expression,
      keyOf: DataSourceV2Relation => Option[(String, String)]): Boolean =
    (q, b) match {
      case (TLeaf(qr), TLeaf(br)) =>
        keyOf(qr).isDefined && keyOf(qr) == keyOf(br)
      case (TFilter(qc, qch), TFilter(bc, bch)) =>
        conjSetEq(qc, bc.map(reb)) && treeEq(qch, bch, reb, keyOf)
      case (TNode(qt, ql, qr, qc), TNode(bt, bl, br, bc)) =>
        qt == bt && conjSetEq(qc, bc.map(reb)) &&
          treeEq(ql, bl, reb, keyOf) && treeEq(qr, br, reb, keyOf)
      case _ => false
    }

  /** The snapshot id a relation's scan serves: the reader-option
    * time-travel override, else the resolved table's own snapshot. */
  private def servedSnapshotId(rel: DataSourceV2Relation): Option[Long] = {
    val opt = Option(rel.options).flatMap(o =>
      Option(o.get("snapshot-id")).orElse(Option(o.get("as_of_snapshot_id"))))
      .flatMap(_.toLongOption)
    opt.orElse(rel.table match {
      case h: HasSnapshotIdentity =>
        h.snapshotIdentity.split('@').lastOption.flatMap(_.toLongOption)
      case _ => None
    })
  }

  private def usable(e: Expression): Boolean =
    e.deterministic && !e.exists(_.isInstanceOf[SubqueryExpression])

  /** TOP-K NAVIGATION (r13): `row_number() OVER (PARTITION BY keys ORDER
    * BY sorts) AS rn ... WHERE rn <= q` over a base table serves from a
    * RANKED view's backing — without the query naming the view — when
    * the window (same partition multiset, same order SEQUENCE), the
    * below-window conjunct set, and the base relation all match and
    * q <= the view's k: the backing holds the top-k rows per group, so
    * the query's top-q is its rank-filtered prefix. Ranks come from the
    * stored rank column when the view exposes one, else from a window
    * re-run over the (MV-sized) backing. Filters BELOW a window do not
    * commute with ranking — a tighter filter changes every rank — so the
    * conjunct sets must be semantically EQUAL, never subsumed. At 100 TB
    * this turns a full sort-heavy window over the fact table into a read
    * of groups x k stored rows. */
  private def rewriteTopK(f: Filter): Option[LogicalPlan] = {
    if (!f.resolved) return None
    import org.apache.spark.sql.catalyst.expressions.{LessThan, LessThanOrEqual, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
    import org.apache.spark.sql.catalyst.plans.logical.Window
    // cheap shape probe before any catalog work: rank-attr <= literal
    def bound(e: Expression): Option[(AttributeReference, Long)] = e match {
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        longLit(v).map(a -> _)
      case LessThan(a: AttributeReference, Literal(v, _)) =>
        longLit(v).map(k => a -> (k - 1))
      case _ => None
    }
    val (rankAttr, qk) = bound(f.condition).getOrElse(return None)
    if (qk <= 0) return None
    def stripA(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => stripA(c)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => stripA(c)
      case other => other
    }
    def winOf(p: LogicalPlan): Option[(Window, Seq[Expression], Seq[SortOrder], Long)] =
      stripA(p) match {
        case wn: Window => wn.windowExpressions match {
          case Seq(al @ Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(ps, os, _)), _)) =>
            Some((wn, ps, os, al.exprId.id))
          case _ => None
        }
        case _ => None
      }
    val (w, parts, order, rnId) = winOf(f.child).getOrElse(return None)
    if (rnId != rankAttr.exprId.id) return None
    if (!parts.forall(_.isInstanceOf[AttributeReference])) return None
    if (!order.forall(_.child.isInstanceOf[AttributeReference])) return None
    val (userConj, rels) = scanForest(w.child).getOrElse(return None)
    if (rels.length != 1 || !userConj.forall(usable)) return None
    val (plugin, candidates) = freshCandidates(rels).getOrElse(return None)
    val hits = candidates.flatMap { case (vdb, v, mvT, sql, _) =>
      tryMatchTopK(f, rankAttr, qk, parts, order, userConj, rels.head,
        plugin, vdb, v, mvT, sql, bound, winOf)
    }
    hits.sortBy(_._1).headOption.map(_._2) // smallest stored k wins
  }

  private def longLit(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  private def tryMatchTopK(f: Filter, rankAttr: AttributeReference, qk: Long,
      parts: Seq[Expression],
      order: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
      userConj: Seq[Expression], rel: DataSourceV2Relation,
      plugin: SnapCatalogPlugin, db: String, view: String, mvT: String,
      sql: String,
      bound: Expression => Option[(AttributeReference, Long)],
      winOf: LogicalPlan => Option[(org.apache.spark.sql.catalyst.plans.logical.Window,
        Seq[Expression], Seq[org.apache.spark.sql.catalyst.expressions.SortOrder], Long)])
      : Option[(Long, LogicalPlan)] = Try {
    val cat = plugin.snapViews
    val backingSchema = cat.currentSnapshot(db, mvT).schema
    if (backingSchema.fieldNames.exists(_.startsWith("__mv_"))) return None
    // analyze the body exactly like analyzeBody does (qualified, no scan
    // substitution), then demand the same Filter-over-Window shape
    val parsedBody = spark.sessionState.sqlParser.parsePlan(sql)
      .transformUpWithSubqueries {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          val k = u.multipartIdentifier match {
            case Seq(d, n) => Some((d, n))
            case Seq(_, d, n) => Some((d, n))
            case Seq(n) => Some((db, n))
            case _ => None
          }
          k.filter { case (d, n) => Try(cat.tableExists(d, n)).getOrElse(false) }
            .map { case (d, n) =>
              u.copy(multipartIdentifier = Seq(plugin.name(), d, n)) }
            .getOrElse(u)
      }
    val analyzedBody = MvRewriteRule.suppressingSubstitution {
      GraftColumnBridge.ofRows(spark, parsedBody).queryExecution.analyzed
    }
    val bodyOut = analyzedBody.output
    if (!backingSchema.fieldNames.sameElements(bodyOut.map(_.name))) return None
    def stripS(p: LogicalPlan): LogicalPlan = p match {
      case s: Sort => stripS(s.child)
      case SubqueryAlias(_, c) => stripS(c)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => stripS(c)
      case other => other
    }
    val bodyF = stripS(analyzedBody) match {
      case bf: Filter => bf
      case _ => return None
    }
    val (bRank, bkRaw) = bound(bodyF.condition).getOrElse(return None)
    val (bw, bParts, bOrder, bRnId) = winOf(bodyF.child).getOrElse(return None)
    if (bRnId != bRank.exprId.id) return None
    if (qk > bkRaw) return None
    val (bodyConj, bodyRels) = scanForest(bw.child).getOrElse(return None)
    if (bodyRels.length != 1 || !bodyConj.forall(usable)) return None
    // same base table, rebased body attrs
    def keyOf(r: DataSourceV2Relation): Option[(String, String)] =
      r.identifier.filter(_.namespace().length == 1)
        .map(i => (i.namespace()(0), i.name()))
        .filter(_ => r.catalog.exists {
          case p: SnapCatalogPlugin => p.name() == plugin.name()
          case _ => false
        })
    if (keyOf(bodyRels.head).isEmpty ||
      keyOf(bodyRels.head) != keyOf(rel)) return None
    val byName = rel.output
      .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
    val rebase = bodyRels.head.output.flatMap { a =>
      byName.get(a.name.toLowerCase(java.util.Locale.ROOT)).map(a.exprId -> _)
    }.toMap
    if (rebase.size != bodyRels.head.output.length) return None // schema drift
    def reb(e: Expression): Expression = e.transform {
      case a: AttributeReference if rebase.contains(a.exprId) => rebase(a.exprId)
    }
    // EXACT conjunct-set equality (no subsumption below a window) and
    // identical ranking: partition multiset, order sequence
    if (!conjSetEq(userConj, bodyConj.map(reb))) return None
    if (!conjSetEq(parts, bParts.map(reb))) return None
    if (order.length != bOrder.length) return None
    if (!order.zip(bOrder).forall { case (qo, bo) =>
      qo.direction == bo.direction && qo.nullOrdering == bo.nullOrdering &&
        qo.child.semanticEquals(reb(bo.child))
    }) return None
    // output mapping: query attr expr-id -> backing column name
    val rankCol: Option[String] =
      bodyOut.find(_.exprId.id == bRnId).map(_.name)
    val baseColOf: Map[Long, String] = bodyOut.flatMap { o =>
      if (o.exprId.id == bRnId) None
      else reb(o) match {
        case u: AttributeReference => Some(u.exprId.id -> o.name)
        case _ => return None
      }
    }.toMap
    val fn = org.apache.spark.sql.functions
    import fn.{col, row_number}
    val partCols = parts.map { case a: AttributeReference =>
      baseColOf.getOrElse(a.exprId.id, return None) }
    val sortCs = order.map { so =>
      val n = so.child match {
        case a: AttributeReference => baseColOf.getOrElse(a.exprId.id, return None)
        case _ => return None
      }
      import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst}
      (so.direction == Ascending, so.nullOrdering == NullsFirst) match {
        case (true, true) => col(s"`$n`").asc_nulls_first
        case (true, false) => col(s"`$n`").asc_nulls_last
        case (false, true) => col(s"`$n`").desc_nulls_first
        case (false, false) => col(s"`$n`").desc_nulls_last
      }
    }
    val backing = spark.table(s"`${plugin.name()}`.`$db`.`$mvT`")
    // rank source: the stored column (the body's own row_number over the
    // base — exactly the query's), else a re-run over the tiny backing
    val rankSrc = "__tknav_rank"
    val ranked = rankCol match {
      case Some(rc) => backing.withColumn(rankSrc, col(s"`$rc`"))
      case None =>
        val spec0 = org.apache.spark.sql.expressions.Window
          .partitionBy(partCols.map(n => col(s"`$n`")): _*)
        backing.withColumn(rankSrc, row_number().over(spec0.orderBy(sortCs: _*)))
    }
    val served = ranked.where(col(rankSrc) <= qk)
    // every attribute the Filter emits must come off the backing
    val outCols = f.output.map { o =>
      if (o.exprId.id == rankAttr.exprId.id) col(rankSrc).alias(s"__o_${o.exprId.id}")
      else col(s"`${baseColOf.getOrElse(o.exprId.id, return None)}`")
        .alias(s"__o_${o.exprId.id}")
    }
    val newPlan = served.select(outCols: _*).queryExecution.analyzed
    if (newPlan.output.length != f.output.length) return None
    if (newPlan.output.zip(f.output).exists { case (n, o) => n.dataType != o.dataType })
      return None
    logInfo(s"MV rewrite: top-$qk window over ${rel.identifier.mkString} " +
      s"served from $db.$view ($mvT, stored k=$bkRaw)")
    Some((bkRaw, Project(f.output.zip(newPlan.output).map { case (o, n0) =>
      val n = if (!o.nullable && n0.nullable) KnownNotNull(n0) else (n0: Expression)
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, newPlan)))
  }.recover { case e =>
    logInfo(s"MV rewrite: top-k candidate $db.$view did not match: ${e.getMessage}")
    None
  }.toOption.flatten

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    if (!agg.resolved) return None
    // inner forests take the flexible conjunct-normalizing lane; a tree
    // containing an outer/semi/anti join takes the strict shape lane
    val shape: QueryShape = scanForest(agg.child)
      .map { case (c, r) => InnerShape(c, r) }
      .orElse(outerSplit(agg.child).collect {
        case (top, tree) if hasOuter(tree) =>
          OuterShape(top, tree, leavesOf(tree))
      })
      .getOrElse(return None)
    val rels = shape.rels
    val userConj = shape.allConjuncts
    if (!(userConj.forall(usable) && agg.groupingExpressions.forall(usable) &&
        agg.aggregateExpressions.forall(usable))) return None
    // metadata-served global aggregates (unfiltered count/min/max over the
    // bare relation) are ALREADY O(1) via MetadataCountRule — stand aside
    if (rels.length == 1 && agg.groupingExpressions.isEmpty && userConj.isEmpty &&
        agg.aggregateExpressions.forall(ne => strip(ne) match {
          case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case Count(Seq(Literal(_, _))) => true
              case Min(_: Attribute) | Max(_: Attribute) => true
              case _ => false
            }
          case _ => false
        })) return None
    val (plugin, candidates) = freshCandidates(rels).getOrElse(return None)
    val matches = candidates.flatMap { case (vdb, v, mvT, sql, dv) =>
      tryMatch(agg, shape, rels, plugin, vdb, v, mvT, sql, dv)
    }
    // smallest backing wins: fewer group keys = more pre-aggregation
    matches.sortBy(_._1).headOption.map(_._2)
  }

  /** GROUPING-SETS NAVIGATION (ROLLUP / CUBE / GROUPING SETS answered
    * from an MV backing): the analyzer lowers grouping analytics to
    * `Aggregate(keys ++ gid, outs, Expand(projections, childOut ++
    * maskedKeys ++ gid, Project(childOut ++ keyAliases, scanTree)))`.
    * Grouping-set semantics is "aggregate per set over the input rows",
    * and every merged-form aggregate composes over pre-aggregated rows —
    * so when each grouping key is an MV key output and every aggregate
    * derives in MERGED form, the whole analytic re-issues as the SAME
    * grouping sets over the (churn-thin) backing: `grouping()` /
    * `grouping_id()` arithmetic carries over verbatim because the
    * rebuilt query lists the keys in the original bit order. At 100 TB a
    * CUBE over the fact table becomes a CUBE over a few thousand
    * pre-aggregated rows. */
  private def rewriteGroupingSets(agg: Aggregate): Option[LogicalPlan] = {
    if (!agg.resolved) return None
    val expand = agg.child match { case e: Expand => e; case _ => return None }
    val expOut = expand.output
    if (expOut.isEmpty || expOut.last.name != "spark_grouping_id") return None
    val gidAttr = expOut.last
    // the alias Project the analyzer inserts under Expand: grouping keys
    // aliased over the scan tree (expression keys refuse — not matchable
    // to MV key OUTPUTS)
    val (aliasBase, scanTree) = expand.child match {
      case Project(pl, c) =>
        val am = pl.collect {
          case al @ Alias(a: AttributeReference, _) => al.exprId -> a
        }.toMap
        if (!pl.forall {
          case _: AttributeReference => true
          case al: Alias => al.child.isInstanceOf[AttributeReference]
          case _ => false
        }) return None
        (am, c)
      case c => (Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId,
        AttributeReference], c)
    }
    // Expand output = [pass-through scan columns..., fresh masked-key
    // attrs..., gid]: the masked-key attrs are exactly the non-gid output
    // attributes the child does NOT produce
    val childOutIds = expand.child.output.map(_.exprId).toSet
    val gsAttrs = expOut.init.filterNot(a => childOutIds.contains(a.exprId))
    val nKeys = gsAttrs.length
    if (nKeys <= 0) return None
    val childLen = expOut.length - 1 - nKeys
    if (!expOut.take(childLen).forall(a => childOutIds.contains(a.exprId)))
      return None
    if (!agg.groupingExpressions.forall(_.isInstanceOf[Attribute]) ||
        agg.groupingExpressions.map { case a: Attribute => a.exprId }.toSet !=
          (gsAttrs :+ gidAttr).map(_.exprId).toSet) return None
    // per grouping-set projection: which keys are live, and the base
    // (scan-tree) attribute behind each key slot
    val baseOfKey = new Array[AttributeReference](nKeys)
    val sets: Seq[Seq[Int]] = expand.projections.map { p =>
      if (p.length != expOut.length) return None
      p.last match { case Literal(_, LongType) => (); case _ => return None }
      (0 until nKeys).flatMap { j =>
        p(childLen + j) match {
          case Literal(null, _) => None
          case a: AttributeReference =>
            val base = aliasBase.getOrElse(a.exprId,
              a match { case b: AttributeReference => b })
            if (baseOfKey(j) == null) baseOfKey(j) = base
            else if (baseOfKey(j).exprId != base.exprId) return None
            Some(j)
          case _ => return None
        }
      }
    }
    if (baseOfKey.exists(_ == null)) return None // a never-live key
    // same two-lane dispatch as the plain path: inner forests match by
    // conjunct containment, outer trees by strict shape equality — the
    // grouping-sets service below is lane-agnostic (merged form always)
    val shape: QueryShape = scanForest(scanTree)
      .map { case (c, r) => InnerShape(c, r) }
      .orElse(outerSplit(scanTree).collect {
        case (top, tree) if hasOuter(tree) =>
          OuterShape(top, tree, leavesOf(tree))
      })
      .getOrElse(return None)
    val rels = shape.rels
    if (!(shape.allConjuncts.forall(usable) && agg.aggregateExpressions.forall(usable)))
      return None
    val (plugin, candidates) = freshCandidates(rels).getOrElse(return None)
    val matches = candidates.flatMap { case (vdb, v, mvT, sql, dv) =>
      tryMatchGroupingSets(agg, baseOfKey.toIndexedSeq, gsAttrs, gidAttr, sets,
        shape, rels, plugin, vdb, v, mvT, sql, dv)
    }
    matches.sortBy(_._1).headOption.map(_._2)
  }

  /** One candidate for the grouping-sets path: the shared body analysis,
    * then the replacement built with `Dataset.groupingSets` over the
    * backing — always MERGED form (coarser sets exist by construction,
    * so per-row "exact" service is never sound). DISTINCT aggregates
    * participate through two lanes (r13): a distinct over a view KEY
    * column re-issues as the same distinct over the backing (every
    * surviving key combination appears there), and a distinct over the
    * view's sidecar ARGUMENT re-issues as the same grouping sets over
    * the per-(group, value) copy-count sidecar — values shared across
    * collapsed subgroups dedupe via the DISTINCT over the value column —
    * joined back to the backing's sets null-safely on (keys, gid) so
    * all-NULL groups (no sidecar rows) still exist with count 0. */
  private def tryMatchGroupingSets(agg: Aggregate,
      baseOfKey: Seq[AttributeReference], gsAttrs: Seq[Attribute],
      gidAttr: Attribute, sets: Seq[Seq[Int]], shape: QueryShape,
      rels: Seq[DataSourceV2Relation], plugin: SnapCatalogPlugin, db: String,
      view: String, mvT: String, sql: String,
      dvTables: Map[Int, String]): Option[(Int, LogicalPlan)] = Try {
    val ctx = analyzeBody(shape, rels, plugin, db, mvT, sql)
      .getOrElse(return None)
    val BodyCtx(backingCols, nBodyGroups, keyCols, aggOuts, residualCols) = ctx
    // every grouping key must be an MV group-key OUTPUT
    val keyNames: Seq[String] =
      baseOfKey.map(a => keyCols.getOrElse(a.exprId.id, return None))
    def need(c: String): String = {
      require(backingCols.contains(c), s"backing $mvT lacks $c"); c
    }
    def fnCol(name: String, args: Expression*): Expression =
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        Seq(name), args.toSeq, isDistinct = false)
    def dfnCol(name: String, args: Expression*): Expression =
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        Seq(name), args.toSeq, isDistinct = true)
    def bcol(c: String): Expression = UnresolvedAttribute.quoted(need(c))
    def arg1(x: AggregateExpression): Option[Expression] =
      x.aggregateFunction.children match { case Seq(c) => Some(c); case _ => None }
    // merged-form aggregate mapping — the non-exact projection of
    // tryMatch's matrix (count → Σ stored counts, sum → Σ sums, min/max
    // fold, avg = Σ__mv_s / Σ__mv_c, count(x)/sum(x) from partials).
    // Computed over the BACKING ("main lane").
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.mode != Complete || ae.filter.isDefined) return None
      val keyArg: Option[String] = ae.aggregateFunction.children match {
        case Seq(a: AttributeReference) => keyCols.get(a.exprId.id)
        case _ => None
      }
      keyArg.foreach { kn =>
        ae.aggregateFunction match {
          case _: Min => return Some(fnCol("min", bcol(kn)))
          case _: Max => return Some(fnCol("max", bcol(kn)))
          // distinct over a KEY column: every surviving key combination
          // appears in the backing, so the same distinct over the
          // backing's rows is exact per grouping set
          case _: Count if ae.isDistinct => return Some(dfnCol("count", bcol(kn)))
          case _: Sum if ae.isDistinct => return Some(dfnCol("sum", bcol(kn)))
          case _: Average if ae.isDistinct => return Some(dfnCol("avg", bcol(kn)))
          case _ => ()
        }
      }
      if (ae.isDistinct) return None // non-key distinct: the sidecar lane
      val direct = aggOuts.find(_._2.semanticEquals(ae)).map(_._3)
      val a = ae.aggregateFunction
      (a, direct) match {
        case (_: Count, Some(n)) =>
          Some(Coalesce(Seq(fnCol("sum", bcol(n)), Literal(0L))))
        case (_: Sum, Some(n)) => Some(fnCol("sum", bcol(n)))
        case (_: Min, Some(n)) => Some(fnCol("min", bcol(n)))
        case (_: Max, Some(n)) => Some(fnCol("max", bcol(n)))
        case (Average(e, _), _) if !ae.dataType.isInstanceOf[DecimalType] =>
          aggOuts.collectFirst {
            case (i, o, n) if !o.isDistinct && arg1(o).exists(_.semanticEquals(e)) &&
                (o.aggregateFunction.isInstanceOf[Average] ||
                  o.aggregateFunction.isInstanceOf[Sum]) =>
              val s: Expression = if (o.aggregateFunction.isInstanceOf[Average])
                bcol(SnapshotCatalog.mvPartialSum(i)) else bcol(n)
              val c: Expression = bcol(SnapshotCatalog.mvPartialCnt(i))
              fnCol("/", fnCol("sum", s), fnCol("sum", c))
          }
        case (Count(Seq(Literal(_, _))), None) =>
          Some(Coalesce(Seq(
            fnCol("sum", bcol(SnapshotCatalog.MvPartialRows)), Literal(0L))))
        case (Count(Seq(e)), None) =>
          aggOuts.collectFirst {
            case (i, o, _) if !o.isDistinct &&
                (o.aggregateFunction.isInstanceOf[Sum] ||
                  o.aggregateFunction.isInstanceOf[Average]) &&
                arg1(o).exists(_.semanticEquals(e)) =>
              Coalesce(Seq(
                fnCol("sum", bcol(SnapshotCatalog.mvPartialCnt(i))), Literal(0L)))
          }
        case (Sum(e, _), None) =>
          aggOuts.collectFirst {
            case (i, o, _) if !o.isDistinct &&
                o.aggregateFunction.isInstanceOf[Average] &&
                arg1(o).exists(_.semanticEquals(e)) =>
              fnCol("sum", bcol(SnapshotCatalog.mvPartialSum(i)))
          }
        case _ => None
      }
    }
    // SIDECAR lane ("side"): one sidecar whose recorded argument covers
    // the user's non-key distinct aggregates (same single-sidecar
    // discipline as the plain rollup path)
    lazy val dvInfo: Option[(Expression, String)] =
      dvTables.toSeq.sortBy(_._1).collectFirst {
        case (i, t) if aggOuts.exists(_._1 == i) =>
          aggOuts.find(_._1 == i).flatMap(o => arg1(o._2)).map(e => (e, t))
      }.flatten
    def sideFor(ae: AggregateExpression): Option[Expression] = {
      if (!ae.isDistinct || ae.filter.isDefined || ae.mode != Complete) return None
      val dvArg = dvInfo.map(_._1).getOrElse(return None)
      if (ae.aggregateFunction.children.length != 1 ||
          !ae.aggregateFunction.children.head.semanticEquals(dvArg)) return None
      val v = UnresolvedAttribute.quoted(SnapshotCatalog.MvDvValue)
      ae.aggregateFunction match {
        case _: Count   => Some(dfnCol("count", v))
        case _: Sum     => Some(dfnCol("sum", v))
        case _: Average => Some(dfnCol("avg", v))
        case _ => None
      }
    }
    val mainAggs = scala.collection.mutable.ArrayBuffer.empty[(String, Expression)]
    val sideAggs = scala.collection.mutable.ArrayBuffer.empty[(String, Expression)]
    val gsIndex: Map[Long, Int] =
      gsAttrs.zipWithIndex.map { case (a, j) => a.exprId.id -> j }.toMap
    // outputs: masked keys by name, gid arithmetic over the main lane's
    // re-derived grouping_id() (same key order → same bit layout),
    // aggregates as lane-slot references, arithmetic around any verbatim
    def mapOut(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        mapAgg(ae).map { ex =>
          val slot = s"__m_${mainAggs.length}"
          mainAggs += slot -> ex
          UnresolvedAttribute.quoted(slot): Expression
        }.orElse(sideFor(ae).map { ex =>
          val slot = s"__d_${sideAggs.length}"
          sideAggs += slot -> ex
          val ref: Expression = UnresolvedAttribute.quoted(slot)
          // a group whose values are all NULL has no sidecar rows: the
          // left join yields NULL, which is count 0 / sum NULL — exactly
          // the base semantics
          if (ae.aggregateFunction.isInstanceOf[Count])
            Coalesce(Seq(ref, Literal(0L))) else ref
        })
      case a: AttributeReference if gsIndex.contains(a.exprId.id) =>
        Some(bcol(keyNames(gsIndex(a.exprId.id))))
      case a: AttributeReference if a.exprId == gidAttr.exprId =>
        Some(UnresolvedAttribute.quoted("__gid"))
      case l: Literal => Some(l)
      case _ if e.references.isEmpty && e.deterministic && e.children.isEmpty => Some(e)
      case _ if e.children.nonEmpty =>
        val kids = e.children.map(c => mapOut(c).getOrElse(return None))
        Some(e.withNewChildren(kids))
      case _ => None
    }
    val mappedOuts = agg.aggregateExpressions.map(ne =>
      mapOut(strip(ne)).getOrElse(return None))
    val fn = org.apache.spark.sql.functions
    def withResiduals(df0: org.apache.spark.sql.DataFrame) =
      residualCols.foldLeft(df0)((d, r) => d.where(GraftColumnBridge.column(r)))
    val keyColumns = keyNames.map(n => fn.col(s"`$n`"))
    val setCols: Seq[Seq[Column]] = sets.map(_.map(keyColumns))
    val mainDf = withResiduals(spark.table(s"`${plugin.name()}`.`$db`.`$mvT`"))
    val mainAggCols = fn.grouping_id().alias("__gid") +:
      mainAggs.toSeq.map { case (n, ex) => GraftColumnBridge.column(ex).alias(n) }
    val main = mainDf.groupingSets(setCols, keyColumns: _*)
      .agg(mainAggCols.head, mainAggCols.tail: _*)
    val joined =
      if (sideAggs.isEmpty) main
      else {
        // the SAME grouping sets over the sidecar, joined back null-safely
        // on (keys, gid): gid separates a MASK null from a genuine null
        // key value, and <=> matches the genuine ones
        val dvTable = dvInfo.get._2
        val sideDf = withResiduals(
          spark.table(s"`${plugin.name()}`.`$db`.`$dvTable`"))
        val sideAggCols = fn.grouping_id().alias("__sgid") +:
          sideAggs.toSeq.map { case (n, ex) => GraftColumnBridge.column(ex).alias(n) }
        val side0 = sideDf.groupingSets(setCols, keyColumns: _*)
          .agg(sideAggCols.head, sideAggCols.tail: _*)
        val side = side0.select(
          (keyNames.zipWithIndex.map { case (n, j) =>
            fn.col(s"`$n`").alias(s"__sk_$j") } :+ fn.col("__sgid")) ++
            sideAggs.map(x => fn.col(x._1)): _*)
        val cond = keyNames.zipWithIndex
          .map { case (n, j) => main.col(s"`$n`") <=> side.col(s"__sk_$j") }
          .foldLeft(main.col("__gid") === side.col("__sgid"))(_ && _)
        main.join(side, cond, "left")
      }
    val outCols = mappedOuts.zip(agg.aggregateExpressions).zipWithIndex.map {
      case ((m, ne), j) =>
        GraftColumnBridge.column(m).cast(ne.dataType).alias(s"__o_$j") }
    val result = joined.select(outCols: _*)
    val newPlan = result.queryExecution.analyzed
    if (newPlan.output.length != agg.output.length) return None
    if (newPlan.output.zip(agg.output).exists { case (n, o) => n.dataType != o.dataType })
      return None
    logInfo(s"MV rewrite: ${sets.length}-set grouping analytic over " +
      s"${rels.flatMap(_.identifier).mkString("⋈")} served from $db.$view ($mvT)")
    Some((nBodyGroups, Project(agg.output.zip(newPlan.output).map { case (o, n0) =>
      val n = if (!o.nullable && n0.nullable) KnownNotNull(n0) else (n0: Expression)
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, newPlan)))
  }.recover { case e =>
    logInfo(s"MV rewrite: grouping-sets candidate $db.$view did not match: ${e.getMessage}")
    None
  }.toOption.flatten

  /** Shared candidate gate for both match paths: an inner-join forest of
    * up to [[MvRewriteRule.MaxJoinLeaves]] distinct snapcat relations,
    * never a backing or a changelog window, every base pinned fresh (or
    * staleness opted in) — returns the plugin and the pin-matched MV
    * candidates. */
  private def freshCandidates(rels: Seq[DataSourceV2Relation])
      : Option[(SnapCatalogPlugin,
        Seq[(String, String, String, String, Map[Int, String])])] = {
    // one relation, or one inner-join forest of DISTINCT relations (a
    // star/snowflake; a self-join has no unambiguous rebase). Real
    // warehouse rollups are 3+-way star joins — the conjunct-subset
    // machinery normalizes any inner forest, so the matcher admits them
    // all; the leaf cap only bounds candidate-analysis work.
    if (rels.isEmpty || rels.length > MvRewriteRule.MaxJoinLeaves) return None
    val plugin = rels.head.catalog match {
      case Some(p: SnapCatalogPlugin) => p
      case _ => return None
    }
    if (!rels.forall(_.catalog.exists {
      case p: SnapCatalogPlugin => p.name() == plugin.name()
      case _ => false
    })) return None
    val keys: Seq[(String, String)] = rels.map { r =>
      val ident = r.identifier.getOrElse(return None)
      if (ident.namespace().length != 1) return None
      (ident.namespace()(0), ident.name())
    }
    if (keys.distinct.length != keys.length) return None
    // backing/sidecar tables never rewrite (the loop-free anchor), and
    // changelog-windowed reads are not table-state scans
    if (keys.exists(_._2.startsWith("__mv_"))) return None
    if (rels.exists(r => Option(r.options).exists(o =>
        o.containsKey("from-snapshot-id") || o.containsKey("to-snapshot-id"))))
      return None
    val cat = plugin.snapViews
    // cheapest gate first: a namespace with no views at all (the common
    // case) costs one directory listing, never a snapshot-log read
    val viewsByDb = keys.map(_._1).distinct
      .map(d => d -> Try(cat.listViews(d)).getOrElse(Seq.empty)).toMap
    if (viewsByDb.values.forall(_.isEmpty)) return None
    // freshness anchor: rewrites serve CURRENT-state scans only (a pin
    // equal to a historical snapshot is not enough — see the scaladoc).
    // Under opted-in bounded staleness ([[allowStale]]) a current-state
    // scan may match a LAGGING pin — the session chose view-refresh
    // latency over live data; time-travel scans stay exact either way.
    val stale = allowStale
    val servedByKey: Map[(String, String), Option[Long]] =
      keys.zip(rels).map { case (k, r) =>
        val served = servedSnapshotId(r).getOrElse(return None)
        val current = Try(cat.currentSnapshotId(k._1, k._2)).getOrElse(-1L)
        if (current != served) return None // never rewrite historical scans
        k -> (if (stale) None else Some(served))
      }.toMap
    val pinSet = servedByKey.map { case ((d, t), id) => s"$d.$t" -> id.map(_.toString) }

    val candidates = keys.map(_._1).distinct.flatMap { vdb =>
      viewsByDb(vdb).flatMap { v =>
        cat.loadView(vdb, v).flatMap { vm =>
          val pins = vm.properties.collect {
            case (k, value) if k.startsWith("mv.base.") =>
              k.stripPrefix("mv.base.") -> value
          }
          val dv = vm.properties.collect {
            case (k, t) if k.startsWith("mv.dv.") => k.stripPrefix("mv.dv.").toInt -> t
          }
          // every base must be pinned; each pin must equal what the scan
          // serves, unless this base's requirement was relaxed to
          // "any pin" by the bounded-staleness opt-in (None)
          val pinsOk = pins.keySet == pinSet.keySet && pinSet.forall {
            case (k, req) => req.forall(pins(k) == _)
          }
          for {
            mvT <- vm.properties.get("materialized")
            if pinsOk
          } yield (vdb, v, mvT, vm.currentVersion.sql, dv)
        }
      }
    }
    if (candidates.isEmpty) return None
    Some((plugin, candidates))
  }

  private def strip(e: Expression): Expression = e match {
    case Alias(c, _) => c
    case c => c
  }

  private def arg1Of(ae: AggregateExpression): Option[Expression] =
    ae.aggregateFunction.children match { case Seq(c) => Some(c); case _ => None }

  /** Everything about one candidate view that is independent of the USER
    * aggregate's own output shape: the analyzed body rebased onto the
    * query's leaves, filter subsumption, the group-key / aggregate-output
    * maps, and the residual conjuncts transformed to backing column
    * names. Shared by the plain-aggregate ([[tryMatch]]) and
    * grouping-sets ([[tryMatchGroupingSets]]) paths. */
  private final case class BodyCtx(
      backingCols: Set[String],
      nBodyGroups: Int,
      keyCols: Map[Long, String],
      aggOuts: Seq[(Int, AggregateExpression, String)],
      residualCols: Seq[Expression])

  private def analyzeBody(shape: QueryShape,
      rels: Seq[DataSourceV2Relation], plugin: SnapCatalogPlugin, db: String,
      mvT: String, sql: String): Option[BodyCtx] = {
    val cat = plugin.snapViews
    val backingSchema = cat.currentSnapshot(db, mvT).schema
    val backingCols = backingSchema.fieldNames.toSet

    // ---- analyze the view body (matching-only: scan substitution off) --
    // Body relations resolve the way the catalog's own refresh machinery
    // resolves them (`relKeyOf`): `d.t` and `cat.d.t` mean (d, t) of THIS
    // catalog, a bare `t` means (viewDb, t) — fully qualified here so the
    // analysis is independent of the session's current catalog.
    val parsedBody = spark.sessionState.sqlParser.parsePlan(sql)
      .transformUpWithSubqueries {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          val k = u.multipartIdentifier match {
            case Seq(d, n) => Some((d, n))
            case Seq(_, d, n) => Some((d, n))
            case Seq(n) => Some((db, n))
            case _ => None
          }
          k.filter { case (d, n) => Try(cat.tableExists(d, n)).getOrElse(false) }
            .map { case (d, n) =>
              u.copy(multipartIdentifier = Seq(plugin.name(), d, n)) }
            .getOrElse(u)
      }
    val analyzedBody = MvRewriteRule.suppressingSubstitution {
      GraftColumnBridge.ofRows(spark, parsedBody).queryExecution.analyzed
    }
    val bodyOut = analyzedBody.output
    // visible backing columns are positionally the body's output list
    val visible = backingSchema.fieldNames.filterNot(_.startsWith("__mv_"))
    if (!visible.sameElements(bodyOut.map(_.name))) return None
    def stripTop(p: LogicalPlan): LogicalPlan = p match {
      case pr @ Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        val _ = pr; stripTop(c)
      case s: Sort => stripTop(s.child)
      case SubqueryAlias(_, c) => stripTop(c)
      case other => other
    }
    val bodyAgg = stripTop(analyzedBody) match {
      case a: Aggregate => a
      case _ => return None
    }
    def keyOf(r: DataSourceV2Relation): Option[(String, String)] =
      r.identifier.filter(_.namespace().length == 1)
        .map(i => (i.namespace()(0), i.name()))
        .filter(_ => r.catalog.exists {
          case p: SnapCatalogPlugin => p.name() == plugin.name()
          case _ => false
        })
    /** body-leaf → query-leaf attribute rebase, leaves paired by `pairs`;
      * None on schema drift (a body column absent on the query side). */
    def mkRebase(pairs: Seq[(DataSourceV2Relation, DataSourceV2Relation)])
        : Option[Expression => Expression] = {
      val rebase: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Attribute] =
        pairs.flatMap { case (br, ur) =>
          val byName = ur.output
            .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
          val m = br.output.flatMap { a =>
            byName.get(a.name.toLowerCase(java.util.Locale.ROOT)).map(a.exprId -> _)
          }
          if (m.length != br.output.length) return None // schema drift
          m
        }.toMap
      Some((e: Expression) => e.transform {
        case a: AttributeReference if rebase.contains(a.exprId) => rebase(a.exprId)
      })
    }
    val userOutputSet = org.apache.spark.sql.catalyst.expressions.AttributeSet(
      rels.flatMap(_.output))
    /** Subsume `bodyConj` into `userConj`: every body conjunct must appear
      * in the query's set; what remains is the residual. */
    def subsume(userConj: Seq[Expression], bodyConj: Seq[Expression])
        : Option[Seq[Expression]] = {
      val remaining = userConj.toBuffer
      bodyConj.foreach { bc =>
        val i = remaining.indexWhere(_.semanticEquals(bc))
        if (i < 0) return None // body is MORE restrictive than the query
        remaining.remove(i)
      }
      Some(remaining.toSeq)
    }

    val (residual, reb): (Seq[Expression], Expression => Expression) = shape match {
      case InnerShape(userConj, _) =>
        // ---- flexible lane: conjunct-set containment over the forest ----
        val (bodyConjRaw, bodyRels) = scanForest(bodyAgg.child).getOrElse(return None)
        if (!bodyConjRaw.forall(usable)) return None
        // pair body leaves to query leaves by table identity
        val userByKey = rels.map(r => keyOf(r).getOrElse(return None) -> r).toMap
        val bodyKeys = bodyRels.map(r => keyOf(r).getOrElse(return None))
        if (bodyKeys.toSet != userByKey.keySet ||
            bodyKeys.distinct.length != bodyKeys.length) return None
        val rebF = mkRebase(bodyRels.map(br => br -> userByKey(keyOf(br).get)))
          .getOrElse(return None)
        val bodyConj = bodyConjRaw.map(rebF)
        if (bodyConj.exists(c => !c.references.subsetOf(userOutputSet))) return None
        (subsume(userConj, bodyConj).getOrElse(return None), rebF)
      case OuterShape(topConj, tree, _) =>
        // ---- strict lane: identical join trees, top-filter subsumption --
        val (bodyTop, bodyTree) = outerSplit(bodyAgg.child).getOrElse(return None)
        if (!(bodyTop.forall(usable) && treeConjuncts(bodyTree).forall(usable)))
          return None
        val bodyLeaves = leavesOf(bodyTree)
        val userLeaves = leavesOf(tree)
        if (bodyLeaves.length != userLeaves.length) return None
        // positional pairing — treeEq then verifies each position names
        // the same table on both sides
        val rebF = mkRebase(bodyLeaves.zip(userLeaves)).getOrElse(return None)
        if (!treeEq(tree, bodyTree, rebF, keyOf)) return None
        val bodyTopReb = bodyTop.map(rebF)
        if (bodyTopReb.exists(c => !c.references.subsetOf(userOutputSet))) return None
        (subsume(topConj, bodyTopReb).getOrElse(return None), rebF)
    }

    // ---- the view's group keys and aggregate outputs --------------------
    val bodyGroupIds = bodyAgg.groupingExpressions.map {
      case a: AttributeReference => a.exprId
      case _ => return None // expression keys: not matchable
    }.toSet
    // defining expression per visible output position
    val defs: Seq[(String, Expression)] = bodyOut.map { o =>
      val d = bodyAgg.aggregateExpressions
        .find(_.toAttribute.exprId == o.exprId).getOrElse(return None)
      o.name -> strip(d)
    }
    // key outputs: rebased leaf attr expr-id -> backing column name
    val keyCols: Map[Long, String] = defs.collect {
      case (n, a: AttributeReference) if bodyGroupIds.contains(a.exprId) =>
        reb(a) match {
          case u: AttributeReference => u.exprId.id -> n
          case _ => return None
        }
    }.toMap
    // aggregate outputs: (position, rebased AggregateExpression, name)
    val aggOuts: Seq[(Int, AggregateExpression, String)] = defs.zipWithIndex.collect {
      case ((n, ae: AggregateExpression), i)
          if ae.mode == Complete && ae.filter.isEmpty =>
        (i, reb(ae).asInstanceOf[AggregateExpression], n)
    }

    // residual conjuncts must land on group-key columns of the backing
    val residualCols = residual.map { r =>
      if (!r.references.forall(a => keyCols.contains(a.exprId.id))) return None
      r.transform { case a: AttributeReference => UnresolvedAttribute.quoted(keyCols(a.exprId.id)) }
    }
    Some(BodyCtx(backingCols, bodyGroupIds.size, keyCols, aggOuts, residualCols))
  }

  /** Attempt the match against one candidate MV; returns (group-key
    * count, replacement plan) on success. */
  private def tryMatch(agg: Aggregate, shape: QueryShape,
      rels: Seq[DataSourceV2Relation], plugin: SnapCatalogPlugin, db: String,
      view: String, mvT: String, sql: String,
      dvTables: Map[Int, String]): Option[(Int, LogicalPlan)] = Try {
    val ctx = analyzeBody(shape, rels, plugin, db, mvT, sql).getOrElse(return None)
    val BodyCtx(backingCols, nBodyGroups, keyCols, aggOuts, residualCols) = ctx

    // ---- group containment ----------------------------------------------
    val userGroups = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (!userGroups.forall(a => keyCols.contains(a.exprId.id))) return None
    // exact = the query groups on EVERY view group key (so the backing is
    // one row per query group); a view key absent from its own output can
    // never be "covered", forcing the rollup path
    val exact = nBodyGroups == keyCols.size &&
      userGroups.map(_.exprId.id).toSet == keyCols.keySet

    // ---- derive each query output from the backing -----------------------
    // (throws into the enclosing Try → no-match, never a user error)
    def need(c: String): String = {
      require(backingCols.contains(c), s"backing $mvT lacks $c"); c
    }
    def fnCol(name: String, args: Expression*): Expression =
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        Seq(name), args.toSeq, isDistinct = false)
    def bcol(c: String): Expression = UnresolvedAttribute.quoted(need(c))
    /** The backing expression for one user aggregate call, or None. */
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.mode != Complete || ae.filter.isDefined) return None
      // aggregates over a GROUP-KEY column serve straight off the backing:
      // every surviving key combination appears there, so min/max fold
      // over the key column, and DISTINCT count/sum/avg of a key dedupe
      // over it — no partials, no sidecar (exact: the key is functionally
      // a group column, so the per-row value IS the aggregate)
      def keyArg: Option[String] = ae.aggregateFunction.children match {
        case Seq(a: AttributeReference) => keyCols.get(a.exprId.id)
        case _ => None
      }
      keyArg.foreach { kn =>
        def dfn(name: String) = org.apache.spark.sql.catalyst.analysis
          .UnresolvedFunction(Seq(name), Seq(bcol(kn)), isDistinct = true)
        ae.aggregateFunction match {
          case _: Min => return Some(if (exact) bcol(kn) else fnCol("min", bcol(kn)))
          case _: Max => return Some(if (exact) bcol(kn) else fnCol("max", bcol(kn)))
          // exact = the key is one of the query's own group columns, so
          // the per-group distinct set is {k}: count is 1 (0 for NULL —
          // distinct aggs ignore nulls), sum/avg are k itself
          case _: Count if ae.isDistinct =>
            return Some(if (exact)
              fnCol("if", fnCol("isnull", bcol(kn)), Literal(0L), Literal(1L))
            else dfn("count"))
          case _: Sum if ae.isDistinct =>
            return Some(if (exact) bcol(kn) else dfn("sum"))
          case _: Average if ae.isDistinct =>
            return Some(if (exact) bcol(kn) else dfn("avg"))
          case _ => ()
        }
      }
      // a directly-matching visible output (function, args, distinct flag,
      // eval mode — all via semantic equality)
      val direct = aggOuts.find(_._2.semanticEquals(ae)).map(_._3)
      def arg1(x: AggregateExpression): Option[Expression] =
        x.aggregateFunction.children match { case Seq(c) => Some(c); case _ => None }
      val a = ae.aggregateFunction
      (a, direct) match {
        case (_, Some(n)) if ae.isDistinct =>
          if (exact) Some(bcol(n)) else None // distinct does not compose
        case (_: Count, Some(n)) =>
          Some(if (exact) bcol(n) else Coalesce(Seq(fnCol("sum", bcol(n)), Literal(0L))))
        case (_: Sum, Some(n)) => Some(if (exact) bcol(n) else fnCol("sum", bcol(n)))
        case (_: Min, Some(n)) => Some(if (exact) bcol(n) else fnCol("min", bcol(n)))
        case (_: Max, Some(n)) => Some(if (exact) bcol(n) else fnCol("max", bcol(n)))
        case (_: Average, Some(n)) if exact => Some(bcol(n))
        case _ if ae.isDistinct => None
        case (Average(e, _), _) if !ae.dataType.isInstanceOf[DecimalType] =>
          // avg never folds as avg-of-avgs — rebuild Σsum/Σcount from the
          // partials of a matching avg output, or from a sum output plus
          // its count partial (decimal scale arithmetic differs — skip)
          aggOuts.collectFirst {
            case (i, o, n) if !o.isDistinct && arg1(o).exists(_.semanticEquals(e)) &&
                (o.aggregateFunction.isInstanceOf[Average] ||
                  o.aggregateFunction.isInstanceOf[Sum]) =>
              val s: Expression = if (o.aggregateFunction.isInstanceOf[Average])
                bcol(SnapshotCatalog.mvPartialSum(i)) else bcol(n)
              val c: Expression = bcol(SnapshotCatalog.mvPartialCnt(i))
              if (exact) fnCol("/", s, c)
              else fnCol("/", fnCol("sum", s), fnCol("sum", c))
          }
        case (Count(Seq(Literal(_, _))), None) => // count(*) from __mv_n
          val n = SnapshotCatalog.MvPartialRows
          Some(if (exact) bcol(n) else Coalesce(Seq(fnCol("sum", bcol(n)), Literal(0L))))
        case (Count(Seq(e)), None) => // count(x) from a sum/avg partial
          aggOuts.collectFirst {
            case (i, o, _) if !o.isDistinct &&
                (o.aggregateFunction.isInstanceOf[Sum] ||
                  o.aggregateFunction.isInstanceOf[Average]) &&
                arg1(o).exists(_.semanticEquals(e)) =>
              val n = SnapshotCatalog.mvPartialCnt(i)
              if (exact) bcol(n) else Coalesce(Seq(fnCol("sum", bcol(n)), Literal(0L)))
          }
        case (Sum(e, _), None) => // sum(x) from an avg partial
          aggOuts.collectFirst {
            case (i, o, _) if !o.isDistinct && o.aggregateFunction.isInstanceOf[Average] &&
                arg1(o).exists(_.semanticEquals(e)) =>
              val n = SnapshotCatalog.mvPartialSum(i)
              if (exact) bcol(n) else fnCol("sum", bcol(n))
          }
        case _ => None
      }
    }
    /** A whole output expression: aggregate calls and group columns map to
      * the backing; any arithmetic AROUND them carries over verbatim. */
    def mapOut(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference =>
        keyCols.get(a.exprId.id).map(n => bcol(n))
      case l: Literal => Some(l)
      case _ if e.references.isEmpty && e.deterministic && e.children.isEmpty => Some(e)
      case _ if e.children.nonEmpty =>
        val kids = e.children.map(c => mapOut(c).getOrElse(return None))
        Some(e.withNewChildren(kids))
      case _ => None
    }
    val mappedOuts: Seq[Option[Expression]] =
      agg.aggregateExpressions.map(ne => mapOut(strip(ne)))
    def readTable(t: String) = spark.table(s"`${plugin.name()}`.`$db`.`$t`")
    def withResiduals(df0: org.apache.spark.sql.DataFrame) = {
      var df = df0
      residualCols.foreach(r => df = df.where(GraftColumnBridge.column(r)))
      df
    }
    def gCols = userGroups.map(a =>
      org.apache.spark.sql.functions.col(s"`${keyCols(a.exprId.id)}`"))
    def oCols = agg.aggregateExpressions.indices.map(j =>
      org.apache.spark.sql.functions.col(s"__o_$j"))

    // ---- build the replacement (normal analysis: MoR on the backing) ----
    val result = if (mappedOuts.forall(_.isDefined)) {
      val outCols = mappedOuts.map(_.get).zip(agg.aggregateExpressions)
        .zipWithIndex.map { case ((m, ne), j) =>
          GraftColumnBridge.column(m).cast(ne.dataType).alias(s"__o_$j") }
      val df = withResiduals(readTable(mvT))
      if (exact) df.select(outCols: _*)
      else df.groupBy(gCols: _*).agg(outCols.head, outCols.tail: _*).select(oCols: _*)
    } else {
      // ---- DISTINCT-rollup fallback: serve from the copy-count SIDECAR --
      // count/sum/avg(DISTINCT x) at a COARSER grouping re-aggregates the
      // per-(group, value) sidecar (O(distinct pairs), still MV-sized —
      // values shared across collapsed subgroups dedupe via the DISTINCT
      // over the value column). The sidecar omits all-NULL groups, so
      // group EXISTENCE comes from the backing: keys left-join the
      // sidecar rollup, absent groups read count 0 / sum NULL — exactly
      // the base semantics. Only pure outputs (keys + distinct aggs over
      // the sidecar's argument) qualify; anything else stays unmatched.
      if (dvTables.isEmpty) return None
      val fn = org.apache.spark.sql.functions
      import fn.{coalesce, col, lit}
      // one sidecar whose argument covers EVERY user distinct aggregate
      val (dvPos, dvTable) = dvTables.toSeq.sortBy(_._1).collectFirst {
        case (i, t) if aggOuts.exists(_._1 == i) => (i, t)
      }.getOrElse(return None)
      val dvArg = aggOuts.find(_._1 == dvPos).flatMap(o => arg1Of(o._2))
        .getOrElse(return None)
      sealed trait Out
      case class KeyOut(n: String) extends Out
      case class DvOut(fname: String, isCount: Boolean) extends Out
      val outs: Seq[Out] = agg.aggregateExpressions.map(ne => strip(ne) match {
        case a: AttributeReference => KeyOut(keyCols.getOrElse(a.exprId.id, return None))
        case ae: AggregateExpression if ae.isDistinct && ae.filter.isEmpty &&
            ae.mode == Complete &&
            ae.aggregateFunction.children.headOption.exists(_.semanticEquals(dvArg)) &&
            ae.aggregateFunction.children.length == 1 =>
          ae.aggregateFunction match {
            case _: Count => DvOut("count", isCount = true)
            case _: Sum => DvOut("sum", isCount = false)
            case _: Average => DvOut("avg", isCount = false)
            case _ => return None
          }
        case _ => return None
      })
      val v = s"`${SnapshotCatalog.MvDvValue}`"
      val sideAgg = withResiduals(readTable(dvTable))
        .groupBy(gCols: _*)
        .agg(lit(1).as("__dv_one"), outs.zipWithIndex.collect {
          case (DvOut(f, _), j) =>
            fn.expr(s"$f(DISTINCT $v)").alias(s"__d_$j")
        }: _*)
      val finished =
        if (userGroups.isEmpty) sideAgg // global: one row exists regardless
        else {
          // group existence from the backing (all-NULL groups have no
          // sidecar rows but DO exist in the view / the base aggregate)
          val keyNames = userGroups.map(a => keyCols(a.exprId.id))
          val groups = withResiduals(readTable(mvT))
            .select(keyNames.map(n => col(s"`$n`")): _*).distinct()
          groups.join(sideAgg, keyNames.toIndexedSeq, "left")
        }
      finished.select(outs.zip(agg.aggregateExpressions).zipWithIndex.map {
        case ((KeyOut(n), ne), j) => col(s"`$n`").cast(ne.dataType).alias(s"__o_$j")
        case ((DvOut(_, isCount), ne), j) =>
          val c = if (isCount) coalesce(col(s"__d_$j"), lit(0L)) else col(s"__d_$j")
          c.cast(ne.dataType).alias(s"__o_$j")
      }: _*)
    }
    val newPlan = result.queryExecution.analyzed
    if (newPlan.output.length != agg.output.length) return None
    if (newPlan.output.zip(agg.output).exists { case (n, o) => n.dataType != o.dataType })
      return None
    logInfo(s"MV rewrite: aggregate over ${rels.flatMap(_.identifier)
      .mkString("⋈")} served from $db.$view ($mvT, " +
      s"${if (exact) "exact" else "rollup"})")
    Some((nBodyGroups, Project(agg.output.zip(newPlan.output).map { case (o, n0) =>
      val n = if (!o.nullable && n0.nullable) KnownNotNull(n0) else (n0: Expression)
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, newPlan)))
  }.recover { case e =>
    // a failed match attempt is never a user error — but surface it for
    // tuning (the analyzer exception says WHY the candidate was unusable)
    logInfo(s"MV rewrite: candidate $db.$view did not match: ${e.getMessage}")
    None
  }.toOption.flatten
}

object MvRewriteRule {
  /** Join-forest width ceiling for rewrite matching: star schemas rarely
    * exceed a fact plus a handful of dimensions, and each extra leaf
    * only adds O(leaf) rebase work — the cap guards against degenerate
    * 50-way join plans burning analysis time per candidate view. */
  val MaxJoinLeaves = 8

  private val suppressDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }
  /** True while a matching-only analysis is in flight on this thread. */
  def substitutionSuppressed: Boolean = suppressDepth.get() > 0
  private[spark] def suppressingSubstitution[T](body: => T): T = {
    suppressDepth.set(suppressDepth.get() + 1)
    try body finally suppressDepth.set(suppressDepth.get() - 1)
  }
}
