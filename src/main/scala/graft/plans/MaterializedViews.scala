package graft.plans

import java.util.Locale

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Divide, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, max, min, sum}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, StructType}

/** Automatic materialized-view rewrite — the optimizer-level half of the
  * incremental-view-maintenance story (§2.15): the IVM family maintains
  * `V = agg(base)` as a state artifact; this rule makes a user's PLAIN
  * `base.groupBy(keys).agg(...)` — written with no knowledge of the view —
  * silently answer from `merge(state ∪ partial(Δ))` instead of rescanning
  * history. That is the KSQL TABLE contract surfaced to arbitrary Spark
  * SQL: at 100 TB the full-history rollup goes from a full scan to
  * |state| + a predicate-pushed delta scan, with zero query rewriting by
  * the user (the same substitution Calcite/Trino/BigQuery MV rewrite
  * performs, expressed as a single `Rule[LogicalPlan]`).
  *
  * Matching is SEMANTIC, not syntactic: the user's aggregate is unwrapped
  * down to the V1 file relation (inlining intermediate deterministic
  * Projects, crossing at most one Filter), and its grouping/aggregate
  * expressions are compared against the registered definition by a
  * normalized rendering (attribute names lowercased, no-op casts
  * stripped — the optimizer removes `CAST(x AS <x's own type>)` on the
  * user side while the analyzed definition keeps it). The user's output
  * list may be any subset/reordering/re-aliasing of {group keys} ∪
  * {registered aggregates}; a crossed Filter must constrain GROUP columns
  * only (the pull-query shape) and is then applied to BOTH serving
  * branches BELOW their aggregates, so it reaches the parquet scans as a
  * pushed predicate regardless of where in the optimizer pipeline the
  * rule runs. Anything that doesn't match — distinct/filtered aggregates,
  * unregistered expressions, filters on non-group columns, grouping
  * sets — is left untouched (the query stays correct, just unserved).
  *
  * Supported aggregate kinds: COUNT / SUM / MIN / MAX, the distributive
  * set whose partials merge losslessly (COUNT and SUM merge by SUM,
  * MIN/MAX by themselves), plus AVG by reconstruction — avg(e) is not
  * mergeable as a ratio, so a user's `avg(e)` is served as
  * `sum(e)/count(e)` over the merged partials whenever the view
  * registers BOTH constituents (exact null semantics: count(e) counts
  * non-nulls, and an all-null group's null sum propagates through the
  * division). DECIMAL sums are rejected at registration (Spark widens
  * the precision on every re-aggregation, so the merged type would
  * drift from the direct plan's; the repo-wide BIGINT-cents discipline
  * is the lossless spelling).
  *
  * The registry holds only session-independent data (paths, column
  * names, Column recipes, a `SparkSession => DataFrame` base factory);
  * the serving plan is REBUILT per rewrite with the active session, so
  * no LogicalPlan — and therefore no SparkSession — is ever cached here
  * (the round-6 weak-map lesson), and a self-union of the same view gets
  * fresh attribute ids on each substitution. Registration requires the
  * delta predicate to reference at least one NON-group column: the
  * serving plan's own delta branch is `Aggregate(Filter(deltaPred,
  * base))`, which would otherwise match the view it serves and recurse.
  */
object MaterializedViews {

  /** One registered view: pure data, no session or plan references. */
  final case class MvView(
      name: String,
      basePaths: Set[String],
      base: SparkSession => DataFrame,
      stateDir: String,
      neededCols: Seq[String],
      deltaPred: Column,
      groupCols: Seq[String],
      groupKeys: Set[String],
      groupKeyToName: Map[String, String],
      aggCols: Seq[Column],
      aggKeyToName: Map[String, String],
      mergeAgg: Seq[(String, String)],
      outTypes: Map[String, DataType])

  private val views = TrieMap.empty[String, MvView]
  private val schemaCache = TrieMap.empty[String, StructType]

  def isEmpty: Boolean = views.isEmpty
  def registered: Set[String] = views.keySet.toSet

  /** Drop all registrations (specs; a prod catalog would scope by name). */
  def clear(): Unit = { views.clear(); schemaCache.clear() }

  /** Normalized rendering for semantic expression comparison: attribute
    * names lowercased (exprIds differ across plans), no-op casts stripped
    * (the optimizer's SimplifyCasts removes them on the user side while
    * the analyzed definition keeps them). None when the tree has no SQL
    * rendering — such expressions simply never match.
    */
  private def norm(e: Expression): Option[String] =
    try {
      // two passes: the no-op-cast guard needs dataType, which only
      // resolves on the original tree — strip casts BEFORE attribute
      // names replace the (resolved) references
      val noCasts = e.transformUp {
        case c: Cast if c.child.dataType == c.dataType => c.child
      }
      Some(noCasts.transformUp {
        case a: AttributeReference =>
          UnresolvedAttribute.quoted(a.name.toLowerCase(Locale.ROOT))
      }.sql)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Strip SubqueryAlias/deterministic Projects (inlining alias
    * definitions) and at most ONE Filter down to a V1 file relation.
    * Returns (scan root paths, an inliner re-expressing any expression
    * over the relation's own attributes, the inlined filter condition).
    */
  private def unwrap(p: LogicalPlan)
      : Option[(Set[String], Expression => Expression, Option[Expression])] =
    p match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            Some((fs.location.rootPaths.map(_.toString).toSet,
              identity[Expression] _, None))
          case _ => None
        }
      case sa: SubqueryAlias => unwrap(sa.child)
      case pr: Project
          if pr.projectList.forall(_.deterministic) &&
            pr.projectList.forall(e =>
              e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
        unwrap(pr.child).map { case (ps, f, cond) =>
          val defs: Map[Long, Expression] = pr.projectList.collect {
            case a: Alias => a.exprId.id -> f(a.child)
          }.toMap
          val g: Expression => Expression = e =>
            f(e.transformUp {
              case ar: AttributeReference if defs.contains(ar.exprId.id) =>
                defs(ar.exprId.id)
            })
          (ps, g, cond)
        }
      case fl: Filter if fl.condition.deterministic =>
        unwrap(fl.child).flatMap { case (ps, f, prev) =>
          if (prev.nonEmpty) None else Some((ps, f, Some(f(fl.condition))))
        }
      case _ => None
    }

  /** Register `name` as: `base.groupBy(groupCols).agg(aggCols)`, with the
    * pre-computed partials for `base WHERE NOT deltaPred` already at
    * `stateDir` (same column names: group cols + agg aliases). The
    * caller owns the coverage contract: state ⊎ (base WHERE deltaPred)
    * must equal the full base — exactly the §2.15 prepare discipline.
    * Idempotent per name.
    */
  def register(spark: SparkSession, name: String,
               base: SparkSession => DataFrame, stateDir: String,
               deltaPred: Column, groupCols: Seq[String],
               aggCols: Seq[Column]): Unit = {
    if (views.contains(name)) return
    val defDF = base(spark).groupBy(groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val aPlan = defDF.queryExecution.analyzed match {
      case a: Aggregate => a
      case other => throw new IllegalArgumentException(
        s"mv $name: definition did not analyze to an Aggregate: ${other.nodeName}")
    }
    val (paths, inline, defCond) = unwrap(aPlan.child).getOrElse(
      throw new IllegalArgumentException(
        s"mv $name: base must unwrap to a single V1 file relation"))
    require(defCond.isEmpty, s"mv $name: base must be unfiltered")

    val groupAttrs = aPlan.groupingExpressions.map {
      case a: AttributeReference => a
      case other => throw new IllegalArgumentException(
        s"mv $name: group keys must be plain columns, got $other")
    }
    val groupKeyToName = groupAttrs.map { a =>
      val k = norm(inline(a)).getOrElse(throw new IllegalArgumentException(
        s"mv $name: group key ${a.name} has no normalized form"))
      k -> a.name
    }.toMap

    val aggAliases = aPlan.aggregateExpressions.collect {
      case al @ Alias(ae: AggregateExpression, _) => (al, ae)
    }
    val mergeAgg = aggAliases.map { case (al, ae) =>
      require(!ae.isDistinct && ae.filter.isEmpty,
        s"mv $name: ${al.name} — DISTINCT/FILTER aggregates are not mergeable partials")
      require(!al.dataType.isInstanceOf[DecimalType],
        s"mv $name: ${al.name} — DECIMAL sums widen on re-aggregation; store BIGINT cents")
      val kind = ae.aggregateFunction match {
        case _: Count => "sum"
        case _: Sum => "sum"
        case _: Min => "min"
        case _: Max => "max"
        case other => throw new IllegalArgumentException(
          s"mv $name: ${al.name} — unsupported aggregate ${other.prettyName}")
      }
      al.name -> kind
    }
    val aggKeyToName = aggAliases.map { case (al, ae) =>
      val k = norm(inline(ae)).getOrElse(throw new IllegalArgumentException(
        s"mv $name: aggregate ${al.name} has no normalized form"))
      k -> al.name
    }.toMap

    val predRefs = base(spark).filter(deltaPred).queryExecution.analyzed match {
      case f: Filter => f.condition.references.map(_.name).toSeq
      case _ => Seq.empty[String]
    }
    require(predRefs.exists(r => !groupCols.exists(_.equalsIgnoreCase(r))),
      s"mv $name: delta predicate must reference a non-group column — a " +
        "group-only delta would make the serving plan's own delta branch " +
        "match the view it serves")

    val neededCols = (groupCols ++
      aPlan.aggregateExpressions.flatMap(_.references.map(_.name)) ++
      predRefs).distinct
    val outTypes = defDF.schema.fields.map(f => f.name -> f.dataType).toMap

    views.putIfAbsent(name, MvView(name, paths, base, stateDir, neededCols,
      deltaPred, groupCols, groupKeyToName.keySet, groupKeyToName, aggCols,
      aggKeyToName, mergeAgg, outTypes))
    ()
  }

  /** Install the rewrite rule into an existing session's optimizer (the
    * runtime path; config-built sessions get it from
    * [[graft.GraftExtensions]]). Idempotent.
    */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq MaterializedViewRewrite))
      spark.experimental.extraOptimizations = cur :+ MaterializedViewRewrite
  }

  /** The serving plan, rebuilt fresh per rewrite: merge(state ∪
    * partial(Δ)), with a group-column pull predicate (when present)
    * applied to BOTH branches below their aggregates so it reaches the
    * parquet scans, and the delta branch explicitly projected to the
    * needed columns (this rule may run after the optimizer's column
    * pruning, so nobody prunes the substituted subtree for us).
    */
  private def servingPlan(spark: SparkSession, v: MvView,
                          condOpt: Option[Expression]): LogicalPlan = {
    val condCol = condOpt.map { c =>
      ColumnBridge.column(c.transformUp {
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      })
    }
    val stateSchema = schemaCache.getOrElseUpdate(v.stateDir,
      spark.read.parquet(v.stateDir).schema)
    var state = spark.read.schema(stateSchema).parquet(v.stateDir)
    var delta = v.base(spark).select(v.neededCols.map(col): _*)
      .filter(v.deltaPred)
    condCol.foreach { c => state = state.filter(c); delta = delta.filter(c) }
    val deltaPart = delta.groupBy(v.groupCols.map(col): _*)
      .agg(v.aggCols.head, v.aggCols.tail: _*)
    val mergeCols = v.mergeAgg.map {
      case (a, "min") => min(col(a)).as(a)
      case (a, "max") => max(col(a)).as(a)
      case (a, _) => sum(col(a)).as(a)
    }
    val analyzed = state.unionByName(deltaPart)
      .groupBy(v.groupCols.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
      .queryExecution.analyzed
    // The substitution happens mid-/post-optimization, so the fresh
    // subtree would otherwise skip the standard normalization passes —
    // costing real things: an unfolded `cast('2001-01-01' AS ...)` in the
    // delta predicate is not translatable to a parquet source filter, and
    // a no-op `cast(floor(x) AS bigint)` inside the aggregate breaks the
    // codegen method-split's subexpression signature (interpreted
    // fallback). Run the session optimizer over the serving plan itself:
    // re-entry is safe because every aggregate inside it bails out of the
    // rewrite (the delta branch filters on a non-group column — enforced
    // at registration — and the merge reads state ∪ base paths).
    spark.sessionState.optimizer.execute(analyzed)
  }

  /** Attempt the substitution for one Aggregate node. */
  private[plans] def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    if (views.isEmpty) return None
    if (agg.groupingExpressions.exists(!_.deterministic) ||
      agg.aggregateExpressions.exists(!_.deterministic)) return None
    for {
      (paths, inline, condOpt) <- unwrap(agg.child)
      v <- views.values.find(_.basePaths == paths)
      plan <- rewriteWith(v, agg, inline, condOpt)
    } yield plan
  }

  private def rewriteWith(v: MvView, agg: Aggregate,
                          inline: Expression => Expression,
                          condOpt: Option[Expression]): Option[LogicalPlan] = {
    // group signature: exact set equality over normalized keys
    val gKeys = agg.groupingExpressions.flatMap(e => norm(inline(e)))
    if (gKeys.size != agg.groupingExpressions.size ||
      gKeys.toSet != v.groupKeys) return None
    // a crossed filter may only constrain group columns
    val condOk = condOpt.forall(_.collect { case a: AttributeReference => a }
      .forall(a => norm(inline(a)).exists(v.groupKeys.contains)))
    if (!condOk) return None
    // every output must be a group key, a registered aggregate, or an
    // AVG whose sum/count constituents are both registered (avg(e) ≡
    // sum(e)/count(e) — partials merge, the ratio does not, so it is
    // reconstructed above the merge; double-typed only, since the
    // reconstruction divides doubles)
    val mapped: Seq[(NamedExpression, Out)] =
      agg.aggregateExpressions.flatMap { ne =>
        val inner = ne match { case Alias(c, _) => c; case e => e }
        inner match {
          case AggregateExpression(a: Average, _, false, None, _)
              if ne.dataType == DoubleType =>
            val ch = inline(a.child)
            for {
              sk <- norm(Sum(ch).toAggregateExpression())
              ck <- norm(Count(Seq(ch)).toAggregateExpression())
              sn <- v.aggKeyToName.get(sk)
              cn <- v.aggKeyToName.get(ck)
            } yield ne -> (OutAvg(sn, cn): Out)
          case _ =>
            norm(inline(inner)).flatMap(k =>
              v.groupKeyToName.get(k).orElse(v.aggKeyToName.get(k)))
              .map(n => ne -> (OutCol(n): Out))
        }
      }
    if (mapped.size != agg.aggregateExpressions.size) return None
    // merged output types must equal the direct plan's
    if (!mapped.forall {
        case (ne, OutCol(name)) => v.outTypes.get(name).contains(ne.dataType)
        case (_, _: OutAvg) => true // Divide(double, double) by construction
      }) return None

    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map { spark =>
        val rep = servingPlan(spark, v, condOpt.map(inline))
        val byName = rep.output
          .map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap
        def attr(n: String) = byName(n.toLowerCase(Locale.ROOT))
        val projList = mapped.map {
          case (ne, OutCol(name)) =>
            Alias(attr(name), ne.name)(exprId = ne.exprId)
          case (ne, OutAvg(sn, cn)) =>
            // null iff the merged sum is null (all inputs null ⇒ count 0
            // ⇒ Average is null too); a group in the view always has
            // count(e) ≥ 0 and the null sum propagates through Divide
            Alias(Divide(Cast(attr(sn), DoubleType),
              Cast(attr(cn), DoubleType)), ne.name)(exprId = ne.exprId)
        }
        Project(projList, rep)
      }
  }

  private sealed trait Out
  private final case class OutCol(name: String) extends Out
  private final case class OutAvg(sumName: String, cntName: String) extends Out
}

/** The optimizer rule: substitute matching aggregates with their
  * registered materialized view's serving plan. Kill switch:
  * `spark.graft.mv.enabled=false`. Idempotent across fixed-point
  * iterations — the substituted merge aggregate reads state ∪ base
  * (paths differ from any registered base), and the inner delta branch
  * carries a filter on a non-group column (enforced at registration),
  * so neither re-matches.
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MaterializedViews.isEmpty ||
      conf.getConfString("spark.graft.mv.enabled", "true") == "false") plan
    else plan.transformUp {
      case agg: Aggregate => MaterializedViews.tryRewrite(agg).getOrElse(agg)
    }
}
