package graft.plans

import java.util.Locale

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Coalesce, CreateNamedStruct, Divide, EqualTo, ExprId, Expression, GetStructField, IsNotNull, Literal, NamedExpression, SessionWindow, UnixMillis}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, max, min, sum, when}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DateType, DecimalType, DoubleType, StructType, TimestampNTZType, TimestampType}

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
  * Projects, ANDing crossed Filters), and its grouping/aggregate
  * expressions are compared against the registered definition by a
  * normalized rendering (attribute names lowercased, no-op casts
  * stripped — the optimizer removes `CAST(x AS <x's own type>)` on the
  * user side while the analyzed definition keeps it). Group keys may be
  * EXPRESSIONS — `window(ts, '1 day')` registers like any other key, so
  * the classic time-series rollup is servable; the analyzer's implicit
  * `isnotnull(ts)` filter under a windowed aggregate is handled by
  * conjunct-set matching (the definition's own analysis-inserted
  * conjuncts must all appear in the user plan; anything extra must
  * constrain plain group columns and becomes the pull predicate, applied
  * to BOTH serving branches BELOW their aggregates so it reaches the
  * parquet scans). User outputs may be arbitrary DERIVED expressions over
  * the registered surface — every maximal registered subtree (a group
  * key, a whole aggregate) becomes a merged-view attribute, `avg(e)`
  * becomes `sum(e)/count(e)` when both constituents are registered, and
  * the result must consume every base reference and contain no leftover
  * aggregate, or the rewrite refuses. Anything that doesn't match —
  * distinct/filtered aggregates, unregistered expressions, filters on
  * non-group columns, grouping sets — is left untouched (the query stays
  * correct, just unserved).
  *
  * Supported aggregate kinds: COUNT / SUM / MIN / MAX, the distributive
  * set whose partials merge losslessly (COUNT and SUM merge by SUM,
  * MIN/MAX by themselves), plus AVG by reconstruction (exact null
  * semantics: count(e) counts non-nulls, and an all-null group's null
  * merged sum propagates through the division). DECIMAL sums are
  * rejected at registration (Spark widens the precision on every
  * re-aggregation, so the merged type would drift from the direct
  * plan's; the repo-wide BIGINT-cents discipline is the lossless
  * spelling).
  *
  * The registry holds only session-independent data (paths, column
  * names, Column recipes, a `SparkSession => DataFrame` base factory);
  * the serving plan is REBUILT per rewrite with the active session, so
  * no LogicalPlan — and therefore no SparkSession — is ever cached here
  * (the round-6 weak-map lesson), and a self-union of the same view gets
  * fresh attribute ids on each substitution. Registration requires the
  * delta predicate to carry a conjunct that is neither a definition
  * conjunct nor a plain-group-column constraint: the serving plan's own
  * delta branch is `Aggregate(Filter(defCond ∧ deltaPred, base))`, which
  * would otherwise match the view it serves and recurse.
  */
object MaterializedViews {

  /** One registered view: pure data, no session or plan references.
    * `distinctOf` marks a PAIR-SET view (COUNT(DISTINCT x)): the state
    * holds distinct (group, x) pairs — the information-theoretic minimum
    * for an exact distinct count — and serving re-counts
    * distinct(state ∪ distinct(Δ-pairs)) instead of merging partials.
    * `pairCounts` (opt-in at registration) upgrades the pair set to a
    * MULTIPLICITY-CARRYING one — (group, x, __dn count) — at 2× state
    * cost: counts subtract exactly under retraction, and a pair whose
    * count reaches zero leaves the view, so COUNT(DISTINCT) views
    * survive CDC deletes (refreshWithDeletes). Serving just drops the
    * count column — the pair set itself is unchanged. */
  final case class MvView(
      name: String,
      basePaths: Set[String],
      base: SparkSession => DataFrame,
      stateDir: String,
      deltaPred: Column,
      groupCols: Seq[Column],
      groupNames: Seq[String],
      groupKeyToName: Map[String, String],
      plainGroupNames: Set[String],
      defCondKeys: Set[String],
      shapeKey: Seq[String],
      aggCols: Seq[Column],
      aggKeyToName: Map[String, String],
      mergeAgg: Seq[(String, String)],
      distinctOf: Option[Column] = None,
      pairCounts: Boolean = false,
      retracted: Boolean = false,
      defSignature: Option[String] = None,
      // push-query binding (the dialect's WITH (LIVE='stream')): the
      // CATALOG NAME of the streaming source whose events continue this
      // view, plus the per-event contribution recipe for each registered
      // aggregate (count → its non-null witness, sum/min/max → the
      // argument column) — both session-independent, like every other
      // field here. Resolution of the name happens at query time
      // against the querying statement's catalog, so a replaying server
      // binds against ITS OWN stream registration.
      liveSource: Option[String] = None,
      liveContribs: Seq[Column] = Nil,
      // (size ms, advance ms) when the LIVE-bound view is WINDOWED:
      // the push continuation derives each live event's pane(s) on this
      // grid — one pane for tumbling (advance == size), size/advance
      // fan-out for hopping — before the keyed fold
      liveWindow: Option[(Long, Long)] = None,
      // SESSION view (round 15): gap ms + the event-time column. A
      // session is NOT a function of one row's timestamp — per-key
      // partial merge is unsound when a delta event extends or bridges
      // stored sessions — so session views serve BY NAME only (the
      // table surface, via [[sessionServe]]): the transparent rewrite
      // never fires on them (shapeKey carries a `session[gap]` sentinel
      // no user plan's unwrap can produce). State artifact: one
      // interval record per (keys, session) — keys…, __first_ms,
      // __last_ms, per-aggregate partials — repaired on serve/refresh
      // by the interval-level gaps-and-islands merge (provably
      // equivalent to re-sessionizing raw events: every event-level
      // gap < g is witnessed by interval adjacency), pruned to
      // delta-touched keys by a broadcast semi-join.
      // ALL retraction predicates folded so far (ANDed complement on
      // every survivor RESCAN): the state subtracts/refolds
      // incrementally, but the MIN/MAX argmax repair and the session
      // touched-key recompute go back to the RAW base, which carries no
      // tombstones — without this, a second DELETED refresh would
      // resurrect rows the first one removed (silent wrong extremum /
      // wrong session). Maintained by refreshWithDeletes /
      // refreshSessionWithDeletes and by repin (the command-log replay
      // path), so sequential retractions compose on every server.
      deletedSoFar: Option[Column] = None,
      sessionGap: Option[Long] = None,
      sessionTimeCol: Option[String] = None,
      // the analyzed session struct's type (struct<start,end> in the
      // source's timestamp flavor) — the transparent session rewrite
      // rebuilds the MERGED window struct from the interval millis and
      // must reproduce the exact field types the user plan carries
      sessionKeyType: Option[org.apache.spark.sql.types.DataType] = None) {
    def groupKeys: Set[String] = groupKeyToName.keySet
  }

  private val views = TrieMap.empty[String, MvView]
  // Derived lookup structures, rebuilt on every registry MUTATION
  // (DDL-rate — registrations/drops/refreshes, never per query): the
  // rewrite rule fires on EVERY Aggregate of EVERY optimized plan in
  // the JVM, and a deployment carries hundreds of views, so per-fire
  // cost must not scale with registry size. `allBasePaths` gives the
  // rule an O(#plan leaves) bail-out for plans touching no registered
  // base; `byPath` narrows a matching Aggregate's candidate set to the
  // few views sharing one of its scan paths (any one path suffices as
  // the index key — a candidate's basePaths must EQUAL the plan's).
  @volatile private var allBasePaths: Set[String] = Set.empty
  @volatile private var byPath: Map[String, Seq[MvView]] = Map.empty

  private def reindex(): Unit = {
    val snap = views.readOnlySnapshot().values.toSeq
    allBasePaths = snap.iterator.flatMap(_.basePaths).toSet
    byPath = snap.flatMap(v => v.basePaths.map(_ -> v))
      .groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2) }
  }

  /** Candidates sharing one of `paths` — index lookup, not a registry
    * scan. Empty when the path set is empty (never unwraps that way). */
  private def candidates(paths: Set[String]): Seq[MvView] =
    paths.headOption.map(p => byPath.getOrElse(p, Nil)).getOrElse(Nil)

  /** O(#leaves) pre-check for the rule: does this plan scan ANY
    * registered base path? A miss skips the whole per-Aggregate unwrap
    * walk — rule cost on unrelated queries is one leaf sweep regardless
    * of how many views the JVM carries. */
  private[plans] def touchesRegistered(plan: LogicalPlan): Boolean = {
    val paths = allBasePaths
    paths.nonEmpty && plan.exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(p => paths.contains(p.toString))
        case _ => false
      }
      case _ => false
    }
  }
  private val schemaCache = TrieMap.empty[String, StructType]

  /** The cached schema of a state artifact (one footer read per dir per
    * JVM — every serving/refresh path shares this; callers outside the
    * registry — the dialect's push bind, e.g. — go through it too
    * rather than paying a fresh parquet schema inference). */
  private[graft] def stateSchemaOf(spark: SparkSession,
      stateDir: String): StructType =
    schemaCache.getOrElseUpdate(stateDir,
      spark.read.parquet(stateDir).schema)
  // rewrite EVENTS per view (each optimization that substituted this
  // view's serving plan — an explain and an execution both count, like
  // any optimizer-level counter). Exposed via the REST /metrics
  // exposition as ksql_mv_rewrites_total.
  private val served =
    TrieMap.empty[String, java.util.concurrent.atomic.AtomicLong]

  def isEmpty: Boolean = views.isEmpty
  def registered: Set[String] = views.keySet.toSet
  /** name → current state dir: the replication-visible registration
    * state. A REFRESH swaps the artifact without changing the name set,
    * so command-topic change detection compares THIS map — set equality
    * would silently leave a refresh unlogged and other servers serving
    * the old cutoff. */
  def registeredState: Map[String, String] =
    views.readOnlySnapshot().map { case (k, v) => k -> v.stateDir }.toMap
  private[graft] def view(name: String): Option[MvView] = views.get(name)

  /** Catalog listing (the dialect's SHOW MATERIALIZED VIEWS): one row
    * per view — name, base paths, group output names, aggregate names. */
  def describeAll: Seq[(String, String, String, String)] =
    views.values.toSeq.sortBy(_.name).map(v => (
      v.name,
      v.basePaths.toSeq.sorted.mkString(","),
      v.groupNames.mkString(", "),
      v.mergeAgg.map(_._1).mkString(", ")))

  /** Rewrite events served per view, for observability surfaces. */
  def servedCounts: Map[String, Long] =
    served.readOnlySnapshot().map { case (k, v) => k -> v.get() }.toMap

  /** Drop all registrations (specs; a prod catalog would scope by name). */
  def clear(): Unit = {
    views.clear(); schemaCache.clear(); served.clear(); reindex()
  }

  /** Unregister one view (the dialect's DROP MATERIALIZED VIEW). The
    * state artifact stays on disk — registration never owns storage
    * (the caller/prepare wrote it; a re-CREATE serves from it again).
    * Returns whether the name was registered. */
  def drop(name: String): Boolean = {
    val had = views.remove(name).isDefined
    served.remove(name)
    reindex()
    had
  }

  /** Normalized rendering for semantic expression comparison: attribute
    * names lowercased (exprIds differ across plans), no-op casts stripped
    * (the optimizer's SimplifyCasts removes them on the user side while
    * the analyzed definition keeps them). None when the tree has no SQL
    * rendering — such expressions simply never match.
    */
  /** Casts that map every non-null input to a non-null output, so
    * `IsNotNull(Cast(x))` ⇔ `IsNotNull(x)` — the timestamp-family
    * reinterpretations the analyzer inserts around time columns. A
    * LEGACY string→number cast can null out a NON-null input, so the
    * general cast must NOT be stripped inside IsNotNull. */
  private def castNeverNulls(c: Cast): Boolean =
    (c.child.dataType, c.dataType) match {
      case (TimestampNTZType, TimestampType) => true
      case (TimestampType, TimestampNTZType) => true
      case (DateType, TimestampType) => true
      case (DateType, TimestampNTZType) => true
      case _ => false
    }

  private[graft] def norm(e: Expression): Option[String] =
    try {
      // two passes: the guards below need dataType/eval, which only
      // resolve on the original tree — normalize BEFORE attribute
      // names replace the (resolved) references. The rewrites mirror
      // what the optimizer does to the user side while the analyzed
      // definition keeps the sugar: no-op casts stripped, foldable
      // subtrees folded (`CAST(0 AS BIGINT)` vs `0L`), IsNotNull looking
      // through never-nulling timestamp casts (InferFiltersFromConstraints
      // derives `isnotnull(ts)` from `isnotnull(cast(ts))`).
      // every case guards on `resolved`: above an Expand the tree holds
      // name placeholders (UnresolvedAttribute), and dataType/eval on
      // their ancestors would throw — those subtrees just render as-is,
      // identically on both sides of the comparison
      val canon = e.transformUp {
        case c: Cast if c.resolved && c.child.dataType == c.dataType =>
          c.child
        case IsNotNull(c: Cast) if c.resolved && castNeverNulls(c) =>
          IsNotNull(c.child)
        case x if x.resolved && x.foldable && !x.isInstanceOf[Literal] =>
          Literal.create(x.eval(), x.dataType)
      }
      Some(canon.transformUp {
        case a: AttributeReference =>
          UnresolvedAttribute.quoted(a.name.toLowerCase(Locale.ROOT))
      }.sql)
    } catch { case scala.util.control.NonFatal(_) => None }

  private[graft] def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Strip SubqueryAlias/deterministic Projects (inlining alias
    * definitions), ANDing crossed Filters, down to a V1 file relation —
    * optionally through Expand nodes (hopping windows plan as an Expand
    * that fans each row into its panes). Returns (scan root paths, an
    * inliner re-expressing any expression over the relation's own
    * attributes — or, above an Expand, over NAME placeholders for its
    * outputs — the inlined filter condition, and the structural SHAPE:
    * one normalized key per crossed Expand. The shape key carries only
    * each projection row's non-attribute expressions (the window
    * structs): passthrough attributes are plumbing that column pruning
    * legally drops from the user side, and they are pure identity, so
    * two Expands with equal non-trivial rows have equal semantics for
    * the named outputs both sides reference.)
    */
  private[graft] def unwrap(p: LogicalPlan): Option[
      (Set[String], Expression => Expression, Option[Expression],
        Seq[String])] =
    p match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            Some((fs.location.rootPaths.map(_.toString).toSet,
              identity[Expression] _, None, Nil))
          case _ => None
        }
      case sa: SubqueryAlias => unwrap(sa.child)
      case pr: Project
          if pr.projectList.forall(_.deterministic) &&
            pr.projectList.forall(e =>
              e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
        unwrap(pr.child).map { case (ps, f, cond, shape) =>
          val defs: Map[Long, Expression] = pr.projectList.collect {
            case a: Alias => a.exprId.id -> f(a.child)
          }.toMap
          val g: Expression => Expression = e =>
            f(e.transformUp {
              case ar: AttributeReference if defs.contains(ar.exprId.id) =>
                defs(ar.exprId.id)
            })
          (ps, g, cond, shape)
        }
      case fl: Filter if fl.condition.deterministic =>
        unwrap(fl.child).map { case (ps, f, prev, shape) =>
          val c = f(fl.condition)
          (ps, f, Some(prev.map(And(_, c)).getOrElse(c)), shape)
        }
      // JOIN-VIEW matching (round 14): a view may be defined over an
      // INNER equi-join (the fact ⋈ dim rollup — revenue by nation).
      // The join is crossed like an Expand: paths union, inliners
      // compose (the two sides' exprIds are disjoint), side filters AND
      // into the condition, and the JOIN CONDITION ITSELF becomes a
      // structural shape key — two views over the same path pair with
      // different join conditions must never cross-match. Restricted to
      // conjunctions of two-sided attribute equalities: a one-sided or
      // non-equi conjunct is exactly what PushDownPredicates splits out
      // of the Join node, so the analyzed definition and the optimized
      // user plan would disagree on the shape — such joins simply never
      // unwrap (the query stays correct, just unserved). Outer joins
      // refuse here too: their null-extension makes partial(Δfact ⋈ dim)
      // unsound (an unmatched state-side row's group can gain a match
      // from the delta).
      case j: Join if j.joinType == Inner && j.condition.isDefined &&
          j.condition.get.deterministic &&
          conjuncts(j.condition.get).forall {
            case EqualTo(l, r) =>
              (l.references.subsetOf(j.left.outputSet) &&
                r.references.subsetOf(j.right.outputSet) &&
                l.references.nonEmpty && r.references.nonEmpty) ||
              (l.references.subsetOf(j.right.outputSet) &&
                r.references.subsetOf(j.left.outputSet) &&
                l.references.nonEmpty && r.references.nonEmpty)
            case _ => false
          } =>
        for {
          lu <- unwrap(j.left)
          ru <- unwrap(j.right)
          (lp, lf, lc, ls) = lu
          (rp, rf, rc, rs) = ru
          // no Expand BELOW a join (a pane-expanded side has replicated
          // rows — join multiplicity would be wrong), and no self-joins
          // (two relations sharing a path would make name-based
          // inlining ambiguous). Joins below joins DO compose — the
          // nested shape key encodes the whole tree, so star chains
          // (fact ⋈ dim ⋈ dim) register and match structurally.
          if !ls.exists(_.startsWith("expand(")) &&
            !rs.exists(_.startsWith("expand(")) &&
            lp.intersect(rp).isEmpty &&
            // …and no CROSS-RELATION NAME COLLISIONS either: matching is
            // name-based (norm lowercases attribute names and drops
            // exprIds), so a view keyed on the LEFT side's `id` would
            // structurally equal a query using the RIGHT side's
            // same-named `id` over the same paths/condition — silently
            // wrong. Distinct paths don't imply distinct names (id,
            // name, ts recur everywhere outside TPC-H); refuse the
            // unwrap, the query stays correct, just unserved.
            j.left.output.map(_.name.toLowerCase(Locale.ROOT)).toSet
              .intersect(j.right.output
                .map(_.name.toLowerCase(Locale.ROOT)).toSet).isEmpty
          ck <- norm(rf(lf(j.condition.get)))
        } yield {
          val f: Expression => Expression = e => rf(lf(e))
          val cond = Seq(lc, rc).flatten.reduceOption(And)
          val key = s"join[${ls.mkString(",")}|${rs.mkString(",")}|$ck]"
          (lp ++ rp, f, cond, Seq(key))
        }
      case ex: Expand if ex.projections.forall(_.forall(_.deterministic)) =>
        unwrap(ex.child).flatMap { case (ps, f, cond, shape) =>
          val rowKeys = ex.projections.map { row =>
            val nontrivial = row.filterNot(_.isInstanceOf[AttributeReference])
              .map(e => norm(f(e)))
            if (nontrivial.exists(_.isEmpty)) None
            else Some(nontrivial.flatten.mkString("[", ",", "]"))
          }
          if (rowKeys.exists(_.isEmpty)) None
          else {
            val key = rowKeys.flatten.mkString("expand(", ";", ")")
            val outs: Map[Long, Attribute] = ex.output
              .map(a => a.exprId.id -> a).toMap
            // above the Expand, expressions reference its outputs by a
            // NAME MARKER: a resolved attribute with the output's own
            // type and the canonical exprId 0, so norm's resolved-only
            // rewrites (no-op-cast strip, folding) still fire on the
            // ancestors, the rendering is name-based on both sides, and
            // the isnotnull(ts) conjunct's placement (pushed below the
            // Expand or not) becomes irrelevant
            val g: Expression => Expression = e => e.transformUp {
              case ar: AttributeReference if outs.contains(ar.exprId.id) =>
                val o = outs(ar.exprId.id)
                AttributeReference(o.name.toLowerCase(Locale.ROOT),
                  o.dataType, o.nullable)(exprId = ExprId(0))
            }
            Some((ps, g, cond, shape :+ key))
          }
        }
      case _ => None
    }

  /** Register `name` as: `base.groupBy(groupCols).agg(aggCols)`, with the
    * pre-computed partials for `base WHERE NOT deltaPred` already at
    * `stateDir` (same column names: group output names + agg aliases).
    * The caller owns the coverage contract: state ⊎ (base WHERE
    * deltaPred) must equal the full base — exactly the §2.15 prepare
    * discipline. Group keys may be expressions (e.g. `window(ts, '1
    * day')`); any filter the ANALYZER inserts for them (isnotnull under
    * a time window) is recorded as the definition condition and required
    * of matching user plans. Idempotent per name.
    */
  def register(spark: SparkSession, name: String,
               base: SparkSession => DataFrame, stateDir: String,
               deltaPred: Column, groupCols: Seq[Column],
               aggCols: Seq[Column], countedPairs: Boolean = false,
               retracted: Boolean = false): Unit = {
    if (views.contains(name)) return
    views.putIfAbsent(name, buildView(spark, name, base, stateDir,
      deltaPred, groupCols, aggCols, countedPairs)
      .copy(retracted = retracted))
    reindex()
  }

  /** Register a view [[validate]] already built — the other half of the
    * validate-then-build DDL sequence, so registration never re-runs the
    * definition analysis, the recursion guard, or the NULL-coverage
    * probe a validate() on the same statement just ran (round-14 ADVICE:
    * CREATE MATERIALIZED VIEW paid both twice). Idempotent per name. */
  def registerValidated(v: MvView): Unit = {
    views.putIfAbsent(v.name, v)
    reindex()
  }

  /** Run every registration-side guard — definition shape, unsupported
    * aggregates, the recursion guard, the NULL-coverage probe — WITHOUT
    * registering. The validate-before-write half of the dialect's CMV:
    * the state artifact is only built once the definition is known to
    * register cleanly, so a rejected DELTA can never leave a stale
    * artifact behind for a later registration-from-existing-artifact to
    * silently serve. Throws exactly when register would; returns the
    * built view so the caller can [[registerValidated]] it without
    * paying the probes twice. */
  def validate(spark: SparkSession, name: String,
               base: SparkSession => DataFrame, stateDir: String,
               deltaPred: Column, groupCols: Seq[Column],
               aggCols: Seq[Column], countedPairs: Boolean = false): MvView =
    buildView(spark, name, base, stateDir, deltaPred, groupCols, aggCols,
      countedPairs)

  private def buildView(spark: SparkSession, name: String,
               base: SparkSession => DataFrame, stateDir: String,
               deltaPred: Column, groupCols: Seq[Column],
               aggCols: Seq[Column], countedPairs: Boolean): MvView = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"mv $name: $msg")
    val defDF = base(spark).groupBy(groupCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val aPlan = defDF.queryExecution.analyzed match {
      case a: Aggregate => a
      case other =>
        fail(s"definition did not analyze to an Aggregate: ${other.nodeName}")
    }
    // SESSION-window keys refuse OUTRIGHT (latent-wrong-answer class): a
    // session struct is not a pure function of one row's timestamp, so
    // merging state ∪ Δ partials BY KEY EQUALITY is unsound — a delta
    // event that extends or bridges a stored session carries a DIFFERENT
    // struct value and would merge into a separate (wrong) row. Session
    // maintenance is the interval-repair path: registerSessionValidated /
    // sessionServe (the DDL's WINDOW SESSION), or the IVM operator
    // (q_incr_session). Tumbling structs ARE per-row functions and stay
    // supported; hopping goes through its Expand shape.
    if (aPlan.groupingExpressions.exists(isSessionKeyed))
      fail("session_window group keys cannot register as mergeable-partial " +
        "views (a delta event extending a stored session has a different " +
        "struct key — struct-keyed merge would serve wrong rows); use the " +
        "SESSION view path (validateSession / the DDL's WINDOW SESSION)")
    val (paths, inline, defCond, shapeKey) = unwrap(aPlan.child).getOrElse(
      fail("base must unwrap to V1 file relations — a single table, or " +
        "INNER equi-joins over distinct tables (no self-joins, no " +
        "cross-side name collisions, no outer/non-equi conditions)"))
    // canonical definition conjuncts come from the OPTIMIZED child:
    // conjunct matching compares against OPTIMIZED user plans, where
    // InferFiltersFromConstraints has added an `isnotnull(x)` beside
    // every null-intolerant `x = …` — an analyzed-side definition WHERE
    // would lack those and never match. Running the same optimizer over
    // the definition child yields the same canonical set (norm already
    // handles the folding/cast rewrites). Falls back to the analyzed
    // conjuncts if the optimized shape stops unwrapping.
    // the SHAPE is canonicalized from the optimized child too: user
    // plans arrive optimized, and on multi-join trees the optimizer may
    // normalize the join structure — registering the analyzed shape
    // would then never match. Flat/Expand shapes are identical on both
    // sides, so this is a no-op for single-table views.
    val (defCondCanon, shapeCanon) = (try unwrap(
      spark.sessionState.optimizer.execute(aPlan.child))
    catch { case scala.util.control.NonFatal(_) => None }) match {
      case Some((p2, _, cond2, shape2)) if p2 == paths => (cond2, shape2)
      case _ => (defCond, shapeKey)
    }
    val defCondKeys = defCondCanon.map(conjuncts).getOrElse(Nil).map(c =>
      norm(c).getOrElse(fail(s"definition filter $c has no normalized form")))
      .toSet

    // group outputs: every non-aggregate output column names a group key
    val groupOut = aPlan.aggregateExpressions.filter {
      case Alias(_: AggregateExpression, _) => false
      case _ => true
    }
    val groupKeyToName = groupOut.map { ne =>
      val inner = ne match { case Alias(c, _) => c; case e => e }
      val k = norm(inline(inner)).getOrElse(
        fail(s"group key ${ne.name} has no normalized form"))
      k -> ne.name
    }.toMap
    val gKeysDef = aPlan.groupingExpressions.flatMap(e => norm(inline(e)))
    if (gKeysDef.size != aPlan.groupingExpressions.size ||
      gKeysDef.toSet != groupKeyToName.keySet)
      fail("every grouping expression must appear as an output column")
    // "plain" = the key is a bare attribute AND the name exists on the
    // base frame itself (an Expand output like `window` renders as a
    // bare placeholder but has no base column; a pull predicate on it
    // could not be applied below the delta aggregate)
    val baseCols = base(spark).columns.map(_.toLowerCase(Locale.ROOT)).toSet
    val plainGroupNames = groupKeyToName.collect {
      case (k, n) if k == UnresolvedAttribute
        .quoted(n.toLowerCase(Locale.ROOT)).sql &&
        baseCols.contains(n.toLowerCase(Locale.ROOT)) =>
        n.toLowerCase(Locale.ROOT)
    }.toSet

    val aggAliases = aPlan.aggregateExpressions.collect {
      case al @ Alias(ae: AggregateExpression, _) => (al, ae)
    }
    // pair-set DISTINCT mode: exactly one COUNT(DISTINCT x) and nothing
    // else — the state is the distinct (group, x) pair set (the
    // q_incr_distinct algebra behind the transparent rewrite). Mixed
    // distinct+partial registrations stay refused: the two state shapes
    // don't share an artifact.
    val distinctOnly = aggAliases match {
      case Seq((al, ae @ AggregateExpression(c: Count, _, true, None, _)))
          if c.children.size == 1 => Some((al, ae, c))
      case _ => None
    }
    distinctOnly.foreach { case (al, ae, c) =>
      val k = norm(inline(ae)).getOrElse(
        fail(s"aggregate ${al.name} has no normalized form"))
      val xExpr = inline(c.children.head).transformUp {
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      }
      val xCol = ColumnBridge.column(xExpr)
      // recursion guard, same as the partial path below
      val predConjs0 =
        base(spark).filter(deltaPred).queryExecution.analyzed match {
          case f: Filter => conjuncts(f.condition)
          case _ => Seq.empty[Expression]
        }
      val guard0 = predConjs0.exists { cj =>
        val ck = norm(cj)
        ck.forall(!defCondKeys.contains(_)) && cj.references.exists(a =>
          !plainGroupNames.contains(a.name.toLowerCase(Locale.ROOT)))
      }
      if (!guard0)
        fail("delta predicate must carry a conjunct on a non-group column")
      requireTotalPredicate(spark, base, deltaPred, "delta predicate", name)
      return MvView(name, paths, base, stateDir, deltaPred,
        groupCols, groupOut.map(_.name), groupKeyToName, plainGroupNames,
        defCondKeys, shapeCanon, aggCols, Map(k -> al.name),
        Seq(al.name -> "distinct"), distinctOf = Some(xCol),
        pairCounts = countedPairs)
    }
    if (countedPairs)
      fail("countedPairs applies only to a sole-COUNT(DISTINCT) pair-set " +
        "registration — mergeable partials already subtract exactly")
    val mergeAgg = aggAliases.map { case (al, ae) =>
      if (ae.isDistinct || ae.filter.nonEmpty)
        fail(s"${al.name} — DISTINCT/FILTER aggregates are not mergeable " +
          "partials (a SOLE COUNT(DISTINCT x) registers as a pair-set view)")
      if (al.dataType.isInstanceOf[DecimalType])
        fail(s"${al.name} — DECIMAL sums widen on re-aggregation; store BIGINT cents")
      // "count" merges like "sum" but is remembered separately: a
      // GLOBAL re-aggregation of the view must serve count as
      // coalesce(sum(partials), 0) — count over an empty input is 0,
      // while a bare SUM over the empty merged view would return NULL
      val kind = ae.aggregateFunction match {
        case _: Count => "count"
        case _: Sum => "sum"
        case _: Min => "min"
        case _: Max => "max"
        case other =>
          fail(s"${al.name} — unsupported aggregate ${other.prettyName}")
      }
      al.name -> kind
    }
    val aggKeyToName = aggAliases.map { case (al, ae) =>
      val k = norm(inline(ae)).getOrElse(
        fail(s"aggregate ${al.name} has no normalized form"))
      k -> al.name
    }.toMap

    // recursion guard: the serving plan's own delta branch carries
    // defCond ∧ deltaPred — at least one deltaPred conjunct must be
    // neither a definition conjunct nor a plain-group constraint, or
    // that branch would match the view it serves
    val predConjs = base(spark).filter(deltaPred).queryExecution.analyzed match {
      case f: Filter => conjuncts(f.condition)
      case _ => Seq.empty[Expression]
    }
    val guardOk = predConjs.exists { c =>
      val k = norm(c)
      val nonDef = k.forall(!defCondKeys.contains(_))
      val nonGroup = c.references.exists(a =>
        !plainGroupNames.contains(a.name.toLowerCase(Locale.ROOT)))
      nonDef && nonGroup
    }
    if (!guardOk)
      fail("delta predicate must carry a conjunct on a non-group column — " +
        "a group-only delta would make the serving plan's own delta " +
        "branch match the view it serves")
    requireTotalPredicate(spark, base, deltaPred, "delta predicate", name)

    MvView(name, paths, base, stateDir, deltaPred,
      groupCols, groupOut.map(_.name), groupKeyToName, plainGroupNames,
      defCondKeys, shapeCanon, aggCols, aggKeyToName, mergeAgg)
  }

  /** Advance a view's cutoff: fold the rows that LEAVE the delta —
    * `oldPred ∧ ¬newPred` — into a fresh state artifact at `newStateDir`
    * (merge(old state ∪ partial(moved)), the same algebra the serving
    * plan runs), then swap the registration atomically. Serving is
    * correct before, during (the rule reads one consistent MvView
    * value), and after; only the delta scan shrinks. The caller owns
    * the implication contract newPred ⊆ oldPred (the cutoff only
    * advances) and the write-once discipline of `newStateDir`.
    */
  /** Refuse a cutoff that re-covers retracted ground (round-16 ADVICE):
    * rows removed by ANY earlier DELETED refresh must stay outside the
    * new delta — the serving delta branch rescans raw base WHERE
    * newPred per query (resurrecting them immediately), and the NEXT
    * cutoff fold's `oldPred ∧ ¬newerPred` would move them into state
    * permanently. Checked on EVERY refresh flavor against the full
    * composed tombstone history (`deletedSoFar`), with this statement's
    * own delete predicate folded into the same bounded probe.
    * (`repin` — the command-log replay half — carries no SparkSession
    * and replays only statements whose folding server passed this very
    * guard, so it re-pins unchecked by design.) */
  private def requireCutoffClearOfDeletes(spark: SparkSession, v: MvView,
      newDeltaPred: Column, extraDeleted: Option[Column],
      name: String): Unit =
    (v.deletedSoFar.toSeq ++ extraDeleted.toSeq).reduceOption(_ || _)
      .foreach { d =>
        if (!v.base(spark).filter(newDeltaPred && d).isEmpty)
          throw new IllegalArgumentException(s"mv $name: the NEW delta " +
            "predicate re-covers retracted rows — the serving delta " +
            "branch rescans base WHERE newPred per query and the next " +
            "cutoff fold would bake them into state, resurrecting " +
            "deleted rows; advance the cutoff past every folded " +
            "retraction")
      }

  def refresh(spark: SparkSession, name: String, newDeltaPred: Column,
              newStateDir: String): Unit = {
    val v = views.getOrElse(name,
      throw new IllegalArgumentException(s"mv $name: not registered"))
    if (v.sessionGap.isDefined) throw new IllegalArgumentException(
      s"mv $name is a SESSION view — its state is interval records, " +
        "not per-key partials; refresh it with refreshSession")
    // same coverage guard as register: a NULL-evaluating NEW predicate
    // would drop rows from both the `oldPred && !newPred` fold and the
    // post-refresh delta
    requireTotalPredicate(spark, v.base, newDeltaPred, "refresh predicate",
      name)
    requireCutoffClearOfDeletes(spark, v, newDeltaPred, None, name)
    val stateSchema = schemaCache.getOrElseUpdate(v.stateDir,
      spark.read.parquet(v.stateDir).schema)
    val movedRows = v.base(spark)
      .filter(v.deltaPred && org.apache.spark.sql.functions.not(newDeltaPred))
    (v.distinctOf match {
      case Some(x) if v.pairCounts =>
        // multiplicity-carrying fold: per-pair counts merge by SUM
        val moved = movedRows
          .groupBy(v.groupCols :+ x.as("__dv"): _*)
          .agg(count(lit(1)).as("__dn"))
        spark.read.schema(stateSchema).parquet(v.stateDir)
          .unionByName(moved)
          .groupBy((v.groupNames :+ "__dv").map(col): _*)
          .agg(sum(col("__dn")).as("__dn"))
      case Some(x) =>
        // pair-set fold: new state = distinct(state ∪ moved pairs)
        spark.read.schema(stateSchema).parquet(v.stateDir)
          .unionByName(movedRows
            .select(v.groupCols :+ x.as("__dv"): _*).distinct())
          .distinct()
      case None =>
        val moved = movedRows
          .groupBy(v.groupCols: _*)
          .agg(v.aggCols.head, v.aggCols.tail: _*)
        spark.read.schema(stateSchema).parquet(v.stateDir)
          .unionByName(moved)
          .groupBy(v.groupNames.map(col): _*)
          .agg(mergeCols(v).head, mergeCols(v).tail: _*)
    }).write.mode("overwrite").parquet(newStateDir)
    views.put(name, v.copy(stateDir = newStateDir, deltaPred = newDeltaPred))
    reindex()
    schemaCache.remove(newStateDir)
    ()
  }

  /** Swap a registration to an ALREADY-BUILT artifact + its cutoff — the
    * command-log replay half of the dialect's REFRESH MATERIALIZED VIEW:
    * one server folds (refresh/refreshWithDeletes above) and every other
    * server, replaying the logged statement, finds the new artifact
    * populated and just re-pins its registration — registration only,
    * never a second fold. The caller owns the artifact/predicate
    * coherence contract (the dialect enforces it by replaying the exact
    * statement the folding server ran). */
  def repin(name: String, newStateDir: String, newDeltaPred: Column,
            retracted: Boolean = false,
            deletedPred: Option[Column] = None): Unit = {
    val v = views.getOrElse(name,
      throw new IllegalArgumentException(s"mv $name: not registered"))
    views.put(name, v.copy(stateDir = newStateDir,
      deltaPred = newDeltaPred,
      // once retracted, always retracted — the artifact excludes the
      // deleted rows whatever later cutoff-only refreshes do
      retracted = v.retracted || retracted,
      // replaying servers accumulate the same tombstone history the
      // folding server recorded, so a LATER retraction they fold
      // composes identically
      deletedSoFar = deletedPred.map(d =>
        v.deletedSoFar.map(_ || d).getOrElse(d)).orElse(v.deletedSoFar)))
    reindex()
    schemaCache.remove(newStateDir)
    ()
  }

  /** Coverage guard (round-12 ADVICE): the register/refresh contract is
    * `state ⊎ (base WHERE pred) = base`, but a row where `pred`
    * evaluates to NULL (nullable delta column, a null-introducing cast)
    * satisfies neither the complement the state was built under nor the
    * serving delta filter — and refresh's `oldPred && !newPred` fold
    * drops it from both the fold and the future delta. The transparent
    * rewrite would then silently under-count for plain user queries
    * that never mentioned the view. Guard: when Catalyst derives the
    * predicate as NULLABLE over this base (bottom-up nullability — a
    * non-nullable predicate is statically total and skips the scan
    * entirely), probe ONCE per register/refresh that no base row
    * NULL-evaluates it: one `pred IS NULL` filter with an isEmpty
    * early exit, at DDL time, never per served query. Opt-out for
    * operators with schema-level guarantees:
    * `spark.graft.mv.coverageCheck=false`. */
  private def requireTotalPredicate(spark: SparkSession,
      base: SparkSession => DataFrame, pred: Column, what: String,
      name: String): Unit = {
    if (MaterializedViewRewrite.isDisabledStr(spark.conf.get(
      "spark.graft.mv.coverageCheck", "true"))) return
    val frame = base(spark)
    val nullable = frame.select(pred.cast("boolean").as("p"))
      .schema.head.nullable
    if (nullable && !frame.filter(pred.isNull).isEmpty)
      throw new IllegalArgumentException(s"mv $name: $what evaluates to " +
        "NULL on at least one base row — such rows fall in NEITHER the " +
        "state artifact (built with the complement) nor the serving " +
        "delta branch, so the rewrite would silently drop them. Make " +
        "the predicate total (AND an IS NOT NULL arm, or coalesce) or " +
        "clean the base.")
  }

  private def mergeCols(v: MvView): Seq[Column] = v.mergeAgg.map {
    case (a, "min") => min(col(a)).as(a)
    case (a, "max") => max(col(a)).as(a)
    case (a, _) => sum(col(a)).as(a) // "sum" and "count" both merge by SUM
  }

  // ─── SESSION views (round 15) — named serving over interval state ───
  //
  // A SESSION window is not a function of one row's timestamp, so the
  // mergeable-partial algebra above cannot carry it (buildView refuses
  // session_window keys outright). Instead the state artifact stores ONE
  // INTERVAL RECORD per (keys, session): keys…, __first_ms, __last_ms,
  // per-aggregate partials. Serving and refresh repair it with the
  // interval-level gaps-and-islands merge of q_incr_session — sort a
  // key's intervals by __first_ms, break when __first_ms − running
  // max(__last_ms) ≥ gap — which is provably equivalent to
  // re-sessionizing the raw events (every event-level gap < g is
  // witnessed by interval adjacency). The merge pass is pruned by a
  // NULL-SAFE broadcast semi-join to keys present in the delta:
  // untouched keys' sessions stream through with NO window sort, so at
  // 100 TB the repair cost is |touched-key sessions| + |Δ|, never
  // |state|. (Scale note, same as q_incr_session: the broadcast assumes
  // the DELTA'S DISTINCT-KEY SET fits broadcast — the late-arrival
  // regime this models; a delta touching most keys should drop the hint
  // and let AQE pick the strategy.) These views serve BY NAME only; the
  // `session[gap]` shapeKey sentinel keeps them out of every rewrite
  // path (no user plan's unwrap produces it).

  /** Per-session partials of `df` on the registered grid: one row per
    * (keys, session) with the interval bounds and each aggregate's
    * partial. Shared by the state build (Translator), serving, and
    * refresh — the three must agree on the artifact shape. */
  private[graft] def sessionPartials(df: DataFrame, timeCol: String,
      gapMs: Long, keyNames: Seq[String], aggCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.functions.{session_window, unix_millis}
    val ts = col(timeCol)
    val aggsAll = Seq(min(unix_millis(ts)).as("__first_ms"),
      max(unix_millis(ts)).as("__last_ms")) ++ aggCols
    df.filter(ts.isNotNull) // a NULL-ts row is outside every session —
      // identically on the state build, the delta, and a direct
      // session_window query, so the serving contract is consistent
      .groupBy(session_window(ts, s"$gapMs milliseconds") +:
        keyNames.map(col): _*)
      .agg(aggsAll.head, aggsAll.tail: _*)
      .drop("session_window")
  }

  /** Gaps-and-islands repair of `state ∪ delta` interval records for
    * one view: touched keys (NULL-safe semi-join against the delta's
    * key set) merge; untouched keys stream through sort-free. Returns
    * interval records in the artifact shape. */
  private def sessionRepair(v: MvView, state: DataFrame,
      delta: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gap = v.sessionGap.get
    val keyNames = v.groupNames
    val touched = delta.select(keyNames.map(col): _*).distinct()
    // NULL-SAFE key match: a NULL-keyed group's late events must repair
    // its stored sessions too (plain equi-semi-join would route the
    // stored NULL-key sessions to the untouched branch and double them)
    val stA = state.alias("__st")
    val tcA = broadcast(touched.alias("__tc"))
    val cond = keyNames.map(n => col(s"__st.$n") <=> col(s"__tc.$n"))
      .reduce(_ && _)
    val stTouched = stA.join(tcA, cond, "left_semi")
    val stUntouched = stA.join(tcA, cond, "left_anti")
    val w = Window.partitionBy(keyNames.map(col): _*)
      .orderBy(col("__first_ms"), col("__last_ms"))
    val aggsAll = Seq(min(col("__first_ms")).as("__first_ms"),
      max(col("__last_ms")).as("__last_ms")) ++ mergeCols(v)
    val merged = stTouched.unionByName(delta)
      .withColumn("__pmax", max(col("__last_ms"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      // BOUNDARY SEMANTICS: merge at EXACTLY gap (split only when the
      // inter-session gap strictly exceeds it) — Spark's session_window
      // merges an event landing exactly on a session's end (= last +
      // gap), and Kafka Streams' SessionWindows merges on
      // |t1−t2| <= inactivityGap; the repair must agree or a boundary
      // event crossing the state/delta seam would split in the served
      // answer and merge in the engine's own recompute.
      .withColumn("__brk", when(col("__pmax").isNull ||
        col("__first_ms") - col("__pmax") > gap, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keyNames :+ "__sid").map(col): _*)
      .agg(aggsAll.head, aggsAll.tail: _*)
      .drop("__sid")
    stUntouched.unionByName(merged)
  }

  /** Run every session-registration guard WITHOUT registering (the
    * validate-before-build half, mirroring [[validate]]): keys must be
    * plain base columns, aggregates must be mergeable partials
    * (COUNT/SUM/MIN/MAX, no DISTINCT/FILTER, no DECIMAL — an interval
    * merge re-aggregates them), the delta predicate must be total.
    * Returns the built view for [[registerValidated]]. */
  def validateSession(spark: SparkSession, name: String,
      base: SparkSession => DataFrame, stateDir: String,
      deltaPred: Column, timeCol: String, gapMs: Long,
      keyNames: Seq[String], aggCols: Seq[Column]): MvView = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"mv $name: $msg")
    if (gapMs <= 0) fail("session gap must be positive")
    if (keyNames.isEmpty)
      fail("a session view needs at least one plain GROUP BY key (the " +
        "touched-key repair prune is keyed)")
    if (aggCols.isEmpty) fail("a session view needs at least one aggregate")
    val frame = base(spark)
    val byLower = frame.columns
      .map(c => c.toLowerCase(Locale.ROOT) -> c).toMap
    val keys = keyNames.map(k => byLower.getOrElse(k.toLowerCase(Locale.ROOT),
      fail(s"session group key '$k' must be a plain base column (an " +
        "expression key has no stable interval-record identity for the " +
        "touched-key prune)")))
    val tc = byLower.getOrElse(timeCol.toLowerCase(Locale.ROOT),
      fail(s"time column '$timeCol' is not a base column"))
    // classify aggregate kinds off the FLAT analyzed aggregate — kinds
    // don't depend on the window, and this reuses Catalyst's resolution
    val aPlan = frame.groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .queryExecution.analyzed match {
      case a: Aggregate => a
      case other =>
        fail(s"definition did not analyze to an Aggregate: ${other.nodeName}")
    }
    val mergeAgg = aPlan.aggregateExpressions.collect {
      case al @ Alias(ae: AggregateExpression, _) => (al, ae)
    }.map { case (al, ae) =>
      if (ae.isDistinct || ae.filter.nonEmpty)
        fail(s"${al.name} — DISTINCT/FILTER aggregates have no mergeable " +
          "session partial (sessions merge by interval union)")
      if (al.dataType.isInstanceOf[DecimalType])
        fail(s"${al.name} — DECIMAL sums widen on re-aggregation; " +
          "store BIGINT cents")
      val kind = ae.aggregateFunction match {
        case _: Count => "count"
        case _: Sum => "sum"
        case _: Min => "min"
        case _: Max => "max"
        case _: Average =>
          fail(s"${al.name} — AVG has no lossless session partial; " +
            "register SUM and COUNT columns and derive the average")
        case other =>
          fail(s"${al.name} — unsupported aggregate ${other.prettyName}")
      }
      al.name -> kind
    }
    if (mergeAgg.size != aggCols.size)
      fail("every aggregate column must be a plain aggregate with an alias")
    requireTotalPredicate(spark, base, deltaPred, "delta predicate", name)
    // ── transparent-rewrite metadata: analyze the SESSION definition ──
    // The rewrite serves a user's PLAIN session_window aggregate from
    // this view (tryRewriteSession), so the matching surface is computed
    // from the session-analyzed definition exactly as buildView does for
    // flat views: the session struct's normalized rendering becomes a
    // group key (mapped to the rebuilt "__session" struct column of the
    // serving plan), plain keys and aggregates get their norm → name
    // maps, and the definition's analyzer-inserted conjuncts
    // (isnotnull(ts) under the window) are required of user plans.
    import org.apache.spark.sql.functions.session_window
    val sessDF = frame
      .groupBy(session_window(col(tc), s"$gapMs milliseconds") +:
        keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val sPlan = sessDF.queryExecution.analyzed match {
      case a: Aggregate => a
      case other => fail(
        s"session definition did not analyze to an Aggregate: ${other.nodeName}")
    }
    val (paths, inline, defCond, _) = unwrap(sPlan.child).getOrElse(
      fail("base must unwrap to a single V1 file relation"))
    // canonical conjuncts + session-struct rendering come from the
    // OPTIMIZED child (user plans arrive optimized — same reasoning as
    // buildView); fall back to the analyzed forms when the optimized
    // shape stops unwrapping
    val (condCanon, inlineCanon) = (try unwrap(
      spark.sessionState.optimizer.execute(sPlan.child))
    catch { case scala.util.control.NonFatal(_) => None }) match {
      case Some((p2, i2, c2, _)) if p2 == paths => (c2, i2)
      case _ => (defCond, inline)
    }
    val defCondKeys = condCanon.map(conjuncts).getOrElse(Nil).map(c =>
      norm(c).getOrElse(fail(s"definition filter $c has no normalized form")))
      .toSet
    val sessAttr = sPlan.groupingExpressions.find(isSessionKeyed).getOrElse(
      fail("session definition lost its session_window grouping key"))
    val sessNorm = norm(inlineCanon(sessAttr)).getOrElse(
      fail("the session struct has no normalized rendering"))
    val plainKeyToName = keys.map(k =>
      UnresolvedAttribute.quoted(k.toLowerCase(Locale.ROOT)).sql -> k).toMap
    val aggKeyToName = sPlan.aggregateExpressions.collect {
      case al @ Alias(ae: AggregateExpression, _) =>
        norm(inline(ae)).getOrElse(
          fail(s"aggregate ${al.name} has no normalized form")) -> al.name
    }.toMap
    // recursion guard (needed once the transparent rewrite serves
    // session aggregates: the serving plan's own delta branch IS a
    // session aggregate over base WHERE deltaPred — at least one delta
    // conjunct must be neither a definition conjunct nor a plain-group
    // constraint, or that branch would re-match the view it serves)
    val predConjs = base(spark).filter(deltaPred)
      .queryExecution.analyzed match {
      case f: Filter => conjuncts(f.condition)
      case _ => Seq.empty[Expression]
    }
    val guardOk = predConjs.exists { c =>
      val k = norm(c)
      k.forall(!defCondKeys.contains(_)) && c.references.exists(a =>
        !keys.map(_.toLowerCase(Locale.ROOT))
          .contains(a.name.toLowerCase(Locale.ROOT)))
    }
    if (!guardOk)
      fail("delta predicate must carry a conjunct on a non-group column — " +
        "a group-only delta would make the serving plan's own delta " +
        "branch match the view it serves")
    MvView(name, paths, base, stateDir, deltaPred,
      groupCols = keys.map(col), groupNames = keys,
      groupKeyToName = plainKeyToName + (sessNorm -> "__session"),
      plainGroupNames = keys.map(_.toLowerCase(Locale.ROOT)).toSet,
      defCondKeys = defCondKeys, shapeKey = Seq(s"session[$gapMs]"),
      aggCols = aggCols, aggKeyToName = aggKeyToName, mergeAgg = mergeAgg,
      sessionGap = Some(gapMs), sessionTimeCol = Some(tc),
      sessionKeyType = Some(sessAttr.dataType))
  }

  /** The state artifact's content for a session view: per-session
    * partials of `base WHERE NOT delta` — what the DDL's single-writer
    * build writes to STATE_DIR. */
  def sessionStateFrame(spark: SparkSession, v: MvView): DataFrame =
    sessionPartials(
      v.base(spark).filter(org.apache.spark.sql.functions.not(v.deltaPred)),
      v.sessionTimeCol.get, v.sessionGap.get, v.groupNames, v.aggCols)

  /** The batch-served SESSION SET of a session view, as interval
    * records (keys…, __first_ms, __last_ms, aggregate partials):
    * repair(state ∪ per-session Δ partials). The named pull projects
    * WINDOWSTART/WINDOWEND from it; the push continuation seeds its
    * per-key interval store with it. */
  def sessionServeIntervals(spark: SparkSession, v: MvView,
      extraCond: Option[Column] = None): DataFrame = {
    val gap = v.sessionGap.get
    val stateSchema = schemaCache.getOrElseUpdate(v.stateDir,
      spark.read.parquet(v.stateDir).schema)
    var state = spark.read.schema(stateSchema).parquet(v.stateDir)
    var deltaBase = v.base(spark).filter(v.deltaPred)
    // pull predicate (plain group columns only — enforced by the
    // caller): keys are untouched by sessionization, so the filter
    // commutes with the per-key repair and prunes BOTH branches' scans
    extraCond.foreach { c => state = state.filter(c)
      deltaBase = deltaBase.filter(c) }
    val delta = sessionPartials(deltaBase,
      v.sessionTimeCol.get, gap, v.groupNames, v.aggCols)
    sessionRepair(v, state, delta)
  }

  /** Serve a session view BY NAME: repair(state ∪ per-session Δ
    * partials), surfacing WINDOWSTART/WINDOWEND millis (end = last
    * event + gap, Spark's own session_window end). */
  def sessionServe(spark: SparkSession, v: MvView): DataFrame =
    sessionServeIntervals(spark, v)
      .withColumn("windowstart", col("__first_ms"))
      .withColumn("windowend", col("__last_ms") + lit(v.sessionGap.get))
      .drop("__first_ms", "__last_ms")

  /** The transparent serving plan for a SESSION-window user aggregate:
    * the repaired interval records with the MERGED window struct
    * rebuilt (start = first event, end = last event + gap — exactly
    * what Spark's session aggregation outputs) in the definition's own
    * timestamp flavor, exposed as "__session" beside the plain keys and
    * merged aggregates. Optimized like servingPlan — re-entry is safe:
    * the delta branch's session aggregate carries the registration-
    * enforced non-group delta conjunct, so it never re-matches. */
  private def sessionServingPlan(spark: SparkSession, v: MvView,
      extraCond: Option[Expression]): LogicalPlan = {
    import org.apache.spark.sql.functions.timestamp_millis
    val condCol = extraCond.map { c =>
      ColumnBridge.column(c.transformUp {
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      })
    }
    val gap = v.sessionGap.get
    val fields = v.sessionKeyType.get
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val frame = sessionServeIntervals(spark, v, condCol).select(
      org.apache.spark.sql.functions.struct(
        timestamp_millis(col("__first_ms"))
          .cast(fields("start").dataType).as("start"),
        timestamp_millis(col("__last_ms") + lit(gap))
          .cast(fields("end").dataType).as("end")).as("__session") +:
        (v.groupNames ++ v.mergeAgg.map(_._1)).map(col): _*)
    spark.sessionState.optimizer.execute(frame.queryExecution.analyzed)
  }

  /** NULL-safe broadcast semi/anti join of `df` against a key frame —
    * the touched-key routing both session refresh forms share (a
    * NULL-keyed group's rows must route WITH their group). */
  private def keyRouted(df: DataFrame, keys: DataFrame,
      keyNames: Seq[String], joinType: String): DataFrame = {
    val l = df.alias("__l")
    val r = broadcast(keys.alias("__r"))
    val cond = keyNames.map(n => col(s"__l.$n") <=> col(s"__r.$n"))
      .reduce(_ && _)
    l.join(r, cond, joinType)
  }

  /** Session refresh under RETRACTIONS — the CDC posture for session
    * views. A deleted event can SPLIT a session (the interval merge
    * only ever widens), so subtraction is unsound; instead the keys
    * with ANY deleted row RECOMPUTE their sessions from the surviving
    * rows outside the new delta (`¬newPred ∧ ¬del`, key ∈ touched —
    * one sessionize over |touched keys' events|, never |base|), while
    * untouched keys take the ordinary interval repair of
    * state ∪ sessionized(moved). Deletes still inside the NEW delta
    * are refused — the serving delta branch rescans `base WHERE
    * newPred` per query and would resurrect them. After this refresh
    * the view's contract is sessions over `base WHERE NOT deletePred`
    * for its OWN key signature (the flat retraction contract; session
    * views never serve globally). Returns the touched-key count — the
    * repair-cost observable. */
  def refreshSessionWithDeletes(spark: SparkSession, name: String,
      newDeltaPred: Column, deletePred: Column,
      newStateDir: String): Long = {
    val v = views.getOrElse(name,
      throw new IllegalArgumentException(s"mv $name: not registered"))
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"mv $name: $msg")
    require(v.sessionGap.isDefined, s"mv $name is not a session view")
    requireTotalPredicate(spark, v.base, newDeltaPred, "refresh predicate",
      name)
    requireTotalPredicate(spark, v.base, deletePred, "delete predicate",
      name)
    requireCutoffClearOfDeletes(spark, v, newDeltaPred, Some(deletePred),
      name)
    val keyNames = v.groupNames
    val gap = v.sessionGap.get
    val tc = v.sessionTimeCol.get
    val delKeys = v.base(spark).filter(deletePred)
      .select(keyNames.map(col): _*).distinct()
      .localCheckpoint() // evaluated twice (semi + anti routing) and
      // small by the retraction regime's nature; pin one value
    val nTouched = delKeys.count()
    // touched keys: full per-key recompute over surviving non-delta
    // rows — surviving excludes EVERY retraction folded so far, not
    // just this statement's (the raw base still carries rows earlier
    // DELETED refreshes removed; rescanning them would resurrect
    // deleted events into repaired sessions)
    val allDeleted = v.deletedSoFar
      .map(_ || deletePred).getOrElse(deletePred)
    val surviving = v.base(spark)
      .filter(org.apache.spark.sql.functions.not(newDeltaPred) &&
        org.apache.spark.sql.functions.not(allDeleted))
    val touchedIntervals = sessionPartials(
      keyRouted(surviving, delKeys, keyNames, "left_semi"),
      tc, gap, keyNames, v.aggCols)
    // untouched keys: the ordinary repair — by definition they carry no
    // deleted rows, so moved = oldPred ∧ ¬newPred restricted to them
    val stateSchema = schemaCache.getOrElseUpdate(v.stateDir,
      spark.read.parquet(v.stateDir).schema)
    val stateUntouched = keyRouted(
      spark.read.schema(stateSchema).parquet(v.stateDir),
      delKeys, keyNames, "left_anti")
    val movedUntouched = sessionPartials(
      keyRouted(v.base(spark).filter(v.deltaPred &&
        org.apache.spark.sql.functions.not(newDeltaPred)),
        delKeys, keyNames, "left_anti"),
      tc, gap, keyNames, v.aggCols)
    sessionRepair(v, stateUntouched, movedUntouched)
      .unionByName(touchedIntervals)
      .write.mode("overwrite").parquet(newStateDir)
    views.put(name, v.copy(stateDir = newStateDir,
      deltaPred = newDeltaPred, retracted = true,
      deletedSoFar = Some(allDeleted)))
    reindex()
    schemaCache.remove(newStateDir)
    nTouched
  }

  /** Advance a session view's cutoff: repair the rows that LEAVE the
    * delta (`oldPred ∧ ¬newPred`, sessionized) into a fresh interval
    * artifact at `newStateDir`, then swap the registration — the
    * session half of [[refresh]], same single-writer/write-once
    * contract. Retraction (DELETED) routes through
    * [[refreshSessionWithDeletes]] (touched-key recompute — a deleted
    * event can SPLIT a session, which the interval merge cannot
    * express). */
  def refreshSession(spark: SparkSession, name: String,
      newDeltaPred: Column, newStateDir: String): Unit = {
    val v = views.getOrElse(name,
      throw new IllegalArgumentException(s"mv $name: not registered"))
    require(v.sessionGap.isDefined, s"mv $name is not a session view")
    requireTotalPredicate(spark, v.base, newDeltaPred, "refresh predicate",
      name)
    requireCutoffClearOfDeletes(spark, v, newDeltaPred, None, name)
    val stateSchema = schemaCache.getOrElseUpdate(v.stateDir,
      spark.read.parquet(v.stateDir).schema)
    val state = spark.read.schema(stateSchema).parquet(v.stateDir)
    val moved = sessionPartials(
      v.base(spark).filter(v.deltaPred &&
        org.apache.spark.sql.functions.not(newDeltaPred)),
      v.sessionTimeCol.get, v.sessionGap.get, v.groupNames, v.aggCols)
    sessionRepair(v, state, moved)
      .write.mode("overwrite").parquet(newStateDir)
    views.put(name, v.copy(stateDir = newStateDir, deltaPred = newDeltaPred))
    reindex()
    schemaCache.remove(newStateDir)
    ()
  }

  /** Refresh under RETRACTIONS — the CDC posture: the base models an
    * append-only log whose upstream issued deletes for some rows, given
    * here as `deletePred`. After this refresh the view's contract is
    * `agg(base WHERE NOT deletePred)` — a plain user aggregate over the
    * base is served the retraction-folded answer, which is the point of
    * a retraction (those rows are logically gone upstream; the immutable
    * file is just their tombstone-less carrier).
    *
    * Algebra (the `q_incr_delete` repair, inside the refresh fold):
    *   1. fold the rows that LEAVE the delta minus the deleted ones —
    *      `oldPred ∧ ¬newPred ∧ ¬del` — into merge(state ∪ partial(·));
    *   2. aggregate the deleted STATE-REGION rows (`¬oldPred ∧ del`)
    *      into per-group delete partials: COUNT/SUM subtract exactly
    *      (integral partials required — see the guard), and only groups
    *      whose stored extremum was deleted (delete-partial min/max ==
    *      folded min/max) recompute MIN/MAX from surviving rows, pruned
    *      by a broadcast semi-join on the group keys EVALUATED ON BASE
    *      ROWS before the aggregate — untouched groups never rescan
    *      (with state partitioned by key that scan prunes to touched
    *      partitions);
    *   3. groups retracted to zero rows leave the view (detected via the
    *      COUNT partial, which is therefore required).
    *
    * Deletes still inside the NEW delta are refused — the serving delta
    * branch rescans `base WHERE newPred` per query and would resurrect
    * them; advance the cutoff past the retractions instead. Window-keyed
    * views are not supported here (the semi-join evaluates group
    * expressions in a join condition, where `window()` does not
    * resolve); pane retraction is the windowed-IVM algebra
    * (q_incr_window), a different operator.
    *
    * Returns the number of argmax-touched groups (the MIN/MAX recompute
    * set) — the repair-cost observable: everything else subtracted
    * without rescanning. */
  def refreshWithDeletes(spark: SparkSession, name: String,
                         newDeltaPred: Column, deletePred: Column,
                         newStateDir: String): Long = {
    val v = views.getOrElse(name,
      throw new IllegalArgumentException(s"mv $name: not registered"))
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"mv $name: $msg")
    if (v.sessionGap.isDefined)
      fail("a SESSION view cannot retract through the interval merge — " +
        "a deleted event can SPLIT a session; rebuild the view over the " +
        "surviving base instead")
    if (v.distinctOf.isDefined && !v.pairCounts)
      fail("a pair-set DISTINCT view cannot retract — the state stores " +
        "each (group, value) once, so a deleted row's multiplicity is " +
        "lost and a pair may or may not survive; register with " +
        "countedPairs=true (multiplicity-carrying state at 2× pair-state " +
        "cost) or rebuild the view over the surviving base instead")
    requireTotalPredicate(spark, v.base, newDeltaPred, "refresh predicate",
      name)
    requireTotalPredicate(spark, v.base, deletePred, "delete predicate",
      name)
    val base = v.base(spark)
    // bounded probe (limit-1 semantics via isEmpty) over the COMPOSED
    // tombstone history + this statement's deletes
    requireCutoffClearOfDeletes(spark, v, newDeltaPred, Some(deletePred),
      name)
    v.distinctOf.foreach { x =>
      // the multiplicity-carrying pair-set retraction: counts subtract
      // EXACTLY, so the whole refresh is one union of three per-pair
      // count frames — state, moved (+1 each), state-region deletes
      // (−1 each) — summed in ONE pair-key shuffle; pairs reaching zero
      // leave the view. No join, no repair pass: a pair set has no
      // extremum to rescan for. The checkpoint bounds the emptied-pair
      // count + the final write to one fold (the |pairs|-sized frame is
      // the state itself — the same footprint the serving plan carries).
      val stateSchema = schemaCache.getOrElseUpdate(v.stateDir,
        spark.read.parquet(v.stateDir).schema)
      val pairKeys = v.groupCols :+ x.as("__dv")
      val moved = base
        .filter(v.deltaPred &&
          org.apache.spark.sql.functions.not(newDeltaPred) &&
          org.apache.spark.sql.functions.not(deletePred))
        .groupBy(pairKeys: _*)
        .agg(count(lit(1)).as("__dn"))
      val negDels = base
        .filter(org.apache.spark.sql.functions.not(v.deltaPred) && deletePred)
        .groupBy(pairKeys: _*)
        .agg((-count(lit(1))).as("__dn"))
      val summed = spark.read.schema(stateSchema).parquet(v.stateDir)
        .unionByName(moved).unionByName(negDels)
        .groupBy((v.groupNames :+ "__dv").map(col): _*)
        .agg(sum(col("__dn")).as("__dn"))
        .localCheckpoint()
      // a NEGATIVE residual means the caller deleted rows the state
      // never counted — a contract violation worth failing loudly on,
      // because the adjacent pairs' counts are then suspect too
      val negative = summed.filter(col("__dn") < 0).count()
      if (negative > 0)
        fail(s"$negative pair(s) retracted below zero — deletePred " +
          "covers rows outside the view's counted region (state ∪ " +
          "moved); the delete set must be a subset of previously " +
          "folded rows")
      val emptied = summed.filter(col("__dn") === 0).count()
      summed.filter(col("__dn") > 0)
        .write.mode("overwrite").parquet(newStateDir)
      views.put(name, v.copy(stateDir = newStateDir,
        deltaPred = newDeltaPred, retracted = true))
      reindex()
      schemaCache.remove(newStateDir)
      return emptied
    }
    val cntName = v.mergeAgg.collectFirst { case (n, "count") => n }
      .getOrElse(fail("retraction needs a COUNT partial to detect " +
        "groups deleted down to zero rows — register one"))
    // exact subtraction only: a double partial re-summed after a
    // subtract drifts in the last ulp (the BIGINT-cents discipline)
    val stateSchema = schemaCache.getOrElseUpdate(v.stateDir,
      spark.read.parquet(v.stateDir).schema)
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.ByteType)
    v.mergeAgg.foreach { case (n, kind) =>
      if ((kind == "sum" || kind == "count") &&
        !integral.contains(stateSchema(n).dataType))
        fail(s"$n — retraction subtracts partials, which is only exact " +
          "for integral types; store BIGINT (cents) partials")
    }
    // strip registration aliases for join-condition use: an Alias inside
    // a predicate does not analyze
    import org.apache.spark.sql.catalyst.expressions.{Alias => CAlias}
    val bareGroupCols = v.groupCols.map { c =>
      ColumnBridge.expression(c) match {
        case CAlias(child, _) => ColumnBridge.column(child)
        case _ => c
      }
    }

    // 1. the ordinary fold, minus deleted rows. When a MIN/MAX repair
    //    pass follows, the fold is consumed TWICE (the touched-count
    //    driver action and the final write) — one eager localCheckpoint
    //    on the |groups|-sized fold keeps state ∪ delta aggregated once.
    val minMax = v.mergeAgg.filter(m => m._2 == "min" || m._2 == "max")
    val moved = base
      .filter(v.deltaPred &&
        org.apache.spark.sql.functions.not(newDeltaPred) &&
        org.apache.spark.sql.functions.not(deletePred))
      .groupBy(v.groupCols: _*)
      .agg(v.aggCols.head, v.aggCols.tail: _*)
    val folded0 = spark.read.schema(stateSchema).parquet(v.stateDir)
      .unionByName(moved)
      .groupBy(v.groupNames.map(col): _*)
      .agg(mergeCols(v).head, mergeCols(v).tail: _*)
    val folded = if (minMax.nonEmpty) folded0.localCheckpoint() else folded0

    // 2. delete partials from the state region, joined by group key.
    //    Group-key equality must be NULL-SAFE (<=>): a NULL-keyed group
    //    (nullable column, null-producing expression key) exists in the
    //    fold as one group, and its deleted rows must subtract from it —
    //    a null-unsafe join would silently never match them. The delete
    //    side's keys are renamed first (a USING join can't spell <=>).
    val dels = base
      .filter(org.apache.spark.sql.functions.not(v.deltaPred) && deletePred)
      .groupBy(v.groupCols: _*)
      .agg(v.aggCols.head, v.aggCols.tail: _*)
      .select(v.groupNames.map(n => col(n).as(s"__dk_$n")) ++
        v.mergeAgg.map { case (n, _) => col(n).as(s"__d_$n") }: _*)
    val delCond = v.groupNames.map(n => col(n) <=> col(s"__dk_$n"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val joined = folded.join(dels, delCond, "left")
      .drop(v.groupNames.map(n => s"__dk_$n"): _*)

    // touched groups: a deleted extremum equals the folded extremum
    // (=== not <=> HERE: a NULL delete partial means "nothing deleted")
    val touchCond = minMax.map { case (n, _) =>
      col(s"__d_$n") === col(n)
    }.reduceOption(_ || _)
    // survivors exclude EVERY retraction folded so far, not just this
    // statement's — the raw base still carries rows earlier DELETED
    // refreshes removed, and an argmax recompute that rescanned them
    // would resurrect a deleted extremum
    val allDeleted = v.deletedSoFar
      .map(_ || deletePred).getOrElse(deletePred)
    val survivors = base.filter(
      org.apache.spark.sql.functions.not(newDeltaPred) &&
        org.apache.spark.sql.functions.not(allDeleted))
    var touchedGroups = 0L
    val repaired: Option[DataFrame] = touchCond.map { tc =>
      val touched = joined.filter(tc).select(v.groupNames.map(col): _*)
      touchedGroups = touched.count()
      // semi-join BEFORE the aggregate: group keys evaluated on base
      // rows against the (broadcast) touched set — the scan feeds only
      // touched-group rows into the recompute shuffle. The touched side
      // is renamed to reserved names first: a plain group column exists
      // on BOTH sides and a bare reference would be ambiguous. Null-safe
      // equality again: a touched NULL-keyed group must capture its
      // NULL-keyed base rows.
      val touchedKeys = touched.select(v.groupNames.map(n =>
        col(n).as(s"__t_$n")): _*)
      val joinCond = bareGroupCols.zip(v.groupNames).map { case (c, n) =>
        c <=> col(s"__t_$n")
      }.reduce(_ && _)
      val minMaxAggs = v.aggCols.zip(v.mergeAgg).collect {
        case (c, (_, k)) if k == "min" || k == "max" => c
      }
      survivors
        .join(broadcast(touchedKeys), joinCond, "left_semi")
        .groupBy(v.groupCols: _*)
        .agg(minMaxAggs.head, minMaxAggs.tail: _*)
        .select(v.groupNames.map(n => col(n).as(s"__rk_$n")) ++
          minMax.map { case (n, _) => col(n).as(s"__r_$n") }: _*)
    }
    val withRepair = repaired.fold(joined) { r =>
      val repCond = v.groupNames.map(n => col(n) <=> col(s"__rk_$n"))
        .reduceOption(_ && _).getOrElse(lit(true))
      joined.join(broadcast(r), repCond, "left")
        .drop(v.groupNames.map(n => s"__rk_$n"): _*)
    }

    // 3. subtract / repair / drop emptied groups, restore column order
    val outAggs = v.mergeAgg.map {
      case (n, k) if k == "min" || k == "max" =>
        // a repaired value exists exactly for argmax-touched groups;
        // an emptied group's NULL repair is dropped by the cnt filter
        if (touchCond.isDefined)
          when(col(s"__d_$n") === col(n), col(s"__r_$n"))
            .otherwise(col(n)).as(n)
        else col(n).as(n)
      case (n, _) =>
        (col(n) - coalesce(col(s"__d_$n"), lit(0L)))
          .cast(stateSchema(n).dataType).as(n)
    }
    withRepair
      .select(v.groupNames.map(col) ++ outAggs: _*)
      .filter(col(cntName) > 0)
      .write.mode("overwrite").parquet(newStateDir)
    // retraction REDEFINES the view's contract — agg(base WHERE NOT
    // deleted), no longer agg(base). The view keeps serving its OWN
    // declared signature (the caller who registered those keys owns the
    // contract), but it must leave the GLOBAL-serving pool: a keyless
    // query matches ANY view of the base, and silently adopting one
    // view's retraction history — chosen by registry iteration order —
    // is the wrong-answer-served-silently failure mode.
    views.put(name, v.copy(stateDir = newStateDir,
      deltaPred = newDeltaPred, retracted = true,
      deletedSoFar = Some(allDeleted)))
    reindex()
    schemaCache.remove(newStateDir)
    touchedGroups
  }

  /** Install the rewrite rule into an existing session's optimizer (the
    * runtime path; config-built sessions get it from
    * [[graft.GraftExtensions]]). Idempotent.
    */
  def install(spark: SparkSession): Unit = synchronized {
    // extension-built sessions already carry the rule via
    // injectOptimizerRule — appending it to extraOptimizations too would
    // run the whole transformUp twice per optimization for nothing
    val injected = spark.sessionState.optimizer.batches
      .exists(_.rules.exists(_ eq MaterializedViewRewrite))
    val cur = spark.experimental.extraOptimizations
    if (!injected && !cur.exists(_ eq MaterializedViewRewrite))
      spark.experimental.extraOptimizations = cur :+ MaterializedViewRewrite
  }

  /** The serving plan, rebuilt fresh per rewrite: merge(state ∪
    * partial(Δ)), with the pull predicate (when present) applied to BOTH
    * branches below their aggregates so it reaches the parquet scans.
    * The definition condition needs no re-application — rebuilding the
    * definition's delta aggregate re-inserts it at analysis, and the
    * state artifact was built under it.
    */
  private def servingPlan(spark: SparkSession, v: MvView,
                          extraCond: Option[Expression],
                          windowCond: Option[Expression] = None): LogicalPlan = {
    val condCol = extraCond.map { c =>
      ColumnBridge.column(c.transformUp {
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      })
    }
    // WINDOWSTART/WINDOWEND pull bounds (already rebuilt over the pane
    // struct by name — rewriteWindowBound): the state scan filters
    // directly on its stored pane column; the delta side applies ABOVE
    // the delta pre-aggregate, where the pane struct exists by name, and
    // Catalyst pushes it through the aggregate into the raw scan (the
    // pane derivation is the grouping key, so the predicate commutes)
    val winCol = windowCond.map(ColumnBridge.column)
    val stateSchema = schemaCache.getOrElseUpdate(v.stateDir,
      spark.read.parquet(v.stateDir).schema)
    var state = spark.read.schema(stateSchema).parquet(v.stateDir)
    var delta = v.base(spark).filter(v.deltaPred)
    condCol.foreach { c => state = state.filter(c); delta = delta.filter(c) }
    winCol.foreach { c => state = state.filter(c) }
    val analyzed = (v.distinctOf match {
      case Some(x) =>
        // pair-set serving: distinct(state-pairs ∪ distinct(Δ-pairs)) —
        // the delta pre-deduplicates map-side, re-seen pairs collapse
        // into the state, and the count never replays base events
        // (count(__dv) skips NULL values, matching COUNT(DISTINCT)).
        // A multiplicity-carrying state serves identically — the count
        // column is maintenance-only metadata and drops here (every
        // surviving pair has count ≥ 1 by the refresh contract).
        val outName = v.mergeAgg.head._1
        val statePairs = if (v.pairCounts) state.drop("__dn") else state
        val deltaPairs = delta
          .select(v.groupCols :+ x.as("__dv"): _*).distinct()
        statePairs.unionByName(deltaPairs).distinct()
          .groupBy(v.groupNames.map(col): _*)
          .agg(count(col("__dv")).as(outName))
      case None =>
        var deltaPart = delta.groupBy(v.groupCols: _*)
          .agg(v.aggCols.head, v.aggCols.tail: _*)
        winCol.foreach { c => deltaPart = deltaPart.filter(c) }
        val merges = mergeCols(v)
        state.unionByName(deltaPart)
          .groupBy(v.groupNames.map(col): _*)
          .agg(merges.head, merges.tail: _*)
    }).queryExecution.analyzed
    // The substitution happens mid-/post-optimization, so the fresh
    // subtree would otherwise skip the standard normalization passes —
    // costing real things: an unfolded `cast('2001-01-01' AS ...)` in the
    // delta predicate is not translatable to a parquet source filter, and
    // a no-op `cast(floor(x) AS bigint)` inside the aggregate breaks the
    // codegen method-split's subexpression signature (interpreted
    // fallback). Run the session optimizer over the serving plan itself:
    // re-entry is safe because every aggregate inside it bails out of the
    // rewrite (the delta branch carries the non-group delta conjunct —
    // enforced at registration — and the merge reads state ∪ base paths).
    spark.sessionState.optimizer.execute(analyzed)
  }

  /** Attempt the substitution for one Aggregate node. Several views may
    * share a base (the orders rollup and a priority rollup over the
    * same parquet) — every path-matching view gets a chance, first
    * successful rewrite wins. A grouping-sets aggregate (ROLLUP / CUBE /
    * GROUPING SETS — recognizable by the spark_grouping_id key over an
    * Expand) takes its own path: one re-aggregation branch per set. */
  private[plans] def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    if (views.isEmpty) return None
    if (agg.groupingExpressions.exists(!_.deterministic) ||
      agg.aggregateExpressions.exists(!_.deterministic)) return None
    agg.child match {
      // hopping windows also plan as Expand-under-Aggregate but carry no
      // grouping id — they stay on the shape-key path below
      case ex: Expand if agg.groupingExpressions.exists(isGroupingId) =>
        return tryRewriteGroupingSets(agg, ex)
      case _ => ()
    }
    // SESSION-window aggregates (a session-marked grouping attribute)
    // take their own path: per-key partial merge is unsound for them,
    // so they only ever match SESSION views' interval-repair serving
    if (agg.groupingExpressions.exists(isSessionKeyed))
      return tryRewriteSession(agg)
    unwrap(agg.child).flatMap { case (paths, inline, condOpt, shape) =>
      candidates(paths).view
        .filter(v => v.basePaths == paths && v.shapeKey == shape)
        .flatMap(v => rewriteWith(v, agg, inline, condOpt).map { plan =>
          served.getOrElseUpdate(v.name,
            new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
          plan
        })
        .headOption
    }
  }

  /** Serve a user's PLAIN session_window aggregate from a registered
    * SESSION view: the grouping set must equal the view's keys — the
    * session struct matching BY NORMALIZED RENDERING (which pins the
    * time column AND the gap: they are literals inside the struct
    * expression), plain keys by the usual norm — with the standard
    * conjunct discipline (definition conjuncts required, extras only on
    * plain group columns → the pull predicate, pushed into both
    * branches of the interval repair). Outputs map through the same
    * mapOutput machinery as flat views: the rebuilt "__session" struct
    * substitutes for the session key, so passthroughs AND derived
    * expressions (unix_millis(session.start), WINDOWSTART/WINDOWEND
    * projections) serve alike. Anything unmatched refuses — the query
    * stays correct, just unserved. */
  private def tryRewriteSession(agg: Aggregate): Option[LogicalPlan] = {
    unwrap(agg.child).flatMap { case (paths, inline, condOpt, shape) =>
      if (shape.nonEmpty) return None
      candidates(paths).view
        .filter(v => v.sessionGap.isDefined && v.basePaths == paths)
        .flatMap(v => rewriteSessionWith(v, agg, inline, condOpt).map {
          plan =>
            served.getOrElseUpdate(v.name,
              new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
            plan
        })
        .headOption
    }
  }

  private def rewriteSessionWith(v: MvView, agg: Aggregate,
                                 inline: Expression => Expression,
                                 condOpt: Option[Expression])
    : Option[LogicalPlan] = {
    // group signature: exact set equality over ALL grouping expressions
    // — the session struct's norm and the plain keys together must equal
    // the registered key set (no GLOBAL/subset forms: collapsing
    // sessions re-aggregates across windows, a different query)
    val gKeys = agg.groupingExpressions.flatMap(e => norm(inline(e)))
    if (gKeys.size != agg.groupingExpressions.size ||
      gKeys.toSet != v.groupKeys) return None
    val userConjs = condOpt.map(conjuncts).getOrElse(Nil)
    val userKeys = userConjs.map(norm)
    if (userKeys.exists(_.isEmpty)) return None
    val keyed = userConjs.zip(userKeys.flatten)
    val (defMatched, extra) = keyed.partition {
      case (_, k) => v.defCondKeys.contains(k)
    }
    if (defMatched.map(_._2).toSet != v.defCondKeys) return None
    val extraOk = extra.forall { case (c, _) =>
      c.references.forall(a =>
        v.plainGroupNames.contains(a.name.toLowerCase(Locale.ROOT)))
    }
    if (!extraOk) return None
    val extraCond = extra.map(_._1).reduceOption(And)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap { spark =>
        val rep = sessionServingPlan(spark, v, extraCond)
        val mapped: Seq[Option[NamedExpression]] =
          agg.aggregateExpressions.map { ne =>
            val inner = ne match { case Alias(c, _) => c; case e => e }
            mapOutput(v, rep, inline(inner))
              .map(e => Alias(e, ne.name)(exprId = ne.exprId))
          }
        if (mapped.exists(_.isEmpty)) None
        else Some(Project(mapped.flatten, rep))
      }
  }

  private def isGroupingId(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == "spark_grouping_id"
    case _ => false
  }

  /** Does this expression carry a session-window key? The analyzer's
    * SessionWindowing rule rewrites the SessionWindow expression into a
    * marker-metadata'd attribute over a per-row struct Project by the
    * time any rule sees the Aggregate — detect either form. */
  private def isSessionKeyed(e: Expression): Boolean = e.exists {
    case a: AttributeReference => a.metadata.contains(SessionWindow.marker)
    case _: SessionWindow => true
    case _ => false
  }

  /** Serve a GROUPING-SETS aggregate (ROLLUP / CUBE / GROUPING SETS)
    * from a registered per-key view: Spark plans these as
    * `Aggregate(keys ∪ {spark_grouping_id}, Expand(one row per set,
    * base))` where each Expand row carries the set's keys (NULL for the
    * dropped ones) and the set's grouping-id literal. Every grouping
    * set is a re-aggregation of the merged view (the same algebra as
    * the global rewrite — the finest set re-aggregates singleton groups,
    * coarser sets collapse them, the grand total drops all keys), so the
    * serving plan is a UNION of per-set re-aggregates over ONE shared
    * merge(state ∪ Δ) subtree — |sets| × |state| rows reduced, history
    * never rescanned. Requirements, each refusing on failure: every
    * set's key expressions must be registered group keys (a SUBSET of
    * the view's keys is fine — the view is finer), aggregate children
    * must be Expand passthroughs mapping to registered aggregates, and
    * the usual conjunct/pull-predicate rules apply below the Expand.
    * Outputs may reference the grouping-id (GROUPING()/GROUPING_ID()
    * plan as bit math over it) — per branch it is a literal and the
    * derived expression folds. */
  private def tryRewriteGroupingSets(agg: Aggregate,
                                     ex: Expand): Option[LogicalPlan] = {
    // the grouping keys: the gid attribute + the set-key attributes,
    // all of which must be Expand outputs
    val gidAttr = agg.groupingExpressions.collectFirst {
      case a: AttributeReference if isGroupingId(a) => a
    }.get
    val outIdx: Map[Long, Int] =
      ex.output.zipWithIndex.map { case (a, i) => a.exprId.id -> i }.toMap
    val groupAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference if !isGroupingId(a) => a
    }
    if (groupAttrs.size != agg.groupingExpressions.size - 1) return None
    if (groupAttrs.exists(a => !outIdx.contains(a.exprId.id)) ||
      !outIdx.contains(gidAttr.exprId.id)) return None

    unwrap(ex.child).flatMap { case (paths, inline, condOpt, shape) =>
      if (shape.nonEmpty) return None
      // per grouping-set row: which key positions are kept, and the
      // grouping-id literal. A kept position's expression must be
      // IDENTICAL (by normalized form) across every row that keeps it.
      val gidIdx = outIdx(gidAttr.exprId.id)
      val rows: Seq[(Set[Int], Long)] = ex.projections.map { row =>
        val gid = row(gidIdx) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
          case _ => return None
        }
        val kept = groupAttrs.indices.filter { i =>
          row(outIdx(groupAttrs(i).exprId.id)) match {
            case Literal(null, _) => false
            case _ => true
          }
        }.toSet
        (kept, gid)
      }
      // normalized key per group position (from any row keeping it)
      val posKey: Seq[Option[String]] = groupAttrs.indices.map { i =>
        val exprs = ex.projections.flatMap { row =>
          row(outIdx(groupAttrs(i).exprId.id)) match {
            case Literal(null, _) => None
            case e => norm(inline(e))
          }
        }
        if (exprs.isEmpty || exprs.distinct.size != 1) None
        else Some(exprs.head)
      }
      if (posKey.exists(_.isEmpty)) return None
      val posKeys = posKey.flatten
      // passthrough map: Expand outputs whose expression is the SAME
      // child attribute in every row — the columns aggregate functions
      // read through the Expand
      val passMap: Map[Long, Expression] = ex.output.zipWithIndex.flatMap {
        case (o, i) =>
          val exprs = ex.projections.map(_(i))
          exprs.head match {
            case ar: AttributeReference
                if exprs.forall(_ == exprs.head) =>
              Some(o.exprId.id -> inline(ar))
            case _ => None
          }
      }.toMap

      candidates(paths).view.filter(v =>
        v.basePaths == paths && v.shapeKey == Nil && v.distinctOf.isEmpty &&
          posKeys.forall(v.groupKeys.contains))
        .flatMap { v =>
          rewriteGroupingSetsWith(v, agg, rows, posKeys, groupAttrs,
            gidAttr, passMap, condOpt).map { plan =>
            served.getOrElseUpdate(v.name,
              new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
            plan
          }
        }
        .headOption
    }
  }

  private def rewriteGroupingSetsWith(v: MvView, agg: Aggregate,
      rows: Seq[(Set[Int], Long)], posKeys: Seq[String],
      groupAttrs: Seq[AttributeReference], gidAttr: AttributeReference,
      passMap: Map[Long, Expression],
      condOpt: Option[Expression]): Option[LogicalPlan] = {
    // conjunct discipline below the Expand, same as the flat path
    val userConjs = condOpt.map(conjuncts).getOrElse(Nil)
    val userKeys = userConjs.map(norm)
    if (userKeys.exists(_.isEmpty)) return None
    val keyed = userConjs.zip(userKeys.flatten)
    val (defMatched, extra) = keyed.partition {
      case (_, k) => v.defCondKeys.contains(k)
    }
    if (defMatched.map(_._2).toSet != v.defCondKeys) return None
    if (!extra.forall { case (c, _) => c.references.forall(a =>
      v.plainGroupNames.contains(a.name.toLowerCase(Locale.ROOT))) })
      return None
    val extraCond = extra.map(_._1).reduceOption(And)

    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap { spark =>
        val kinds = v.mergeAgg.toMap
        // inline the user outputs through the Expand passthroughs so
        // aggregate subtrees render over relation attributes; group/gid
        // attrs survive untouched for the per-branch cases
        def preInline(e: Expression): Expression = e.transformUp {
          case ar: AttributeReference if passMap.contains(ar.exprId.id) =>
            passMap(ar.exprId.id)
        }
        val setAttrIds = (groupAttrs :+ gidAttr).map(_.exprId).toSet
        // pre-check every aggregate maps (the mapGlobalOutput contract:
        // an unmapped aggregate left in place would aggregate VIEW rows).
        // An aggregate over a SET-KEY copy (count(group_col) through the
        // Expand) is NULL-patterned per set — its per-branch semantics
        // differ from the registered base aggregate, so it refuses.
        val mappable = agg.aggregateExpressions.forall { ne =>
          val inner = ne match { case Alias(c, _) => c; case e => e }
          preInline(inner).collect {
            case ae: AggregateExpression => ae
          }.forall {
            case ae if ae.references.exists(a => setAttrIds.contains(a.exprId)) =>
              false
            case ae @ AggregateExpression(a: Average, _, false, None, _) =>
              (for {
                sk <- norm(Sum(a.child).toAggregateExpression())
                ck <- norm(Count(Seq(a.child)).toAggregateExpression())
              } yield v.aggKeyToName.contains(sk) &&
                v.aggKeyToName.contains(ck) &&
                ae.dataType == DoubleType).getOrElse(false)
            case ae =>
              !ae.isDistinct && ae.filter.isEmpty &&
                norm(ae).exists(v.aggKeyToName.contains)
          }
        }
        if (!mappable) return None

        // one re-aggregation branch per grouping set, each over its OWN
        // freshly-built serving subtree (fresh attribute ids — a shared
        // subtree would self-union identical exprIds; Catalyst's
        // exchange reuse still dedupes the identical scans at runtime
        // by canonical equality)
        val branches: Seq[Option[LogicalPlan]] = rows.map { case (kept, gid) =>
          val rep = servingPlan(spark, v, extraCond)
          val repByName = rep.output
            .map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap
          def repAttr(n: String): Attribute =
            repByName(n.toLowerCase(Locale.ROOT))
          val posRepAttr: Seq[Attribute] =
            posKeys.map(k => repAttr(v.groupKeyToName(k)))
          def go(e: Expression): Expression = e match {
            case ar: AttributeReference if ar.exprId == gidAttr.exprId =>
              // the parse side accepts Int-typed gid literals, so the
              // rebuilt literal must coerce the Long back to the
              // attribute's own type — Literal(gid, IntegerType) would
              // construct a malformed Long-valued IntegerType literal
              // that ClassCastExceptions at execution
              ar.dataType match {
                case org.apache.spark.sql.types.IntegerType =>
                  Literal(gid.toInt, ar.dataType)
                case _ => Literal(gid, ar.dataType)
              }
            case ar: AttributeReference
                if groupAttrs.exists(_.exprId == ar.exprId) =>
              val i = groupAttrs.indexWhere(_.exprId == ar.exprId)
              if (kept(i)) posRepAttr(i)
              else Literal.create(null, ar.dataType)
            case AggregateExpression(a: Average, _, false, None, _) =>
              val sn = v.aggKeyToName(
                norm(Sum(a.child).toAggregateExpression()).get)
              val cn = v.aggKeyToName(
                norm(Count(Seq(a.child)).toAggregateExpression()).get)
              Divide(
                Cast(Sum(repAttr(sn)).toAggregateExpression(), DoubleType),
                Cast(Sum(repAttr(cn)).toAggregateExpression(), DoubleType))
            case ae: AggregateExpression =>
              val n = v.aggKeyToName(norm(ae).get)
              val a = repAttr(n)
              kinds(n) match {
                case "min" => Min(a).toAggregateExpression()
                case "max" => Max(a).toAggregateExpression()
                case "count" => Coalesce(Seq(
                  Sum(a).toAggregateExpression(),
                  Literal.create(0L, a.dataType)))
                case _ => Sum(a).toAggregateExpression()
              }
            case other => other.mapChildren(go)
          }
          val outs: Seq[Option[NamedExpression]] =
            agg.aggregateExpressions.map { ne =>
              val inner = ne match { case Alias(c, _) => c; case e => e }
              val mapped = go(preInline(inner))
              val ok = mapped.resolved &&
                mapped.references.forall(a =>
                  rep.output.exists(_.exprId == a.exprId)) &&
                (try mapped.dataType.catalogString ==
                  inner.dataType.catalogString
                catch { case scala.util.control.NonFatal(_) => false })
              if (ok) Some(Alias(mapped, ne.name)()) else None
            }
          if (outs.exists(_.isEmpty)) None
          else Some(Aggregate(
            kept.toSeq.sorted.map(posRepAttr(_): Expression),
            outs.flatten, rep))
        }
        if (branches.exists(_.isEmpty)) None
        else {
          val union = branches.flatten.reduceLeft[LogicalPlan](
            (l, r) => org.apache.spark.sql.catalyst.plans.logical.Union(l, r))
          // bind the union's outputs back to the user's attribute ids
          val bound = union.output.zip(agg.aggregateExpressions).map {
            case (a, ne) => Alias(a, ne.name)(exprId = ne.exprId)
          }
          Some(Project(bound, union))
        }
      }
  }

  /** Re-express one user output over the merged view's attributes:
    * every maximal registered subtree (group key, whole aggregate)
    * becomes the corresponding merged attribute, avg(e) becomes
    * sum(e)/count(e) when both constituents are registered. Refuses
    * unless the result consumed every base reference, contains no
    * leftover aggregate, and kept the original type.
    */
  private def mapOutput(v: MvView, rep: LogicalPlan,
                        inlined: Expression): Option[Expression] = {
    val byName = rep.output
      .map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap
    def attr(n: String): Attribute = byName(n.toLowerCase(Locale.ROOT))
    val replaced = inlined.transformDown {
      // AVG divergence note: the served value is CAST(exact BIGINT sum
      // AS DOUBLE) / CAST(count AS DOUBLE), while Spark's native Average
      // over integral input ACCUMULATES the sum in DOUBLE. Below 2^53
      // the two are bit-identical (double-accumulating integers is
      // exact there); above 2^53 the native accumulation can round
      // per-step while the served sum rounds ONCE at the final cast, so
      // the two plans may differ in the last ulp — the served value is
      // the more accurate of the pair, but results become
      // plan-dependent. Registrations whose per-group integral totals
      // can plausibly exceed 2^53 (~9e15 — e.g. >9e13 rows of 100-unit
      // values in ONE group) should not rely on avg reconstruction.
      case ae @ AggregateExpression(a: Average, _, false, None, _) =>
        (for {
          sk <- norm(Sum(a.child).toAggregateExpression())
          ck <- norm(Count(Seq(a.child)).toAggregateExpression())
          sn <- v.aggKeyToName.get(sk)
          cn <- v.aggKeyToName.get(ck)
          if ae.dataType == DoubleType
        } yield Divide(Cast(attr(sn), DoubleType), Cast(attr(cn), DoubleType))
        ).getOrElse(ae)
      case sub =>
        norm(sub).flatMap(k => v.groupKeyToName.get(k)
          .orElse(v.aggKeyToName.get(k))).map(n => attr(n): Expression)
          .getOrElse(sub)
    }
    // leftover name placeholders (above-Expand references that matched
    // nothing) leave the tree unresolved — bail before touching exprIds
    if (!replaced.resolved) return None
    val repIds = rep.output.map(_.exprId).toSet
    val complete = replaced.references.forall(a => repIds.contains(a.exprId))
    val noAgg = !replaced.exists(_.isInstanceOf[AggregateExpression])
    // catalogString comparison = type equality ignoring nullability (the
    // parquet state's struct fields are nullable where the live window
    // struct's are not; values are identical)
    val typeOk =
      try replaced.dataType.catalogString == inlined.dataType.catalogString
      catch { case scala.util.control.NonFatal(_) => false }
    if (complete && noAgg && typeOk) Some(replaced) else None
  }

  /** Re-express one output of a GLOBAL (no-key) user aggregate as a
    * re-aggregation of the merged view: the view holds one merged
    * partial row per group, and the distributive set re-aggregates
    * losslessly across groups — SUM/COUNT by summing the partials
    * (COUNT coalesced to 0: count over an empty input is 0 while SUM
    * over the empty view is NULL), MIN/MAX by themselves, AVG as
    * total-sum / total-count (NULL over the empty view on both — the
    * unserved plan's avg over zero rows is NULL too). DOUBLE-typed SUM
    * partials re-sum here in a different order than the unserved plan
    * (per-group subtotals vs one global accumulation) — last-ulp
    * plan-dependence, the same class as any Spark re-aggregation; the
    * repo-wide BIGINT-cents discipline is the exact spelling. Every
    * AggregateExpression in the output must map, or the whole output
    * refuses — an unmapped count(*) left in place would count VIEW
    * GROUPS, not base rows, which is exactly the silent-wrong-answer
    * failure mode the bail-outs exist to prevent. */
  private def mapGlobalOutput(v: MvView, rep: LogicalPlan,
                              inlined: Expression): Option[Expression] = {
    val byName = rep.output
      .map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap
    def attr(n: String): Attribute = byName(n.toLowerCase(Locale.ROOT))
    val kinds = v.mergeAgg.toMap
    // pre-check EVERY aggregate subtree maps (nested aggregates are
    // impossible, so collect is exhaustive and the transform total)
    val mappable = inlined.collect {
      case ae: AggregateExpression => ae
    }.forall {
      case ae @ AggregateExpression(a: Average, _, false, None, _) =>
        (for {
          sk <- norm(Sum(a.child).toAggregateExpression())
          ck <- norm(Count(Seq(a.child)).toAggregateExpression())
        } yield v.aggKeyToName.contains(sk) && v.aggKeyToName.contains(ck) &&
          ae.dataType == DoubleType).getOrElse(false)
      case ae =>
        !ae.isDistinct && ae.filter.isEmpty &&
          norm(ae).exists(v.aggKeyToName.contains)
    }
    if (!mappable) return None
    // explicit recursion, NOT transformDown: the replacements contain
    // fresh AggregateExpressions over view attributes, and transformDown
    // re-descends into its own replacements — a (pathological) key
    // collision would then rewrite the rewritten. Replaced subtrees are
    // final here.
    def go(e: Expression): Expression = e match {
      case AggregateExpression(a: Average, _, false, None, _) =>
        val sn = v.aggKeyToName(norm(Sum(a.child).toAggregateExpression()).get)
        val cn = v.aggKeyToName(
          norm(Count(Seq(a.child)).toAggregateExpression()).get)
        Divide(
          Cast(Sum(attr(sn)).toAggregateExpression(), DoubleType),
          Cast(Sum(attr(cn)).toAggregateExpression(), DoubleType))
      case ae: AggregateExpression =>
        val n = v.aggKeyToName(norm(ae).get)
        val a = attr(n)
        kinds(n) match {
          case "min" => Min(a).toAggregateExpression()
          case "max" => Max(a).toAggregateExpression()
          case "count" => Coalesce(Seq(
            Sum(a).toAggregateExpression(),
            Literal.create(0L, a.dataType)))
          case _ => Sum(a).toAggregateExpression()
        }
      // a group key referenced OUTSIDE an aggregate can't appear in a
      // global aggregate (the analyzer rejects it), and one INSIDE an
      // aggregate fails the mappable pre-check above — nothing to do
      case other => other.mapChildren(go)
    }
    val replaced = go(inlined)
    if (!replaced.resolved) return None
    val repIds = rep.output.map(_.exprId).toSet
    val complete = replaced.references.forall(a => repIds.contains(a.exprId))
    val typeOk =
      try replaced.dataType.catalogString == inlined.dataType.catalogString
      catch { case scala.util.control.NonFatal(_) => false }
    if (complete && typeOk) Some(replaced) else None
  }

  /** For a TUMBLING-windowed view: (pane column name, norm of the
    * pane-start expression over the base, norm of pane-end). Derived
    * from the definition's own analyzed+optimized aggregate — the
    * optimizer collapses the TimeWindowing projects exactly the way it
    * collapses them under a user aggregate before pushing a WINDOWSTART
    * filter below it, so the two renderings compare equal. Hopping
    * panes plan through an Expand (no single struct-alias project) and
    * are not derivable this way — a hopping view just refuses the bound
    * and the query falls back to the correct full recompute. Cache key
    * includes the state dir: registries re-register names across spec
    * runs. */
  private val winNormCache =
    TrieMap.empty[String, Option[(String, String, String)]]
  private def windowKeyNorms(spark: SparkSession, v: MvView)
    : Option[(String, String, String)] =
    winNormCache.getOrElseUpdate(v.name + "|" + v.stateDir, try {
      // ANALYZED plan + the unwrap inliner, NOT the session optimizer:
      // optimizing the definition here would re-enter this very rule on
      // the definition's own aggregate (exact match → servingPlan →
      // optimize → …). TimeWindowing is an analyzer rule, so the
      // analyzed struct already carries the same pane arithmetic the
      // optimizer pushes below a user aggregate; inline maps it onto
      // base attributes exactly like the user side's unwrap did.
      val def0 = v.base(spark).groupBy(v.groupCols: _*)
        .agg(v.aggCols.head, v.aggCols.tail: _*)
      val analyzed = def0.queryExecution.analyzed
      val out = for {
        a <- analyzed.collectFirst { case a: Aggregate => a }
        winAttr <- a.groupingExpressions.collectFirst {
          case attr: AttributeReference if (attr.dataType match {
            case st: StructType =>
              st.fieldNames.sameElements(Array("start", "end"))
            case _ => false
          }) => attr
        }
        (_, inline, _, _) <- unwrap(a.child)
        struct <- Some(inline(winAttr)).collect {
          case cns: CreateNamedStruct => cns }
        sN <- norm(struct.valExprs.head)
        eN <- norm(struct.valExprs(1))
      } yield (winAttr.name, sN, eN)
      out
    } catch { case scala.util.control.NonFatal(_) => None })

  /** Rebuild a pushed-down WINDOWSTART/WINDOWEND conjunct over the
    * serving plan's pane struct: every `unix_millis(<pane start/end
    * derivation over the time column>)` subtree becomes
    * `unix_millis(<pane col>.start|end)` by name; a conjunct with any
    * OTHER base reference left over is not a pure window bound and
    * refuses (None → the whole rewrite refuses, the query stays a
    * correct full recompute). */
  private def rewriteWindowBound(c: Expression, winName: String,
      startNorm: String, endNorm: String): Option[Expression] = {
    def pane(field: String): Expression = UnixMillis(UnresolvedExtractValue(
      UnresolvedAttribute.quoted(winName), Literal(field)))
    val out = c.transformUp {
      case u: UnixMillis => norm(u.child) match {
        case Some(n) if n == startNorm => pane("start")
        case Some(n) if n == endNorm => pane("end")
        case _ => u
      }
    }
    if (out.exists { case _: AttributeReference => true; case _ => false })
      None
    else Some(out)
  }

  /** HOPPING flavor (round 17): sliding panes plan through an Expand, so
    * a WINDOWSTART/WINDOWEND bound can NOT push below it — the conjunct
    * arrives still referencing the pane attribute, which the unwrap's
    * Expand case re-expressed as a lowercased NAME MARKER (exprId 0).
    * The shape-key match already proved the user's pane derivation IS
    * the view's (the Expand projections' window structs norm-compared
    * equal), so rebuilding every `marker.start|end` extraction over the
    * serving plan's stored pane column BY NAME is exact. Any other
    * reference left over means the conjunct is not a pure window bound
    * and refuses (None → full-recompute fallback, correct but unserved). */
  private def rewriteMarkerBound(c: Expression, winName: String)
      : Option[Expression] = {
    val out = c.transformUp {
      case g: GetStructField if (g.child match {
          case a: AttributeReference =>
            a.name.equalsIgnoreCase(winName) && (a.dataType match {
              case st: StructType =>
                st.fieldNames.sameElements(Array("start", "end"))
              case _ => false
            })
          case _ => false
        }) =>
        UnresolvedExtractValue(UnresolvedAttribute.quoted(winName),
          Literal(if (g.ordinal == 0) "start" else "end"))
    }
    if (out.exists { case _: AttributeReference => true; case _ => false })
      None
    else Some(out)
  }

  /** The stored pane column of a windowed view: the unique group output
    * whose STATE type is a {start, end} struct. Resolved from the state
    * schema (already cached for serving) — no definition re-analysis. */
  private def paneColName(spark: SparkSession, v: MvView): Option[String] = {
    val st = schemaCache.getOrElseUpdate(v.stateDir,
      spark.read.parquet(v.stateDir).schema)
    val panes = st.fields.filter(f => v.groupNames.contains(f.name) &&
      (f.dataType match {
        case s: StructType => s.fieldNames.sameElements(Array("start", "end"))
        case _ => false
      }))
    if (panes.length == 1) Some(panes.head.name) else None
  }

  private def rewriteWith(v: MvView, agg: Aggregate,
                          inline: Expression => Expression,
                          condOpt: Option[Expression]): Option[LogicalPlan] = {
    // group signature: exact set equality over normalized keys — OR the
    // GLOBAL case (no grouping at all), served by re-aggregating the view
    val gKeys = agg.groupingExpressions.flatMap(e => norm(inline(e)))
    val global = agg.groupingExpressions.isEmpty && v.groupNames.nonEmpty
    if (!global && (gKeys.size != agg.groupingExpressions.size ||
      gKeys.toSet != v.groupKeys)) return None
    // a RETRACTED view answers agg(base WHERE NOT deleted), not
    // agg(base) — it serves only its own declared key signature (that
    // contract belongs to whoever registered the keys); a keyless query
    // matches ANY view of the base, and adopting one view's retraction
    // history by registry iteration order would be silently wrong
    if (global && v.retracted) return None
    // crossed-filter conjuncts: every definition conjunct must be
    // present (a windowed aggregate without the analyzer's isnotnull
    // has different null semantics than the state), and anything extra
    // must constrain plain group columns (the pull predicate)
    val userConjs = condOpt.map(conjuncts).getOrElse(Nil)
    val userKeys = userConjs.map(norm)
    if (userKeys.exists(_.isEmpty)) return None
    val keyed = userConjs.zip(userKeys.flatten)
    val (defMatched, extra) = keyed.partition {
      case (_, k) => v.defCondKeys.contains(k)
    }
    if (defMatched.map(_._2).toSet != v.defCondKeys) return None
    // extras split two ways: plain group-column conjuncts (the classic
    // pull predicate, pushed into both RAW branches by name) and
    // WINDOWSTART/WINDOWEND bounds (round 16 — the ksqlDB windowed-pull
    // idiom `WHERE WINDOWSTART >= x AND WINDOWSTART < y`, which the
    // optimizer pushes below the user aggregate as unix_millis over the
    // pane-start derivation). Window bounds become a PANE-RANGE pull
    // predicate: filtered on the stored pane struct in the state branch
    // and above the delta pre-aggregate (→ pushed into the raw delta
    // scan). Anything neither plain nor a window bound refuses.
    val (plainExtra, windowExtra) = extra.partition { case (c, _) =>
      c.references.forall(a =>
        v.plainGroupNames.contains(a.name.toLowerCase(Locale.ROOT)))
    }
    if (windowExtra.nonEmpty && v.distinctOf.isDefined) return None
    val extraCond = plainExtra.map(_._1).reduceOption(And)

    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap { spark =>
        val windowCond: Option[Option[Expression]] =
          if (windowExtra.isEmpty) Some(None)
          else windowKeyNorms(spark, v) match {
            case Some((wn, sN, eN)) =>
              val rs = windowExtra.map { case (c, _) =>
                rewriteWindowBound(c, wn, sN, eN) }
              if (rs.forall(_.isDefined)) Some(rs.flatten.reduceOption(And))
              else None
            case None =>
              // HOPPING: the bound stayed ABOVE the Expand (panes differ
              // per projection row, so it can't push through) and inlined
              // to the name-marker form — rebuild it over the stored pane
              // column. Tumbling conjuncts (derivation form) never match
              // the marker rewrite and refuse here, as before.
              paneColName(spark, v).flatMap { wn =>
                val rs = windowExtra.map { case (c, _) =>
                  rewriteMarkerBound(c, wn) }
                if (rs.forall(_.isDefined)) Some(rs.flatten.reduceOption(And))
                else None
              }
          }
        windowCond.flatMap { winCond =>
        val rep = servingPlan(spark, v, extraCond, winCond)
        val mapped: Seq[Option[NamedExpression]] =
          agg.aggregateExpressions.map { ne =>
            val inner = ne match { case Alias(c, _) => c; case e => e }
            val m = if (global) mapGlobalOutput(v, rep, inline(inner))
              else mapOutput(v, rep, inline(inner))
            m.map(e => Alias(e, ne.name)(exprId = ne.exprId))
          }
        if (mapped.exists(_.isEmpty)) None
        // global: a second (one-row) aggregate ABOVE the merged view —
        // |groups| rows in, 1 out; the outer node can never re-match the
        // rule because its child unwraps to an Aggregate, not a relation
        else if (global) Some(Aggregate(Nil, mapped.flatten, rep))
        else Some(Project(mapped.flatten, rep))
        }
      }
  }
}

/** The optimizer rule: substitute matching aggregates with their
  * registered materialized view's serving plan. Kill switch:
  * `spark.graft.mv.enabled=false`. Idempotent across fixed-point
  * iterations — the substituted merge aggregate reads state ∪ base
  * (paths differ from any registered base), and the inner delta branch
  * carries a conjunct on a non-group column (enforced at registration),
  * so neither re-matches.
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {
  /** Conf-string boolean: the kill switch exists for the emergency-
    * disable scenario, where an operator typing `FALSE`, `False` or `0`
    * must actually disable the rewrite — an exact lowercase compare
    * would leave it silently active at the worst possible moment. */
  private[plans] def isDisabledStr(s: String): Boolean = {
    val t = s.trim
    t.equalsIgnoreCase("false") || t == "0"
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MaterializedViews.isEmpty ||
      isDisabledStr(conf.getConfString("spark.graft.mv.enabled", "true")) ||
      // O(#leaves) bail: plans scanning no registered base path skip
      // the per-Aggregate unwrap entirely — rule cost on unrelated
      // queries stays flat however many views the JVM carries
      !MaterializedViews.touchesRegistered(plan)) plan
    else plan.transformUp {
      case agg: Aggregate => MaterializedViews.tryRewrite(agg).getOrElse(agg)
    }
}
