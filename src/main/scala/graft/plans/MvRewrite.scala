package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, ExprId, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

/** AUTOMATIC MATERIALIZED-VIEW QUERY REWRITE — the read half of the
  * engine's MV story. x12/x35/x41 keep aggregate state maintainable
  * (mergeable monoid partials, O(Δ) folds); this rule makes the
  * stored state SERVE queries nobody rewrote by hand: a registered
  * MV `G ⊢ SUM/COUNT/MIN/MAX over fact F` answers any later
  * `Aggregate` whose grouping keys are a subset of G and whose
  * aggregates are derivable from the stored partials — including
  * pure-SQL text that only ever names the fact table.
  *
  * Containment rules (the algebra, nothing heuristic):
  *  - grouping ⊆ G  →  re-aggregate the MV (group rollup);
  *    SUM/COUNT re-sum, MIN/MAX re-min/max — all decomposable.
  *  - COUNT(*) → COALESCE(SUM(n_rows), 0) (empty rollup must be 0,
  *    not the null a bare re-SUM would produce);
  *    COUNT(c) → COALESCE(SUM(cnt_c), 0) — the stored count is
  *    count(c), so null semantics survive the rollup exactly.
  *  - SUM(expr) matches STRUCTURALLY (attribute names + node shapes,
  *    e.g. the repo-standard `SUM(CAST(x AS DECIMAL(18,2)))`); the
  *    re-sum is cast back to the original aggregate's type, so the
  *    rewritten plan's schema is bit-identical to the fact plan's.
  *  - AVG is NOT special-cased: `SUM(x)/COUNT(*)` in the query text
  *    rewrites naturally (each AggregateExpression in the tree maps
  *    independently; the Divide stays put), which sidesteps decimal
  *    average scale drift entirely.
  *  - DISTINCT, FILTER clauses, filters between Aggregate and scan,
  *    or any unregistered aggregate → refuse (scan the fact). A
  *    wrong rewrite is a wrong answer; refusal is merely slower.
  *
  * FRESHNESS is a hard gate, checked at rewrite time against the
  * fact's Snapshots log (`isFresh`, typically "latest published
  * version unchanged since the MV was built"): a stale MV never
  * serves — the x68 declared query pins exactly that fallback.
  *
  * 100 TB: the rewrite turns a fact-sized scan + shuffle into an
  * MV-sized one (group-cardinality rows). The decision itself is
  * driver-only — a registry probe plus one manifest-sized log read —
  * and the output attribute ids are preserved (every rewritten
  * column keeps its ExprId), so parent operators re-bind untouched.
  *
  * Reference anchor: the reference app precomputes its chunk/paper
  * aggregates at ingestion and serves queries from those tables
  * (CS_5542_Lab_6 data/ingestion.py); this rule is that pattern as
  * infrastructure — declared once, applied to every matching query.
  *
  * Installed per session via `spark.experimental.extraOptimizations`
  * (`ensureInstalled`) and for config-built sessions via
  * [[graft.GraftExtensions]].
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.isEmpty) plan
    else plan.transformUp { case agg: Aggregate => tryRewrite(agg).getOrElse(agg) }

  /** Idempotently add the rule to an already-built session's
    * optimizer (the "User Provided Optimizers" batch — runs after
    * view inlining, project collapse and column pruning, so the
    * Aggregate-over-scan shape below is what actually arrives). */
  def ensureInstalled(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_ eq MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite
  }

  /** The fact scan under an Aggregate, looking through pure column
    * pruning only — a Filter (or anything else) in between changes
    * the aggregate's input and must block the rewrite. */
  private def factScan(p: LogicalPlan): Option[LogicalRelation] = p match {
    case l: LogicalRelation => Some(l)
    case Project(es, c) if es.forall(_.isInstanceOf[AttributeReference]) => factScan(c)
    case _ => None
  }

  private def scanPaths(l: LogicalRelation): Seq[String] = l.relation match {
    case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
    case _ => Nil
  }

  /** Structural expression equality with attributes matched by NAME
    * (registration and query resolve against different plan
    * instances, so ExprIds can never agree). Strict by construction:
    * an unrecognized mismatch refuses the rewrite, never forces it. */
  private def same(a: Expression, b: Expression): Boolean = (a, b) match {
    case (x: AttributeReference, y: AttributeReference) =>
      x.name.equalsIgnoreCase(y.name) && x.dataType == y.dataType
    case (x: Literal, y: Literal) => x == y
    case _ =>
      a.getClass == b.getClass && a.dataType == b.dataType &&
        a.children.length == b.children.length &&
        a.children.zip(b.children).forall { case (c, d) => same(c, d) }
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    val scan = factScan(agg.child).getOrElse(return None)
    val paths = scanPaths(scan)
    val d = MvCatalog.all
      .find(m => paths.exists(_.contains(m.factFragment)))
      .getOrElse(return None)
    // grouping must be plain fact attributes within the MV's key set
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name.toLowerCase) => a
      case _ => return None
    }
    if (!d.isFresh()) return None
    val mvPlan = d.mvRead() // fresh attribute ids per rewrite site
    val mvByName = mvPlan.output.map(a => a.name.toLowerCase -> a).toMap
    val groupMap: Map[ExprId, AttributeReference] = groupAttrs.map(a =>
      a.exprId -> mvByName(a.name.toLowerCase).asInstanceOf[AttributeReference]).toMap

    def resumFn(mvCol: String) = Sum(mvByName(mvCol)).toAggregateExpression()
    def zeroIfEmpty(e: Expression) = Coalesce(Seq(e, Literal(0L)))

    def mapFn(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      ae.aggregateFunction match {
        case Sum(c, _) =>
          d.sums.collectFirst { case (n, e) if same(c, e) =>
            val s = resumFn(n)
            if (s.dataType == ae.dataType) s else Cast(s, ae.dataType)
          }
        case Count(Seq(_: Literal)) => Some(zeroIfEmpty(resumFn(d.rowCountCol)))
        case Count(Seq(c)) =>
          d.counts.collectFirst { case (n, e) if same(c, e) => zeroIfEmpty(resumFn(n)) }
        case Min(c) =>
          d.mins.collectFirst { case (n, e) if same(c, e) =>
            Min(mvByName(n)).toAggregateExpression() }
        case Max(c) =>
          d.maxs.collectFirst { case (n, e) if same(c, e) =>
            Max(mvByName(n)).toAggregateExpression() }
        case _ => None
      }
    }

    // two passes: map every AggregateExpression first (their children
    // still name fact attributes, which the structural match needs),
    // then re-bind the surviving grouping references to the MV's.
    var ok = true
    def rewriteTree(e: Expression): Expression = {
      val mapped = e.transformUp { case ae: AggregateExpression =>
        mapFn(ae).getOrElse { ok = false; ae }
      }
      mapped.transformUp {
        case a: AttributeReference if groupMap.contains(a.exprId) => groupMap(a.exprId)
      }
    }

    val newAggExprs = agg.aggregateExpressions.map { ne =>
      val inner = ne match { case al: Alias => al.child; case other => other }
      val t = rewriteTree(inner)
      ne match {
        // preserve the ExprId: parents re-bind to the rewritten
        // aggregate with zero plan surgery above this node
        case al: Alias => Alias(t, al.name)(exprId = al.exprId, qualifier = al.qualifier)
        case other => Alias(t, other.name)(exprId = other.exprId)
      }
    }
    if (!ok) return None
    // a surviving non-MV reference means a fact column leaked through
    // (e.g. a non-grouping attribute in the select list) — refuse
    val mvIds = mvPlan.outputSet
    if (newAggExprs.exists(_.references.exists(r => !mvIds.contains(r)))) return None
    val newGroups = groupAttrs.map(a => groupMap(a.exprId))
    val used = mvPlan.output.filter(a =>
      newGroups.exists(_.exprId == a.exprId) ||
        newAggExprs.exists(_.references.contains(a)))
    // the explicit Project keeps the MV scan's ReadSchema pruned —
    // the user batch runs after column pruning, which can no longer
    // do it for us
    Some(Aggregate(newGroups, newAggExprs, Project(used, mvPlan)))
  }
}

/** The registered-MV registry [[MvRewrite]] consults. Process-wide
  * (the rule object is a singleton); definitions are keyed by name
  * and matched to scans by fact-path fragment, so distinct tables
  * can never cross-serve. */
object MvCatalog {
  final case class MvDef(
      name: String,
      factFragment: String,
      groupCols: Seq[String],
      sums: Seq[(String, Expression)],
      counts: Seq[(String, Expression)],
      mins: Seq[(String, Expression)],
      maxs: Seq[(String, Expression)],
      rowCountCol: String,
      mvRead: () => LogicalPlan,
      isFresh: () => Boolean)

  private val defs = new scala.collection.concurrent.TrieMap[String, MvDef]
  def register(d: MvDef): Unit = defs.put(d.name, d)
  def remove(name: String): Unit = defs.remove(name)
  def clear(): Unit = defs.clear()
  def isEmpty: Boolean = defs.isEmpty
  def all: Seq[MvDef] = defs.values.toSeq
}

/** CREATE MATERIALIZED VIEW: build the per-group partial-aggregate
  * table from `fact`, commit it as a Snapshots version under
  * `mvDir`, and register it for [[MvRewrite]]. Stored layout per
  * value column `n`: `sum_n` / `cnt_n` (+ optional `min_n`/`max_n`)
  * plus the view-wide `n_rows` — exactly the decomposable partials
  * the containment rules above re-aggregate. Rebuilds are
  * deterministic (drop + re-commit) and the definition is
  * de-registered FIRST so the build's own groupBy can never be
  * served by the previous index generation. */
object MatView {
  def create(
      spark: SparkSession,
      name: String,
      fact: DataFrame,
      factFragment: String,
      mvDir: String,
      groupCols: Seq[String],
      sumCols: Seq[(String, Column)] = Nil,
      countCols: Seq[(String, Column)] = Nil,
      minMaxCols: Seq[(String, Column)] = Nil,
      isFresh: () => Boolean = () => true): DataFrame = {
    import graft.sources.Snapshots
    MvCatalog.remove(name)
    Snapshots.drop(spark, mvDir)
    val aggs: Seq[Column] =
      sumCols.map { case (n, c) => sum(c).as(s"sum_$n") } ++
        countCols.map { case (n, c) => count(c).as(s"cnt_$n") } ++
        minMaxCols.flatMap { case (n, c) =>
          Seq(min(c).as(s"min_$n"), max(c).as(s"max_$n")) } :+
        count(lit(1)).as("n_rows")
    val mv = fact.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    Snapshots.commit(mv, mvDir)
    // the registered match targets, resolved against the fact's own
    // schema (the rule compares them to query expressions by name)
    def resolved(c: Column): Expression =
      fact.select(c).queryExecution.analyzed.asInstanceOf[Project]
        .projectList.head match {
        case a: Alias => a.child
        case e => e
      }
    MvCatalog.register(MvCatalog.MvDef(
      name = name,
      factFragment = factFragment,
      groupCols = groupCols.map(_.toLowerCase),
      sums = sumCols.map { case (n, c) => (s"sum_$n", resolved(c)) },
      counts = countCols.map { case (n, c) => (s"cnt_$n", resolved(c)) },
      mins = minMaxCols.map { case (n, c) => (s"min_$n", resolved(c)) },
      maxs = minMaxCols.map { case (n, c) => (s"max_$n", resolved(c)) },
      rowCountCol = "n_rows",
      mvRead = () => Snapshots.read(spark, mvDir).queryExecution.analyzed,
      isFresh = isFresh))
    MvRewrite.ensureInstalled(spark)
    mv
  }
}
