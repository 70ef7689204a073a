package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent materialized-view rewrite — the warehouse feature that
  * makes dashboard aggregates cheap: a query matching a REGISTERED
  * summary definition is answered from the pre-built summary table,
  * and the rewrite is invisible in the result (the oracle runs the
  * raw SQL). This is the engine's third Catalyst extension kind
  * beside the injected functions and the TopKPerKey planner strategy:
  * a `Rule[LogicalPlan]` in the analyzer's post-hoc-resolution batch.
  *
  * Matching is how real MV systems do it — against the registered
  * definition, not arbitrary plan mining: the catalog keys each view
  * by its definition's CANONICALIZED aggregate (exprIds normalized,
  * so a freshly constructed identical query matches) plus the scanned
  * source paths (two corpora never cross-match). Anything else —
  * a different grouping, an extra filter, another table — misses the
  * key and runs untouched (spec-proven with a near-miss control).
  *
  * At 100 TB this is the difference between a 100 TB scan and a
  * k-row read for every repeat of the signature aggregate; the MV
  * itself is built ONCE per corpus fingerprint like every published
  * layout (Bucketing, z-order) and goes stale with the fingerprint,
  * never silently.
  */
object MvCatalog {

  /** canonical definition key → materialized parquet path */
  private val views =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The catalog key: canonicalized plan text (attribute ids
    * normalized by Catalyst) + the leaf scan paths — the pair that is
    * stable across separate constructions of the same definition and
    * distinct across corpora. */
  private[plans] def keyOf(plan: LogicalPlan): String = planKeyOf(plan)

  /** Registered Aggregate definitions for grain-rollup matching,
    * keyed like [[keyOf]] but by the definition's CHILD (the shared
    * pre-aggregate subtree a coarser query must also sit on), each
    * carrying the definition and its MV path. */
  private val defs = new java.util.concurrent.ConcurrentHashMap[
    String, List[(Aggregate, String)]]()

  private[plans] def childKeyOf(agg: Aggregate): String =
    planKeyOf(agg.child)

  private def leafPaths(plan: LogicalPlan): Seq[String] =
    plan.collectLeaves().flatMap {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _: LeafNode => Nil
    }

  /** The ONE key-derivation function — canonicalized plan text plus
    * leaf scan paths; keyOf/childKeyOf/candidatesFor all route here
    * so the exact-match and rollup keyspaces can never drift. */
  private[plans] def planKeyOf(plan: LogicalPlan): String =
    plan.canonicalized.toString + "|" + leafPaths(plan).mkString(",")

  /** Every source path any registered definition scans — the CHEAP
    * pre-filter: a query whose leaves touch none of these paths can
    * never match any view, so the rule skips canonicalization (the
    * expensive half of keyOf — a full subtree rewrite + text render
    * PER Aggregate, which every unrelated query in a view-registering
    * session would otherwise pay). */
  private val srcPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[plans] def mightMatch(plan: LogicalPlan): Boolean =
    leafPaths(plan).exists(srcPaths.contains)

  def register(definition: LogicalPlan, mvPath: String): Unit = {
    leafPaths(definition).foreach(srcPaths.add)
    views.put(keyOf(definition), mvPath)
    definition match {
      case a: Aggregate =>
        defs.compute(childKeyOf(a), (_, old) =>
          (a, mvPath) :: Option(old).getOrElse(Nil)
            .filterNot(_._2 == mvPath))
      case _ => ()
    }
  }

  def lookup(plan: LogicalPlan): Option[String] =
    Option(views.get(keyOf(plan)))

  /** Definitions sharing `agg`'s pre-aggregate subtree — rollup
    * candidates. */
  def candidates(agg: Aggregate): List[(Aggregate, String)] =
    Option(defs.get(childKeyOf(agg))).getOrElse(Nil)

  /** Definitions whose pre-aggregate subtree is exactly `plan` —
    * used by the selection-subsumption path, where the query's
    * Filter sits between its Aggregate and the shared subtree. */
  def candidatesFor(plan: LogicalPlan): List[(Aggregate, String)] =
    Option(defs.get(planKeyOf(plan))).getOrElse(Nil)

  /** True when nothing is registered — the analyzer rule's fast path.
    * Until the first `register`, every query of every session pays
    * ZERO MV overhead (no canonicalization, no leaf walk); after
    * registration the per-Aggregate keyOf cost is the price of
    * having views to match, as in any MV-capable optimizer. */
  def isEmpty: Boolean = views.isEmpty && defs.isEmpty

  def clear(): Unit = {
    views.clear(); defs.clear(); srcPaths.clear(); MvRollup.sizes.clear()
  }
}

/** Analyzer rule: replace a registered aggregate with a scan of its
  * materialized table, re-aliasing the MV's columns onto the query's
  * output attribute ids (by position — the MV was written from the
  * same definition, so orders and types line up) so every parent
  * operator resolves unchanged. */
object MvRewrite {
  /** Per-thread suspension — [[MvAdvisor]] re-analyzes workload
    * plans with the rewrite off so it examines the DASHBOARD, not
    * whatever summary a shared session already answers it from. */
  private[plans] val suspended: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)
}

case class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    // empty-catalog fast path: with no registered views there is
    // nothing to match — skip the tree walk entirely so sessions
    // that never register an MV pay zero analysis overhead
    if (MvCatalog.isEmpty || MvRewrite.suspended.get) plan
    else plan.transformUp {
      // the resolved guard matters: canonicalizing an aggregate whose
      // resolution FAILED (e.g. a typo'd column) throws INTERNAL_ERROR
      // from inside this rule and masks the real unresolved-column
      // error the checker would have raised. mightMatch is the cheap
      // per-Aggregate gate: only queries actually scanning a
      // registered definition's source pay canonicalization
      case agg: Aggregate if agg.resolved && MvCatalog.mightMatch(agg) =>
        MvCatalog.lookup(agg) match {
          case Some(path) =>
            val mv = spark.read.parquet(path).queryExecution.analyzed
            val proj: Seq[NamedExpression] = agg.output.zip(mv.output)
              .map { case (o, m) => Alias(m, o.name)(exprId = o.exprId) }
            Project(proj, mv)
          case None =>
            MvRollup.rewrite(spark, agg).getOrElse(agg)
        }
    }
}

/** Grain-rollup rewrite — the half of MV matching that makes ONE
  * materialized summary serve a whole dashboard family: a query
  * whose GROUP BY keys are a SUBSET of a registered MV's keys and
  * whose aggregates are re-aggregable from the MV's outputs
  * (SUM → SUM of partial sums, COUNT → SUM of partial counts,
  * MIN/MAX → MIN/MAX of partial extrema) is answered by
  * re-aggregating the k-row MV instead of re-scanning the corpus —
  * at 100 TB, a daily/monthly MV answers the year rollup for the
  * cost of reading the summary. AVG and DISTINCT aggregates are NOT
  * re-aggregable from these partials and deliberately never match.
  *
  * Matching stays catalog-driven (the exact-match discipline): the
  * query's pre-aggregate subtree must equal the definition's
  * CANONICALIZED child (same source, same projections, same paths —
  * [[MvCatalog.childKeyOf]]), and expressions are compared on the
  * canonicalized plans, where attribute ids are position-normalized
  * against that shared child, so textual equality is semantic
  * equality. Any unmapped output, grouping key outside the MV's key
  * set, aggregate FILTER clause, or DISTINCT flag vetoes the rewrite
  * and the query runs untouched.
  *
  * r9 adds SELECTION SUBSUMPTION, the third classic rewrite beside
  * exact match and rollup: a WHERE between the query's aggregate and
  * the shared subtree is accepted when every grouping-key subtree of
  * the predicate (e.g. `year(o_orderdate)`, not just bare columns)
  * maps onto an MV output — the filter then runs against the k-row
  * MV (and pushes into its parquet scan) instead of the corpus, so
  * "this quarter, by month" dashboards ride the same daily summary.
  * A predicate touching any non-key column leaves residual base
  * attributes after the mapping and vetoes — only key-grain slices
  * are answerable from key-grain partials. */
object MvRollup {

  private def unalias(e: Expression): Expression = e match {
    case a: Alias => unalias(a.child)
    case x => x
  }

  /** MV size cache — on-disk bytes per registered path. A published
    * MV never mutates (one build per corpus fingerprint), so one FS
    * walk per path amortizes over every later analysis. An unreadable
    * path sorts last for THIS lookup but is NOT cached — a transient
    * FS error must not permanently invert the cost choice (the next
    * analysis re-walks and recovers). */
  private[plans] val sizes =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[plans] def mvBytes(spark: SparkSession, path: String): Long =
    Option(sizes.computeIfAbsent(path, p =>
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        java.lang.Long.valueOf(
          hp.getFileSystem(spark.sessionState.newHadoopConf())
            .getContentSummary(hp).getLength)
      } catch { case _: java.io.IOException => null }))
      .map(_.longValue).getOrElse(Long.MaxValue)

  def rewrite(spark: SparkSession, agg: Aggregate): Option[LogicalPlan] = {
    // selection subsumption: a Filter between the query's Aggregate
    // and the definition's pre-aggregate subtree is fine as long as
    // its predicate is deterministic and rewrites ENTIRELY onto MV
    // grouping-key outputs (checked per-candidate below) — the
    // filter then runs against the k-row MV instead of the corpus
    val qCanon = agg.canonicalized match {
      case a: Aggregate => a
      case _ => return None
    }
    // a definition whose OWN child contains the query's Filter (the
    // whole filtered subtree is the shared child) needs no predicate
    // mapping at all; the stripped-Filter key adds the
    // selection-subsumption candidates
    val whole = MvCatalog.candidates(agg)
      .map { case (d, path) => (d, path, None: Option[Expression]) }
    val stripped = agg.child match {
      case f: Filter if f.condition.deterministic =>
        qCanon.child match {
          case fc: Filter =>
            MvCatalog.candidatesFor(f.child).map { case (d, path) =>
              (d, path, Some(fc.condition): Option[Expression]) }
          case _ => Nil
        }
      case _: Filter => Nil // non-deterministic: veto
      case _ => Nil // no Filter: `whole` already covers it
    }
    // COST-BASED choice: when several registered MVs match (a day
    // and a month summary over the same child both serve the year
    // grain), answer from the SMALLEST by on-disk bytes — at 100 TB
    // the coarser summary is orders of magnitude fewer rows to scan
    // and re-aggregate. Candidates are tried cheapest-first and the
    // first that actually rewrites wins, so a small-but-unmappable
    // MV (missing a measure) never blocks a larger match.
    (whole ++ stripped)
      .sortBy { case (_, path, _) => mvBytes(spark, path) }
      .view
      .flatMap { case (d, path, cond) =>
        tryRollup(spark, agg, qCanon, cond, d, path) }
      .headOption
  }

  private def tryRollup(spark: SparkSession, agg: Aggregate,
      qCanon: Aggregate, condCanon: Option[Expression],
      d: Aggregate, path: String): Option[LogicalPlan] = {
    val dCanon = d.canonicalized match {
      case a: Aggregate => a
      case _ => return None
    }
    // def output position by canonical text: both plans canonicalize
    // over the SAME child, so position-normalized attribute ids make
    // text equality semantic equality
    val dGroup = dCanon.groupingExpressions.map(_.toString).toSet
    val dOutPos = dCanon.aggregateExpressions.zipWithIndex.map {
      case (ne, i) => unalias(ne).toString -> i }.toMap
    // every query grouping key must be one of the MV's grouping keys
    // AND be carried as an MV output column
    val qGroups = qCanon.groupingExpressions.map(_.toString)
    if (!qGroups.forall(g => dGroup.contains(g) && dOutPos.contains(g)))
      return None
    // text-only mappability pre-check BEFORE any MV I/O: every query
    // output must be a re-aggregable SUM/COUNT/MIN/MAX carried by the
    // definition, or a carried grouping key — near-miss queries veto
    // here without paying the parquet footer read below
    val mappable = qCanon.aggregateExpressions.forall { canonNe =>
      unalias(canonNe) match {
        case ae: AggregateExpression =>
          !ae.isDistinct && ae.filter.isEmpty &&
            dOutPos.contains(ae.toString) && (ae.aggregateFunction match {
              case _: Sum | _: Count | _: Min | _: Max => true
              case _ => false
            })
        case g => dOutPos.contains(g.toString)
      }
    }
    if (!mappable) return None
    val mv = spark.read.parquet(path).queryExecution.analyzed
    val mvOut = mv.output // positionally aligned with d's output
    // selection subsumption: every grouping-key SUBTREE of the
    // predicate (e.g. year(o_orderdate), not just bare columns) maps
    // to its MV output column; any residual base-attribute reference
    // after the mapping vetoes the rewrite — a predicate over a
    // non-key column can't be answered at MV grain
    val mvChild: Option[LogicalPlan] = condCanon match {
      case None => Some(mv)
      case Some(c) =>
        val mapped = c.transform {
          case e if dGroup.contains(e.toString) &&
            dOutPos.contains(e.toString) => mvOut(dOutPos(e.toString))
        }
        if (mapped.references.subsetOf(mv.outputSet))
          Some(Filter(mapped, mv))
        else None
    }
    if (mvChild.isEmpty) return None
    // map every query output; any miss vetoes the whole rewrite
    val outs = agg.aggregateExpressions.zip(qCanon.aggregateExpressions)
      .map { case (orig, canonNe) =>
        unalias(canonNe) match {
          case ae: AggregateExpression =>
            if (ae.isDistinct || ae.filter.isDefined) None
            else dOutPos.get(ae.toString).flatMap { i =>
              val partial = mvOut(i)
              val reAgg = ae.aggregateFunction match {
                case _: Sum   => Some(Sum(partial).toAggregateExpression())
                // COUNT must stay 0 (never NULL) when a GLOBAL
                // rewrite aggregates zero MV rows — a bare
                // SUM(partials) over empty input is NULL, which
                // would silently change count(*) WHERE <no match>
                case _: Count => Some(Coalesce(Seq(
                  Sum(partial).toAggregateExpression(),
                  Literal(0L))))
                case _: Min   => Some(Min(partial).toAggregateExpression())
                case _: Max   => Some(Max(partial).toAggregateExpression())
                case _ => None
              }
              reAgg.map { r =>
                val typed = if (r.dataType == orig.dataType) r
                  else Cast(r, orig.dataType)
                Alias(typed, orig.name)(exprId = orig.exprId)
              }
            }
          case g => // grouping-key passthrough
            dOutPos.get(g.toString)
              .map(i => Alias(mvOut(i), orig.name)(exprId = orig.exprId))
        }
      }
    if (outs.exists(_.isEmpty)) return None
    val newGroup: Seq[Expression] =
      qGroups.map(g => mvOut(dOutPos(g)))
    Some(Aggregate(newGroup, outs.map(_.get), mvChild.get))
  }
}
