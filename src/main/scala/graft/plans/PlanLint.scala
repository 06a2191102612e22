package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import graft.functions.Opaque

/** Static guards for the repo's two sharp tools — [[graft.functions.Opaque]]
  * (a deliberate `deterministic = false` lie that disables move-based
  * optimizations on the wrapped column) and [[graft.ext.Par.widen]] (whose
  * partition-count guard forces physical planning of its input). Each has a
  * documented misuse mode that would regress silently; these lints make the
  * misuse fail fast instead.
  */
object PlanLint {

  private def containsOpaque(e: Expression): Boolean =
    e.exists(_.isInstanceOf[Opaque])

  /** Sites where an `opaque()`-derived column feeds something Catalyst
    * needs to MOVE or co-partition — a join condition or an explicit
    * repartitioning expression (the documented misuse mode,
    * functions/Opaque.scala). A LITERAL opaque() inside a join condition
    * is already rejected loudly by Spark's analyzer
    * (INVALID_NON_DETERMINISTIC_EXPRESSIONS); the SILENT variant this
    * lint exists for is laundering through a projection —
    * `withColumn("k", opaque(...)).join(other, "k")` analyzes fine but
    * pins a nondeterministic-flagged Project under the join, blocking
    * predicate pushdown, join reorder, and partial-agg moves around it.
    * Traces Alias provenance on the ANALYZED plan (the optimizer never
    * introduces Opaque into a condition on its own — nondeterministic
    * expressions don't move). Empty result = clean. */
  def opaqueMisuse(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    val opaqueAliases: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
      plan.collect { case p: Project =>
        p.projectList.collect {
          case a: org.apache.spark.sql.catalyst.expressions.Alias
              if containsOpaque(a.child) => a.exprId
        }
      }.flatten.toSet
    def tainted(e: Expression): Boolean =
      containsOpaque(e) || e.references.exists(r => opaqueAliases(r.exprId))
    plan.collect {
      case j: Join if j.condition.exists(tainted) =>
        s"opaque()-derived column inside a join condition: " +
          j.condition.get.sql
      case r: RepartitionByExpression if r.partitionExpressions.exists(tainted) =>
        s"opaque()-derived column inside a repartitioning expression: " +
          r.partitionExpressions.map(_.sql).mkString(", ")
    }
  }

  /** Throw if `opaque()` feeds a join condition or partitioning expression
    * anywhere in `df`'s plan. */
  def assertNoOpaqueMisuse(df: DataFrame): Unit = {
    val bad = opaqueMisuse(df)
    require(bad.isEmpty,
      "opaque() is an optimizer barrier and must never wrap a join key or " +
        "partitioning expression (it would block pushdown/co-partitioning " +
        "and regress to a cross-join-shaped plan):\n" + bad.mkString("\n"))
  }

  /** Node classes through which [[graft.ext.Par.widen]]'s eager
    * `rdd.getNumPartitions` probe stays metadata-only: leaves (file scans,
    * local relations) and narrow scan-rooted shaping — projections,
    * filters, unions, aliases. Anything that plans an exchange (join,
    * aggregate, sort, window, repartition, ...) would be eagerly
    * materialized at CONSTRUCTION time by the probe. */
  def isScanRooted(plan: LogicalPlan): Boolean = plan.collectFirst {
    case n if !(n.isInstanceOf[LeafNode] || n.isInstanceOf[Project] ||
      n.isInstanceOf[Filter] || n.isInstanceOf[Union] ||
      n.isInstanceOf[SubqueryAlias] || n.isInstanceOf[Generate]) => n
  }.isEmpty

  /** Throw unless `df` is a scan-rooted projection (no upstream exchange) —
    * the [[graft.ext.Par.widen]] input contract. */
  def assertScanRooted(df: DataFrame): Unit = {
    val plan = df.queryExecution.analyzed
    require(isScanRooted(plan),
      "Par.widen input must be a scan-rooted projection (leaf scans under " +
        "Project/Filter/Union only) — its partition-count probe forces " +
        "physical planning, which eagerly materializes any upstream " +
        "exchange. Widen the SCAN, not the shuffled result. Offending " +
        "nodes: " + plan.collect {
          case n if !(n.isInstanceOf[LeafNode] || n.isInstanceOf[Project] ||
            n.isInstanceOf[Filter] || n.isInstanceOf[Union] ||
            n.isInstanceOf[SubqueryAlias] || n.isInstanceOf[Generate]) =>
            n.nodeName
        }.distinct.mkString(", "))
  }
}
