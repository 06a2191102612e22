package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** `opaque(x)` — identity pass-through that the optimizer cannot see
  * through: an EXPRESSION-LEVEL BARRIER.
  *
  * Why it exists: Catalyst's `PushDownPredicates` rewrites a filter on a
  * projected column back into the underlying expression and pushes it
  * below the projection — into a join condition if it can. For a filter
  * like `jac >= θ` where `jac` is derived from an O(|array|) native
  * expression (`sorted_intersect_size`), that rewrite is a pessimization
  * twice over: the expensive expression is re-evaluated in the join
  * condition AND again in the projection (no common-subexpression
  * elimination spans a join condition and its parent project), and
  * inside the condition it can land AHEAD of cheap conjuncts like
  * `id_a < id_b`, so every unordered candidate pays it. Measured on
  * x121: 6.7 s → 1.2 s at sf0.1 from keeping the merge walk out of the
  * join condition (pre-fix plans evaluated it 2–4× per pair — see
  * PlanShapeSpec "verification intersect computes once").
  *
  * Mechanism: the expression is a no-op at runtime (eval and codegen
  * both delegate to the child — zero overhead inside whole-stage
  * codegen) but reports `deterministic = false`, which
  * `PushDownPredicates` treats as un-movable. Wrap the EXPENSIVE
  * derived column at the point it should be computed
  * (`opaque(jacExpr).as("jac")`); filters on it then stay above the
  * projection, evaluating the cheap already-computed column.
  *
  * Trade-off, by design: a nondeterministic-flagged column is excluded
  * from every optimization that needs to move or duplicate it (pushdown,
  * partial aggregation reuse, join-condition inlining). Use it ONLY on
  * expensive derived columns whose filter placement the plan audit has
  * shown to regress — never on join keys or pruning predicates, where
  * pushdown is the whole point.
  */
case class Opaque(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "opaque"
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
