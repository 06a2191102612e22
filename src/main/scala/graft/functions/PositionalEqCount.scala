package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `positional_eq_count(a, b)` — number of positions where two equal-length
  * long arrays agree.
  *
  * This is the MinHash signature-agreement estimator
  * (est_jaccard = eq/k, reference semantics per the standard MinHash
  * identity): it runs once per LSH candidate pair — a quadratic hot path
  * on self-similar corpora — so it earns a native codegen expression; the
  * interpreted `aggregate(zip_with(...))` form it replaces evaluates a
  * lambda per element per pair (see PERF.md for the measured gap class).
  * If lengths differ, positions beyond the shorter array count as
  * disagreement.
  */
case class PositionalEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "positional_eq_count"

  // enforce long arrays at ANALYSIS time: getLong over int-packed
  // ArrayData would silently return garbage, and the function is exposed
  // cluster-wide via GraftExtensions
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      s"""
         |int $c = 0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
