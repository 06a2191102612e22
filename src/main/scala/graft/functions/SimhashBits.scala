package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash_bits(hashedTokens)` — 64-bit SimHash fingerprint of a
  * document from its hashed-token array in one pass: every token votes
  * ±1 per bit via its hash; the sign of each per-bit sum is the
  * fingerprint bit. Bit-identical to the higher-order-function column
  * form it replaces (`aggregate`/`zip_with` over 64 bit-votes per token),
  * which evaluated ~64 interpreted lambdas per token; this is a tight
  * scan-local loop — no shuffle, no per-token row materialization. */
case class SimhashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> hashed tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    SimhashBits.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimhashBits.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashBits {
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val h = arr.getLong(e)
      var j = 0
      while (j < 64) {
        votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      e += 1
    }
    var f = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) f |= (1L << j)
      j += 1
    }
    f
  }
}
