package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `minhash_sigs(hashedShingles, k)` — the k-wide MinHash signature of a
  * document in ONE pass over its hashed-shingle array: signature_i =
  * min over shingles of mix_i(hash), with mix_i the xor-rotate remix
  * family ([[MinhashSigs.mix]] — ANSI-safe bit ops, identical values to
  * the column-expression form it replaces).
  *
  * This replaces an `explode` + 16-way `min` `groupBy` per corpus — a
  * shuffle of every (doc, shingle) pair — with a scan-local loop: no
  * exchange, no per-shingle row materialization, and the hashed array is
  * shared with the verification join's merge-walk input, so each shingle
  * is hashed exactly once per query. At 100 TB the signature stage
  * becomes embarrassingly parallel scan work.
  *
  * `k` must be a foldable literal. Empty input arrays yield a sentinel
  * signature of Long.MaxValue values (callers exclude empty documents;
  * the shingle builder never emits an empty array for non-null text).
  */
case class MinhashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if !right.foldable =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal k")
      case (ArrayType(LongType, _), IntegerType) =>
        val k = right.eval().asInstanceOf[Int]
        if (k >= 1 && k <= MinhashSigs.mixConsts.length)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName k must be in 1..${MinhashSigs.mixConsts.length}, got $k")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint> hashed shingles, int k), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    MinhashSigs.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MinhashSigs.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinhashSigs {

  /** Hash-family constants — fixed seed, shared with the column-expression
    * remix so both forms produce bit-identical signatures. */
  val mixConsts: Array[Long] = {
    val r = new scala.util.Random(20240812L)
    Array.fill(64)(r.nextLong())
  }

  /** xor-rotate remix: derives hash-family member i from one base hash
    * with bit ops only (no wraparound arithmetic — Spark 4 ANSI mode). */
  @inline def mix(h: Long, i: Int): Long =
    if (i == 0) h
    else {
      val r = (i * 7) % 61 + 1
      (h ^ ((h << r) | (h >>> (64 - r)))) ^ mixConsts(i)
    }

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val h = arr.getLong(e)
      var i = 0
      while (i < k) {
        val m = mix(h, i)
        if (m < mins(i)) mins(i) = m
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }
}
