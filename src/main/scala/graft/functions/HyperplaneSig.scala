package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** `hyperplane_sig(vec, nBits, dim, seed)` — random-hyperplane LSH
  * signature: bit_p = sign(vec · plane_p), planes drawn from a seeded
  * Gaussian (deterministic and partition-independent).
  *
  * The column-expression form inlined `nBits × dim` plan literals — 4,096
  * Literal nodes at the test dims and ~100k at production embedding dims
  * (1536), which bloats analysis, plan strings and codegen. Here the plan
  * carries THREE scalars (nBits, dim, seed); the plane matrix materializes
  * once per executor as a codegen reference object (the broadcast-constant
  * pattern) and the generated code is one static call. Bit-identical to
  * the literal-tree form: same `nextGaussian` sequence (row-major), same
  * sequential double multiply-accumulate as [[VectorDot]], same
  * strict-positive sign rule.
  *
  * `nBits`/`dim`/`seed` must be foldable literals. A null vector yields a
  * null signature.
  */
case class HyperplaneSig(vec: Expression, nBitsE: Expression,
    dimE: Expression, seedE: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(vec, nBitsE, dimE, seedE)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!vecOk)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> vec, got ${vec.dataType.simpleString}")
    if (!(nBitsE.foldable && dimE.foldable && seedE.foldable))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires literal nBits/dim/seed")
    (nBitsE.dataType, dimE.dataType, seedE.dataType) match {
      case (IntegerType, IntegerType, LongType) =>
        val n = nBitsE.eval().asInstanceOf[Int]
        val d = dimE.eval().asInstanceOf[Int]
        if (n >= 1 && n <= 64 && d >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName nBits must be 1..64 and dim >= 1, got ($n, $d)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int nBits, int dim, bigint seed), got $other")
    }
  }

  private lazy val nBits: Int = nBitsE.eval().asInstanceOf[Int]
  private lazy val dim: Int = dimE.eval().asInstanceOf[Int]
  private lazy val seed: Long = seedE.eval().asInstanceOf[Long]
  private def vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Row-major flattened plane matrix — built once per task lifecycle, a
    * plan CONSTANT, never a per-row allocation. */
  @transient private lazy val planes: Array[Double] =
    HyperplaneSig.planesFor(nBits, dim, seed)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null
    else HyperplaneSig.compute(
      v.asInstanceOf[ArrayData], planes, nBits, dim, vecIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecCode = vec.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    ev.copy(code = code"""
      ${vecCode.code}
      boolean ${ev.isNull} = ${vecCode.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.HyperplaneSig.compute(
          ${vecCode.value}, $planesRef, $nBits, $dim, $vecIsFloat);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), nBitsE = newChildren(1),
      dimE = newChildren(2), seedE = newChildren(3))
}

object HyperplaneSig {

  /** nBits rows of dim Gaussians from `scala.util.Random(seed)`, row-major
    * — the same generator and fill order the original literal-tree builder
    * used, so signatures stay bit-identical across engine versions. */
  def planesFor(nBits: Int, dim: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits * dim)(rnd.nextGaussian())
  }

  /** One signature: per bit, a sequential double multiply-accumulate over
    * min(|vec|, dim) elements (identical arithmetic to [[VectorDot]] over
    * a plane-literal array), sign-thresholded at strictly positive. */
  def compute(arr: ArrayData, planes: Array[Double], nBits: Int, dim: Int,
      isFloat: Boolean): Long = {
    val n = math.min(arr.numElements(), dim)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      val off = b * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += xv * planes(off + i)
        i += 1
      }
      if (acc > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
