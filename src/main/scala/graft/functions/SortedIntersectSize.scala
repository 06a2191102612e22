package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `sorted_intersect_size(a, b)` — intersection cardinality of two SORTED,
  * de-duplicated string or long arrays via a linear merge walk.
  *
  * A native Catalyst expression with `doGenCode`: the generated loop runs
  * inside whole-stage codegen with zero allocation, vs. the built-in
  * `size(array_intersect(...))` which builds a hash set per row pair. On
  * the pairwise-Jaccard hot path (quadratic in candidates) this is the
  * operator the engine spends its time in, so it earns a custom expression
  * (preference order per SURVEY §7.3: compose built-ins → custom
  * Expression → custom plan node).
  *
  * Inputs must be sorted ascending by Spark's UTF8String binary ordering
  * (i.e. `sort_array(array_distinct(...))`) — unsorted input silently
  * undercounts, so callers own the contract.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  private def elemIsLong: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n1 = x.numElements(); val n2 = y.numElements()
    val longs = elemIsLong
    while (i < n1 && j < n2) {
      val cmp =
        if (longs) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val cmpExpr =
        if (elemIsLong) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $n1 = $a.numElements(), $n2 = $b.numElements();
         |while ($i < $n1 && $j < $n2) {
         |  final int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the engine's native functions; idempotent.
  * One builder table serves both the in-process `register(spark)` form and
  * the cluster-wide [[graft.GraftExtensions]] hook, each builder guarded
  * by an arity check so a wrong-arity SQL call reports a usable error
  * instead of an `IndexOutOfBoundsException` from the lambda. */
object Functions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** (name, expression class, arity-checked builder) for every native
    * function the engine ships. */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("sorted_intersect_size", classOf[SortedIntersectSize],
      arity("sorted_intersect_size", 2)(e => SortedIntersectSize(e(0), e(1)))),
    ("vector_dot", classOf[VectorDot],
      arity("vector_dot", 2)(e => VectorDot(e(0), e(1)))),
    ("positional_eq_count", classOf[PositionalEqCount],
      arity("positional_eq_count", 2)(e => PositionalEqCount(e(0), e(1)))),
    ("minhash_sigs", classOf[MinhashSigs],
      arity("minhash_sigs", 2)(e => MinhashSigs(e(0), e(1)))),
    ("simhash_bits", classOf[SimhashBits],
      arity("simhash_bits", 1)(e => SimhashBits(e(0)))),
    ("hyperplane_sig", classOf[HyperplaneSig],
      arity("hyperplane_sig", 4)(e => HyperplaneSig(e(0), e(1), e(2), e(3)))),
    ("hashed_ngrams", classOf[HashedNgrams],
      arity("hashed_ngrams", 2)(e => HashedNgrams(e(0), e(1)))),
    ("hashed_ngrams_all", classOf[HashedNgramsAll],
      arity("hashed_ngrams_all", 2)(e => HashedNgramsAll(e(0), e(1)))),
    ("bpe_encode_len", classOf[BpeEncodeLen],
      arity("bpe_encode_len", 3)(e => BpeEncodeLen(e(0), e(1), e(2)))),
    ("cdc_chunks", classOf[CdcChunks],
      arity("cdc_chunks", 2)(e => CdcChunks(e(0), e(1)))),
    ("opaque", classOf[Opaque],
      arity("opaque", 1)(e => Opaque(e(0)))),
    // Catalyst ships BloomFilterMightContain for its own runtime join
    // filters but does not expose it in the public FunctionRegistry
    // (only `bloom_filter_agg` is registered). Registering it here gives
    // the bloom-prefilter operators a codegen'd scan-local probe — the
    // sketch rides the plan as a foldable binary literal, which is
    // exactly the shape the expression's input check requires.
    ("might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
      arity("might_contain", 2)(e =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          e(0), e(1)))),
    // Catalyst registers bloom_filter_agg only in its INTERNAL registry
    // (for InjectRuntimeFilter), so call_function can't resolve it;
    // re-register the public class here. The analyzer wraps the bare
    // AggregateFunction in a Complete AggregateExpression on resolution.
    ("bloom_filter_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
      arity("bloom_filter_agg", 3)(e =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          e(0), e(1), e(2)))))

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name requires $n argument(s), got ${exprs.length}")
      f(exprs)
    }

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
