package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{PositionalEqCount, SortedIntersectSize, VectorDot}

/** Session-extension entry point — the idiomatic deployment hook for the
  * engine's native expressions (SURVEY §7.3 preference order: custom
  * `Expression` registered via `SparkSessionExtensions`):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes `sorted_intersect_size`, `vector_dot`, and `positional_eq_count`
  * first-class SQL functions in every session of the cluster, no
  * imperative registration required. `graft.functions.Functions.register`
  * remains the in-process form for programmatic sessions (it is what the
  * library operators call); both resolve to the same expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      exprs => SortedIntersectSize(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      exprs => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("positional_eq_count"),
      new ExpressionInfo(classOf[PositionalEqCount].getName,
        "positional_eq_count"),
      exprs => PositionalEqCount(exprs(0), exprs(1))))
  }
}
