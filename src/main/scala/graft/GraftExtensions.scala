package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point — the idiomatic deployment hook for the
  * engine's native expressions (SURVEY §7.3 preference order: custom
  * `Expression` registered via `SparkSessionExtensions`):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes every native function in [[graft.functions.Functions.builders]]
  * (`sorted_intersect_size`, `vector_dot`, `positional_eq_count`,
  * `minhash_sigs`, `simhash_bits`, `hyperplane_sig`) a first-class SQL
  * function in every session of the cluster, no imperative registration
  * required. `graft.functions.Functions.register` remains the in-process
  * form for programmatic sessions (it is what the library operators call);
  * both resolve to the same arity-checked expression builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Functions.builders.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
}
