package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge to the private[sql] `registerFunctions` hook — the
  * exact call SparkSession makes at session build time — so the suite can
  * verify `graft.GraftExtensions` without constructing a second
  * SparkContext. */
object GraftExtensionsProbe {
  def register(e: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    e.registerFunctions(reg)
}
