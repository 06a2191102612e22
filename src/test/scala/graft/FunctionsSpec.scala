package graft

import org.apache.spark.sql.functions._
import graft.functions.Functions

/** Native codegen expression `sorted_intersect_size`. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_intersect_size: merge walk over sorted distinct arrays") {
    Functions.register(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d"), 2),
      (Seq("a"), Seq("a"), 1),
      (Seq[String](), Seq("a"), 0),
      (Seq("a", "z"), Seq("b", "y"), 0))
      .toDF("a", "b", "want")
    val got = df.select(
      call_function("sorted_intersect_size", $"a", $"b").as("got"), $"want")
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // null propagation
    val n = Seq((Seq("a"), null.asInstanceOf[Seq[String]])).toDF("a", "b")
      .select(call_function("sorted_intersect_size", $"a", $"b")).collect()
    assert(n(0).isNullAt(0))
    // agrees with the built-in on arbitrary sorted-distinct input
    val docs = graft.queries.Q.tbl(spark, sf(), "documents")
      .select(sort_array(array_distinct(split($"text", " "))).as("t1"),
        sort_array(array_distinct(split(reverse($"text"), " "))).as("t2"))
    val diff = docs.select(
        call_function("sorted_intersect_size", $"t1", $"t2").as("native"),
        size(array_intersect($"t1", $"t2")).as("builtin"))
      .filter($"native" =!= $"builtin").count()
    assert(diff == 0)
  }

  test("positional_eq_count: agreement count equals the HOF form") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 9L, 3L), 2),
      (Seq(1L, 2L), Seq(1L, 2L), 2),
      (Seq(7L), Seq(8L), 0),
      (Seq.empty[Long], Seq.empty[Long], 0))
      .toDF("a", "b", "want")
    df.select(call_function("positional_eq_count", $"a", $"b").as("got"), $"want")
      .collect().foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // null propagation
    val n = Seq((Seq(1L), null.asInstanceOf[Seq[Long]])).toDF("a", "b")
      .select(call_function("positional_eq_count", $"a", $"b")).collect()
    assert(n(0).isNullAt(0))
    // agrees with the interpreted HOF on arbitrary signatures
    val sigs = graft.ext.TextDedup.minhashSignatures(
      graft.queries.Q.tbl(spark, sf(), "documents"), "doc_id", "text", 16, 2)
      .select(array((0 until 16).map(i => col(s"mh_$i")): _*).as("s"))
      .limit(200).localCheckpoint(true)
    val pairs = sigs.as("x").crossJoin(sigs.as("y").limit(20))
    val hof = aggregate(
      zip_with(col("x.s"), col("y.s"),
        (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
          when(a === b, 1).otherwise(0)),
      lit(0), (acc: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) => acc + v)
    val mism = pairs.select(
        call_function("positional_eq_count", col("x.s"), col("y.s")).as("native"),
        hof.as("builtin"))
      .filter($"native" =!= $"builtin").count()
    assert(mism == 0)
  }

  test("GraftExtensions injects the native functions for cluster-wide use") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions()(ext)
    // the same hook SparkSession applies at session build time
    val reg = org.apache.spark.sql.GraftExtensionsProbe
      .register(ext, FunctionRegistry.builtin.clone())
    val args = Seq[org.apache.spark.sql.catalyst.expressions.Expression](
      Literal(1), Literal(2))
    assert(reg.lookupFunction(FunctionIdentifier("sorted_intersect_size"), args)
      .isInstanceOf[graft.functions.SortedIntersectSize])
    assert(reg.lookupFunction(FunctionIdentifier("vector_dot"), args)
      .isInstanceOf[graft.functions.VectorDot])
    assert(reg.lookupFunction(FunctionIdentifier("positional_eq_count"), args)
      .isInstanceOf[graft.functions.PositionalEqCount])
  }
}
