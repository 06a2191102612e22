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
}
