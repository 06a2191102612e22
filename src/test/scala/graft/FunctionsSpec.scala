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

  test("hyperplane_sig: bit-identical to the literal-tree form") {
    Functions.register(spark)
    val nBits = 16; val dim = 8; val seed = 42L
    // the pre-round-5 literal-tree builder, reconstructed as the reference:
    // same Random(seed) row-major Gaussian planes, same vector_dot
    // arithmetic, same strict-positive sign rule
    def literalSig(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val rnd = new scala.util.Random(seed)
      val planes = Array.fill(nBits, dim)(rnd.nextGaussian())
      planes.zipWithIndex.map { case (p, i) =>
        when(call_function("vector_dot", vec, array(p.map(lit): _*)) > 0,
          shiftleft(lit(1L), i)).otherwise(0L)
      }.reduce((a, b) => a.bitwiseOR(b))
    }
    // double vectors at varied lengths (shorter and longer than dim)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(12) + 1)(rnd.nextDouble() * 2 - 1)))
    val mism = rows.toDF("id", "v").select(
        call_function("hyperplane_sig", $"v", lit(nBits), lit(dim), lit(seed))
          .as("native"),
        literalSig($"v").as("reference"))
      .filter($"native" =!= $"reference").count()
    assert(mism == 0)
    // float vectors straight off the embeddings table
    val emb = graft.queries.Q.tbl(spark, sf(), "embeddings")
    val mismF = emb.select(
        call_function("hyperplane_sig", $"embedding", lit(nBits), lit(dim), lit(seed))
          .as("native"),
        literalSig($"embedding").as("reference"))
      .filter($"native" =!= $"reference").count()
    assert(mismF == 0)
    // null vector yields a null signature
    val n = Seq((1L, null.asInstanceOf[Seq[Double]])).toDF("id", "v")
      .select(call_function("hyperplane_sig", $"v", lit(nBits), lit(dim), lit(seed)))
      .collect()
    assert(n(0).isNullAt(0))
  }

  test("hyperplane_sig: production-dim (1536) plan stays scalar-sized") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    Functions.register(spark)
    val df = Seq((1L, Seq.fill(1536)(0.25))).toDF("id", "v")
      .select(call_function("hyperplane_sig", $"v", lit(64), lit(1536), lit(42L))
        .as("sig"))
    // the literal-tree form carried nBits*dim ≈ 100k Literal nodes here;
    // the native expression carries three scalars
    val lits = df.queryExecution.analyzed.expressions
      .map(_.collect { case l: Literal => l }.size).sum
    assert(lits < 10, s"expected a scalar-sized plan, got $lits literals")
    assert(df.collect().length == 1)
  }

  test("hashed_ngrams: bit-identical to the HOF distinct-then-hash form") {
    Functions.register(spark)
    // the column form this expression replaces — the parity reference
    def hofForm(text: org.apache.spark.sql.Column, n: Int) =
      transform(array_distinct(graft.ext.Curation.ngrams(text, n)),
        (g: org.apache.spark.sql.Column) => xxhash64(g))
    // string hazards: empty text, runs of spaces (empty tokens), leading/
    // trailing spaces, unicode multi-byte, repeated grams, docs shorter
    // than n, single token
    val hazards = Seq(
      "", " ", "  ", "a", "a b", "a  b", " a", "a ", "a b c",
      "x y x y x y x y", "héllo wörld ünïcode tæxt",
      "one two three four five six seven eight nine ten",
      "tab\tand\nnewline stay intact", "samegram samegram samegram")
    for (n <- Seq(1, 2, 3, 8)) {
      val rows = hazards.toDF("t").select(
          call_function("hashed_ngrams", $"t", lit(n)).as("native"),
          hofForm($"t", n).as("hof"), $"t")
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"n=$n text='${r.getString(2)}': ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}"))
    }
    // the real documents table, the n values the engine ships (x26=5, x21=8)
    for (n <- Seq(1, 5, 8)) {
      val mism = graft.queries.Q.tbl(spark, sf(), "documents")
        .select(call_function("hashed_ngrams", $"text", lit(n)).as("native"),
          hofForm($"text", n).as("hof"))
        .filter(not($"native" <=> $"hof")).count()
      assert(mism == 0, s"n=$n")
    }
    // null text → null for EVERY n (deliberate divergence: the HOF form
    // produced [xxhash64("")] for n >= 2 — concat_ws swallows the null
    // token array — but null for n = 1; the native form is uniform, so
    // null-text docs drop from every pair/contamination report instead
    // of pairing with empty-string docs)
    for (n <- Seq(1, 2, 8)) {
      val nl = Seq(null.asInstanceOf[String]).toDF("t")
        .select(call_function("hashed_ngrams", $"t", lit(n))).collect()
      assert(nl(0).isNullAt(0), s"n=$n")
    }
    val hofNull = Seq(null.asInstanceOf[String]).toDF("t")
      .select(hofForm($"t", 2)).collect()
    assert(!hofNull(0).isNullAt(0)) // the old inconsistency, not replicated
    intercept[Exception] {
      Seq(("a b", 2)).toDF("t", "n")
        .select(call_function("hashed_ngrams", $"t", $"n")).collect()
    }
  }

  test("hashed_ngrams_all: bit-identical to the HOF occurrence-level form") {
    Functions.register(spark)
    def hofForm(text: org.apache.spark.sql.Column, n: Int) =
      transform(graft.ext.Curation.ngrams(text, n),
        (g: org.apache.spark.sql.Column) => xxhash64(g))
    val hazards = Seq(
      "", " ", "  ", "a", "a b", "a  b", " a", "a ", "a b c",
      "x y x y x y x y", "héllo wörld ünïcode tæxt",
      "samegram samegram samegram")
    for (n <- Seq(1, 2, 3, 8)) {
      val rows = hazards.toDF("t").select(
          call_function("hashed_ngrams_all", $"t", lit(n)).as("native"),
          hofForm($"t", n).as("hof"), $"t")
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"n=$n text='${r.getString(2)}': ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}"))
    }
    for (n <- Seq(1, 5)) {
      val mism = graft.queries.Q.tbl(spark, sf(), "documents")
        .select(call_function("hashed_ngrams_all", $"text", lit(n)).as("native"),
          hofForm($"text", n).as("hof"))
        .filter(not($"native" <=> $"hof")).count()
      assert(mism == 0, s"n=$n")
    }
    // multiplicity is the point: repeats stay, order is positional
    val rep = Seq("p q p q").toDF("t")
      .select(call_function("hashed_ngrams_all", $"t", lit(2))).collect()
    assert(rep(0).getSeq[Long](0).length == 3) // [p q][q p][p q]
    assert(rep(0).getSeq[Long](0)(0) == rep(0).getSeq[Long](0)(2))
    // same null semantics as the distinct form
    for (n <- Seq(1, 2, 8)) {
      val nl = Seq(null.asInstanceOf[String]).toDF("t")
        .select(call_function("hashed_ngrams_all", $"t", lit(n))).collect()
      assert(nl(0).isNullAt(0), s"n=$n")
    }
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
    val args4 = Seq[org.apache.spark.sql.catalyst.expressions.Expression](
      Literal(1), Literal(2), Literal(3), Literal(4L))
    assert(reg.lookupFunction(FunctionIdentifier("hyperplane_sig"), args4)
      .isInstanceOf[graft.functions.HyperplaneSig])
    val args3 = args4.take(3)
    assert(reg.lookupFunction(FunctionIdentifier("bpe_encode_len"), args3)
      .isInstanceOf[graft.functions.BpeEncodeLen])
    assert(reg.lookupFunction(FunctionIdentifier("cdc_chunks"), args)
      .isInstanceOf[graft.functions.CdcChunks])
    // wrong arity reports a usable error, not IndexOutOfBoundsException
    val err = intercept[Exception] {
      reg.lookupFunction(FunctionIdentifier("hyperplane_sig"), args)
    }
    def rootChain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).map(rootChain).getOrElse(Nil)
    assert(rootChain(err).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("hyperplane_sig requires 4 argument(s)")), err.toString)
  }
}
