package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hashed_ngrams(text, n)` — the DISTINCT word n-gram hashes of a
  * document in one pass over its UTF-8 bytes, bit-identical to the
  * column form `transform(array_distinct(ngrams(text, n)), xxhash64)`
  * it replaces ([[graft.ext.Curation.ngrams]] semantics: tokens split
  * on single spaces; a document shorter than n tokens contributes its
  * whole token sequence as one gram; first-occurrence order, seed-42
  * xxhash64 of each gram string).
  *
  * Why native: the column form chains four higher-order functions
  * (`sequence` → `transform(concat_ws(slice))` → `array_distinct` →
  * `transform(xxhash64)`), each a CodegenFallback evaluated lambda-per-
  * element, and materializes every gram as a string — an 8-gram build
  * copies ~8× the corpus through UTF8String allocations before hashing.
  * Because tokens are split on SINGLE spaces, every gram is an exact
  * byte-substring of the original text (`concat_ws(" ", toks[i..i+n-1])`
  * reproduces the separators verbatim, including empty tokens from
  * runs of spaces), so this expression hashes byte ranges of the input
  * in place with Spark's own XXH64 — zero gram materialization, zero
  * lambda dispatch. It is the shared front of the dedup family's
  * shingles ([[graft.ext.TextDedup.hashedShingles]]) and the curation
  * family's gram builder, i.e. the scan stage of x02/x04/x16/x21/x26.
  *
  * `n` must be a foldable literal in 1..64. Null text yields null for
  * EVERY n — a deliberate divergence from the HOF form, which produced
  * `[xxhash64("")]` for n ≥ 2 (concat_ws swallows the null token array)
  * but null for n = 1; see [[graft.ext.TextDedup.hashedShingles]].
  */
case class HashedNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if !right.foldable =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal n")
      case (StringType, IntegerType) =>
        val n = right.eval().asInstanceOf[Int]
        if (n >= 1 && n <= 64) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName n must be in 1..64, got $n")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string text, int n), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HashedNgrams.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashedNgrams.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hashed_ngrams_all(text, n)` — [[HashedNgrams]] WITHOUT the distinct:
  * every sliding gram occurrence hashes in position order, multiplicity
  * kept. The occurrence-level front of stride-1 duplication analytics
  * ([[graft.ext.Curation.duplicatedGramStats]]), where dropping repeats
  * would undercount the very thing being measured. Same tokenization,
  * seed, short-document and null semantics as the distinct form;
  * bit-identical to `transform(ngrams(text, n), xxhash64)`. */
case class HashedNgramsAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_ngrams_all"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if !right.foldable =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal n")
      case (StringType, IntegerType) =>
        val n = right.eval().asInstanceOf[Int]
        if (n >= 1 && n <= 64) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName n must be in 1..64, got $n")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string text, int n), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HashedNgrams.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[Int],
      distinct = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashedNgrams.compute($a, $b, false);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HashedNgrams {

  /** Same seed as Spark's `xxhash64(...)` with no explicit seed arg. */
  private val Seed = 42L

  def compute(text: UTF8String, n: Int): GenericArrayData =
    compute(text, n, distinct = true)

  def compute(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    // token i spans [starts(i), ends(i)): starts follow each 0x20 byte
    // (a UTF-8 continuation byte is >= 0x80, so a raw byte scan for the
    // space is exactly the `split(text, " ")` tokenization)
    var starts = new Array[Int](math.max(8, len / 8))
    var t = 0
    starts(0) = 0; t = 1
    var p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        if (t == starts.length) starts = java.util.Arrays.copyOf(starts, t * 2)
        starts(t) = p + 1; t += 1
      }
      p += 1
    }
    // gram i = bytes [starts(i), end of token i+n-1); the end of token j
    // is starts(j+1)-1 (the separating space) except the last, which is len
    def tokEnd(j: Int): Int = if (j + 1 < t) starts(j + 1) - 1 else len
    val set = if (distinct) new LongSeenSet(16) else null
    val out = new LongBuf(math.max(8, t))
    if (t >= n) {
      var i = 0
      val last = t - n
      while (i <= last) {
        val s = starts(i)
        val h = XXH64.hashUnsafeBytes(base, off + s, tokEnd(i + n - 1) - s, Seed)
        if (set == null || set.add(h)) out.append(h)
        i += 1
      }
    } else {
      // shorter than n tokens: the whole token sequence is one gram,
      // and `concat_ws(" ", toks)` is the entire input string verbatim
      out.append(XXH64.hashUnsafeBytes(base, off, len, Seed))
    }
    new GenericArrayData(out.toArray)
  }

  /** Minimal open-addressed long set (linear probe, power-of-2 table,
    * explicit zero-slot flag) — the gram loop is the hottest scan in the
    * curation/dedup family and must not box per element. */
  private final class LongSeenSet(initCap: Int) {
    private var cap = Integer.highestOneBit(math.max(initCap, 8) * 2 - 1) << 1
    private var table = new Array[Long](cap)
    private var size = 0
    private var seenZero = false

    /** true iff `v` was not present (i.e. this call inserted it). */
    def add(v: Long): Boolean = {
      if (v == 0L) {
        if (seenZero) return false
        seenZero = true; return true
      }
      var i = idx(v)
      while (table(i) != 0L) {
        if (table(i) == v) return false
        i = (i + 1) & (cap - 1)
      }
      table(i) = v; size += 1
      if (size * 2 > cap) grow()
      true
    }

    private def idx(v: Long): Int =
      ((v ^ (v >>> 32)).toInt * -1640531527) & (cap - 1)

    private def grow(): Unit = {
      val old = table
      cap <<= 1
      table = new Array[Long](cap)
      size = 0
      var i = 0
      while (i < old.length) {
        val v = old(i)
        if (v != 0L) {
          var j = idx(v)
          while (table(j) != 0L) j = (j + 1) & (cap - 1)
          table(j) = v; size += 1
        }
        i += 1
      }
    }
  }

  private final class LongBuf(initCap: Int) {
    private var a = new Array[Long](math.max(initCap, 8))
    private var n = 0
    def append(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def toArray: Array[Long] = java.util.Arrays.copyOf(a, n)
  }
}
