package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_chunks(text, divisor)` — FastCDC-style content-defined chunking
  * of a whitespace-tokenized document: a rolling polynomial hash
  * (`h·31 + codepoint mod 1e9+7`) per word, and a chunk boundary after
  * every word whose hash ≡ 0 (mod divisor); the trailing partial chunk
  * is kept. One tight scan-local pass replacing the interpreted
  * HOF fold in `Curation.cdcChunkDedup`, which evaluated the per-word
  * char-hash aggregate TWICE per word (once per struct branch) through
  * Catalyst's interpreter. Bit-identical by the parity spec
  * (ExtOpsSpec), including multi-space and unicode edges; x84 stays
  * oracle-exact end to end. */
case class CdcChunks(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got $other")
    }

  override def nullSafeEval(t: Any, d: Any): Any =
    CdcChunks.compute(t.asInstanceOf[UTF8String], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.functions.CdcChunks.compute($t, $d);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}

object CdcChunks {
  private val P = 1000000007L

  def compute(text: UTF8String, divisor: Int): ArrayData = {
    val s = text.toString
    // split(text, " ") keeps empty tokens (limit -1) — an empty word
    // hashes to 0, which IS a boundary (0 % d == 0), matching the fold
    val words = s.split(" ", -1)
    val chunks = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val cur = new java.lang.StringBuilder()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var h = 0L
      var ci = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci) // mirrors Spark ascii() on split(w, "")
        h = (h * 31 + cp) % P
        ci += Character.charCount(cp)
      }
      if (cur.length() > 0) cur.append(' ')
      cur.append(w)
      if (h % divisor == 0) {
        chunks += UTF8String.fromString(cur.toString)
        cur.setLength(0)
      }
      wi += 1
    }
    if (cur.length() > 0) chunks += UTF8String.fromString(cur.toString)
    new GenericArrayData(chunks.toArray[Any])
  }
}
