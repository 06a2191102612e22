package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode_len(text, mergeLefts, mergeRights)` — total token count
  * of `text` after applying the learned BPE merge table: whitespace
  * words split to characters, then each merge rule contracts adjacent
  * (l, r) occurrences non-overlapping leftmost-first (exactly
  * `Curation.contractPair`'s pending-symbol fold), and the surviving
  * symbol counts sum. One tight scan-local loop per row — the
  * higher-order-function form it replaces interprets a struct-building
  * lambda per SYMBOL per MERGE (8 merges × ~6 chars/word ≈ 50
  * interpreted closures per word), which made the encode the most
  * CPU-bound stage on the bench. Bit-identical by the parity spec
  * (ExtOpsSpec) including multi-space / trailing-space / empty edge
  * cases, and end-to-end hash-checked by x93's independent naive
  * oracle. */
case class BpeEncodeLen(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_encode_len"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>, array<string>), got $other")
    }

  override def nullSafeEval(t: Any, l: Any, r: Any): Any =
    BpeEncodeLen.compute(t.asInstanceOf[UTF8String],
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l, r) =>
      s"${ev.value} = graft.functions.BpeEncodeLen.compute($t, $l, $r);")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

object BpeEncodeLen {

  def compute(text: UTF8String, lefts: ArrayData, rights: ArrayData): Long = {
    val nm = lefts.numElements()
    val ls = new Array[String](nm)
    val rs = new Array[String](nm)
    var m = 0
    while (m < nm) {
      ls(m) = lefts.getUTF8String(m).toString
      rs(m) = rights.getUTF8String(m).toString
      m += 1
    }
    val s = text.toString
    // Spark's split(text, " ") keeps ALL empty tokens (limit -1), and
    // split("", "") of the empty word yields [""] — one phantom symbol
    // no merge rule can touch. Replicated exactly; the parity spec
    // pins both edges.
    val words = s.split(" ", -1)
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.isEmpty) total += 1L
      else {
        // symbols: one String per Unicode code point (split(w, "")
        // operates on characters, surrogate pairs staying joined)
        var syms = new java.util.ArrayList[String](w.length)
        var ci = 0
        while (ci < w.length) {
          val cp = w.codePointAt(ci)
          val n = Character.charCount(cp)
          syms.add(w.substring(ci, ci + n))
          ci += n
        }
        m = 0
        while (m < nm && syms.size > 1) {
          val l = ls(m); val r = rs(m); val merged = l + r
          val out = new java.util.ArrayList[String](syms.size)
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms.get(i) == l && syms.get(i + 1) == r) {
              out.add(merged); i += 2 // leftmost-first, non-overlapping
            } else { out.add(syms.get(i)); i += 1 }
          }
          syms = out
          m += 1
        }
        total += syms.size
      }
      wi += 1
    }
    total
  }
}
