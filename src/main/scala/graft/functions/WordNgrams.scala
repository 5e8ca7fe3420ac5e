package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernel for the dedup family's word n-gram
  * shingling: lowercase → alphanumeric tokenization → space-joined
  * n-grams, all in ONE fused per-row pass (r20, guide §4 — the
  * [[LangIdMargins]]/[[BandSigs]] preference order).
  *
  * WHY AN EXPRESSION: the column-algebra form —
  * `transform(sequence(1, len−n+1), i => concat_ws(" ",
  * element_at(ws, i) … element_at(ws, i+n−1)))` over
  * `filter(split(lower(text), "[^a-z0-9]+"), _ =!= "")` — pays a Java
  * regex scan, an array allocation per token, and an interpreted
  * higher-order lambda dispatch per shingle (HigherOrderFunction is
  * CodegenFallback). This kernel lowercases once and scans bytes once:
  * tokens are the maximal runs of ASCII [a-z0-9] bytes, which on the
  * LOWERCASED string is exactly what splitting on the complement
  * class yields (multi-byte UTF-8 code units sit entirely above 0x7F,
  * so every byte of a non-ASCII character is a delimiter byte,
  * exactly as the regex treats the character); each n-gram is one
  * byte-copy of the window plus single spaces — the same bytes
  * `concat_ws(" ", …)` produced. BIT PARITY with the retained
  * column-algebra twin ([[graft.dedup.TextDedup.shingleItemsHof]]) is
  * spec-pinned on real corpus text plus adversarial unicode.
  *
  * Fewer than n tokens (or a null input, which yields null and is
  * dropped by the downstream explode exactly like the old
  * `size(ws) >= n` pre-filter) → empty array. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.WordNgrams.compute($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  /** The fused per-row pass — static so interpreted eval and codegen
    * share one implementation (the [[DeflateRatio]] pattern). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val lowered = text.toLowerCase
    val nb = lowered.numBytes()
    val base = lowered.getBaseObject
    val off = lowered.getBaseOffset
    // token boundaries: maximal runs of ASCII [a-z0-9]
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    var inTok = false
    while (i < nb) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      val alnum = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (alnum && !inTok) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = i
        inTok = true
      } else if (!alnum && inTok) { ends(nTok) = i; nTok += 1; inTok = false }
      i += 1
    }
    if (inTok) { ends(nTok) = nb; nTok += 1 }
    if (nTok < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](nTok - n + 1)
    var t = 0
    while (t <= nTok - n) {
      var len = n - 1 // the joining spaces
      var j = 0
      while (j < n) { len += ends(t + j) - starts(t + j); j += 1 }
      val bytes = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { bytes(p) = ' '; p += 1 }
        val s = starts(t + j); val e = ends(t + j)
        org.apache.spark.unsafe.Platform.copyMemory(
          base, off + s, bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + p, (e - s).toLong)
        p += e - s
        j += 1
      }
      out(t) = UTF8String.fromBytes(bytes)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: the space-joined word `n`-grams of the
    * lowercased alphanumeric tokens of `text`. */
  def ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))
}
