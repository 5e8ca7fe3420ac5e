package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernel for character n-gram extraction: all
  * `length − n + 1` grams of a string in ONE fused pass (r20, guide §4
  * — the [[WordNgrams]]/[[LangIdMargins]] preference order).
  *
  * WHY AN EXPRESSION: the column-algebra form —
  * `transform(sequence(1, length(t) − (n−1)), i => substr(t, i, n))` —
  * pays an interpreted higher-order lambda dispatch per gram AND an
  * O(i) scan per `substr` (UTF-8 character indexing is a linear walk
  * from byte 0), so a document costs O(len²) character work. The
  * kernel builds the char→byte offset table once and emits each gram
  * as one byte-window copy — O(len) + O(grams).
  *
  * BIT PARITY (spec-pinned in TextSpec against the column-algebra
  * twin): gram i is exactly `substring(t, i, n)` — the same chars,
  * the same bytes. Strings shorter than n yield an EMPTY array where
  * the twin's `when(length >= n, …)` yields null — both explode to
  * zero rows at every call site. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharNgrams.compute($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {

  /** The fused per-row pass — static so interpreted eval and codegen
    * share one implementation (the [[DeflateRatio]] pattern). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    if (len < n) return new GenericArrayData(new Array[Any](0))
    val base = text.getBaseObject
    val off = text.getBaseOffset
    // char-position → byte-offset table in one pass (the LangIdMargins
    // r20 shape)
    val offs = new Array[Int](len + 1)
    var p = 0
    var ci = 0
    while (ci < len) {
      offs(ci) = p
      p += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + p))
      ci += 1
    }
    offs(len) = text.numBytes()
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val s = offs(i); val e = offs(i + n)
      val bytes = new Array[Byte](e - s)
      org.apache.spark.unsafe.Platform.copyMemory(
        base, off + s, bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        (e - s).toLong)
      out(i) = UTF8String.fromBytes(bytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: all character `n`-grams of `text`. */
  def ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(text), n))
}
