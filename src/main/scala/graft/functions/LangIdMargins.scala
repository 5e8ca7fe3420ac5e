package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernel for [[graft.text.LangId]] scoring: all K
  * class margins of the hashed-char-n-gram linear model in ONE fused
  * per-row loop with whole-stage codegen.
  *
  * WHY AN EXPRESSION: the scoring algebra is expressible with
  * higher-order functions (build grams → hash → fold margins), but
  * every HOF step is an interpreted lambda dispatch (HigherOrderFunction
  * is CodegenFallback) costing ~1 µs — at ~600 grams × K classes per
  * row that interpreted tax IS the operator (measured 5+ s for a
  * 5k-doc pass that this kernel does in a fraction of one). The brief's
  * preference order applies: a native Expression with `doGenCode`
  * beats the HOF formulation beats a UDF. The grammar is tiny and
  * fixed, so the fused loop is small: lowercase prefix once, slide
  * n-gram windows, murmur3 each gram, add K flat-array weights.
  *
  * FEATURE-MAP PARITY (the [[graft.text.QualityFilter]] discipline —
  * train and score must share one hash): grams are
  * `UTF8String.toLowerCase.substringSQL` windows (exactly SQL
  * `substring(lower(text), i, n)`) and the bucket is
  * `pmod(Murmur3_x86_32.hashUnsafeBytes(gram, 42), dim)` — the same
  * bytes-and-seed murmur3 that SQL `hash(gram)` compiles to, so a
  * model TRAINED through the column-algebra featurizer scores
  * identically here (LangIdSpec pins expression == HOF margins
  * bit-for-bit). Null text yields the null row (callers coalesce to
  * '' for the intercept prior).
  */
case class LangIdMargins(
    child: Expression,
    weightsFlat: Array[Double], intercepts: Array[Double],
    dim: Int, minN: Int, maxN: Int, maxChars: Int)
  extends UnaryExpression {

  private val k = intercepts.length
  require(weightsFlat.length == k.toLong * dim,
    s"weightsFlat length ${weightsFlat.length} != k*dim = ${k.toLong * dim}")
  require(1 <= minN && minN <= maxN && maxChars >= 1 && dim >= 1)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "langid_margins"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val prefix = input.asInstanceOf[UTF8String].toLowerCase.substringSQL(1, maxChars)
    val len = prefix.numChars()
    val base = prefix.getBaseObject
    val off = prefix.getBaseOffset
    // Char-position → byte-offset table, built in ONE pass: gram
    // windows then hash raw byte ranges directly. The substringSQL
    // form this replaces re-scanned the prefix from byte 0 on EVERY
    // gram (UTF-8 char indexing is a linear walk) and allocated a
    // UTF8String per gram — O(len²) character work per row (r20,
    // guide §4; same bytes hashed, bit-identical margins, pinned
    // against the column-algebra twin by LangIdSpec).
    val offs = new Array[Int](len + 1)
    var p = 0
    var ci = 0
    while (ci < len) {
      offs(ci) = p
      p += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + p))
      ci += 1
    }
    offs(len) = prefix.numBytes()
    val m = java.util.Arrays.copyOf(intercepts, k)
    var n = minN
    while (n <= maxN) {
      var i = 0
      while (i + n <= len) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(base, off + offs(i), offs(i + n) - offs(i), 42)
        val b = ((h % dim) + dim) % dim
        var c = 0
        while (c < k) { m(c) += weightsFlat(c * dim + b); c += 1 }
        i += 1
      }
      n += 1
    }
    new GenericArrayData(m)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("langidWeights", weightsFlat, "double[]")
    val bRef = ctx.addReferenceObj("langidIntercepts", intercepts, "double[]")
    nullSafeCodeGen(ctx, ev, s => {
      val prefix = ctx.freshName("prefix"); val len = ctx.freshName("len")
      val m = ctx.freshName("m"); val offs = ctx.freshName("offs")
      val base = ctx.freshName("base"); val off = ctx.freshName("off")
      val p = ctx.freshName("p"); val ci = ctx.freshName("ci")
      val h = ctx.freshName("h"); val b = ctx.freshName("b")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      // char-position → byte-offset table in one pass, then hash raw
      // byte ranges: the substringSQL-per-gram form re-scanned the
      // prefix from byte 0 per gram (O(len²)) and allocated per gram
      // — see nullSafeEval (r20)
      s"""
         |UTF8String $prefix = $s.toLowerCase().substringSQL(1, $maxChars);
         |int $len = $prefix.numChars();
         |Object $base = $prefix.getBaseObject();
         |long $off = $prefix.getBaseOffset();
         |int[] $offs = new int[$len + 1];
         |int $p = 0;
         |for (int $ci = 0; $ci < $len; $ci++) {
         |  $offs[$ci] = $p;
         |  $p += UTF8String.numBytesForFirstByte(
         |    org.apache.spark.unsafe.Platform.getByte($base, $off + $p));
         |}
         |$offs[$len] = $prefix.numBytes();
         |double[] $m = java.util.Arrays.copyOf($bRef, $k);
         |for (int $n = $minN; $n <= $maxN; $n++) {
         |  for (int $i = 0; $i + $n <= $len; $i++) {
         |    int $h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |      $base, $off + $offs[$i], $offs[$i + $n] - $offs[$i], 42);
         |    int $b = (($h % $dim) + $dim) % $dim;
         |    for (int $c = 0; $c < $k; $c++) $m[$c] += $wRef[$c * $dim + $b];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($m);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdMargins =
    copy(child = newChild)
}

object LangIdMargins {
  /** Column-API entry point over a fitted [[graft.text.LangId.Model]]. */
  def margins(text: Column, model: graft.text.LangId.Model): Column =
    ColumnBridge.column(LangIdMargins(
      ColumnBridge.expression(text),
      model.weights.flatten, model.intercepts,
      model.dim, model.minN, model.maxN, model.maxChars))
}
