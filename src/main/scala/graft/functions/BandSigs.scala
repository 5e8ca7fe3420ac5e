package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst kernel for the LSH band signatures of
  * [[graft.similarity.Ann.bandSignatures]]: ALL `bands` signed-
  * hyperplane signatures of one vector in a single fused loop with
  * whole-stage codegen.
  *
  * WHY AN EXPRESSION (the [[LangIdMargins]]/[[SquaredDistance]]
  * preference order, guide §4): the column-algebra form evaluates one
  * interpreted `aggregate` fold per hyperplane — bands × bitsPerBand
  * folds of `dim` lambda dispatches each (16 × 64 = 1024 interpreted
  * steps per row at the embedding family's defaults), and that
  * interpreted tax IS the signing stage. The kernel walks the vector
  * once per plane with no allocation and no dispatch.
  *
  * BIT PARITY with the HOF form it replaces (spec-pinned): each dot
  * accumulates left-to-right in index order (acc + v[i]·p[i] — the
  * same IEEE adds), the bit is `dot > 0`, and the band signature is
  * Σ bit_j · 2^j in integer math. Degenerate inputs replicate the HOF
  * fold exactly: a vector SHORTER than `dim` throws (ANSI element_at
  * past the end — malformed fixed-dim input is a caller bug and must
  * fail loud, the SquaredDistance stance), a null ELEMENT inside
  * [0, dim) nulls every dot so every bit drops to 0 (the all-zero
  * signature array), and a NULL vector yields NULL here with the call
  * site coalescing to all-zero — what `when(null > 0, 1).otherwise(0)`
  * produced per bit. */
case class BandSigs(
    child: Expression,
    planesFlat: Array[Double], bands: Int, bitsPerBand: Int, dim: Int)
  extends UnaryExpression {

  require(bands >= 1 && bitsPerBand >= 1 && dim >= 1,
    s"bad banding geometry: bands=$bands bits=$bitsPerBand dim=$dim")
  require(planesFlat.length == bands.toLong * bitsPerBand * dim,
    s"planesFlat length ${planesFlat.length} != bands*bits*dim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "band_sigs"

  private def elemOk(t: DataType): Boolean = t match {
    case FloatType | DoubleType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if elemOk(t) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a numeric array input, got ${other.simpleString}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim)
      throw new IllegalArgumentException(
        s"$prettyName: vector has ${v.numElements()} elements, needs $dim")
    val sigs = new Array[Int](bands)
    if (!hasNullPrefix(v)) {
      val t = elemType
      var b = 0
      while (b < bands) {
        var sig = 0
        var j = 0
        while (j < bitsPerBand) {
          val base = (b * bitsPerBand + j) * dim
          var acc = 0.0
          var i = 0
          while (i < dim) { acc += get(v, i, t) * planesFlat(base + i); i += 1 }
          if (acc > 0) sig += 1 << j
          j += 1
        }
        sigs(b) = sig
        b += 1
      }
    }
    new GenericArrayData(sigs)
  }

  private def hasNullPrefix(v: ArrayData): Boolean = {
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case _           => a.getDouble(i)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elemType match {
      case FloatType   => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case ByteType    => (a: String, i: String) => s"(double) $a.getByte($i)"
      case ShortType   => (a: String, i: String) => s"(double) $a.getShort($i)"
      case IntegerType => (a: String, i: String) => s"(double) $a.getInt($i)"
      case LongType    => (a: String, i: String) => s"(double) $a.getLong($i)"
      case _           => (a: String, i: String) => s"$a.getDouble($i)"
    }
    val pRef = ctx.addReferenceObj("bandPlanes", planesFlat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val sigs = ctx.freshName("sigs"); val ok = ctx.freshName("ok")
      val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig"); val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "band_sigs: vector has " + $v.numElements() + " elements, needs " + $dim);
         |}
         |int[] $sigs = new int[$bands];
         |boolean $ok = true;
         |for (int $i = 0; $i < $dim; $i++) if ($v.isNullAt($i)) { $ok = false; break; }
         |if ($ok) {
         |  for (int $b = 0; $b < $bands; $b++) {
         |    int $sig = 0;
         |    for (int $j = 0; $j < $bitsPerBand; $j++) {
         |      int $base = ($b * $bitsPerBand + $j) * $dim;
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $acc += ${getter(v, i)} * $pRef[$base + $i];
         |      }
         |      if ($acc > 0) $sig += 1 << $j;
         |    }
         |    $sigs[$b] = $sig;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BandSigs =
    copy(child = newChild)
}

object BandSigs {
  /** Column-API entry point: all band signatures of `vec` under the
    * given flattened plane matrix (plane-major, `dim` doubles each). */
  def sigs(vec: Column, planesFlat: Array[Double],
      bands: Int, bitsPerBand: Int, dim: Int): Column =
    ColumnBridge.column(BandSigs(
      ColumnBridge.expression(vec), planesFlat, bands, bitsPerBand, dim))
}
