package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst cosine-similarity over two numeric arrays.
  *
  * The ANN hot path evaluates this once per (query, candidate) pair —
  * at scale, millions of times per task — so it is a fused single-pass
  * loop (dot product and both norms in one traversal) with whole-stage
  * codegen via [[doGenCode]]: no per-element boxing, no intermediate
  * arrays, unlike a `zip_with`/`aggregate` higher-order formulation or
  * a Scala UDF (both allocate per row).
  *
  * Arrays shorter than the other operand are truncated to the common
  * prefix; zero-norm inputs yield 0.0. Computation is double-precision
  * regardless of element type.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    // integral element types serve the int8-quantized path
    // (graft.similarity.Quantize): the int8 dot product runs in the
    // same fused kernel, accumulation stays double
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType | ByteType | ShortType |
                     IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs numeric array inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case _           => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, ta); val y = get(b, i, tb)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case ByteType    => s"(double) $arr.getByte($i)"
      case ShortType   => s"(double) $arr.getShort($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case _           => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(elemType(left), a, i)};
         |  double $y = ${getter(elemType(right), b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `cosineSim($"a", $"b")`. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `cosine_similarity(a, b)` for SQL use in this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "cosine_similarity", {
      case Seq(a, b) => CosineSimilarity(a, b)
      case args => throw new IllegalArgumentException(
        s"cosine_similarity expects 2 arguments, got ${args.size}")
    })
}
