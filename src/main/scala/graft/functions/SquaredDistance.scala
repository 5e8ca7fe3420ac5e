package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst squared-L2 distance over two numeric arrays.
  *
  * The IVF coarse quantizer evaluates this k times per row — once per
  * centroid — on both the build path ([[graft.similarity.Ann.ivfIndex]]
  * / `ivfAssign`) and the query path (`knnIvf`'s probe-cell
  * selection), so like [[CosineSimilarity]] it is a fused single-pass
  * loop with whole-stage codegen: no per-element boxing, no lambda
  * dispatch, unlike the `aggregate` higher-order formulation (a
  * CodegenFallback that interprets its lambda per element — measured
  * 2× on the q96a IVF bench when it briefly sat on the build path).
  * Summation is sequential in index order, so the result is
  * bit-identical to the left-to-right `aggregate` fold it replaces —
  * the ivfIndex ≡ ivfAssign equivalence is arithmetic, not just
  * semantic.
  *
  * Length-mismatched inputs yield NULL (r18 advice: the IVF argmin
  * consumes these distances, and a silently-truncated prefix distance
  * assigns a vector to a confidently wrong cell — the `aggregate`
  * formulation this kernel replaced surfaced dim mismatches as null,
  * and a distance that feeds a selection must keep that contract).
  * Computation is double-precision regardless of element type.
  */
case class SquaredDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_distance"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
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
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, i, ta) - get(b, i, tb)
      acc += d * d
      i += 1
    }
    acc
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
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${getter(elemType(left), a, i)} - ${getter(elemType(right), b, i)};
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  /** Column-API entry point: `sqDist($"a", $"b")`. */
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(
      SquaredDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `squared_distance(a, b)` for SQL use in this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "squared_distance", {
      case Seq(a, b) => SquaredDistance(a, b)
      case args => throw new IllegalArgumentException(
        s"squared_distance expects 2 arguments, got ${args.size}")
    })
}
