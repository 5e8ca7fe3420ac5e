package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst deflate-compression ratio over a string column —
  * the information-theoretic generalization of Gopher's repetition
  * rules (Rae et al. 2021 measure repeated-n-gram fractions for a few
  * fixed n; a general-purpose compressor measures ALL of them at
  * once): boilerplate, keyword-stuffed spam and template farms
  * compress far below prose, so `compressed_bytes / raw_bytes` is a
  * one-number repetition/entropy signal, and public corpus releases
  * ship it as a per-document quality column.
  *
  * Runs once per document in the hygiene scan, so it is a native
  * expression inside whole-stage codegen (no UDF serialization, no
  * row boxing) calling a static kernel that REUSES a thread-local
  * `Deflater` and output buffer — a fresh Deflater per row would pay
  * native allocation per document. Only the compressed SIZE is
  * counted; compressed bytes are never materialized.
  *
  * Deterministic for a fixed JDK (zlib level fixed per expression;
  * same input → same size on every executor), but NOT replayable in
  * DuckDB — the query rides the rows-only ⊘ gate with CompressSpec
  * pinning the semantic contract (repetition compresses, prose
  * doesn't; empty → 1.0; stability across evaluations).
  */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String].getBytes, level)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateRatio.ratio($c.getBytes(), $level)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {

  require(Deflater.DEFAULT_COMPRESSION == -1) // the sentinel we document below

  // one Deflater + scratch buffer per (thread, level): Deflater holds
  // native state, so construction per row would dominate the kernel
  private val deflaters = new ThreadLocal[java.util.HashMap[Integer, Deflater]] {
    override def initialValue() = new java.util.HashMap[Integer, Deflater]()
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue() = new Array[Byte](64 * 1024)
  }

  /** Compressed-size / raw-size for `bytes` at zlib `level` (1-9, or
    * -1 for zlib's default). Empty input → 1.0 (nothing to judge).
    * Raw deflate (no zlib header) so tiny documents aren't dominated
    * by framing bytes. */
  def ratio(bytes: Array[Byte], level: Int): Double = {
    if (bytes.length == 0) return 1.0
    val pool = deflaters.get()
    var d = pool.get(level)
    if (d == null) { d = new Deflater(level, true); pool.put(level, d) }
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Column-API entry point: `deflateRatio($"text")`. Level 6 is
    * zlib's speed/density sweet spot and the usual corpus-pipeline
    * choice. */
  def deflateRatio(c: Column, level: Int = 6): Column = {
    require(level == Deflater.DEFAULT_COMPRESSION || (level >= 1 && level <= 9),
      s"zlib level must be 1-9 or -1 (default), got $level")
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(c), level))
  }

  /** Register `deflate_ratio(text[, level])` for SQL use. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "deflate_ratio", {
      case Seq(c) => DeflateRatio(c, 6)
      case Seq(c, l) => DeflateRatio(c,
        l.eval().asInstanceOf[Number].intValue())
      case args => throw new IllegalArgumentException(
        s"deflate_ratio expects 1-2 arguments, got ${args.size}")
    })
}
