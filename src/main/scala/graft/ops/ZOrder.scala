package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional pruning.
  *
  * A 100 TB table filtered on several independent dimensions cannot be
  * range-partitioned to serve all of them: sorting by `a` scatters
  * `b`. Interleaving the bits of both (the Morton curve) gives every
  * file a TIGHT min/max envelope in EVERY participating dimension, so
  * parquet footer stats prune files for filters on any of them — the
  * standard lakehouse answer (Delta/Iceberg `ZORDER BY`), and the
  * layout [[graft.llm.QueryBuilder.suggestIndexes]] recommends when a
  * query carries 2+ range predicates; this operator is what applies
  * that recommendation.
  *
  * Spark-shaped: ONE stats pass collects per-column bounds, the
  * z-value is a pure codegen'd bit-interleave expression (no UDF),
  * and the layout is `repartitionByRange(_z)` + sort-within-partition
  * — exactly one shuffle, the same cost as any global sort, after
  * which the column is dropped (the layout IS the artifact). */
object ZOrder {

  /** Interleave the low `bits` bits of each (already `[0, 2^bits)`)
    * column: bit j of column i lands at position `j·n + i`. Pure
    * integer arithmetic — codegen keeps all `bits·n` terms in one
    * whole-stage method. `bits · n ≤ 63` keeps the key positive. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "interleave needs at least one column")
    require(bits >= 1 && bits * n <= 63,
      s"bits * columns must be in [1, 63], got $bits * $n")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(1), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min-max normalize a numeric column into `[0, 2^bits)` given its
    * bounds (nulls map to 0 — they sort first, like a null-first
    * range sort). Constant columns map to 0. */
  def normalize(c: Column, min: Column, max: Column, bits: Int): Column = {
    val span = max.cast("double") - min.cast("double")
    val scaled = when(c.isNull || span <= 0, 0L).otherwise(
      least(
        floor((c.cast("double") - min.cast("double")) / span * (1L << bits)).cast("long"),
        lit((1L << bits) - 1)))
    scaled
  }

  /** Rewrite `df` in z-order over `cols`: one aggregate pass for the
    * bounds, one range shuffle on the interleaved key, local sort,
    * key dropped. Write the result with any sink — every output file
    * then carries tight footer min/max on every `cols` member.
    *
    * `partitions` sizes the range shuffle (target file count);
    * `bits` trades key resolution against the 63-bit budget
    * (16 bits × up to 3 columns is the sweet spot). */
  def zOrderBy(
      df: DataFrame, cols: Seq[String],
      partitions: Int, bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "zOrderBy needs at least one column")
    require(partitions > 0, s"partitions must be positive, got $partitions")
    // one pass, all bounds (same single-job discipline as
    // Silver.autoClean's decision stats)
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"_min_$c"), max(col(c)).as(s"_max_$c")))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    val normalized = cols.map { c =>
      normalize(col(c),
        lit(b.getAs[Any](s"_min_$c")), lit(b.getAs[Any](s"_max_$c")), bits)
    }
    df.withColumn("_z", interleave(normalized, bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
