package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators Spark has no built-in for: gap sessionization
  * (batch form of streaming.Streaming.sessionize) and as-of joins.
  *
  * Both are single-shuffle window formulations: partition on the
  * entity key, one in-partition sort — linear in data, no driver
  * involvement, and AQE-splittable on skewed entities.
  */
object TimeOps {

  /** Epoch micros for TIMESTAMP and TIMESTAMP_NTZ columns alike.
    * `unix_micros()` accepts only TIMESTAMP; parquet `timestamp[us]`
    * written without `isAdjustedToUTC` reads back as TIMESTAMP_NTZ, so
    * event tables arrive in either encoding depending on the writer.
    * The cast is a no-op for TIMESTAMP; for NTZ it interprets the wall
    * time in the session timezone — every entry point (Verify, Bench,
    * GrowthBench, SparkSpec) pins `spark.sql.session.timeZone=UTC`, a
    * fixed-offset zone, so gaps/grains/frames are deterministic and
    * DST-free regardless of the source encoding. */
  def epochMicros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Gap-based sessions over a batch table: a new session starts when
    * the gap to the previous same-key event exceeds `gapMs`.
    * → (key, session_start, session_end, n_events). Identical
    * semantics to the streaming sessionizer (equivalence-tested);
    * `tiebreaker` totally orders simultaneous events. */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMs: Long,
      tiebreaker: Column): DataFrame = {
    require(!df.columns.contains("_session"),
      "input already has a _session column; rename it before sessionize()")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, tiebreaker.asc)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prev.isNull || (epochMicros(col(tsCol)) - epochMicros(prev)) > gapMs * 1000L, 1)
      .otherwise(0)
    val sessId = sum(isNew).over(
      Window.partitionBy(keyCol).orderBy(col(tsCol).asc, tiebreaker.asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("_session", sessId)
      .groupBy(col(keyCol), col("_session"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("_session")
  }

  /** Range (interval-containment) join: left rows match right intervals
    * with start ≤ ts ≤ end on the same key. The naive formulation is a
    * nested-loop/cartesian with a range predicate; this one bucketizes
    * time into `grainMs` grains — intervals explode into the grains
    * they cover, point rows map to one grain — so the match runs as an
    * EQUI-join on (key, grain) with the exact containment predicate as
    * a post-filter. Fan-out per interval = ⌈span/grain⌉: pick a grain
    * near the typical interval span. */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      grainMs: Long): DataFrame = {
    require(grainMs > 0, "grainMs must be positive")
    val overlap = right.columns.toSet.intersect(left.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"left/right share non-key columns $overlap — rename before rangeJoin()")
    val grain = grainMs * 1000L // micros
    val l = left.withColumn("_grain", (epochMicros(col(tsCol)) / grain).cast("long"))
    val r = right.withColumn("_grain",
      explode(sequence(
        (epochMicros(col(startCol)) / grain).cast("long"),
        (epochMicros(col(endCol)) / grain).cast("long"))))
    l.join(r, Seq(keyCol, "_grain"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_grain")
  }

  /** As-of join: each left row picks up the LATEST right row with
    * right.ts ≤ left.ts on the same key (the point-in-time lookup a
    * feature pipeline needs against slowly-updating state).
    *
    * Formulated as union → one window over (key, ts) carrying the last
    * non-null right payload forward — a single shuffle on the key, no
    * range-join explosion, no per-key driver loops. Right rows sort
    * before left rows at equal timestamps, so ties match (ts ≥
    * semantics, like DuckDB's ASOF JOIN). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    require(payloadCols.forall(!left.columns.contains(_)),
      s"payload columns ${payloadCols.filter(left.columns.contains)} collide with left columns")
    val leftCols = left.columns.toSeq
    val nulledPayload = payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val l = left
      .select((leftCols.map(col) ++ nulledPayload :+ lit(1).as("_side")): _*)
    val r = right
      .select((Seq(col(keyCol), col(tsCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(col) :+ lit(0).as("_side")): _*)
      .select((leftCols.map(col) ++ payloadCols.map(col) :+ col("_side")): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(l.unionByName(r)) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side")
  }
}
