package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic parts of the reference's LLM augmentation surface
  * (ref llm/schema_generator.py). The LLM-backed pieces (free-text
  * schema descriptions, NL→SQL) are external-service calls out of
  * deterministic scope; what IS deterministic — type inference from
  * observed data, DDL rendering, rename suggestions — is implemented
  * for real, and the NL→SQL entry point is a trait with a rule-based
  * default so callers can plug a real model without code changes.
  */
object SchemaInference {

  /** Infer a column type from observed string data in ONE aggregate
    * pass over all candidate columns: a column is BIGINT if every
    * non-null value matches the integer pattern, DOUBLE if numeric,
    * BOOLEAN / DATE / TIMESTAMP likewise, else STRING.
    * → (column, inferred_type, n_nonnull, n_matching) */
  def inferTypes(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "inferTypes needs at least one column")
    val patterns = Seq(
      "BIGINT"    -> "^[+-]?\\d+$",
      "DOUBLE"    -> "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$",
      "BOOLEAN"   -> "^(?i)(true|false)$",
      "DATE"      -> "^\\d{4}-\\d{2}-\\d{2}$",
      "TIMESTAMP" -> "^\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}")

    val aggs: Seq[Column] = columns.flatMap { c =>
      count(col(c)).as(s"_n_$c") +: patterns.map { case (t, p) =>
        count(when(regexp_like(col(c).cast("string"), lit(p)), 1)).as(s"_${t}_$c")
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    val rows = columns.map { c =>
      val n = col(s"_n_$c")
      val inferred = patterns.foldLeft(when(n === 0, "STRING")) { case (acc, (t, _)) =>
        acc.when(col(s"_${t}_$c") === n, t)
      }.otherwise("STRING")
      val matched = patterns.foldLeft(when(lit(false), lit(0L))) { case (acc, (t, _)) =>
        acc.when(col(s"_${t}_$c") === n, col(s"_${t}_$c"))
      }.otherwise(lit(0L))
      struct(lit(c).as("column"), inferred.as("inferred_type"),
        n.cast("long").as("n_nonnull"), matched.cast("long").as("n_matching"))
    }
    one.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }

  /** schema_generator.py:114 `suggest_partition_strategy`, result shape
    * mirroring the reference's JSON contract (partition_columns,
    * partition_transforms, sort_columns, estimated_partition_count,
    * reasoning) plus the Z-order recommendation that composes with
    * [[graft.ops.ZOrder]]. */
  final case class PartitionStrategy(
      partitionColumns: Seq[String],
      partitionTransforms: Map[String, String],
      sortColumns: Seq[String],
      zOrderColumns: Seq[String],
      estimatedPartitionCount: Long,
      reasoning: String)

  /** schema_generator.py:114 `suggest_partition_strategy`: the
    * reference profiles column characteristics and asks an LLM to pick
    * Iceberg partition columns; the decision criteria its prompt spells
    * out (time-based query patterns, cardinality vs partition-count
    * explosion, 128–512 MB target files) are deterministic, so they are
    * implemented here as code over ONE Expand-free aggregate pass
    * (approx_count_distinct per column + per time-granularity — the
    * q40a discipline; one bounded driver read of a single row).
    *
    * Heuristic, in the prompt's own priority order:
    *  1. a time column (date/timestamp, < 10% null) partitions first —
    *     at the granularity of year/month/day/hour whose bucket count
    *     is log-closest to `targetPartitions(rows)`, so files stay in
    *     the 128–512 MB band instead of exploding into small files or
    *     collapsing into one;
    *  2. one low-cardinality categorical (2 ≤ distinct ≤
    *     `maxCategoricalValues`, < 10% null, < 50% of rows) may join it
    *     while the combined count stays under `maxPartitions`;
    *  3. high-cardinality columns never partition: the top
    *     predicate-derived (pass `QueryBuilder.suggestIndexes(...)
    *     .sortColumns` through `predicateColumns`) then
    *     highest-distinct columns become sort columns, and 2+ of them
    *     an [[graft.ops.ZOrder]] recommendation.
    *
    * `useCase` (reference arg): "time_series" requires a time column
    * (fails soft to general otherwise); "lookup" skips time-first and
    * sorts/Z-orders on the high-cardinality keys. */
  def suggestPartitionStrategy(
      df: DataFrame,
      useCase: String = "general",
      predicateColumns: Seq[String] = Nil,
      targetRowsPerPartition: Long = 4000000L,
      maxPartitions: Long = 10000L,
      maxCategoricalValues: Long = 1000L): PartitionStrategy = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    // TimestampNTZType included: parquet timestamp[us] without
    // isAdjustedToUTC reads back as NTZ, and a time column is a time
    // column for partitioning either way (date_trunc handles both).
    val timeCols = df.schema.fields.collect {
      case f if f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType => f.name
    }.toSeq
    val grans = Seq("year", "month", "day", "hour")
    val aggs: Seq[Column] =
      count(lit(1)).as("_n") +:
        (df.columns.toSeq.flatMap(c => Seq(
          approx_count_distinct(col(c)).as(s"_d_$c"),
          count(col(c)).as(s"_nn_$c"))) ++
          timeCols.flatMap(c => grans.map(g =>
            approx_count_distinct(date_trunc(g, col(c))).as(s"_t_${g}_$c"))))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0) // bounded: one row
    def l(name: String): Long = row.getLong(row.fieldIndex(name))
    val n = l("_n")
    def distinct(c: String) = l(s"_d_$c")
    def nullPct(c: String) = if (n == 0) 0.0 else (n - l(s"_nn_$c")) * 100.0 / n

    val targetPartitions = math.min(maxPartitions, math.max(1L, n / targetRowsPerPartition))
    val why = Seq.newBuilder[String]

    // 1. time partition at the coarsest granularity that reaches target
    val timePick: Option[(String, String, Long)] =
      if (useCase == "lookup") None
      else timeCols.filter(nullPct(_) < 10.0)
        .sortBy(c => (if (predicateColumns.contains(c)) 0 else 1, -distinct(c)))
        .headOption.map { c =>
          val byGran = grans.map(g => (g, l(s"_t_${g}_$c")))
          // closest to target in log space (ties → coarser): overshooting
          // 20x means 20x-too-small files, as bad as undershooting
          val (g, cnt) = byGran.minBy { case (_, k) =>
            math.abs(math.log((k.toDouble + 1) / (targetPartitions.toDouble + 1)))
          }
          (c, g, cnt)
        }
    timePick.foreach { case (c, g, cnt) =>
      why += s"$c is a time column: $g granularity yields $cnt partitions " +
        s"(target $targetPartitions for ${n} rows at ~$targetRowsPerPartition rows/partition)"
    }

    // 2. one safe categorical, if the combined count stays sane
    val timeCount = timePick.map(_._3).getOrElse(1L)
    val catPick = df.columns.toSeq
      .filterNot(c => timePick.exists(_._1 == c))
      .filter(c => !timeCols.contains(c))
      .filter(c => distinct(c) >= 2 && distinct(c) <= maxCategoricalValues &&
        nullPct(c) < 10.0 && distinct(c) * 2 < math.max(n, 1L))
      .sortBy(c => (if (predicateColumns.contains(c)) 0 else 1, distinct(c)))
      .headOption
      .filter(c => timeCount * distinct(c) <= maxPartitions &&
        n / math.max(1L, timeCount * distinct(c)) >= targetRowsPerPartition / 8)
    catPick.foreach(c => why += s"$c is a ${distinct(c)}-value categorical: combined " +
      s"${timeCount * distinct(c)} partitions stay under $maxPartitions")

    val partCols = timePick.map(_._1).toSeq ++ catPick.toSeq
    if (partCols.isEmpty)
      why += s"no column partitions safely (${n} rows; time columns: ${timeCols.size}, " +
        "low-cardinality non-null categoricals: none eligible) — keep unpartitioned, sort instead"

    // 3. high-cardinality sort / Z-order from predicates then cardinality
    val sortCands = (predicateColumns.filterNot(partCols.contains) ++
      df.columns.toSeq.filterNot(partCols.contains)
        .sortBy(-distinct(_))).distinct.take(3)
    val zOrder = sortCands.filter(c => distinct(c) > maxCategoricalValues).take(2)
    if (zOrder.size >= 2)
      why += s"${zOrder.mkString(", ")} are high-cardinality scan keys: Z-order them (ops.ZOrder)"

    PartitionStrategy(
      partitionColumns = partCols,
      partitionTransforms = timePick.map(t => t._1 -> t._2).toMap ++
        catPick.map(_ -> "identity").toMap,
      sortColumns = sortCands,
      zOrderColumns = if (zOrder.size >= 2) zOrder else Nil,
      estimatedPartitionCount =
        math.max(1L, timeCount * catPick.map(distinct).getOrElse(1L)),
      reasoning = why.result().mkString("; "))
  }

  /** schema_generator.py:174 `generate_table_ddl` (rendering only). */
  def renderDdl(table: String, columns: Seq[(String, String)], partitionBy: Seq[String] = Nil): String = {
    val cols = columns.map { case (n, t) => s"  $n $t" }.mkString(",\n")
    val part = if (partitionBy.isEmpty) "" else s"\nPARTITIONED BY (${partitionBy.mkString(", ")})"
    s"CREATE TABLE $table (\n$cols\n)$part"
  }

  /** schema_generator.py:215 `suggest_column_renames` — deterministic
    * snake_case suggestions (only columns that actually change). */
  def suggestRenames(columns: Seq[String]): Map[String, String] =
    columns.flatMap { c =>
      var s = c
      s = s.replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      s = s.replaceAll("([a-z\\d])([A-Z])", "$1_$2")
      s = s.replaceAll("[-\\s]+", "_")
      val snake = s.toLowerCase
      if (snake != c) Some(c -> snake) else None
    }.toMap
}

/** NL→SQL plumbing (ref llm/nl2sql): the interface a real LLM backend
  * implements; [[RuleBasedNl2Sql]] is the deterministic default used in
  * tests and offline environments. */
trait Nl2Sql {
  def toSql(question: String, table: String, columns: Seq[String]): String
}

/** Keyword-rule translator: "count …" → COUNT(*), "average of X" →
  * AVG(X), else SELECT *. Deliberately minimal — it exists to pin the
  * interface and give pipelines a predictable offline fallback. */
object RuleBasedNl2Sql extends Nl2Sql {
  def toSql(question: String, table: String, columns: Seq[String]): String = {
    val q = question.toLowerCase
    val byCol = columns.find(c => q.contains(s"by ${c.toLowerCase}"))
    def grouped(agg: String): String = byCol match {
      case Some(g) => s"SELECT $g, $agg FROM $table GROUP BY $g"
      case None    => s"SELECT $agg FROM $table"
    }
    val avgCol = columns.find(c => q.contains(s"average ${c.toLowerCase}") ||
      q.contains(s"average of ${c.toLowerCase}") || q.contains(s"mean ${c.toLowerCase}"))
    val sumCol = columns.find(c => q.contains(s"total ${c.toLowerCase}") ||
      q.contains(s"sum of ${c.toLowerCase}"))
    if (q.contains("how many") || q.startsWith("count")) grouped("COUNT(*) AS n")
    else if (avgCol.isDefined) grouped(s"AVG(${avgCol.get}) AS avg_${avgCol.get}")
    else if (sumCol.isDefined) grouped(s"SUM(${sumCol.get}) AS sum_${sumCol.get}")
    else s"SELECT * FROM $table"
  }
}
