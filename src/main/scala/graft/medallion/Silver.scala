package graft.medallion

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Silver-layer cleaning operators.
  *
  * Re-expresses the reference's silver pipeline
  * (automic_etl/medallion/silver.py:121-368) as declarative
  * `DataFrame => DataFrame` transforms. All operations are pure column
  * expressions, so they stay inside whole-stage codegen and never force
  * a shuffle except `dedup` (one hash shuffle on the business key —
  * unavoidable and linear at any scale).
  */
object Silver {

  /** Default string tokens treated as NULL (silver.py:173 `null_string_values`). */
  val DefaultNullStrings: Seq[String] = Seq("", "null", "NULL", "N/A", "n/a", "None")

  /** Trim whitespace on every string column (silver.py:164). */
  def trimStrings(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType) trim(col(f.name)).as(f.name) else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Map sentinel strings to real NULLs on every string column (silver.py:173). */
  def normalizeNullStrings(df: DataFrame, nullValues: Seq[String] = DefaultNullStrings): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType)
        when(col(f.name).isin(nullValues: _*), lit(null)).otherwise(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Standard cleaning = trim + null normalization (silver.py:159). */
  def clean(df: DataFrame, nullValues: Seq[String] = DefaultNullStrings): DataFrame =
    normalizeNullStrings(trimStrings(df), nullValues)

  /** snake_case every column name (silver.py:321 normalize_column_names). */
  def normalizeColumnNames(df: DataFrame): DataFrame = {
    def toSnake(name: String): String = {
      var s = name
      s = s.replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      s = s.replaceAll("([a-z\\d])([A-Z])", "$1_$2")
      s = s.replaceAll("[-\\s]+", "_")
      s.toLowerCase
    }
    df.toDF(df.columns.map(toSnake).toIndexedSeq: _*)
  }

  /** Recursively flatten nested struct columns to top level with
    * separator-joined names (ref utils/helpers.py:117 `flatten_dict` —
    * the JSON-ingest companion: semi-structured payloads arrive as
    * structs and the silver layer wants flat columns). Pure projection:
    * struct field access is free in Catalyst (no shuffle, pruning still
    * reaches the scan for the fields actually selected). Arrays and
    * maps stay as values — flattening them is an explode, a row-count
    * change the caller must opt into. */
  def flattenStructs(df: DataFrame, sep: String = "_"): DataFrame = {
    def expand(prefix: String, field: org.apache.spark.sql.types.StructField,
        path: Column): Seq[(String, Column)] = field.dataType match {
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.toSeq.flatMap(f => expand(prefix + sep + f.name, f, path.getField(f.name)))
      case _ => Seq(prefix -> path)
    }
    val cols = df.schema.fields.toSeq.flatMap(f => expand(f.name, f, col(f.name)))
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** Rename columns per mapping, ignoring absent sources (silver.py:189). */
  def applySchemaMapping(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** Cast string columns to timestamps with a format (silver.py:335). */
  def castTimestamps(df: DataFrame, columns: Seq[String], format: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    columns.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, to_timestamp(col(c), format))
    }

  /** Fill nulls per column (silver.py:349). */
  def fillNulls(df: DataFrame, fills: Map[String, Any]): DataFrame =
    fills.filter { case (c, _) => df.columns.contains(c) }
      .foldLeft(df) { case (d, (c, v)) => d.withColumn(c, coalesce(col(c), lit(v))) }

  /** Drop rows whose required columns are null (silver.py:360). */
  def filterInvalid(df: DataFrame, requiredColumns: Seq[String]): DataFrame =
    requiredColumns.filter(df.columns.contains)
      .foldLeft(df)((d, c) => d.filter(col(c).isNotNull))

  /** Deduplicate on business keys keeping the single row maximizing
    * `orderKey` (silver.py:200 — reference keeps "last" by
    * `_ingestion_time`; pass `struct(ingestionTime, tiebreaker)`).
    *
    * Formulated as `groupBy(keys).agg(max_by(struct(*), orderKey))` —
    * NOT as a row_number window — because hash aggregation gets map-side
    * partial aggregation: duplicates collapse *before* the shuffle, so
    * at 100 TB strictly less data moves than the window formulation
    * (which shuffles every column of every duplicate row and sorts each
    * partition), and hot keys reduce partially instead of hammering one
    * reducer. `orderKey` must totally order rows within a key (include
    * a unique tiebreaker field) for deterministic results.
    */
  def dedup(df: DataFrame, keys: Seq[String], orderKey: Column): DataFrame = {
    require(!df.columns.contains("_row"),
      "input already has a _row column; rename it before dedup()")
    val packed = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(packed, orderKey).as("_row"))
      .select(col("_row.*"))
  }

  /** silver.py:51 `process` pipeline configuration: every stage of the
    * bronze→silver flow, declaratively. Stages are skipped when their
    * config is empty, mirroring the reference's optional arguments. */
  final case class ProcessConfig(
      schemaMapping: Map[String, String] = Map.empty,
      clean: Boolean = true,
      nullValues: Seq[String] = DefaultNullStrings,
      transformations: Seq[DataFrame => DataFrame] = Nil,
      timestampColumns: Seq[String] = Nil,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss",
      fills: Map[String, Any] = Map.empty,
      requiredColumns: Seq[String] = Nil,
      dedupKeys: Seq[String] = Nil,
      dedupOrderKey: Option[Column] = None)

  /** silver.py:121 `_apply_pipeline` + `:225 _add_metadata`: the full
    * bronze→silver transform as ONE composed declarative plan — rename →
    * clean → custom transforms → timestamp casts → null fills → invalid
    * filter → dedup → silver metadata. Catalyst sees a single tree, so
    * projection collapsing fuses all the narrow stages into one pass;
    * only dedup (if configured) shuffles. */
  def process(
      df: DataFrame,
      config: ProcessConfig,
      sourceTable: String,
      processingTimeMs: Long): DataFrame = {
    val mapped = applySchemaMapping(df, config.schemaMapping)
    val cleaned = if (config.clean) clean(mapped, config.nullValues) else mapped
    val transformed = config.transformations.foldLeft(cleaned)((d, f) => f(d))
    val casted = castTimestamps(transformed, config.timestampColumns, config.timestampFormat)
    val filled = fillNulls(casted, config.fills)
    val valid = filterInvalid(filled, config.requiredColumns)
    val deduped =
      if (config.dedupKeys.nonEmpty)
        dedup(valid, config.dedupKeys,
          config.dedupOrderKey.getOrElse(struct(valid.columns.map(col).toIndexedSeq: _*)))
      else valid
    deduped
      .withColumn("_silver_processed_time", timestamp_millis(lit(processingTimeMs)))
      .withColumn("_source_table", lit(sourceTable))
  }

  /** Window-based dedup keeping the first row under `orderBy`. Same
    * semantics as [[dedup]] when `orderBy` is the descending of its
    * `orderKey`; kept for when rank-style tie surfacing is needed.
    * Shuffles full duplicate rows (no partial agg) — prefer [[dedup]]
    * at scale.
    */
  def dedupWindow(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    require(!df.columns.contains("_rn"),
      "input already has a _rn column; rename it before dedupWindow()")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  final case class AutoCleanResult(data: DataFrame, actions: Seq[String], qualityScore: Double)

  /** Automatic stats-driven cleaning (ref llm/augmented_etl.py:419
    * `auto_clean` + :574 `_calculate_quality_score`): detect issues
    * from the data, then apply the fix policy — high-null column drop
    * (`aggressive`), median fill for numeric nulls, whitespace trim,
    * null-string standardization, full-row dedup — and report every
    * action taken plus the resulting quality score (mean of
    * completeness and row-uniqueness, both 0..1).
    *
    * Spark-shaped: the reference interleaves per-column scans and
    * rewrites; here ONE aggregation pass computes every decision input
    * (per-column null counts + approx medians — approx_percentile,
    * not an exact sort, is the 100 TB call), the fix policy composes
    * as a single declarative plan (only the dedup shuffles), and one
    * report pass scores the result. Two jobs + the caller's action,
    * independent of column count.
    *
    * Ordering deviation, deliberate: the reference fills string nulls
    * with "" and LATER standardizes ""→null, undoing its own fill —
    * net effect, string nulls stay null. Cleaning here runs FIRST
    * (trim + null-string standardization), so numeric medians compute
    * over standardized data and the net string behavior matches the
    * reference's end state without the self-cancelling fill. */
  def autoClean(
      df: DataFrame,
      aggressive: Boolean = false,
      nullValues: Seq[String] = DefaultNullStrings): AutoCleanResult = {
    import org.apache.spark.sql.types.NumericType
    val pre = clean(df, nullValues)
    val numericCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSeq

    // one pass: total rows, per-column non-null counts, numeric medians
    val aggs = count(lit(1)).as("_n") +:
      (df.columns.toSeq.map(c => count(col(c)).as(s"_nn_$c")) ++
        numericCols.map(c => percentile_approx(col(c), lit(0.5), lit(10000)).as(s"_med_$c")))
    val stats = pre.agg(aggs.head, aggs.tail: _*).head()
    val n = stats.getAs[Long]("_n")
    if (n == 0) return AutoCleanResult(pre, Seq.empty, 0.5)

    val nullPct = df.columns.toSeq.map(c => c -> (1.0 - stats.getAs[Long](s"_nn_$c").toDouble / n)).toMap
    val actions = Seq.newBuilder[String]

    val dropped =
      if (aggressive) df.columns.toSeq.filter(nullPct(_) > 0.5)
      else Seq.empty
    dropped.foreach(c => actions += s"Dropped column '$c' (>50% nulls)")

    val kept = pre.drop(dropped: _*)
    val fills = numericCols.filterNot(dropped.contains)
      .filter(nullPct(_) > 0)
      .flatMap(c => Option(stats.getAs[Any](s"_med_$c")).map(c -> _)).toMap
    fills.keys.toSeq.sorted.foreach(c => actions += s"Filled nulls in '$c' with median")

    val filled = if (fills.isEmpty) kept else kept.na.fill(fills)
    val result = filled.distinct()
    actions += "Trimmed whitespace from string columns"
    actions += "Standardized null string values"

    // report pass over the result: row count + residual nulls
    val rAggs = count(lit(1)).as("_m") +:
      result.columns.toSeq.map(c => count(col(c)).as(s"_nn_$c"))
    val r = result.agg(rAggs.head, rAggs.tail: _*).head()
    val m = r.getAs[Long]("_m")
    val removed = n - m
    if (removed > 0) actions += s"Removed $removed duplicate rows"
    val completeness =
      if (m == 0 || result.columns.isEmpty) 1.0
      else result.columns.toSeq.map(c => r.getAs[Long](s"_nn_$c").toDouble).sum /
        (m.toDouble * result.columns.length)
    // result is distinct() → uniqueness is 1 by construction, as in the
    // reference (it scores its own already-deduped output)
    AutoCleanResult(result, actions.result(), (completeness + 1.0) / 2.0)
  }
}
