package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File connectors (ref connectors/files/{csv,json,parquet}_connector.py)
  * and bronze ingest metadata (ref medallion/bronze.py:28-40).
  *
  * Thin declarative wrappers over `spark.read` that (a) surface the
  * reference's option vocabulary, and (b) default to scale-safe
  * behavior: schema REQUIRED for CSV/JSON unless `inferSchema` is
  * explicitly requested — schema inference is an extra full pass over
  * 100 TB and is never an accident here.
  */
object Connectors {

  final case class CsvOptions(
      delimiter: String = ",",
      header: Boolean = true,
      quote: String = "\"",
      nullValue: String = "",
      multiLine: Boolean = false)

  def readCsv(
      spark: SparkSession, path: String,
      schema: Option[StructType] = None,
      options: CsvOptions = CsvOptions(),
      inferSchema: Boolean = false): DataFrame = {
    require(schema.isDefined || inferSchema,
      "CSV needs an explicit schema (or inferSchema=true, which costs an extra full scan)")
    val r = spark.read
      .option("delimiter", options.delimiter)
      .option("header", options.header)
      .option("quote", options.quote)
      .option("nullValue", options.nullValue)
      .option("multiLine", options.multiLine)
    schema.map(r.schema).getOrElse(r.option("inferSchema", true)).csv(path)
  }

  def readJson(
      spark: SparkSession, path: String,
      schema: Option[StructType] = None,
      multiLine: Boolean = false): DataFrame = {
    val r = spark.read.option("multiLine", multiLine)
    schema.map(r.schema).getOrElse(r).json(path)
  }

  def readParquet(spark: SparkSession, path: String, mergeSchema: Boolean = false): DataFrame =
    spark.read.option("mergeSchema", mergeSchema).parquet(path)

  /** bronze.py:126 `ingest_unstructured`: raw documents/media as rows
    * of (path, modificationTime, length, content: binary) via Spark's
    * binaryFile source — the on-ramp into the multimodal plumbing
    * (graft.multimodal). `pathGlobFilter` bounds the listing; maximum
    * file size is governed by spark.sql.sources.binaryFile.maxLength. */
  def readBinaryFiles(
      spark: SparkSession, path: String,
      globFilter: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    globFilter.map(g => r.option("pathGlobFilter", g)).getOrElse(r).load(path)
  }

  /** bronze.py:36 METADATA_COLUMNS: stamp every ingested row with
    * ingestion time, source, file, batch id, and the partition-friendly
    * ingestion date. `ingestionTime` is injectable (epoch millis) so
    * batches are reproducible/testable; production passes the job start
    * time once — NOT per-executor clock reads. */
  def withIngestMetadata(
      df: DataFrame,
      source: String,
      batchId: String,
      ingestionTimeMs: Long,
      sourceFile: Option[String] = None): DataFrame =
    df.withColumn("_ingestion_time", timestamp_millis(lit(ingestionTimeMs)))
      .withColumn("_source", lit(source))
      .withColumn("_source_file", sourceFile.map(lit).getOrElse(lit(null).cast("string")))
      .withColumn("_batch_id", lit(batchId))
      .withColumn("_ingestion_date", to_date(timestamp_millis(lit(ingestionTimeMs))))
}
