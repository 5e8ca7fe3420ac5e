package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HuggingFace dataset connector (ref connectors/datasets/huggingface.py:
  * 57-113 connect/load, :154 extract, :436 list_splits, :144 get_schema,
  * :431 get_sample, :290 `_process_item` media handling).
  *
  * The reference calls `datasets.load_dataset` over the network; this
  * sandbox has zero egress, and more fundamentally a 100 TB corpus is
  * not pulled through a Python iterator — it is laid down ONCE as the
  * hub's parquet export and scanned in place. So the Spark-native
  * connector reads the hub's on-disk contract directly:
  *
  * {{{
  * dataset/            (hub snapshot or `to_parquet` export)
  *   data/train-00000-of-00003.parquet
  *   data/train-00001-of-00003.parquet
  *   data/validation-00000-of-00001.parquet …
  * }}}
  *
  * Shard files are plain parquet → every Spark scan optimization
  * (column pruning, predicate pushdown, per-shard task parallelism)
  * applies untouched; `limit/offset/columns` from the reference's
  * extract() are just `.limit/.offset/.select` on the returned frame.
  * Media columns in HF parquet are `struct<bytes: binary, path:
  * string>` — [[mediaPayload]] adapts them to the [[Multimodal]]
  * payload/meta contract so audio/image datasets flow into the same
  * downstream plumbing ([[graft.multimodal.Audio]], q100). The
  * `save_to_disk` Arrow-IPC layout is NOT supported (Spark has no
  * Arrow-file source on this classpath) — use the parquet export, the
  * hub's own bulk format.
  */
object HuggingFace {

  private val ShardPattern = "([A-Za-z0-9_.]+)-(\\d{5})-of-(\\d{5})\\.parquet".r

  /** huggingface.py:436 list_splits: discover splits from shard file
    * names (searched at the root and under `data/`). */
  def listSplits(spark: SparkSession, datasetDir: String): Map[String, Seq[String]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val candidates = Seq(new Path(datasetDir), new Path(datasetDir, "data"))
    val files = candidates.flatMap { dir =>
      val fs = dir.getFileSystem(conf)
      if (fs.exists(dir)) fs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath) else Nil
    }
    files
      .flatMap { p =>
        p.getName match {
          case ShardPattern(split, _, _) => Some(split -> p.toString)
          case _ => None
        }
      }
      .groupBy(_._1)
      .map { case (split, shards) => split -> shards.map(_._2).sorted }
  }

  /** Read one split as a DataFrame — one task per shard rowgroup, all
    * parquet pushdown intact (huggingface.py:192 `_extract_batch`,
    * minus the driver-side materialization). */
  def readSplit(spark: SparkSession, datasetDir: String, split: String): DataFrame = {
    val splits = listSplits(spark, datasetDir)
    val shards = splits.getOrElse(split,
      throw new IllegalArgumentException(
        s"split '$split' not found in $datasetDir (have: ${splits.keys.toSeq.sorted.mkString(", ")})"))
    spark.read.parquet(shards: _*)
  }

  /** huggingface.py:144 get_schema: column name → type string. */
  def schemaOf(df: DataFrame): Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  /** huggingface.py:431 get_sample — bounded head, never a full scan. */
  def sample(df: DataFrame, n: Int = 5): DataFrame = df.limit(n)

  /** Adapt an HF media column (struct<bytes, path>) to the
    * [[Multimodal]] payload/meta contract: (payload: binary, meta:
    * {n_bytes, content_hash, mime, origin_path}). */
  def mediaPayload(df: DataFrame, mediaCol: String, mime: String): DataFrame = {
    val dt = df.schema(mediaCol).dataType
    require(dt match {
      case s: StructType => s.fieldNames.contains("bytes")
      case _ => false
    }, s"$mediaCol must be an HF media struct<bytes, path>, got ${dt.simpleString}")
    df.withColumn("payload", col(s"$mediaCol.bytes"))
      .withColumn("meta", struct(
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_hash"),
        lit(mime).as("mime"),
        col(s"$mediaCol.path").as("origin_path")))
  }
}
