package graft.sources

import org.apache.spark.sql.DataFrame

/** Write paths (ref connectors/files + storage layer write surface).
  *
  * [[writeBucketed]] is the co-located-join enabler at scale: two fact
  * tables bucketed (and sorted) on the same keys with the same bucket
  * count join WITHOUT a shuffle on either side — the single biggest
  * exchange eliminator for repeated fact-fact joins at 100 TB. Bucket
  * count should target HDFS-block-sized files per bucket at the
  * expected data volume.
  */
object Sinks {

  def writeParquet(
      df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Idempotent incremental publish (ref storage/delta.py:122 overwrite
    * with partition filters): `mode("overwrite")` with DYNAMIC partition
    * overwrite replaces ONLY the partitions present in `df` and leaves
    * every other partition untouched — so re-running a failed batch
    * rewrites its own partitions and nothing else (static mode, the
    * default, would drop the whole table first). This is the safe
    * restatement path for partition-aligned batches (e.g. a daily
    * silver/SCD2 output keyed by ingestion date); for arbitrary
    * row-level merges use [[VersionedTable.upsert]]. */
  def writePartitionedIdempotent(
      df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty,
      "dynamic overwrite without partition columns would replace the whole table")
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  /** Bucketed + sorted managed table (bucketing metadata only survives
    * via the catalog, hence saveAsTable). */
  def writeBucketed(
      df: DataFrame, table: String,
      buckets: Int, bucketKeys: Seq[String],
      sortKeys: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(bucketKeys.nonEmpty, "writeBucketed needs at least one bucket key")
    val w = df.write.mode(mode)
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
    val sorted =
      if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }
}
