package graft

import graft.ops.Tuning
import graft.ops.Tuning.ClusterSpec

/** Spill-aware sizing arithmetic + metadata-only input measurement. */
class TuningSpec extends SparkSpec {

  private val GB = 1024L * 1024 * 1024
  private val MB = 1024L * 1024

  test("task memory and partition sizing follow the documented identities") {
    // 1000 executors × 8 cores × 32 GB — the 100 TB reference cluster
    val cluster = ClusterSpec(executors = 1000, coresPerExecutor = 8, executorHeapBytes = 32 * GB)
    // taskMem = 32G × 0.6 × 0.5 / 8 = 1.2 GB
    assert(cluster.taskExecutionBytes == (32 * GB * 0.6 * 0.5).toLong / 8)
    val a = Tuning.advise(shuffleBytes = 10L * 1024 * GB, cluster = cluster) // 10 TB shuffle
    // partition target = 1.2G/2 = 600 MB → ~17.5k partitions → full waves of 8000
    assert(a.shufflePartitions % cluster.totalCores == 0)
    assert(a.shufflePartitions >= 16000 && a.shufflePartitions <= 24000, a.toString)
    // scan split: 600 MB / 3x expansion = 200 MB
    assert(a.maxPartitionBytes == (cluster.taskExecutionBytes / 2 / 3.0).toLong)
    // broadcast ≤ min(512 MB, taskMem/4)
    assert(a.broadcastThresholdBytes == math.min(512 * MB, cluster.taskExecutionBytes / 4))
  }

  test("floors: tiny jobs never go below one full wave; splits never below 1 MB") {
    val local = ClusterSpec(executors = 1, coresPerExecutor = 32, executorHeapBytes = 48 * GB)
    val a = Tuning.advise(shuffleBytes = 10 * MB, cluster = local)
    assert(a.shufflePartitions == 32) // the repo's local[32] default falls out
    val tiny = ClusterSpec(1, 2, 64 * MB)
    assert(Tuning.advise(shuffleBytes = 0, cluster = tiny).maxPartitionBytes >= 1 * MB)
  }

  test("inputBytes measures real files via metadata only; applied confs take effect") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tuning").toString
    Tables.orders(spark, sfDir).write.mode("overwrite").parquet(dir + "/orders")
    val measured = Tuning.inputBytes(spark, Seq(dir + "/orders"))
    assert(measured > 1000, s"measured $measured")
    assert(Tuning.inputBytes(spark, Seq(dir + "/missing")) == 0L)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val cluster = ClusterSpec(1, 4, 8 * GB)
      Tuning.apply(spark, Tuning.advise(measured, cluster))
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
      assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold").toLong ==
        math.min(512 * MB, cluster.taskExecutionBytes / 4))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
