package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.functions._

import graft.multimodal.Audio
import graft.sources.HuggingFace

/** HF hub parquet-export layout: split discovery, shard-parallel reads,
  * media-struct adaptation into the multimodal/audio pipeline.
  */
class HuggingFaceSpec extends SparkSpec {

  /** Lay down dataset/data/<split>-NNNNN-of-NNNNN.parquet shards. */
  private def makeDataset(): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_hf")
    val dataDir = root.resolve("data")
    Files.createDirectories(dataDir)
    def shard(dir: JPath, name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("hf_shard").toString
      rows.toDF("id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, dir.resolve(name))
    }
    shard(dataDir, "train-00000-of-00002.parquet", Seq((1L, "alpha"), (2L, "beta")))
    shard(dataDir, "train-00001-of-00002.parquet", Seq((3L, "gamma")))
    shard(dataDir, "validation-00000-of-00001.parquet", Seq((10L, "delta")))
    root.toString
  }

  test("listSplits + readSplit: shard discovery, parallel read, schema") {
    val dir = makeDataset()
    val splits = HuggingFace.listSplits(spark, dir)
    assert(splits.keySet == Set("train", "validation"))
    assert(splits("train").size == 2)
    val train = HuggingFace.readSplit(spark, dir, "train")
    assert(train.count() == 3)
    assert(train.rdd.getNumPartitions >= 2, "each shard must be at least one task")
    assert(HuggingFace.schemaOf(train) == Map("id" -> "bigint", "text" -> "string"))
    assert(HuggingFace.sample(train, 2).count() == 2)
    val e = intercept[IllegalArgumentException](HuggingFace.readSplit(spark, dir, "test"))
    assert(e.getMessage.contains("train"))
  }

  test("media struct column adapts into the audio pipeline end-to-end") {
    import spark.implicits._
    // 16-bit PCM mono WAV, 0.1 s at 1 kHz — built the same way AudioSpec does
    val bb = java.nio.ByteBuffer.allocate(44 + 200).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 200).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1).putInt(1000).putInt(2000)
      .putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(200)
    (0 until 100).foreach(_ => bb.putShort(123))
    val wav = bb.array()

    val ds = Seq((1L, (wav, "clips/a.wav"))).toDF("id", "audio")
      .withColumn("audio", col("audio").cast("struct<bytes:binary,path:string>"))
    val adapted = HuggingFace.mediaPayload(ds, "audio", mime = "audio/wav")
    val meta = Audio.extractMetadata(
      adapted.select(col("meta.origin_path").as("path"), col("payload").as("content")))
      .collect().head
    assert(meta.getAs[Int]("sample_rate") == 1000)
    assert(meta.getAs[Long]("frames") == 100)
    assert(meta.isNullAt(meta.fieldIndex("error")))
    intercept[IllegalArgumentException](HuggingFace.mediaPayload(ds, "id", "audio/wav"))
  }
}
