package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video travel through the pipeline as `binary` columns
  * with a metadata struct; Spark never interprets the bytes. The
  * plumbing — schema, chunking, frame sampling, batch shapes — is real
  * and tested. Decoders now exist for every JVM-native format: images →
  * [[Image]] (`javax.imageio`: PNG/JPEG/BMP/GIF decode, features,
  * thumbnails), audio → [[Audio]] (PCM WAV), documents → [[Pdf]] /
  * [[Office]] / [[graft.sources.Excel]]. [[decodeImageStub]] remains
  * only as the schema-stable stand-in for formats with no JVM codec
  * (webp/heic/video) — swap a `mapPartitions` decoder behind the same
  * schema and nothing upstream or downstream changes.
  */
object Multimodal {

  /** Wrap a source column as (payload: binary, meta: struct). For the
    * test corpus the "media" is the document text encoded as UTF-8 —
    * the byte-level plumbing is identical for real media. */
  def withBinaryPayload(df: DataFrame, sourceCol: String, mime: String = "text/plain"): DataFrame =
    df.withColumn("payload", encode(col(sourceCol), "UTF-8").cast("binary"))
      .withColumn("meta", struct(
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_hash"),
        lit(mime).as("mime")))

  /** Split each payload into fixed-size byte chunks →
    * (…, chunk_idx: long, chunk: binary). A narrow explode — rows fan
    * out but never shuffle; chunk size bounds per-row memory for
    * arbitrarily large payloads. */
  def chunk(df: DataFrame, chunkSize: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val nChunks = ceil(octet_length(col("payload")) / lit(chunkSize.toDouble)).cast("long")
    // zero-byte payloads yield zero chunk rows (explode drops them);
    // the guard matters because sequence(0, -1) is an error under ANSI
    val idxs = when(nChunks > 0, sequence(lit(0L), nChunks - 1))
      .otherwise(array().cast("array<bigint>"))
    df.withColumn("chunk_idx", explode(idxs))
      .withColumn("chunk",
        substring(col("payload"), (col("chunk_idx") * chunkSize + 1).cast("int"), lit(chunkSize)))
  }

  /** Keep every `every`-th chunk — the deterministic stand-in for
    * video frame sampling (sample rate, not content, is the contract). */
  def sampleChunks(chunked: DataFrame, every: Int): DataFrame =
    chunked.filter(col("chunk_idx") % every === 0)

  /** STUB — media decode. Real decoding needs imaging libs absent from
    * this environment; this returns a deterministic fake (dimensions
    * derived from the content hash) with the REAL output schema
    * (width, height, format) so downstream feature code is exercised.
    * Swap for an actual decoder behind the same schema in production. */
  def decodeImageStub(payload: Column): Column = {
    val h = conv(substring(md5(payload), 1, 4), 16, 10).cast("long")
    struct(
      (h % 1920 + 1).as("width"),
      (h % 1080 + 1).as("height"),
      lit("stub").as("format"))
  }
}
