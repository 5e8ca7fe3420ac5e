package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim

/** Int8 embedding quantization — the storage/bandwidth lever of a
  * large-scale embedding pipeline: a 100 TB float32 embedding table is
  * 25 TB as int8 codes + one float scale per vector, and every
  * downstream shuffle (ANN banding, near-dup verification, k-means
  * assignment) moves a quarter of the bytes. Published, standard
  * scheme: symmetric per-vector quantization (scale = max|x|/127,
  * code = round(x/scale)), the same family FAISS's scalar quantizer
  * and the int8 ONNX/TensorRT paths use.
  *
  * Everything is a pure column expression (codegen-friendly, no UDF),
  * and COSINE NEEDS NO DEQUANTIZATION: per-vector scales cancel in
  * cosine's normalization, so [[cosineQuantized]] runs the existing
  * codegen'd [[graft.functions.CosineSimilarity]] directly over the
  * tinyint code arrays — the int8 dot products are exactly the cheap
  * kernel the storage saving buys. */
object Quantize {

  /** Symmetric per-vector int8: struct(codes: array<tinyint>,
    * scale: float). The all-zero vector gets scale 0 and zero codes
    * (dequantizes to itself). Max round-trip error is scale/2 per
    * element, i.e. max|x|/254. */
  def quantize(emb: Column): Column = {
    val scale = array_max(transform(emb, x => abs(x))) / 127.0
    struct(
      when(scale > 0, transform(emb, x => round(x / scale).cast("tinyint")))
        .otherwise(transform(emb, _ => lit(0).cast("tinyint"))).as("codes"),
      scale.cast("float").as("scale"))
  }

  /** Reconstruct approximate floats: code · scale. */
  def dequantize(q: Column): Column = {
    val scale = q.getField("scale").cast("double")
    transform(q.getField("codes"), c => c.cast("double") * scale)
  }

  /** Cosine over quantized vectors WITHOUT dequantizing: cosine is
    * scale-invariant, so the two per-vector scales cancel and the
    * codegen'd kernel runs straight over the int8 codes. */
  def cosineQuantized(a: Column, b: Column): Column =
    cosineSim(a.getField("codes"), b.getField("codes"))
}
