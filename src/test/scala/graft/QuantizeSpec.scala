package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.Quantize

/** Int8 embedding quantization: error bound, schema, cosine
  * preservation and top-k recall on the real embeddings table. */
class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  private def embs = Tables.embeddings(spark, sfDir)
    .select(col("vec_id").as("emb_id"), col("embedding"))

  test("round-trip error is bounded by scale/2 per element; zero vector survives") {
    val q = embs.select(col("embedding"), Quantize.quantize(col("embedding")).as("q"))
      .select(col("embedding"), Quantize.dequantize(col("q")).as("back"),
        col("q.scale").as("scale"))
      .select(array_max(zip_with(col("embedding"), col("back"),
        (a, b) => abs(a - b))).as("err"), (col("scale") / 2 * 1.0001).as("bound"))
    assert(q.filter(col("err") > col("bound")).count() == 0)

    val zero = Seq(Seq(0.0f, 0.0f, 0.0f)).toDF("embedding")
      .select(Quantize.dequantize(Quantize.quantize(col("embedding"))).as("back"))
      .head.getSeq[Double](0)
    assert(zero == Seq(0.0, 0.0, 0.0))
  }

  test("codes are genuinely tinyint (the 4x storage claim) in [-127, 127]") {
    val q = embs.select(Quantize.quantize(col("embedding")).as("q"))
    val codesType = q.schema("q").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .apply("codes").dataType
    assert(codesType.simpleString == "array<tinyint>")
    val bad = q.select(explode(col("q.codes")).as("c"))
      .filter(col("c") > 127 || col("c") < -127).count()
    assert(bad == 0)
  }

  test("quantized cosine tracks exact cosine closely and preserves top-10 recall >= 0.9") {
    val q = embs.limit(200)
      .select(col("emb_id"), col("embedding"), Quantize.quantize(col("embedding")).as("q"))
      .cache()
    val queries = q.limit(10).select(
      col("emb_id").as("query_id"), col("embedding").as("_qe"), col("q").as("_qq"))
    val pairs = queries.crossJoin(broadcast(
        q.select(col("emb_id").as("neighbor_id"), col("embedding").as("_ce"), col("q").as("_cq"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.CosineSimilarity.cosineSim(col("_qe"), col("_ce")).as("exact"),
        Quantize.cosineQuantized(col("_qq"), col("_cq")).as("approx"))
      .cache()

    // pointwise: int8 cosine stays within 0.02 of exact
    assert(pairs.filter(abs(col("exact") - col("approx")) > 0.02).count() == 0)

    // top-10 recall per query
    def topK(score: String) = pairs.withColumn("_r",
        row_number().over(Window.partitionBy("query_id").orderBy(col(score).desc, col("neighbor_id"))))
      .filter(col("_r") <= 10).select("query_id", "neighbor_id")
    val recall = topK("exact").intersect(topK("approx")).count() / (10.0 * 10)
    assert(recall >= 0.9, s"top-10 recall $recall")
    q.unpersist(); pairs.unpersist()
  }
}
