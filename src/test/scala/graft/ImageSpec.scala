package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions.col

import graft.multimodal.Image

/** Image decode/features/thumbnail over JDK-encoded fixture images. */
class ImageSpec extends SparkSpec {

  /** w×h image: left half pure red, right half pure blue. */
  private def bicolor(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xFF0000 else 0x0000FF)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, format, buf)
    buf.toByteArray
  }

  test("metadata decodes png/bmp/jpeg dimensions and error-tags junk") {
    import spark.implicits._
    val df = Seq(
      ("a.png", bicolor(40, 20, "png")),
      ("b.bmp", bicolor(8, 8, "bmp")),
      ("c.jpg", bicolor(16, 16, "jpg")),
      ("junk.webp", Array[Byte](1, 2, 3))).toDF("path", "content")
    val rows = Image.metadata(df).orderBy("path").collect()
    assert(rows(0).getAs[String]("img_format") == "png" &&
      rows(0).getAs[Int]("width") == 40 && rows(0).getAs[Int]("height") == 20)
    assert(rows(1).getAs[String]("img_format") == "bmp")
    assert(rows(2).getAs[String]("img_format").contains("jpeg"))
    assert(rows(3).getAs[String]("error") != null && rows(3).getAs[Int]("width") == 0)
  }

  test("features: half-red half-blue averages; luminance is BT.601") {
    import spark.implicits._
    val df = Seq(("a.png", bicolor(64, 64, "png"))).toDF("path", "content")
    val r = Image.features(df).collect().head
    // exactly half 255-red, half 255-blue → avg_r ≈ avg_b ≈ 127.5, g = 0
    assert(math.abs(r.getAs[Double]("avg_r") - 127.5) < 4.0)
    assert(math.abs(r.getAs[Double]("avg_b") - 127.5) < 4.0)
    assert(r.getAs[Double]("avg_g") == 0.0)
    val expectedLum = 0.299 * r.getAs[Double]("avg_r") + 0.114 * r.getAs[Double]("avg_b")
    assert(math.abs(r.getAs[Double]("avg_luminance") - expectedLum) < 1e-9)
    assert(r.getAs[Double]("aspect_ratio") == 1.0)
  }

  test("thumbnail bounds the long edge, preserves aspect, re-decodes as png") {
    import spark.implicits._
    val df = Seq(("wide.png", bicolor(200, 50, "png"))).toDF("path", "content")
    val t = Image.thumbnail(df, maxDim = 100).collect().head
    assert(t.getAs[Int]("width") == 100 && t.getAs[Int]("height") == 25)
    val round = Image.decode(t.getAs[Array[Byte]]("thumb"))
    assert(round.exists { case (fmt, img) =>
      fmt == "png" && img.getWidth == 100 && img.getHeight == 25 })
    // images already under the bound are not upscaled
    val same = Image.thumbnail(df, maxDim = 400).collect().head
    assert(same.getAs[Int]("width") == 200 && same.getAs[Int]("height") == 50)
  }

  test("pHash: stable under rescale + lossy re-encode, far apart for unrelated images") {
    import graft.queries.ImageQueries.syntheticImage
    def hashOf(bytes: Array[Byte]): Long =
      Image.decode(bytes).map { case (_, img) => Image.pHash64(img) }
        .getOrElse(fail("decode failed"))
    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (seed <- 0L until 8L) {
      val base = hashOf(syntheticImage(seed, 32, "png"))
      // the SAME picture, rendered 2.25x larger and JPEG-compressed
      val transformed = hashOf(syntheticImage(seed, 48, "jpg"))
      assert(dist(base, transformed) <= 7,
        s"seed $seed: rescale+re-encode moved ${dist(base, transformed)} bits")
      // a DIFFERENT picture: independent bits land ~32 apart
      val other = hashOf(syntheticImage(seed + 100, 32, "png"))
      assert(dist(base, other) >= 16,
        s"seed $seed: unrelated images only ${dist(base, other)} bits apart")
    }
  }

  test("nearDuplicates recovers planted rescaled/re-encoded dups, rejects the rest") {
    import spark.implicits._
    import graft.queries.ImageQueries.syntheticImage
    // 20 distinct pictures; 3 planted duplicates of pictures 0/5/9 at
    // other resolutions + lossy encoding; one undecodable payload
    // (error rows must not pair with each other at phash 0)
    val originals = (0 until 20).map(i => (s"img$i", syntheticImage(i, 32, "png")))
    val planted = Seq(
      ("dup0", syntheticImage(0, 48, "jpg")),
      ("dup5", syntheticImage(5, 64, "jpg")),
      ("dup9", syntheticImage(9, 40, "png")))
    val junk = Seq(("junk1", Array[Byte](9, 9, 9)), ("junk2", Array[Byte](1, 2)))
    val corpus = spark.createDataFrame(originals ++ planted ++ junk).toDF("path", "content")
    val pairs = Image.nearDuplicates(corpus, maxDist = 7)
      .collect()
      .map(r => Set(r.getAs[String]("id_1"), r.getAs[String]("id_2")))
      .toSet
    assert(pairs == Set(
      Set("img0", "dup0"), Set("img5", "dup5"), Set("img9", "dup9")), pairs)
  }

  test("nearDuplicatesIncremental: batch probes the store, old pixels never re-decoded, old×old excluded") {
    import spark.implicits._
    import graft.queries.ImageQueries.syntheticImage
    // the persisted store: hashes of 20 originals PLUS an old near-dup
    // pair (img0b ~ img0) that must NOT resurface — old×old
    val storeImgs = (0 until 20).map(i => (s"img$i", syntheticImage(i, 32, "png"))) :+
      ("img0b", syntheticImage(0, 40, "png"))
    val store = Image.pHash(spark.createDataFrame(storeImgs).toDF("path", "content"))
      .filter(col("error").isNull)
      .select(col("path").as("id"), col("phash").as("simhash"))
      .localCheckpoint(true)
    // the batch: one re-encoded dup of img5, one fresh picture, junk
    val batch = spark.createDataFrame(Seq(
      ("new5", syntheticImage(5, 48, "jpg")),
      ("fresh", syntheticImage(777, 32, "png")),
      ("junk", Array[Byte](1, 2, 3)))).toDF("path", "content")
    val pairs = Image.nearDuplicatesIncremental(batch, store, maxDist = 7)
      .collect().map(r => Set(r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(Set("img5", "new5")),
      s"expected only the batch-vs-store pair (no img0~img0b old×old), got $pairs")
  }
}
