package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

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
}
