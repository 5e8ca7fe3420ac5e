package graft.queries

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Image

/** Perceptual image near-dup (q134) — rows-only ⊘: the pHash DCT is
  * Spark-computed over JVM-decoded pixels and not replayable in SQL,
  * so correctness lives in ImageSpec (planted rescaled/re-encoded
  * duplicates recovered, unrelated images rejected); this row exists
  * so the production plan and timing are artifact facts per round,
  * the q96/q116a pattern.
  *
  * The corpus carries no image column, so the query manufactures one
  * deterministically from doc ids (the q117/q118 fixture discipline):
  * every doc renders a seeded low-frequency luminance pattern, and
  * every 50th doc re-renders its PREDECESSOR's pattern at a different
  * resolution with JPEG (lossy) encoding instead of PNG — a planted
  * near-duplicate under exactly the transformations pHash exists to
  * see through. Expected output: one pair per planted dup (ids 49–50k
  * apart by 1), nothing else.
  */
object ImageQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic synthetic image: a seeded random low-frequency
    * cosine field — luminance(x, y) = 128 + Σ_{u,v ≤ 8, (u,v)≠(0,0)}
    * c_uv·cos(πu·t_x)·cos(πv·t_y) with Gaussian c_uv and normalized
    * coordinates t = (x+0.5)/size — rendered at `size`×`size`, encoded
    * as `format` (png lossless / jpg lossy). Dense low-frequency
    * spectrum on purpose: a pattern with only a couple of spectral
    * lines leaves most DCT coefficients at the median, where the pHash
    * bits degenerate to tie-break noise and unrelated images can
    * collide — exactly the structure real photographs don't have.
    * Coefficients derive from `seed` only and coordinates are
    * normalized, so two renderings of one seed at different sizes
    * depict the SAME continuous picture — a true rescale, not a
    * different image. */
  private[graft] def syntheticImage(seed: Long, size: Int, format: String): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val coeffs = Array.tabulate(9, 9)((u, v) =>
      if (u == 0 && v == 0) 0.0 else rnd.nextGaussian() * 14.0 / (1.0 + 0.3 * (u + v)))
    val img = new java.awt.image.BufferedImage(size, size,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val cosT = Array.tabulate(9, size)((u, x) => math.cos(math.Pi * u * (x + 0.5) / size))
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        var lum = 128.0
        var u = 0
        while (u <= 8) {
          var v = 0
          while (v <= 8) { lum += coeffs(u)(v) * cosT(u)(x) * cosT(v)(y); v += 1 }
          u += 1
        }
        val g = math.max(0, math.min(255, lum.round.toInt))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, format, buf)
    buf.toByteArray
  }

  val queries: Map[String, Q] = Map(
    "q134_phash_neardup" -> ((s, d) => {
      import s.implicits._
      val imgs = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val dup = id % 50 == 49
          val seed = if (dup) id - 1 else id
          ( s"img$id",
            syntheticImage(seed, size = if (dup) 48 else 32,
              format = if (dup) "jpg" else "png"))
        }
        .toDF("path", "content")
      Image.nearDuplicates(imgs, maxDist = 7)
    }))

  /** Rows-only ⊘ — no SQL oracle (see object doc). */
  val oracles: Map[String, String] = Map.empty
}
