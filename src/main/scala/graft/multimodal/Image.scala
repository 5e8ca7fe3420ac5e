package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Image decode / feature-extract / resize over opaque binary columns.
  * The reference has no dedicated image connector — its media package
  * holds only audio (ref connectors/media/audio.py) and its document
  * extractors expose an `extract_images` flag (ref
  * connectors/unstructured/documents.py:25,298); this fills that gap
  * with the decode/thumbnail/stats surface a Pillow-based connector
  * would offer, in the audio connector's binary-payload shape.
  *
  * A Pillow equivalent is not needed; here the decoder is `javax.imageio` —
  * part of the JDK itself (PNG, JPEG, BMP, GIF, WBMP readers ship in
  * every JVM), so image decode is a REAL parser on this classpath,
  * not a stub. Codecs outside the JDK set (webp, tiff, heic) surface
  * as error-tagged rows behind the same schema — the documented-seam
  * contract every binary connector here follows.
  *
  * All three operations run as one-task-per-row `map` over the binary
  * payload (the Excel/Pdf/Office stance): a corpus of millions of
  * images decodes with full parallelism, and the extracted
  * metadata/feature columns — not the pixels — are what flow into
  * downstream joins and dedup. `ImageIO.setUseCache(false)` keeps
  * decode purely in-memory (no temp-file I/O per row).
  */
object Image {

  ImageIO.setUseCache(false) // in-memory decode; no disk-backed cache per task

  /** Decode metadata per row → (…, img_format, width, height, n_bands,
    * error). Null payloads and unsupported codecs error-tag. */
  def metadata(
      binary: DataFrame, pathCol: String = "path", payloadCol: String = "content"): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        decode(bytes) match {
          case Right((fmt, img)) =>
            (path, fmt, img.getWidth, img.getHeight, img.getRaster.getNumBands, null: String)
          case Left(err) => (path, null: String, 0, 0, 0, err)
        }
      }
      .toDF(pathCol, "img_format", "width", "height", "n_bands", "error")
  }

  /** Pixel features per row → (…, avg_luminance, avg_r, avg_g, avg_b,
    * aspect_ratio, error). Luminance is ITU-R BT.601
    * (0.299R + 0.587G + 0.114B), averaged over a bounded sample grid
    * (at most `sampleGrid`² pixels) so cost is constant per image
    * regardless of resolution — features for dedup/quality filtering,
    * not rendering. */
  def features(
      binary: DataFrame, pathCol: String = "path", payloadCol: String = "content",
      sampleGrid: Int = 64): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        decode(bytes) match {
          case Right((_, img)) =>
            val (lum, r, g, b) = sampleStats(img, sampleGrid)
            (path, lum, r, g, b, img.getWidth.toDouble / img.getHeight, null: String)
          case Left(err) => (path, 0.0, 0.0, 0.0, 0.0, 0.0, err)
        }
      }
      .toDF(pathCol, "avg_luminance", "avg_r", "avg_g", "avg_b", "aspect_ratio", "error")
  }

  /** Re-encode every image as a bounded thumbnail → (…, thumb, width,
    * height, error); aspect ratio preserved, output is PNG (lossless,
    * always writable by the JDK). The training-data use: normalize
    * heterogeneous crawl images to a bounded-size column before
    * shipping to a vision tokenizer. */
  def thumbnail(
      binary: DataFrame, maxDim: Int = 128,
      pathCol: String = "path", payloadCol: String = "content"): DataFrame = {
    require(maxDim > 0, "maxDim must be positive")
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        decode(bytes) match {
          case Right((_, img)) =>
            val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
            val (w, h) = (math.max(1, (img.getWidth * scale).round.toInt),
              math.max(1, (img.getHeight * scale).round.toInt))
            val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val gfx = out.createGraphics()
            try {
              gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              gfx.drawImage(img, 0, 0, w, h, null)
            } finally gfx.dispose()
            val buf = new ByteArrayOutputStream()
            ImageIO.write(out, "png", buf)
            (path, buf.toByteArray, w, h, null: String)
          case Left(err) => (path, null: Array[Byte], 0, 0, err)
        }
      }
      .toDF(pathCol, "thumb", "width", "height", "error")
  }

  // ---- byte-level decode (runs inside executor tasks) ----

  /** → Right((formatName, image)) or Left(error). */
  private[graft] def decode(bytes: Array[Byte]): Either[String, (String, BufferedImage)] = {
    if (bytes == null || bytes.isEmpty) return Left("empty payload")
    try {
      val stream = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(stream)
      if (!readers.hasNext)
        Left("no JDK codec for this format (webp/tiff/heic need an external decoder)")
      else {
        val reader = readers.next()
        try {
          reader.setInput(stream)
          Right((reader.getFormatName.toLowerCase, reader.read(0)))
        } finally reader.dispose()
      }
    } catch { case e: Exception => Left(s"decode failed: ${e.getMessage}") }
  }

  /** Average (luminance, r, g, b) over an at-most grid×grid sample. */
  private def sampleStats(img: BufferedImage, grid: Int): (Double, Double, Double, Double) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (sx, sy) = (math.max(1, w / grid), math.max(1, h / grid))
    var (r, g, b) = (0.0, 0.0, 0.0)
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        r += (rgb >> 16) & 0xFF; g += (rgb >> 8) & 0xFF; b += rgb & 0xFF
        n += 1
        x += sx
      }
      y += sy
    }
    val (ar, ag, ab) = (r / n, g / n, b / n)
    (0.299 * ar + 0.587 * ag + 0.114 * ab, ar, ag, ab)
  }
}
