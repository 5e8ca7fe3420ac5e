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

  /** 64-bit DCT perceptual hash per row → (…, phash, error): grayscale
    * resample to 32×32 (bilinear, so the hash is resolution-invariant
    * by construction), 2-D DCT-II, keep the 8×8 low-frequency block
    * skipping row/column 0 (the DC terms — brightness/contrast, not
    * structure), bit i = coefficient > median of the 64. Two renderings
    * of the same picture — rescaled, re-encoded, mildly recompressed —
    * land within a few Hamming bits; unrelated pictures land ~32 apart
    * (independent coin-flips per bit). The standard pHash construction
    * (Zauner 2010, "Implementation and Benchmarking of Perceptual
    * Image Hash Functions").
    *
    * Cost is bounded per row regardless of resolution: one 32×32
    * resample + an 8×8-output partial DCT (two 8×32 cosine-table
    * matmuls), so the map stays O(pixels-read) with a constant
    * transform — the same one-task-per-row shape as [[metadata]].
    * Undecodable payloads error-tag with phash = 0. */
  def pHash(
      binary: DataFrame, pathCol: String = "path", payloadCol: String = "content"): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        decode(bytes) match {
          case Right((_, img)) => (path, pHash64(img), null: String)
          case Left(err)       => (path, 0L, err)
        }
      }
      .toDF(pathCol, "phash", "error")
  }

  /** Perceptual near-duplicate PAIRS over an image corpus: [[pHash]]
    * per row, then Hamming banding — the multimodal member of the
    * dedup family, riding the exact pigeonhole machinery text simhash
    * uses ([[graft.dedup.TextDedup.simhashNearPairs]]); `bands` bands
    * of 64/`bands` bits are exact for `maxDist` ≤ bands − 1. The
    * default 8×8-bit geometry keeps d ≤ 7 — pHash's PUBLISHED near-dup
    * radius (recompression/resize land 4–10 bits) — but 8-bit band
    * values give only 2048 buckets, so candidate pairs grow
    * quadratically past ~10⁵ images (the r18 q144 measurement: 13.7×
    * wall for 10× clips); on corpora that large, pass
    * (maxDist = 3, bands = 4) where the tighter radius is acceptable,
    * or pre-cluster (e.g. by [[extractMetadata]] dimensions) so each
    * banding universe stays bounded. One (band, sig) shuffle of
    * (id, hash) rows — pixels never shuffle, no all-pairs comparison,
    * the q93 scale shape unchanged.
    * Undecodable rows are dropped before banding (an error-tagged row
    * must not pair with every other error row at hash 0).
    * → (id_1, id_2, distance) on `pathCol` ids. */
  def nearDuplicates(
      binary: DataFrame, maxDist: Int = 7, bands: Int = 8,
      pathCol: String = "path", payloadCol: String = "content"): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist >= 0 && maxDist <= bands - 1,
      s"maxDist must be in [0, ${bands - 1}] ($bands-band pigeonhole exactness bound), got $maxDist")
    val sigs = pHash(binary, pathCol, payloadCol)
      .filter(col("error").isNull)
      .select(col(pathCol).as("id"), col("phash").as("simhash"))
    graft.dedup.TextDedup.simhashNearPairs(sigs, maxDist, bands)
  }

  /** Incremental perceptual near-dup: [[pHash]] the NEW batch only and
    * probe a persisted (id, simhash) fingerprint store — the
    * daily-crawl contract ([[graft.dedup.TextDedup.simhashNearPairsIncremental]]):
    * history's pixels are never re-decoded, old×old pairs never
    * generated, a re-crawled id's new hash wins. Persist this batch's
    * `pHash` output as the next store version. Same band/radius dial
    * as [[nearDuplicates]]. → (id_1, id_2, distance). */
  def nearDuplicatesIncremental(
      newBinary: DataFrame, oldSigs: DataFrame, maxDist: Int = 7, bands: Int = 8,
      pathCol: String = "path", payloadCol: String = "content"): DataFrame = {
    val sigs = pHash(newBinary, pathCol, payloadCol)
      .filter(col("error").isNull)
      .select(col(pathCol).as("id"), col("phash").as("simhash"))
    graft.dedup.TextDedup.simhashNearPairsIncremental(sigs, oldSigs, maxDist, bands)
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

  private val PhashGrid = 32 // resample size
  private val PhashBlock = 8 // low-frequency block edge (bits = 8×8)

  /** cosTable(u)(x) = cos((2x+1)·u·π/64) — the DCT-II basis for the
    * partial transform, built once per JVM. Only rows/cols 1..8 of the
    * output are needed, so the table covers u ∈ [0, 9). */
  private lazy val phashCos: Array[Array[Double]] =
    Array.tabulate(PhashBlock + 1, PhashGrid) { (u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * PhashGrid))
    }

  /** The 64-bit perceptual hash of one decoded image (driver-free,
    * runs inside the task). */
  private[graft] def pHash64(img: BufferedImage): Long = {
    // bilinear 32×32 grayscale resample (BT.601 luminance)
    val gray = new BufferedImage(PhashGrid, PhashGrid, BufferedImage.TYPE_INT_RGB)
    val gfx = gray.createGraphics()
    try {
      gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gfx.drawImage(img, 0, 0, PhashGrid, PhashGrid, null)
    } finally gfx.dispose()
    val lum = Array.ofDim[Double](PhashGrid, PhashGrid)
    var y = 0
    while (y < PhashGrid) {
      var x = 0
      while (x < PhashGrid) {
        val rgb = gray.getRGB(x, y)
        lum(y)(x) = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    // partial separable DCT-II: rows first (only u ≤ 8 outputs), then
    // columns — 2·8·32·32 multiply-adds, resolution-independent
    val rowT = Array.ofDim[Double](PhashGrid, PhashBlock + 1)
    y = 0
    while (y < PhashGrid) {
      var u = 1
      while (u <= PhashBlock) {
        var s = 0.0
        var x = 0
        while (x < PhashGrid) { s += lum(y)(x) * phashCos(u)(x); x += 1 }
        rowT(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coeffs = new Array[Double](PhashBlock * PhashBlock)
    var v = 1
    while (v <= PhashBlock) {
      var u = 1
      while (u <= PhashBlock) {
        var s = 0.0
        var yy = 0
        while (yy < PhashGrid) { s += rowT(yy)(u) * phashCos(v)(yy); yy += 1 }
        coeffs((v - 1) * PhashBlock + (u - 1)) = s
        u += 1
      }
      v += 1
    }
    // median split: exactly (or nearly, under ties) half the bits set —
    // hashes sit mid-Hamming-space, the property banding relies on
    val sorted = coeffs.clone().sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var hash = 0L
    var i = 0
    while (i < 64) { if (coeffs(i) > median) hash |= (1L << i); i += 1 }
    hash
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
