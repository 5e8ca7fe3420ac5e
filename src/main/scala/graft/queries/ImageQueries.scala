package graft.queries

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Image

/** The multimodal near-dup fixture queries — image pHash (q134),
  * acoustic fingerprint (q144), video frame-fingerprint (q145) — all
  * rows-only ⊘: the perceptual transforms are Spark-computed over
  * JVM-decoded payloads and not replayable in SQL, so correctness
  * lives in ImageSpec/AudioSpec/VideoSpec (planted transformed
  * duplicates recovered, unrelated rejected); the rows exist so the
  * production plans and timings are artifact facts per round, the
  * q96/q116a pattern.
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

  /** Deterministic synthetic clip for q144 (the audio twin of
    * [[syntheticImage]], same density lesson): 3 s at 8 kHz mono
    * 16-bit, four segments of twelve summed sinusoids, each tone
    * amplitude-modulated at 1–6 Hz so band energies move continuously
    * (a stationary mixture leaves the Haitsma–Kalker
    * difference-derivative at quantization ties, and clips much
    * shorter than ~20 frames leave the quarter-majority bits weakly
    * pooled — both lessons measured). Tones synthesize by phasor
    * RECURRENCE (two multiply-adds per tone per sample, no
    * trigonometry in the hot loop), so a 50k-doc render stays
    * bench-friendly. `scale` varies only amplitude — the invariance
    * the planted duplicates exercise. */
  private[graft] def syntheticWav(seed: Long, scale: Double): Array[Byte] = {
    val rate = 8000; val n = 24000; val tones = 12
    val rnd = new scala.util.Random(seed)
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    val segLen = n / 4
    var seg = 0
    while (seg < 4) {
      // per tone: carrier phasor (rotated by 2πf/rate per sample) and
      // envelope phasor (2πfm/rate) — sin = imaginary part
      val amp = new Array[Double](tones)
      val cr = new Array[Double](tones); val ci = new Array[Double](tones)
      val rotR = new Array[Double](tones); val rotI = new Array[Double](tones)
      val er = new Array[Double](tones); val ei = new Array[Double](tones)
      val erotR = new Array[Double](tones); val erotI = new Array[Double](tones)
      var k = 0
      while (k < tones) {
        val f = 320.0 * math.pow(7.0, rnd.nextDouble())
        amp(k) = 0.2 + 0.8 * rnd.nextDouble()
        val fm = 1.0 + 5.0 * rnd.nextDouble()
        val ph = 2 * math.Pi * rnd.nextDouble()
        cr(k) = 1.0; ci(k) = 0.0
        rotR(k) = math.cos(2 * math.Pi * f / rate); rotI(k) = math.sin(2 * math.Pi * f / rate)
        er(k) = math.cos(ph); ei(k) = math.sin(ph)
        erotR(k) = math.cos(2 * math.Pi * fm / rate); erotI(k) = math.sin(2 * math.Pi * fm / rate)
        k += 1
      }
      var i = 0
      while (i < segLen) {
        var v = 0.0
        k = 0
        while (k < tones) {
          v += amp(k) * (0.55 + 0.45 * ei(k)) * ci(k)
          val ncr = cr(k) * rotR(k) - ci(k) * rotI(k)
          ci(k) = cr(k) * rotI(k) + ci(k) * rotR(k); cr(k) = ncr
          val ner = er(k) * erotR(k) - ei(k) * erotI(k)
          ei(k) = er(k) * erotI(k) + ei(k) * erotR(k); er(k) = ner
          k += 1
        }
        bb.putShort((math.max(-1.0, math.min(1.0, v / 6.0 * scale)) * 32767).toShort)
        i += 1
      }
      seg += 1
    }
    bb.array()
  }

  /** Deterministic synthetic MP4 for q145 (the video member of the
    * fixture family): a structurally-correct ISO-BMFF container —
    * ftyp + moov(mvhd 4 s @ timescale 1000, one 'vide' trak) — so
    * [[graft.multimodal.Video.parseMp4]] reads REAL box grammar, plus
    * a 'free' box carrying (sceneSeed, renderSize, jpegFlag): the
    * scene parameters a codec would recover from mdat, which this
    * container cannot hold (no codec in either environment — the
    * documented stub boundary; everything around it is real). */
  private[graft] def syntheticMp4(seed: Long, size: Int, jpeg: Boolean): Array[Byte] = {
    def u32(v: Long) = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def box(tpe: String, p: Array[Byte]) =
      java.nio.ByteBuffer.allocate(8 + p.length)
        .putInt(8 + p.length).put(tpe.getBytes("US-ASCII")).put(p).array()
    def fullBox(tpe: String, p: Array[Byte]) = box(tpe, Array[Byte](0, 0, 0, 0) ++ p)
    val free = box("free", java.nio.ByteBuffer.allocate(13)
      .putLong(seed).putInt(size).put((if (jpeg) 1 else 0).toByte).array())
    val mvhd = fullBox("mvhd",
      u32(0) ++ u32(0) ++ u32(1000) ++ u32(4000) ++ Array.fill[Byte](80)(0))
    val tkhd = fullBox("tkhd", u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(0) ++
      Array.fill[Byte](52)(0) ++ u32(size.toLong << 16) ++ u32(size.toLong << 16))
    val hdlr = fullBox("hdlr", u32(0) ++ "vide".getBytes("US-ASCII") ++ Array.fill[Byte](12)(0))
    val trak = box("trak", tkhd ++ box("mdia", hdlr))
    box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512)) ++ free ++
      box("moov", mvhd ++ trak)
  }

  /** The q145 frame decoder behind [[graft.multimodal.Video]]'s
    * `(payload, tsMs) → Either[error, hash64]` seam — REAL except the
    * codec step: read the scene parameters from the container's free
    * box, render the 1-scene-per-second [[syntheticImage]] at the
    * clip's own resolution/encoding, then decode those bytes back
    * through `javax.imageio` and pHash — so re-encoded (jpeg) and
    * rescaled duplicate CLIPS exercise exactly the codec invariance
    * q134 proves for still images, frame by frame. */
  private[graft] def videoFrameDecoder(payload: Array[Byte], tsMs: Long): Either[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(payload)
    var off = 0
    while (off + 8 <= payload.length) {
      val sz = bb.getInt(off)
      if (new String(payload, off + 4, 4, "US-ASCII") == "free") {
        val seed = bb.getLong(off + 8)
        val size = bb.getInt(off + 16)
        val fmt = if (bb.get(off + 20) == 1) "jpg" else "png"
        val scene = tsMs / 1000 // one scene per second
        val frameBytes = syntheticImage(seed + 1000003L * scene, size, fmt)
        return Image.decode(frameBytes).map { case (_, img) => Image.pHash64(img) }
      }
      off += math.max(8, sz)
    }
    Left("no free box in fixture mp4")
  }

  val queries: Map[String, Q] = Map(
    // Acoustic near-dup (rows-only ⊘, the q134 stance): every doc
    // renders a seeded modulated tone mixture; every 50th doc
    // re-renders its PREDECESSOR's mixture at half amplitude — a
    // planted duplicate under exactly the transformation the
    // fingerprint is invariant to. AudioSpec pins recovery/rejection.
    "q144_audio_neardup" -> ((s, d) => {
      import s.implicits._
      // Repartition the 8-byte id frame BEFORE the render map: the
      // per-row cost (24k-sample render + 22 FFTs ≈ ms) dwarfs the
      // scan, and parallelism of a narrow map = input splits — a
      // single-row-group parquet file gives ONE split, serializing
      // the whole render on one core (measured 11.7 s → ~1.2 s at
      // sf0.1). Explicit numPartitions so AQE cannot coalesce the
      // tiny-by-bytes shuffle back to one partition. Ids move, clip
      // payloads never do — the render stays map-local.
      val clips = Tables.documents(s, d).select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .map { id =>
          val dup = id % 50 == 49
          val seed = if (dup) id - 1 else id
          (s"clip$id", syntheticWav(seed, scale = if (dup) 0.45 else 0.9))
        }
        .toDF("path", "content")
      // default geometry = d ≤ 3 on 4×16-bit bands (the corpus-scale
      // pigeonhole, r18): the old 8×8-bit banding went quadratic at
      // the 500k-clip tier — 2048 buckets for 500k rows — and the
      // planted half-amplitude re-renders land at 0–2 bits anyway
      graft.multimodal.Audio.nearDuplicates(clips)
    }),

    // Video near-dup (rows-only ⊘, the q134/q144 stance): every doc
    // gets a 4-scene synthetic clip; every 50th doc re-renders its
    // PREDECESSOR's scene sequence at a different resolution with
    // jpeg (lossy) frames — a planted duplicate under exactly the
    // transformations frame-level pHash sees through. VideoSpec pins
    // recovery, rejection, and that time-OFFSET scene sharing does
    // NOT pair (alignment lives in the shuffle key).
    "q145_video_neardup" -> ((s, d) => {
      import s.implicits._
      // Same split-vs-compute mismatch as q144 (see above).
      val clips = Tables.documents(s, d).select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .map { id =>
          val dup = id % 50 == 49
          val seed = if (dup) id - 1 else id
          (s"vid$id", syntheticMp4(seed, size = if (dup) 48 else 32, jpeg = dup))
        }
        .toDF("path", "content")
      // d ≤ 3 on 4×16-bit bands — the corpus-scale pigeonhole (q93's
      // trade): planted frame dups land ≤ 2 bits, and 65536-value
      // bands keep collision groups near-singleton as the corpus
      // grows (8-bit bands measurably went quadratic at 50k clips —
      // the growth gate caught 12.8× > 10×).
      graft.multimodal.Video.nearDuplicates(clips, nFrames = 4, maxDist = 3,
        minMatchFrac = 0.75, frameHash = videoFrameDecoder _)
    }),

    "q134_phash_neardup" -> ((s, d) => {
      import s.implicits._
      // Same split-vs-compute mismatch as q144 (see above): spread
      // the id frame across cores before the per-row image render.
      val imgs = Tables.documents(s, d).select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
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
