package graft.multimodal

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Video container plumbing: ISO-BMFF (MP4/MOV) metadata + the
  * frame-sampling PLAN, with decode behind a schema-stable stub.
  *
  * The reference stops at the MIME map (`utils/helpers.py:237`
  * ".mp4" → video/mp4) — video decode needs codec libraries that
  * exist in neither environment. What does NOT need a codec is the
  * container: ISO 14496-12 is a fixed big-endian box grammar
  * ([size:4][type:4], nested containers), so duration / timescale /
  * track geometry parse with pure byte arithmetic — a real parser in
  * the [[Audio]] RIFF / [[graft.sources.Excel]] OOXML tradition, not a
  * stub. Everything a 100 TB frame-sampling pipeline needs BEFORE
  * touching pixels is here and distributed:
  *
  *   - [[extractMetadata]]: per-file metadata map over binary
  *     payloads (error-tagged rows for non-MP4 bytes, the
  *     documents.py missing-parser contract);
  *   - [[frameSamplePlan]]: mid-interval sample timestamps as a
  *     narrow generated column — rows fan out, nothing shuffles;
  *   - [[decodeFrameStub]]: the deterministic schema-stable stand-in
  *     where a `mapPartitions` codec decoder slots in, same seam
  *     contract as [[Multimodal.decodeImageStub]].
  */
object Video {

  final case class TrackInfo(trackId: Long, handler: String, width: Double, height: Double)

  final case class Mp4Info(
      majorBrand: String,
      timescale: Long,
      duration: Long,
      tracks: Seq[TrackInfo]) {
    def durationSec: Double = if (timescale > 0) duration.toDouble / timescale else 0.0
    def videoTracks: Seq[TrackInfo] = tracks.filter(_.handler == "vide")
  }

  // ---- ISO-BMFF box walker (ISO 14496-12 §4.2) ----

  private def ascii(b: Array[Byte], off: Int, n: Int) = new String(b, off, n, "US-ASCII")

  private def u32(bb: ByteBuffer, off: Int): Long = bb.getInt(off).toLong & 0xFFFFFFFFL

  /** Boxes in [from, until): (type, payloadStart, payloadEnd). size==1
    * reads a 64-bit largesize, size==0 extends to the range end. */
  private def boxes(bytes: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = Seq.newBuilder[(String, Int, Int)]
    var off = from
    while (off + 8 <= until) {
      val size32 = u32(bb, off)
      val tpe = ascii(bytes, off + 4, 4)
      val (payloadStart, boxEnd) = size32 match {
        case 0 => (off + 8, until)
        case 1 =>
          if (off + 16 > until) return out.result()
          val large = bb.getLong(off + 8)
          if (large < 16 || off + large > until) return out.result()
          (off + 16, off + large.toInt)
        case s =>
          if (s < 8 || off + s > until) return out.result()
          (off + 8, off + s.toInt)
      }
      out += ((tpe, payloadStart, boxEnd))
      off = boxEnd
    }
    out.result()
  }

  private def find(bs: Seq[(String, Int, Int)], tpe: String): Option[(Int, Int)] =
    bs.collectFirst { case (`tpe`, s, e) => (s, e) }

  /** Container metadata without any codec: ftyp brand, mvhd
    * timescale/duration, per-trak tkhd geometry + hdlr handler type.
    * Left(reason) for anything that is not ISO-BMFF — including files
    * whose box headers are valid but whose mvhd/tkhd/hdlr payloads are
    * truncated (the payload reads below would otherwise throw out of
    * the executor map and fail the job, violating the error-tagged-
    * rows-never-dropped contract). */
  private[graft] def parseMp4(bytes: Array[Byte]): Either[String, Mp4Info] =
    try parseMp4Unsafe(bytes)
    catch {
      case e: IndexOutOfBoundsException =>
        Left(s"truncated box payload: ${e.getMessage}")
      case scala.util.control.NonFatal(e) =>
        Left(s"malformed ISO-BMFF: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def parseMp4Unsafe(bytes: Array[Byte]): Either[String, Mp4Info] = {
    if (bytes.length < 16) return Left("too short for an ISO-BMFF file")
    val top = boxes(bytes, 0, bytes.length)
    val brand = find(top, "ftyp") match {
      case Some((s, e)) if e - s >= 4 => ascii(bytes, s, 4)
      case _ => return Left("no ftyp box — not an ISO-BMFF file")
    }
    val (moovS, moovE) = find(top, "moov").getOrElse(return Left("no moov box"))
    val bb = ByteBuffer.wrap(bytes)
    val inMoov = boxes(bytes, moovS, moovE)

    val (mvS, _) = find(inMoov, "mvhd").getOrElse(return Left("no mvhd box"))
    val (timescale, duration) = bytes(mvS) match {
      case 0 => (u32(bb, mvS + 12), u32(bb, mvS + 16))
      case 1 => (u32(bb, mvS + 20), bb.getLong(mvS + 24))
      case v => return Left(s"unsupported mvhd version $v")
    }

    val tracks = inMoov.collect { case ("trak", ts, te) =>
      val inTrak = boxes(bytes, ts, te)
      val geom = find(inTrak, "tkhd").flatMap { case (s, _) =>
        // width/height are 16.16 fixed point at the end of tkhd
        // (v0: +76/+80, v1: +88/+92 from payload start)
        bytes(s) match {
          case 0 => Some((u32(bb, s + 12), u32(bb, s + 76) / 65536.0, u32(bb, s + 80) / 65536.0))
          case 1 => Some((u32(bb, s + 20), u32(bb, s + 88) / 65536.0, u32(bb, s + 92) / 65536.0))
          case _ => None
        }
      }
      val handler = find(inTrak, "mdia")
        .map { case (ms, me) => boxes(bytes, ms, me) }
        .flatMap(find(_, "hdlr"))
        .map { case (hs, _) => ascii(bytes, hs + 8, 4) }
        .getOrElse("unkn") // no hdlr box: unknown handler type
      geom.map { case (id, w, h) => TrackInfo(id, handler, w, h) }
    }.flatten

    Right(Mp4Info(brand, timescale, duration, tracks))
  }

  /** Per-file container metadata over a binaryFile-shaped frame
    * (path, content) — one task per file, the [[Audio.extractMetadata]]
    * scale shape. Non-MP4 payloads come back error-tagged, never
    * dropped. */
  def extractMetadata(binary: DataFrame): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        parseMp4(bytes) match {
          case Right(m) =>
            val v = m.videoTracks.headOption
            (path, bytes.length.toLong, Some(m.majorBrand), Some(m.timescale),
              Some(m.durationSec), Some(m.tracks.size),
              v.map(_.width), v.map(_.height), None: Option[String])
          case Left(err) =>
            (path, bytes.length.toLong, None, None, None, None, None, None, Some(err))
        }
      }
      .toDF("path", "file_size_bytes", "major_brand", "timescale",
        "duration_sec", "n_tracks", "width", "height", "error")
  }

  /** The frame-sampling PLAN: n mid-interval timestamps per video —
    * `ts_ms(i) = (i + 0.5) · duration·1000 / n` — as one generated
    * array column exploded to (…, sample_idx, ts_ms) rows. Pure
    * codegen'd column arithmetic: rows fan out n-fold with NO shuffle
    * and no UDF, so planning 8 frames over a billion clips is one
    * narrow map stage. Error rows (null duration) yield zero sample
    * rows rather than poisoning the stage. */
  def frameSamplePlan(meta: DataFrame, n: Int, durationCol: String = "duration_sec"): DataFrame = {
    require(n > 0, "sample count must be positive")
    val dur = col(durationCol)
    val idxs = when(dur.isNotNull && dur > 0, sequence(lit(0), lit(n - 1)))
    meta
      .withColumn("sample_idx", explode(idxs))
      .withColumn("ts_ms",
        round((col("sample_idx") + 0.5) * dur * 1000.0 / n).cast("long"))
  }

  /** Schema-stable frame-decode stand-in ([[Multimodal.decodeImageStub]]
    * contract): deterministic pseudo-frame keyed by (payload, ts_ms),
    * so downstream feature plumbing is testable end-to-end. A real
    * codec decoder replaces this behind the SAME struct schema via
    * `mapPartitions`, and nothing upstream or downstream changes. */
  def decodeFrameStub(payload: Column, tsMs: Column): Column = struct(
    md5(concat(md5(payload), tsMs.cast("string"))).as("frame_hash"),
    lit(0).as("width"),
    lit(0).as("height"),
    lit("stub").as("format"))

  // ---- frame-level perceptual signatures (the video member of the
  // dedup family: text q92/q93, image q134, audio q144, video here) ----

  /** Deterministic 64-bit frame-hash stand-in, the scalar sibling of
    * [[decodeFrameStub]]: first 8 bytes of md5(payload ‖ ts_ms). Equal
    * payloads hash equal at every timestamp (exact-duplicate clips
    * match end-to-end through [[nearDuplicates]]), unrelated payloads
    * land ~32 Hamming bits apart — the mid-Hamming-space property the
    * banding relies on. A codec decoder replaces this behind the SAME
    * `(payload, tsMs) → Either[error, hash64]` seam (decode the frame
    * at ts, then [[Image.pHash64]]), and nothing downstream changes —
    * VideoSpec and the q145 fixture drive that seam with a REAL
    * render→encode→decode→pHash decoder to prove it. */
  def stubFrameHash(payload: Array[Byte], tsMs: Long): Either[String, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload)
    md.update(ByteBuffer.allocate(8).putLong(tsMs).array())
    Right(ByteBuffer.wrap(md.digest()).getLong(0))
  }

  /** Per-clip frame signature rows: parse the container for duration,
    * take `n` mid-interval timestamps (the [[frameSamplePlan]] grid),
    * and hash each sampled frame through the `frameHash` seam — ALL
    * inside one `flatMap` task per clip, so the payload bytes never
    * leave the scan task and what flows downstream is (id, sample_idx,
    * frame_hash) — 24-byte rows, a billion clips ⇒ n·10⁹ longs, not
    * pixels. Non-MP4 / zero-duration payloads yield one error-tagged
    * row (sample_idx −1), per-frame decode failures error-tag that
    * frame only — the error-rows-never-dropped contract.
    * → (pathCol, sample_idx, frame_hash, error). */
  def frameSignatures(
      binary: DataFrame, n: Int,
      frameHash: (Array[Byte], Long) => Either[String, Long] = stubFrameHash,
      pathCol: String = "path", payloadCol: String = "content"): DataFrame = {
    require(n > 0, "sample count must be positive")
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseMp4(bytes) match {
          case Left(err) => Seq((path, -1, 0L, err))
          case Right(m) if m.durationSec <= 0 =>
            Seq((path, -1, 0L, "zero duration — nothing to sample"))
          case Right(m) =>
            (0 until n).map { i =>
              val tsMs = math.round((i + 0.5) * m.durationSec * 1000.0 / n)
              frameHash(bytes, tsMs) match {
                case Right(h)  => (path, i, h, null: String)
                case Left(err) => (path, i, 0L, err)
              }
            }
        }
      }
      .toDF(pathCol, "sample_idx", "frame_hash", "error")
  }

  /** Near-duplicate clip pairs from frame signatures: per-frame
    * Hamming banding with the pigeonhole split (`bands` bands of
    * 64/`bands` bits — exact for frame distance ≤ `bands` − 1), keyed
    * on (sample_idx, band, sig) — TEMPORAL ALIGNMENT is in the shuffle
    * key, so frame i only ever meets frame i and a clip sharing scenes
    * at a time OFFSET does not pair (the published frame-fingerprint
    * video-copy detection shape: align first, then match). Clips pair
    * when at least ⌈minMatchFrac·nFrames⌉ aligned frames match —
    * robust to a minority of frames falling on cuts/transitions.
    *
    * BAND WIDTH IS THE SCALE DIAL, the same trade text simhash makes
    * (q93): an 8-bit band has 256 values, so candidate groups — and
    * the band self-join's output — grow QUADRATICALLY once the corpus
    * outgrows bands·256·nFrames rows (measured: the growth gate blew
    * 12.8× > 10× at 50k clips on 8-bit bands). The default 4×16-bit
    * split (exact for d ≤ 3, 65536-value bands) keeps collision
    * groups near-singleton to millions of frames per sample slot;
    * callers needing the published pHash radius d ≤ 7 on a bounded
    * corpus pass bands = 8 explicitly and accept the collision cost.
    *
    * Scale shape: the band explode and join move (id, idx, hash) rows
    * only; Hamming verification runs BEFORE the pair-distinct, so
    * band-duplicate candidates die in the codegen'd filter instead of
    * feeding a shuffle. No all-pairs comparison anywhere; pixels and
    * payloads never shuffle. Same localCheckpoint rationale as
    * `simhashNearPairs`: the signature lineage feeds both sides of a
    * broadcast-vs-shuffle self-join ReusedExchange cannot collapse.
    * → (id_1, id_2, frames_matched, avg_distance). */
  def nearDuplicatesBySignatures(
      frameSigs: DataFrame, nFrames: Int, maxDist: Int = 3,
      minMatchFrac: Double = 0.75, bands: Int = 4, idCol: String = "path"): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist >= 0 && maxDist <= bands - 1,
      s"maxDist must be in [0, ${bands - 1}] ($bands-band pigeonhole exactness bound), got $maxDist")
    require(minMatchFrac > 0 && minMatchFrac <= 1,
      s"minMatchFrac must be in (0, 1], got $minMatchFrac")
    val bandBits = 64 / bands
    val bandMask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val sigs = frameSigs.filter(col("error").isNull)
      .select(col(idCol).as("id"), col("sample_idx").as("idx"),
        col("frame_hash").as("fh"))
      .localCheckpoint(true)
    val banded = sigs.select(col("id"), col("idx"), col("fh"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fh"), b * bandBits).bitwiseAND(bandMask).as("sig"))): _*)).as("_b"))
      .select(col("id"), col("idx"), col("fh"),
        col("_b.band").as("band"), col("_b.sig").as("sig"))
    banded.toDF("id_1", "idx", "fh_1", "band", "sig")
      .join(banded.toDF("id_2", "idx", "fh_2", "band", "sig"), Seq("idx", "band", "sig"))
      .filter(col("id_1") < col("id_2"))
      .withColumn("distance",
        graft.dedup.TextDedup.hammingDistance(col("fh_1"), col("fh_2")))
      .filter(col("distance") <= maxDist)
      .select("id_1", "id_2", "idx", "distance")
      .distinct()
      .groupBy("id_1", "id_2")
      .agg(count(lit(1)).as("frames_matched"),
        avg("distance").as("avg_distance"))
      .filter(col("frames_matched") >= math.ceil(minMatchFrac * nFrames).toLong)
  }

  /** Perceptual near-duplicate clip pairs over a binary video corpus:
    * [[frameSignatures]] (container parse + `nFrames` sampled frame
    * hashes per clip, one task per file) composed with
    * [[nearDuplicatesBySignatures]] (temporally-aligned Hamming
    * banding). `frameHash` is the codec seam — default
    * [[stubFrameHash]]; a real pipeline passes decode-then-pHash. */
  def nearDuplicates(
      binary: DataFrame, nFrames: Int = 8, maxDist: Int = 3,
      minMatchFrac: Double = 0.75, bands: Int = 4,
      frameHash: (Array[Byte], Long) => Either[String, Long] = stubFrameHash,
      pathCol: String = "path", payloadCol: String = "content"): DataFrame =
    nearDuplicatesBySignatures(
      frameSignatures(binary, nFrames, frameHash, pathCol, payloadCol),
      nFrames, maxDist, minMatchFrac, bands, idCol = pathCol)

  /** Incremental video near-dup over frame signatures: a NEW batch's
    * (id, sample_idx, frame_hash) rows probe a persisted frame-
    * signature store — the daily-crawl contract
    * ([[graft.dedup.TextDedup.simhashNearPairsIncremental]]) lifted
    * to the temporally-aligned shape: the asymmetric band join keys
    * on (sample_idx, band, sig), so old×old clip pairs are never
    * generated and history's frames are never re-decoded; a
    * re-crawled id's new signature rows replace ALL its store rows
    * (anti-join on the broadcast batch ids). The per-pair
    * ⌈minMatchFrac·nFrames⌉ gate then runs on batch-involving pairs
    * only. Persist this batch's [[frameSignatures]] output as the
    * next store version. → (id_1, id_2, frames_matched, avg_distance). */
  def nearDuplicatesBySignaturesIncremental(
      newFrameSigs: DataFrame, oldFrameSigs: DataFrame, nFrames: Int,
      maxDist: Int = 3, minMatchFrac: Double = 0.75, bands: Int = 4,
      idCol: String = "path"): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist >= 0 && maxDist <= bands - 1,
      s"maxDist must be in [0, ${bands - 1}] ($bands-band pigeonhole exactness bound), got $maxDist")
    require(minMatchFrac > 0 && minMatchFrac <= 1,
      s"minMatchFrac must be in (0, 1], got $minMatchFrac")
    val bandBits = 64 / bands
    val bandMask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    def clean(df: DataFrame) = df.filter(col("error").isNull)
      .select(col(idCol).as("id"), col("sample_idx").as("idx"), col("frame_hash").as("fh"))
    val newSigs = clean(newFrameSigs).localCheckpoint(true)
    val oldOnly = clean(oldFrameSigs)
      .join(broadcast(newSigs.select("id").distinct()), Seq("id"), "left_anti")
    val all = oldOnly.unionByName(newSigs)
    def banded(df: DataFrame, idAs: String, fhAs: String): DataFrame =
      df.select(col("id").as(idAs), col("idx"), col("fh").as(fhAs),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("fh"), b * bandBits).bitwiseAND(bandMask).as("sig"))): _*)).as("_b"))
        .select(col(idAs), col("idx"), col(fhAs),
          col("_b.band").as("band"), col("_b.sig").as("sig"))
    banded(newSigs, "_ida", "_fha")
      .join(banded(all, "_idb", "_fhb"), Seq("idx", "band", "sig"))
      .filter(col("_ida") =!= col("_idb"))
      .withColumn("distance",
        graft.dedup.TextDedup.hammingDistance(col("_fha"), col("_fhb")))
      .filter(col("distance") <= maxDist)
      .select(least(col("_ida"), col("_idb")).as("id_1"),
        greatest(col("_ida"), col("_idb")).as("id_2"), col("idx"), col("distance"))
      .distinct()
      .groupBy("id_1", "id_2")
      .agg(count(lit(1)).as("frames_matched"),
        avg("distance").as("avg_distance"))
      .filter(col("frames_matched") >= math.ceil(minMatchFrac * nFrames).toLong)
  }

  /** Incremental video near-dup over binary payloads: [[frameSignatures]]
    * on the NEW batch only, probed against the persisted store via
    * [[nearDuplicatesBySignaturesIncremental]]. */
  def nearDuplicatesIncremental(
      newBinary: DataFrame, oldFrameSigs: DataFrame, nFrames: Int = 8,
      maxDist: Int = 3, minMatchFrac: Double = 0.75, bands: Int = 4,
      frameHash: (Array[Byte], Long) => Either[String, Long] = stubFrameHash,
      pathCol: String = "path", payloadCol: String = "content"): DataFrame =
    nearDuplicatesBySignaturesIncremental(
      frameSignatures(newBinary, nFrames, frameHash, pathCol, payloadCol),
      oldFrameSigs, nFrames, maxDist, minMatchFrac, bands, idCol = pathCol)
}
