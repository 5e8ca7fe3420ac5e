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
}
