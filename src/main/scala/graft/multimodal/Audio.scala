package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio connector (ref connectors/media/audio.py:50-114 AudioConfig /
  * list_files, :200 extract_metadata, :315 mute_segments, :374
  * bleep_segments, :21 AudioSegment).
  *
  * The reference leans on soundfile/pydub; neither exists here — but
  * PCM WAV is a fixed binary layout (RIFF chunks), so metadata parsing
  * and the two REDACTION operators (mute = zero the sample range,
  * bleep = overwrite with a sine tone) are implemented fully with byte
  * arithmetic: real parsers, not stubs. Compressed codecs (mp3/flac/
  * ogg/m4a/aac) surface as `error`-tagged rows behind the same schema —
  * the documents.py contract for missing parsers — and swap in behind
  * [[Multimodal.decodeImageStub]]-style seams when codec libraries are
  * available.
  *
  * Scale shape: per-FILE tasks over the binaryFile source (flatMap),
  * like [[graft.sources.Excel]] — thousands of clips parse in
  * parallel, payload bytes never shuffle except where rewritten.
  * Redaction segments ride per-row, so the mute/bleep pass is
  * embarrassingly parallel — the shape a 100 TB audio-PII sweep needs.
  */
object Audio {

  /** audio.py:21 AudioSegment, the redaction time-range contract. */
  final case class SegmentSpec(start_ms: Double, end_ms: Double)

  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      frames: Long, dataOffset: Int, dataLength: Int) {
    def durationSec: Double = frames.toDouble / sampleRate
    def blockAlign: Int = channels * bitsPerSample / 8
  }

  /** Walk the RIFF chunk list → fmt + data coordinates. Returns Left
    * (reason) for anything that is not an uncompressed PCM WAV. */
  private[graft] def parseWav(bytes: Array[Byte]): Either[String, WavInfo] = {
    if (bytes.length < 44) return Left("too short for a WAV header")
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return Left("not a RIFF/WAVE file")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var data: Option[(Int, Int)] = None // offset, length
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = ascii(off, 4)
      val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return Left(s"truncated $id chunk")
      id match {
        case "fmt " =>
          fmt = Some((bb.getShort(off + 8) & 0xFFFF, bb.getShort(off + 10) & 0xFFFF,
            bb.getInt(off + 12), bb.getShort(off + 22) & 0xFFFF))
        case "data" => data = Some((off + 8, size))
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((format, ch, rate, bits)), Some((dOff, dLen))) =>
        if (format != 1) Left(s"compressed WAV (format $format) needs a codec library")
        else if (ch <= 0 || rate <= 0 || bits <= 0) Left("degenerate fmt chunk")
        else Right(WavInfo(rate, ch, bits, dLen.toLong / (ch * bits / 8), dOff, dLen))
      case _ => Left("missing fmt or data chunk")
    }
  }

  /** audio.py:200 extract_metadata over a binaryFile frame →
    * (path, file_size_bytes, format, sample_rate, channels, bit_depth,
    * frames, duration_sec, error). Compressed formats keep their file
    * stats and carry the reason in `error`. */
  def extractMetadata(binary: DataFrame): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val ext = path.replaceAll(".*\\.", ".").toLowerCase
        parseWav(bytes) match {
          case Right(w) => (path, bytes.length.toLong, ext, Some(w.sampleRate),
            Some(w.channels), Some(w.bitsPerSample), Some(w.frames),
            Some(w.durationSec), None: Option[String])
          case Left(err) => (path, bytes.length.toLong, ext, None, None, None, None, None, Some(err))
        }
      }
      .toDF("path", "file_size_bytes", "format", "sample_rate", "channels",
        "bit_depth", "frames", "duration_sec", "error")
  }

  private def frameRange(w: WavInfo, seg: SegmentSpec): (Long, Long) = {
    val from = math.max(0L, (seg.start_ms * w.sampleRate / 1000.0).toLong)
    val until = math.min(w.frames, math.ceil(seg.end_ms * w.sampleRate / 1000.0).toLong)
    (from, until)
  }

  /** audio.py:315 mute_segments: zero the PCM samples inside each
    * [start_ms, end_ms) range — silence, all formats/bit depths. */
  private[graft] def muteWav(bytes: Array[Byte], segments: Seq[SegmentSpec]): Array[Byte] =
    parseWav(bytes) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(w) =>
        val out = bytes.clone()
        segments.foreach { seg =>
          val (from, until) = frameRange(w, seg)
          java.util.Arrays.fill(out,
            w.dataOffset + (from * w.blockAlign).toInt,
            w.dataOffset + (until * w.blockAlign).toInt, 0: Byte)
        }
        out
    }

  /** audio.py:374 bleep_segments: overwrite each range with a sine
    * tone (16-bit PCM — the reference's synthesis path is 16-bit too). */
  private[graft] def bleepWav(
      bytes: Array[Byte], segments: Seq[SegmentSpec],
      freqHz: Double = 1000.0, amplitude: Double = 0.6): Array[Byte] =
    parseWav(bytes) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(w) if w.bitsPerSample != 16 =>
        throw new IllegalArgumentException(s"bleep needs 16-bit PCM, got ${w.bitsPerSample}-bit")
      case Right(w) =>
        val out = bytes.clone()
        val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
        segments.foreach { seg =>
          val (from, until) = frameRange(w, seg)
          var f = from
          while (f < until) {
            val s = (amplitude * Short.MaxValue *
              math.sin(2 * math.Pi * freqHz * f / w.sampleRate)).toShort
            var c = 0
            while (c < w.channels) {
              bb.putShort(w.dataOffset + (f * w.blockAlign).toInt + c * 2, s)
              c += 1
            }
            f += 1
          }
        }
        out
    }

  /** DataFrame form of the redaction pass: rows of
    * (path, payload, segments array) → payload rewritten. `mode` is
    * "mute" or "bleep" (audio.py exposes both as the PII-removal
    * surface for transcribed ranges). */
  def redactSegments(df: DataFrame, mode: String = "mute"): DataFrame = {
    require(Set("mute", "bleep")(mode), s"mode must be mute|bleep, got $mode")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("path"), col("payload"), col("segments"))
      .as[(String, Array[Byte], Seq[SegmentSpec])]
      .map { case (path, bytes, segs) =>
        (path, if (mode == "mute") muteWav(bytes, segs) else bleepWav(bytes, segs))
      }
      .toDF("path", "payload")
  }
}
