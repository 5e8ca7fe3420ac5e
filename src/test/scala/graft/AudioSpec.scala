package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.multimodal.Audio
import graft.multimodal.Audio.SegmentSpec

/** WAV parsing + redaction (mute/bleep) over synthesized PCM audio. */
class AudioSpec extends SparkSpec {

  /** Minimal PCM WAV: 16-bit, little-endian, constant sample value. */
  private def makeWav(
      rate: Int, channels: Int, frames: Int, sample: Short = 1000): Array[Byte] = {
    val blockAlign = channels * 2
    val dataLen = frames * blockAlign
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until frames * channels).foreach(_ => bb.putShort(sample))
    bb.array()
  }

  private def samplesAt(bytes: Array[Byte], frame: Int, channels: Int): Seq[Short] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    (0 until channels).map(c => bb.getShort(44 + frame * channels * 2 + c * 2))
  }

  test("extractMetadata parses PCM WAV headers; compressed formats error-tag") {
    import spark.implicits._
    val wav = makeWav(rate = 8000, channels = 2, frames = 4000) // 0.5 s stereo
    val binary = Seq(
      ("a/clip.wav", wav),
      ("b/song.mp3", Array[Byte](0x49, 0x44, 0x33, 0, 0, 0, 0, 0))
    ).toDF("path", "content")
    val meta = Audio.extractMetadata(binary).collect().map(r => r.getString(0) -> r).toMap
    val ok = meta("a/clip.wav")
    assert(ok.getAs[Int]("sample_rate") == 8000)
    assert(ok.getAs[Int]("channels") == 2)
    assert(ok.getAs[Int]("bit_depth") == 16)
    assert(ok.getAs[Long]("frames") == 4000)
    assert(math.abs(ok.getAs[Double]("duration_sec") - 0.5) < 1e-9)
    assert(ok.isNullAt(ok.fieldIndex("error")))
    val bad = meta("b/song.mp3")
    assert(!bad.isNullAt(bad.fieldIndex("error")))
    assert(bad.isNullAt(bad.fieldIndex("sample_rate")))
  }

  test("mute zeroes exactly the segment's frames; bleep writes a tone") {
    val wav = makeWav(rate = 1000, channels = 1, frames = 1000, sample = 500)
    // mute 100ms-300ms → frames [100, 300)
    val muted = Audio.muteWav(wav, Seq(SegmentSpec(100, 300)))
    assert(samplesAt(muted, 99, 1).head == 500, "before segment untouched")
    assert(samplesAt(muted, 100, 1).head == 0)
    assert(samplesAt(muted, 299, 1).head == 0)
    assert(samplesAt(muted, 300, 1).head == 500, "after segment untouched")
    // metadata survives the rewrite bit-for-bit
    assert(Audio.parseWav(muted).toOption.get.frames == 1000)

    val bleeped = Audio.bleepWav(wav, Seq(SegmentSpec(100, 300)), freqHz = 250)
    // 250 Hz at 1 kHz sampling: frame 101 sits at sin(π/2) → near peak
    val peak = samplesAt(bleeped, 101, 1).head
    assert(math.abs(peak - (0.6 * Short.MaxValue).toShort) <= 1,
      s"expected near-peak tone, got $peak")
    assert(samplesAt(bleeped, 99, 1).head == 500)
  }

  test("redactSegments rewrites payloads per row under Spark execution") {
    import spark.implicits._
    val wav = makeWav(rate = 1000, channels = 1, frames = 100, sample = 777)
    val df = Seq(
      ("a.wav", wav, Seq(SegmentSpec(0, 50))),
      ("b.wav", wav, Seq.empty[SegmentSpec])
    ).toDF("path", "payload", "segments")
    val out = Audio.redactSegments(df, "mute").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(samplesAt(out("a.wav"), 0, 1).head == 0)
    assert(samplesAt(out("a.wav"), 60, 1).head == 777)
    assert(out("b.wav").toSeq == wav.toSeq, "no segments → payload unchanged")
  }
}
