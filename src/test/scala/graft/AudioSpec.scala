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

  /** Seeded tone-mixture clip: 3 s at 8 kHz mono 16-bit, four 0.75 s
    * segments of SIXTEEN summed sinusoids each, frequencies log-drawn
    * across the fingerprint's band range — a spectrally DENSE signal
    * whose structure changes over time, so every band carries real
    * energy and the difference-derivative bits are decisions, not
    * tie-break noise (the same density lesson as the image fixture's
    * cosine fields). `scale` only changes amplitude (the invariance
    * planted duplicates exercise). */
  private def toneWav(seed: Long, scale: Double): Array[Byte] = {
    val rate = 8000; val n = 24000
    val rnd = new scala.util.Random(seed)
    // every tone carries its own slow amplitude modulation (1–6 Hz) so
    // band energies move CONTINUOUSLY frame to frame — the
    // difference-derivative bit is a decision at every frame, as in
    // real audio, not only at segment boundaries (a stationary mixture
    // leaves the derivative at quantization-noise ties)
    val segs = Array.fill(4)(Array.fill(16)((
      320.0 * math.pow(7.0, rnd.nextDouble()),
      0.2 + 0.8 * rnd.nextDouble(),
      1.0 + 5.0 * rnd.nextDouble(),
      2 * math.Pi * rnd.nextDouble())))
    val samples = Array.tabulate(n) { i =>
      val t = i.toDouble / rate
      val seg = segs(math.min(3, i / (n / 4)))
      val v = seg.map { case (f, a, fm, ph) =>
        a * (0.55 + 0.45 * math.sin(2 * math.Pi * fm * t + ph)) *
          math.sin(2 * math.Pi * f * t)
      }.sum / 8.0
      (math.max(-1.0, math.min(1.0, v * scale)) * 32767).toShort
    }
    val bb = ByteBuffer.allocate(44 + n * 2).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("acoustic fingerprint: amplitude-invariant, distinct clips far apart, degenerate inputs error-tag") {
    def fp(b: Array[Byte]) = Audio.fingerprint64(b).toOption.get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // amplitude scaling (with its 16-bit requantization) stays within
    // the near-dup radius; distinct seeds land far outside it
    for (seed <- 1L to 5L) {
      val d = ham(fp(toneWav(seed, 0.9)), fp(toneWav(seed, 0.4)))
      assert(d <= 3, s"seed=$seed scaled-dup distance $d (must sit inside the default 4-band radius)")
    }
    for (s1 <- 1L to 4L; s2 <- (s1 + 1) to 5L) {
      val d = ham(fp(toneWav(s1, 0.9)), fp(toneWav(s2, 0.9)))
      assert(d > 12, s"seeds=($s1,$s2) unrelated distance $d")
    }
    // degenerate inputs are tagged, not zero-fingerprinted
    assert(Audio.fingerprint64(Array[Byte](0x49, 0x44, 0x33, 0)).isLeft)
    assert(Audio.fingerprint64(makeWav(8000, 1, 3000)).isLeft) // < 5 frames
  }

  test("audio nearDuplicates recovers planted scaled copies, rejects the rest, drops error rows") {
    import spark.implicits._
    val clips = (1L to 10L).flatMap { s =>
      Seq(s"clip$s.wav" -> toneWav(s, 0.9)) ++
        (if (s % 3 == 0) Seq(s"clip${s}_dup.wav" -> toneWav(s, 0.45)) else Nil)
    } :+ ("broken.mp3" -> Array[Byte](0x49, 0x44, 0x33, 0))
    val pairs = Audio.nearDuplicates(clips.toDF("path", "content"))
      .collect().map(r => Set(r.getString(0), r.getString(1)))
    val expected = Seq(3L, 6L, 9L).map(s => Set(s"clip$s.wav", s"clip${s}_dup.wav"))
    assert(pairs.toSet == expected.toSet, s"pairs: ${pairs.toSeq}")
  }

  test("q144 fixture: every planted half-amplitude duplicate recovered, nothing else") {
    val out = graft.queries.ImageQueries.queries("q144_audio_neardup")(spark, sfDir)
      .collect().map(r => (r.getString(0).drop(4).toLong, r.getString(1).drop(4).toLong))
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter("doc_id % 50 = 49").count()
    assert(out.length.toLong == expected, s"pairs: ${out.length} vs planted $expected")
    assert(out.forall { case (a, b) =>
      (a - b).abs == 1 && a.max(b) % 50 == 49 }, s"non-planted pair in ${out.toSeq}")
  }

  test("nearDuplicatesIncremental: batch probes the fingerprint store; old×old and stale rows excluded") {
    import spark.implicits._
    // store: fingerprints of clips 1-10 plus an old half-amplitude dup
    // of clip 3 (an old×old near pair that must not resurface)
    val storeClips = (1L to 10L).map(s => s"clip$s.wav" -> toneWav(s, 0.9)) :+
      ("clip3_old.wav" -> toneWav(3L, 0.45))
    val store = Audio.acousticFingerprint(storeClips.toDF("path", "content"))
      .filter(col("error").isNull)
      .select(col("path").as("id"), col("afp").as("simhash"))
      .localCheckpoint(true)
    // batch: a rescaled copy of clip 7, one fresh clip, one broken file
    val batch = Seq(
      "new7.wav" -> toneWav(7L, 0.5),
      "fresh.wav" -> toneWav(99L, 0.9),
      "broken.mp3" -> Array[Byte](0x49, 0x44, 0x33, 0)).toDF("path", "content")
    val pairs = Audio.nearDuplicatesIncremental(batch, store)
      .collect().map(r => Set(r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(Set("clip7.wav", "new7.wav")),
      s"expected only the batch-vs-store pair (no clip3 old×old), got $pairs")
  }
}
