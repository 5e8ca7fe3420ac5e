package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.functions._

import graft.multimodal.Video

/** ISO-BMFF container parsing + frame-sample plan. The fixture MP4 is
  * built in-test from the box grammar (ISO 14496-12), the same
  * byte-level fixture discipline as the WAV/OOXML/PDF specs. */
class VideoSpec extends SparkSpec {

  import spark.implicits._

  // ---- fixture: a minimal but structurally-correct MP4 ----

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  private def fullBox(tpe: String, version: Int, payload: Array[Byte]): Array[Byte] =
    box(tpe, Array[Byte](version.toByte, 0, 0, 0) ++ payload)

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v.toInt).array()

  /** mvhd v0: creation, modification, timescale, duration (+ the rate/
    * volume/matrix tail the parser skips). */
  private def mvhd(timescale: Long, duration: Long): Array[Byte] =
    fullBox("mvhd", 0,
      u32(0) ++ u32(0) ++ u32(timescale) ++ u32(duration) ++ Array.fill[Byte](80)(0))

  /** tkhd v0: track id at +12, width/height 16.16 at +76/+80. */
  private def tkhd(trackId: Long, w: Int, h: Int): Array[Byte] =
    fullBox("tkhd", 0,
      u32(0) ++ u32(0) ++ u32(trackId) ++ u32(0) ++ u32(0) ++
        Array.fill[Byte](52)(0) ++ u32(w.toLong << 16) ++ u32(h.toLong << 16))

  private def hdlr(handler: String): Array[Byte] =
    fullBox("hdlr", 0, u32(0) ++ handler.getBytes("US-ASCII") ++ Array.fill[Byte](12)(0))

  private def trak(trackId: Long, handler: String, w: Int, h: Int): Array[Byte] =
    box("trak", tkhd(trackId, w, h) ++ box("mdia", hdlr(handler)))

  /** 10 s @ timescale 600, one 640x360 video track + one audio track. */
  private def sampleMp4: Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512) ++ "isomiso2".getBytes("US-ASCII")) ++
      box("moov", mvhd(600, 6000) ++ trak(1, "vide", 640, 360) ++ trak(2, "soun", 0, 0)) ++
      box("mdat", Array.fill[Byte](32)(7))

  test("valid box headers with a truncated mvhd payload error-tag, not throw") {
    // the mvhd box claims only its 4 version/flags payload bytes, so the
    // timescale read at payload+12 dereferences past EOF — the contract
    // is Left(reason), never an exception out of the executor map
    val shortMvhd = box("mvhd", Array[Byte](0, 0, 0, 0))
    val bytes = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512)) ++ box("moov", shortMvhd)
    assert(Video.parseMp4(bytes).isLeft)
    val rows = Video.extractMetadata(Seq(("t.mp4", bytes)).toDF("path", "content")).collect()
    assert(rows(0).getAs[String]("error") != null)
    // a trak whose tkhd payload stops short of the 16.16 geometry tail
    val shortTrak = box("trak", fullBox("tkhd", 0, u32(0) ++ u32(0) ++ u32(1)))
    val bytes2 = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512)) ++
      box("moov", mvhd(600, 6000) ++ shortTrak)
    assert(Video.parseMp4(bytes2).isLeft)
  }

  test("parseMp4 reads brand, duration, and per-track handler/geometry from the box grammar") {
    val m = Video.parseMp4(sampleMp4).toOption.get
    assert(m.majorBrand == "isom")
    assert(m.timescale == 600 && m.duration == 6000)
    assert(m.durationSec == 10.0)
    assert(m.tracks == Seq(
      Video.TrackInfo(1, "vide", 640.0, 360.0),
      Video.TrackInfo(2, "soun", 0.0, 0.0)))
    assert(m.videoTracks.map(_.trackId) == Seq(1L))
  }

  test("non-MP4 payloads error-tag instead of crashing or disappearing") {
    assert(Video.parseMp4("definitely not a video file".getBytes).swap.toOption.get.contains("ftyp"))
    assert(Video.parseMp4(Array[Byte](1, 2)).isLeft)
    // a truncated moov (size past EOF) parses no moov rather than throwing
    val truncated = sampleMp4.take(sampleMp4.length - 60)
    assert(Video.parseMp4(truncated).isLeft)

    val df = Seq(
      ("a.mp4", sampleMp4),
      ("b.bin", "garbage".getBytes)).toDF("path", "content")
    val rows = Video.extractMetadata(df).orderBy("path").collect()
    assert(rows(0).getAs[String]("error") == null)
    assert(rows(0).getAs[Double]("duration_sec") == 10.0)
    assert(rows(0).getAs[Double]("width") == 640.0)
    assert(rows(1).getAs[String]("error") != null)
    assert(rows(1).getAs[Any]("duration_sec") == null)
  }

  test("frameSamplePlan generates mid-interval timestamps as a narrow explode, skipping error rows") {
    val meta = Video.extractMetadata(Seq(
      ("a.mp4", sampleMp4), ("bad.bin", "x".getBytes)).toDF("path", "content"))
    val plan = Video.frameSamplePlan(meta, n = 4)
    val rows = plan.select("path", "sample_idx", "ts_ms").orderBy("sample_idx").collect()
    // 10 s, 4 samples → mid-interval at 1.25/3.75/6.25/8.75 s
    assert(rows.map(_.getLong(2)).toSeq == Seq(1250L, 3750L, 6250L, 8750L))
    assert(rows.forall(_.getString(0) == "a.mp4")) // error row yields no samples
    // narrow plan: no shuffle anywhere in the sampling fan-out
    assert(!plan.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("decodeFrameStub is deterministic per (payload, ts) and schema-stable") {
    val df = Seq(("a", Array[Byte](1, 2, 3)), ("b", Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
      .withColumn("ts_ms", lit(1250L))
      .withColumn("frame", Video.decodeFrameStub(col("payload"), col("ts_ms")))
    val frames = df.select("frame.frame_hash", "frame.format").collect()
    assert(frames(0).getString(0) == frames(1).getString(0)) // same bytes+ts → same hash
    assert(frames(0).getString(1) == "stub")
    val other = df.withColumn("frame2",
      Video.decodeFrameStub(col("payload"), lit(3750L)))
      .select(col("frame.frame_hash") === col("frame2.frame_hash")).head.getBoolean(0)
    assert(!other) // different ts → different frame
  }

  // ---- frame signatures + near-dup (the video dedup member) ----

  test("frameSignatures emits n hash rows per valid clip, one error row per bad payload") {
    val df = Seq(("a.mp4", sampleMp4), ("bad.bin", "garbage".getBytes))
      .toDF("path", "content")
    val rows = Video.frameSignatures(df, n = 4).orderBy("path", "sample_idx").collect()
    assert(rows.length == 5)
    val good = rows.filter(_.getString(0) == "a.mp4")
    assert(good.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(good.forall(_.getAs[String]("error") == null))
    // stub seam: equal payloads hash equal per timestamp, distinct across
    assert(good.map(_.getLong(2)).distinct.length == 4)
    val bad = rows.filter(_.getString(0) == "bad.bin")
    assert(bad.length == 1 && bad(0).getInt(1) == -1 && bad(0).getAs[String]("error") != null)
  }

  test("nearDuplicates (stub seam): exact-duplicate payloads match at every frame, distance 0") {
    val df = Seq(
      ("a.mp4", sampleMp4),
      ("a_copy.mp4", sampleMp4),
      ("other.mp4", sampleMp4 ++ box("free", Array[Byte](9)))) // different bytes
      .toDF("path", "content")
    val pairs = Video.nearDuplicates(df, nFrames = 4).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getString(0) == "a.mp4" && pairs(0).getString(1) == "a_copy.mp4")
    assert(pairs(0).getLong(2) == 4 && pairs(0).getDouble(3) == 0.0)
  }

  test("q145 decoder seam: rescaled+re-encoded duplicate clips recovered, unrelated and time-offset clips rejected") {
    import graft.queries.ImageQueries.{syntheticMp4, videoFrameDecoder}
    // a: 32px png scenes from seed 7; aDup: the SAME scene sequence at
    // 48px jpeg — the planted q145 transformation. bOffset: seed 7 +
    // 1000003, i.e. a's scene k+1 at index k — three of four scene
    // IMAGES shared with a, but none at an aligned index. c: unrelated.
    val df = Seq(
      ("a", syntheticMp4(7L, 32, jpeg = false)),
      ("aDup", syntheticMp4(7L, 48, jpeg = true)),
      ("bOffset", syntheticMp4(7L + 1000003L, 32, jpeg = false)),
      ("c", syntheticMp4(999L, 32, jpeg = false)))
      .toDF("path", "content")
    val pairs = Video.nearDuplicates(df, nFrames = 4, maxDist = 3,
      minMatchFrac = 0.75, frameHash = videoFrameDecoder _)
      .collect()
    assert(pairs.length == 1, s"expected only the planted pair, got ${pairs.toSeq}")
    assert(pairs(0).getString(0) == "a" && pairs(0).getString(1) == "aDup")
    assert(pairs(0).getLong(2) >= 3) // ≥ ceil(0.75·4) aligned frames within 7 bits
  }

  test("nearDuplicatesBySignatures verifies Hamming exactly: a one-frame match does not pair at minMatchFrac 0.75") {
    // clips sharing exactly one aligned frame hash: below the 3-of-4 gate
    val sigs = Seq(
      ("x", 0, 0x1234L, null: String), ("x", 1, 0xAAAAL, null: String),
      ("x", 2, 0xBBBBL, null: String), ("x", 3, 0xCCCCL, null: String),
      ("y", 0, 0x1234L, null: String), ("y", 1, 0x5555L, null: String),
      ("y", 2, 0x6666L, null: String), ("y", 3, 0x7777L, null: String))
      .toDF("path", "sample_idx", "frame_hash", "error")
    assert(Video.nearDuplicatesBySignatures(sigs, nFrames = 4).count() == 0)
    // at minMatchFrac 0.25 the same one-frame overlap DOES pair
    val loose = Video.nearDuplicatesBySignatures(sigs, nFrames = 4, minMatchFrac = 0.25).collect()
    assert(loose.length == 1 && loose(0).getLong(2) == 1)
  }

  test("band width is the radius dial: d=5 frames pair at 8x8-bit bands, not at the default 4x16") {
    // every frame of y is x's frame with 5 bits flipped (distance 5):
    // beyond the default d<=3 exactness radius, inside bands=8/d<=7
    val flip5 = (h: Long) => h ^ 0x1F00L
    val base = Seq(0x0123456789ABCDEFL, 0x0F0F0F0F0F0F0F0FL, 0x00FF00FF00FF00FFL, 0x7777777777777777L)
    val sigs = (base.zipWithIndex.map { case (h, i) => ("x", i, h, null: String) } ++
      base.zipWithIndex.map { case (h, i) => ("y", i, flip5(h), null: String) })
      .toDF("path", "sample_idx", "frame_hash", "error")
    assert(Video.nearDuplicatesBySignatures(sigs, nFrames = 4).count() == 0)
    val wide = Video.nearDuplicatesBySignatures(sigs, nFrames = 4,
      maxDist = 7, bands = 8).collect()
    assert(wide.length == 1 && wide(0).getLong(2) == 4 && wide(0).getDouble(3) == 5.0)
  }

  test("nearDuplicatesIncremental: batch probes the frame store; re-crawled id's new frames win, old×old excluded") {
    import graft.queries.ImageQueries.{syntheticMp4, videoFrameDecoder}
    // store: frame signatures of clips a/b/c plus aOld — an old
    // rescaled dup of a (old×old, must never resurface)
    val store = Video.frameSignatures(Seq(
      ("a", syntheticMp4(7L, 32, jpeg = false)),
      ("aOld", syntheticMp4(7L, 48, jpeg = true)),
      ("b", syntheticMp4(50L, 32, jpeg = false)),
      ("c", syntheticMp4(60L, 32, jpeg = false)))
      .toDF("path", "content"), n = 4, videoFrameDecoder _)
      .localCheckpoint(true)
    // batch: clip b RE-CRAWLED with entirely new scenes (its stale
    // store frames must not pair), plus a jpeg re-render of c
    val batch = Seq(
      ("b", syntheticMp4(1234L, 32, jpeg = false)),
      ("cDup", syntheticMp4(60L, 48, jpeg = true)))
      .toDF("path", "content")
    val pairs = Video.nearDuplicatesIncremental(batch, store, nFrames = 4,
      frameHash = videoFrameDecoder _)
      .collect().map(r => Set(r.getString(0), r.getString(1))).toSet
    // NOT present: (a, aOld) old×old, and any pair with b — its stale
    // frames are gone and its new scenes match nothing
    assert(pairs == Set(Set("c", "cDup")),
      s"expected only the batch-vs-store pair, got $pairs")
  }
}
