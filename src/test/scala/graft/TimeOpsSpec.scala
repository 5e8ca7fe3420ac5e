package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TimeOps
import graft.streaming.Streaming
import graft.streaming.Streaming.SessionEvent

/** Batch sessionize / as-of join semantics, including the
  * streaming ≡ batch sessionization equivalence guarantee.
  */
class TimeOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("asofJoin picks the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq((1L, ts(5), "a"), (1L, ts(10), "b"), (2L, ts(5), "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(3), 30.0), (1L, ts(10), 100.0), (1L, ts(12), 120.0))
      .toDF("k", "ts", "price")
    val out = TimeOps.asofJoin(left, right, "k", "ts", Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("a").contains(30.0))   // latest <= 10:05 is 10:03
    assert(out("b").contains(100.0))  // tie at 10:10 matches (>= semantics)
    assert(out("c").isEmpty)          // key 2 has no state
  }

  test("streaming sessionize produces the same sessions as the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      SessionEvent(1L, ts(1)), SessionEvent(1L, ts(3)), SessionEvent(1L, ts(20)),
      SessionEvent(2L, ts(2)), SessionEvent(2L, ts(30)), SessionEvent(2L, ts(33)))
    val gapMs = 5L * 60 * 1000

    val batch = TimeOps.sessionize(
      events.toDF(), keyCol = "user_id", tsCol = "ts", gapMs = gapMs,
      tiebreaker = lit(0))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    val in = MemoryStream[SessionEvent]
    val q = Streaming.sessionize(in.toDS(), gapMs, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sess_eq").outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      // flush: advance the watermark far past every session's timeout
      in.addData(SessionEvent(99L, ts(59)))
      q.processAllAvailable()
      in.addData(SessionEvent(99L, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("sess_eq").filter(col("user_id") =!= 99L)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getInt(3).toLong)).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("rangeJoin: containment inclusive on both ends, grain-boundary safe") {
    import spark.implicits._
    val points = Seq((1L, ts(0), "at-start"), (1L, ts(7), "inside"),
      (1L, ts(10), "at-end"), (1L, ts(11), "outside"), (2L, ts(5), "other-key"))
      .toDF("k", "ts", "tag")
    val intervals = Seq((1L, ts(0), ts(10), "i1")).toDF("k", "s", "e", "name")
    // grain (2 min) much smaller than the interval: exercises multi-grain explode
    val out = TimeOps.rangeJoin(points, intervals, "k", "ts", "s", "e", grainMs = 2 * 60 * 1000)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(out == Set("at-start", "inside", "at-end"))
  }

  test("TIMESTAMP_NTZ events: sessionize/rangeJoin/rollingMetrics match the TIMESTAMP results") {
    // Parquet timestamp[us] written without isAdjustedToUTC reads back
    // as TIMESTAMP_NTZ — the library must accept both encodings (the
    // driver controls the parquet writer). Round 9 went red on exactly
    // this: unix_micros() rejects NTZ. epochMicros() must not.
    import spark.implicits._
    val tz = Seq((1L, ts(1), 1L), (1L, ts(3), 2L), (1L, ts(20), 3L),
      (2L, ts(2), 4L), (2L, ts(30), 5L), (2L, ts(33), 6L))
      .toDF("user_id", "ts", "event_id")
    val ntz = tz.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampNTZType))
    assert(ntz.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val gapMs = 5L * 60 * 1000

    def sess(df: org.apache.spark.sql.DataFrame) =
      TimeOps.sessionize(df, "user_id", "ts", gapMs, col("event_id"))
        // NTZ collects as LocalDateTime, TZ as Timestamp — compare epochs
        .select(col("user_id"), TimeOps.epochMicros(col("session_start")),
          TimeOps.epochMicros(col("session_end")), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sess(ntz) == sess(tz))

    def roll(df: org.apache.spark.sql.DataFrame) =
      graft.medallion.Gold.rollingMetrics(df, "user_id", "ts", 10L * 60 * 1000,
        Seq((count(lit(1)), "n_10m")))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(roll(ntz) == roll(tz))

    def rng(points: org.apache.spark.sql.DataFrame, ivals: org.apache.spark.sql.DataFrame) =
      TimeOps.rangeJoin(points, ivals, "user_id", "ts", "s", "e", grainMs = 2 * 60 * 1000)
        .select("event_id").collect().map(_.getLong(0)).toSet
    val ivalsTz = Seq((1L, ts(0), ts(10), "i1")).toDF("user_id", "s", "e", "name")
    val ivalsNtz = ivalsTz
      .withColumn("s", col("s").cast(org.apache.spark.sql.types.TimestampNTZType))
      .withColumn("e", col("e").cast(org.apache.spark.sql.types.TimestampNTZType))
    assert(rng(ntz, ivalsNtz) == rng(tz, ivalsTz))
  }

  test("sessionize boundary: event exactly at the gap joins the session") {
    import spark.implicits._
    val df = Seq((1L, ts(0), 1L), (1L, ts(5), 2L), (1L, ts(11), 3L))
      .toDF("user_id", "ts", "event_id")
    // gap = 5 min: 10:00->10:05 joins (== gap, not >), 10:05->10:11 breaks
    val out = TimeOps.sessionize(df, "user_id", "ts", 5L * 60 * 1000, col("event_id"))
      .orderBy("session_start").collect().map(_.getLong(3))
    assert(out.toSeq == Seq(2L, 1L))
  }
}
