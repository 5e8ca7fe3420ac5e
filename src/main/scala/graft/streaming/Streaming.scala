package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.medallion.Gold

/** Structured Streaming operators (ref connectors/streaming/kafka.py,
  * kinesis.py, pubsub.py — the reference consumes micro-batches
  * imperatively; here the same semantics are declarative streaming
  * plans that share the batch layer's column logic).
  *
  * All three operators are watermark-bounded: state is dropped once
  * event time passes the watermark, so memory is proportional to the
  * in-flight window/session population, not the stream's history —
  * the property that keeps them alive on an unbounded 100 TB/day feed.
  */
object Streaming {

  /** Windowed aggregation with a watermark. Reuses [[Gold.AggSpec]] so
    * batch and streaming compute identical aggregate expressions
    * (append mode: a window emits once, when the watermark passes its
    * end). */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      dimensions: Seq[String],
      aggs: Seq[Gold.AggSpec]): DataFrame = {
    require(aggs.nonEmpty, "windowedAgg needs at least one AggSpec")
    val exprs = aggs.map(_.expr)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: dimensions.map(col)): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  /** Streaming dedup bounded by the watermark: duplicate keys arriving
    * within the watermark horizon are dropped; key state is evicted
    * after it (silver.py:200's keep-first semantics, streaming form). */
  def dedupWithinWatermark(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionAcc(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int)

  /** Gap-based sessionization via `flatMapGroupsWithState` with event-
    * time timeout: a session closes `gap` after its last event (emitted
    * on timeout once the watermark passes), or immediately when a
    * same-user event arrives beyond the gap. State per user is O(1).
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMs: Long,
      watermarkDelay: String): Dataset[Session] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, evs: Iterator[SessionEvent],
        state: GroupState[SessionAcc]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val a = state.get
        state.remove()
        Iterator(Session(userId, new Timestamp(a.start), new Timestamp(a.last), a.n))
      } else {
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        val closed = Seq.newBuilder[Session]
        var acc = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          acc match {
            case Some(a) if t - a.last <= gapMs =>
              // A late (in-watermark) event can precede the session's
              // start — widen both edges so streaming matches the batch
              // operator's global-sort result.
              acc = Some(SessionAcc(math.min(a.start, t), math.max(a.last, t), a.n + 1))
            case Some(a) =>
              closed += Session(userId, new Timestamp(a.start), new Timestamp(a.last), a.n)
              acc = Some(SessionAcc(t, t, 1))
            case None =>
              acc = Some(SessionAcc(t, t, 1))
          }
        }
        acc.foreach { a =>
          state.update(a)
          state.setTimeoutTimestamp(a.last + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
