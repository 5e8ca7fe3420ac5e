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

  /** Exactly-once streaming sink into a versioned lakehouse table:
    * each micro-batch appends through
    * [[graft.sources.VersionedTable.appendIdempotent]] keyed by
    * `<queryName>-<batchId>` — Structured Streaming replays a batch id
    * after recovery (at-least-once delivery to foreachBatch), and the
    * idempotence token collapses the replay to a no-op, yielding
    * end-to-end exactly-once WITHOUT a Delta/Iceberg jar (the
    * txnAppId/txnVersion contract on the marker-file format). The
    * per-batch transform runs on a plain batch DataFrame, so every
    * batch-layer operator applies unchanged inside the stream. */
  def foreachBatchVersioned(
      stream: DataFrame,
      table: String,
      queryName: String,
      transform: DataFrame => DataFrame = identity): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.VersionedTable.appendIdempotent(
          batch.sparkSession, table, transform(batch.toDF()), s"$queryName-$batchId")
        ()
      }

  /** Exactly-once streaming SCD2 dimension maintenance — the
    * reference's flagship operator under the lakehouse loop: each
    * micro-batch is a CDC SNAPSHOT slice (at most one row per business
    * key, carrying its effective timestamp in `effectiveDateCol` — one
    * scalar date per batch, read with a bounded single-row aggregate)
    * that folds into the versioned dimension via
    * [[graft.medallion.Scd2.mergeIntoVersionedIdempotent]]: the first
    * batch is the initial load, every later batch a merge, each commit
    * keyed by `<queryName>-<batchId>` so foreachBatch's replay-on-
    * recovery collapses to a no-op — end-to-end exactly-once, N
    * micro-batches ≡ the same merges run as batch jobs, bit-identical
    * (StreamingSpec pins it against the q20 fixture). Empty batches
    * commit nothing. */
  def foreachBatchScd2(
      stream: DataFrame,
      table: String,
      queryName: String,
      businessKeys: Seq[String],
      trackedCols: Seq[String],
      effectiveDateCol: String,
      deleteIndicator: Option[String] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val eff = batch.agg(max(col(effectiveDateCol))).head().get(0)
          graft.medallion.Scd2.mergeIntoVersionedIdempotent(
            batch.sparkSession, table, batch.toDF().drop(effectiveDateCol),
            businessKeys, trackedCols,
            lit(eff), s"$queryName-$batchId", deleteIndicator)
        }
        ()
      }

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
        // Merge the open session (an interval) and this batch's events
        // (points) on one sorted-by-start timeline: adjacent items fuse
        // when they sit within the gap — exactly the batch operator's
        // global-sort rule. A late (in-watermark) event that precedes
        // the open session's start therefore WIDENS it only when it is
        // within the gap of the start; an event earlier than
        // start − gap forms its own, separate session (and consecutive
        // such events group together), matching batch output instead of
        // being absorbed.
        val items = state.getOption.toList ++
          evs.toSeq.sortBy(_.ts.getTime).map(e => SessionAcc(e.ts.getTime, e.ts.getTime, 1))
        val merged = items.sortBy(a => (a.start, a.last))
          .foldLeft(List.empty[SessionAcc]) {
            case (cur :: done, nxt) if nxt.start - cur.last <= gapMs =>
              SessionAcc(cur.start, math.max(cur.last, nxt.last), cur.n + nxt.n) :: done
            case (done, nxt) => nxt :: done
          } // head = latest session, tail = earlier ones in reverse
        merged match {
          case latest :: earlier =>
            state.update(latest)
            state.setTimeoutTimestamp(latest.last + gapMs)
            earlier.reverse.iterator.map(a =>
              Session(userId, new Timestamp(a.start), new Timestamp(a.last), a.n))
          case Nil => Iterator.empty
        }
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
