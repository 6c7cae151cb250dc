package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.model.CdcSchema

/** Per-url edit-session detection as custom streaming state
  * (`flatMapGroupsWithState` + event-time timeout).
  *
  * A "session" is a run of change events for one url with no gap larger
  * than `gapMs` in event time — the streaming analog of the reference's
  * burst detection (/root/reference/convoetl/queries.py:122–153, hourly
  * counts vs avg+2σ) and response-dynamics windows (queries.py:347–358),
  * which the reference recomputes from scratch over the whole table per
  * run. Here the state is per-key, incremental, and evicted by the
  * watermark: a session closes (and is emitted exactly once, in append
  * mode) when the event-time watermark passes its end + gap.
  *
  * Scale posture: state size is O(open sessions) = O(urls active inside
  * the watermark horizon), not O(table); keys are hash-partitioned by
  * url across executors — the same key layout as the merge path.
  */
object Sessionize {

  /** Carries the watermarked event-time column itself (`warc_ts`) — the
    * event-time tag must survive to the stateful operator or Spark
    * rejects EventTimeTimeout.
    */
  final case class UrlEvent(url: String, warc_ts: Timestamp, seq: Long, op: String) {
    def tsMs: Long = warc_ts.getTime
  }

  /** Open-session state kept per url between micro-batches. */
  final case class SessionState(
      startMs: Long, endMs: Long, events: Long, deletes: Long,
      minSeq: Long, maxSeq: Long)

  /** A closed session (the emitted record). */
  final case class UrlSession(
      url: String, session_start: Timestamp, session_end: Timestamp,
      events: Long, deletes: Long, min_seq: Long, max_seq: Long)

  /** Fold a sorted run of events into (closed sessions, open tail). */
  private def fold(st0: Option[SessionState], evs: Seq[UrlEvent],
                   gapMs: Long): (Seq[SessionState], Option[SessionState]) = {
    var closed = List.empty[SessionState]
    var open = st0
    evs.foreach { e =>
      open = open match {
        case Some(s) if e.tsMs - s.endMs <= gapMs =>
          Some(SessionState(math.min(s.startMs, e.tsMs),
            math.max(s.endMs, e.tsMs), s.events + 1,
            s.deletes + (if (e.op == "D") 1 else 0),
            math.min(s.minSeq, e.seq), math.max(s.maxSeq, e.seq)))
        case Some(s) =>
          closed ::= s
          Some(SessionState(e.tsMs, e.tsMs, 1,
            if (e.op == "D") 1 else 0, e.seq, e.seq))
        case None =>
          Some(SessionState(e.tsMs, e.tsMs, 1,
            if (e.op == "D") 1 else 0, e.seq, e.seq))
      }
    }
    (closed.reverse, open)
  }

  private def toSession(url: String, s: SessionState): UrlSession =
    UrlSession(url, new Timestamp(s.startMs), new Timestamp(s.endMs),
      s.events, s.deletes, s.minSeq, s.maxSeq)

  /** The per-group state function. Emits sessions closed either by a
    * larger-than-gap gap inside the arriving data or by the event-time
    * timeout (watermark passed end + gap with no new data).
    */
  def stateFn(gapMs: Long)(url: String, rows: Iterator[UrlEvent],
                           state: GroupState[SessionState]): Iterator[UrlSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(url, _)).iterator
      state.remove()
      out
    } else {
      val evs = rows.toSeq.sortBy(e => (e.tsMs, e.seq))
      val (closed, open) = fold(state.getOption, evs, gapMs)
      open match {
        case Some(s) =>
          state.update(s)
          // close when the watermark passes session end + gap
          state.setTimeoutTimestamp(s.endMs + gapMs)
        case None => state.remove()
      }
      closed.map(toSession(url, _)).iterator
    }
  }

  /** Build the streaming Dataset of closed sessions from a feed stream.
    * `lateness` must be ≥ the expected disorder; the watermark both
    * drops too-late events and drives session-closing timeouts.
    */
  def sessions(feed: DataFrame, gapMs: Long, lateness: String): Dataset[UrlSession] = {
    val spark = feed.sparkSession
    import spark.implicits._
    feed
      .withWatermark("warc_ts", lateness)
      .select(col("url"), col("warc_ts"), col("seq"), col("op"))
      .as[UrlEvent]
      .groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn(gapMs))
  }

  /** Tail the WAL, append closed sessions to `outDir` as parquet. */
  def start(spark: SparkSession, feedDir: String, outDir: String,
            checkpointDir: String, gapMs: Long = 15 * 60 * 1000L,
            lateness: String = "10 minutes",
            maxFilesPerTrigger: Option[Int] = None,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    var reader = spark.readStream.schema(CdcSchema.latest)
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val feed = reader.parquet(s"$feedDir/wal")
    sessions(feed, gapMs, lateness).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  def runAvailableNow(spark: SparkSession, feedDir: String, outDir: String,
                      checkpointDir: String, gapMs: Long = 15 * 60 * 1000L,
                      lateness: String = "10 minutes",
                      maxFilesPerTrigger: Option[Int] = None): Unit =
    start(spark, feedDir, outDir, checkpointDir, gapMs, lateness,
      maxFilesPerTrigger).awaitTermination()
}
