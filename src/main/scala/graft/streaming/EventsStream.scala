package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingest of the `events` table (SURVEY.md §2.9 — the
  * reference is pure batch; this is the engine's streaming generalization
  * of its incremental-append + delayed-fetch patterns). The transforms are
  * the streaming twins of batch queries q13 (hourly windows) and q15
  * (sessionization), so batch/stream parity is testable.
  *
  * Scale shape: the windowed agg shuffles on (window, event_type) with
  * partial aggregation and watermark-bounded state; sessionization state
  * is one small record per active user key, dropped via event-time
  * timeout.
  *
  * STATE-SCHEMA COMPATIBILITY: [[SessionState]] carries an in-band schema
  * version ([[StateVersion]]), checked on every restore (the DedupStream
  * contract). The v1→v2 field addition itself changes the physical
  * layout, which Spark's own state-schema validation rejects at restart
  * (its error, before the operator runs); the in-band marker guards the
  * cases Spark cannot see — SAME-LAYOUT semantic changes from v2 onward,
  * which now fail with an engine error naming this operator and the fix
  * (new checkpoint directory) instead of resuming silently wrong. Bump
  * [[StateVersion]] with any semantic change to the state.
  */
object EventsStream {

  final case class EventRow(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** v1 = pre-round-13 unversioned 4-field state; v2 = this envelope. */
  final val StateVersion = 2

  final case class SessionState(
      version: Int, sessionSeq: Long, startUs: Long, lastUs: Long,
      nEvents: Long)

  final case class SessionOut(
      user_id: Long, session_seq: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp, closed_by_timeout: Boolean)

  val GapUs: Long = 1800L * 1000000L // 30 min, same gap as batch q15

  /** File-source streaming read over a landing DIRECTORY of events parquet
    * files (the file source tails a directory; new files become
    * micro-batches). `ts` is normalized exactly as in graft.Tables.events
    * (ns-long → µs truncation; NTZ → timestamp cast), so the stream and
    * its batch twin see identical frames regardless of how the landing
    * files were written. */
  def readEvents(spark: SparkSession, landingDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(landingDir).schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(landingDir))
  }

  /** Hourly tumbling-window aggregation with a 1-hour watermark — the
    * streaming twin of batch q13 (same grouping, same exact integer sum). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_milli"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_milli"))

  /** Gap-based sessionization over a stream: state per user carries the
    * open session; a > 30 min gap closes it (emitting the closed session),
    * and an event-time timeout at watermark + gap closes idle sessions.
    * Emissions are append-mode — each session is output exactly once. */
  def sessionize(events: Dataset[EventRow]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionStep _)
  }

  /** The per-user state transition (package-visible so the version-gate
    * restore path is testable against a stubbed GroupState). */
  private[streaming] def sessionStep(userId: Long, rows: Iterator[EventRow],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    state.getOption.foreach { s =>
      if (s.version != StateVersion) throw new IllegalStateException(
        s"EventsStream session state carries schema v${s.version}, but " +
          s"this engine writes v$StateVersion: the checkpoint was written " +
          "by an incompatible version of the operator and cannot be " +
          "resumed. Start a new checkpoint directory (stateful schema " +
          "evolution contract — see EventsStream scaladoc).")
    }
    // emit at full µs too: new Timestamp(ms) would floor away the
    // sub-millisecond part the gap arithmetic just started honoring.
    // floorDiv/floorMod so pre-epoch times produce the (second, +nanos)
    // pair Timestamp requires — `us % 1000000` would hand setNanos a
    // negative value and crash the query on the first pre-1970 session
    def usTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
      t
    }
    def toOut(s: SessionState, timedOut: Boolean) = SessionOut(
      userId, s.sessionSeq, s.nEvents,
      usTs(s.startUs), usTs(s.lastUs), timedOut)

    if (state.hasTimedOut) {
      val out = state.getOption.map(toOut(_, timedOut = true)).toIterator
      state.remove()
      out
    } else {
      // full-µs event times (AsOfStream.tsUs): getTime drops the
      // sub-millisecond part, which would make µs-resolution gap
      // comparisons diverge from the batch q15 (TimestampType micros)
      val sorted = rows.toVector.sortBy(e => (AsOfStream.tsUs(e.ts), e.event_id))
      var cur = state.getOption
      val closed = Vector.newBuilder[SessionOut]
      sorted.foreach { e =>
        val us = AsOfStream.tsUs(e.ts)
        cur match {
          case Some(s) if us - s.lastUs <= GapUs =>
            cur = Some(s.copy(lastUs = us, nEvents = s.nEvents + 1))
          case Some(s) =>
            closed += toOut(s, timedOut = false)
            cur = Some(SessionState(StateVersion, s.sessionSeq + 1, us, us, 1))
          case None =>
            cur = Some(SessionState(StateVersion, 1, us, us, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close the session once the event-time watermark passes last+gap
        state.setTimeoutTimestamp((s.lastUs + GapUs) / 1000)
      }
      closed.result().iterator
    }
  }

  /** Streaming exact dedup — the streaming twin of the batch hash-groupBy
    * exact dedup (q08): re-deliveries of an already-seen key are dropped,
    * with state bounded by the watermark (an id's dedup state is released
    * once the watermark passes its event time, so an at-least-once source
    * can run forever without state growth — the property a raw
    * dropDuplicates lacks). */
  def dedupe(events: DataFrame, keyCols: Seq[String] = Seq("event_id"),
      lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Run the hourly aggregation over all currently-available files into an
    * in-memory table (Trigger.AvailableNow) and block until done. */
  def runHourlyToMemory(spark: SparkSession, landingDir: String, tableName: String): Unit = {
    val q = hourlyAgg(readEvents(spark, landingDir))
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
