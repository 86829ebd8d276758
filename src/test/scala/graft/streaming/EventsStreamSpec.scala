package graft.streaming

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming/batch parity and stateful-session checks. */
class EventsStreamSpec extends SparkSpec {

  test("streaming hourly agg matches the batch q13 frame") {
    // the file source tails a directory — stage the parquet into one
    val landing = java.nio.file.Files.createTempDirectory("events_landing")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("events.parquet"))
    EventsStream.runHourlyToMemory(spark, landing.toString, "hourly_stream")
    val streamed = spark.table("hourly_stream")
      .select("hour", "event_type", "n_events", "sum_milli")
    val batch = SparkEntry.queries("q13_hourly_events")(spark, sfDir)
      .select("hour", "event_type", "n_events", "sum_milli")
    assert(streamed.count() > 0)
    // every emitted window must match the batch result exactly
    assert(streamed.exceptAll(batch).count() == 0)
    // append mode finalizes a window only once the watermark passes it, so
    // the missing windows must all sit within 1h+1h (watermark + window) of
    // the max event time — nothing else may be missing
    val maxTs = graft.Tables.events(spark, sfDir)
      .agg(max("ts")).head.getTimestamp(0).getTime
    val missing = batch.exceptAll(streamed).collect()
    assert(missing.nonEmpty, "final open windows are not yet finalized")
    missing.foreach { r =>
      val hour = r.getTimestamp(0).getTime
      assert(maxTs - hour < 2 * 3600 * 1000L,
        s"window $r should have been finalized")
    }
  }

  test("streaming dedup drops re-deliveries; state released past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventsStream.EventRow]
    val query = EventsStream.dedupe(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()

    val base = 1700000000000L
    def ev(id: Long, minute: Long) = EventsStream.EventRow(
      id, new Timestamp(base + minute * 60000L), 1L, "click", 1.0)

    // batch 1: two distinct events + an in-batch duplicate
    input.addData(ev(1, 0), ev(2, 1), ev(1, 0))
    query.processAllAvailable()
    assert(spark.table("dedup_stream").count() == 2)

    // batch 2: cross-batch re-delivery of id 1 (still within watermark)
    input.addData(ev(1, 0), ev(3, 2))
    query.processAllAvailable()
    assert(spark.table("dedup_stream").count() == 3)
    assert(spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    query.stop()
  }

  test("sessionization closes sessions on gaps across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventsStream.EventRow]
    val query = EventsStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()

    // keep timestamps well past epoch: the initial watermark is 0 and
    // rows at/below it would be treated as late
    val base = 1700000000000L
    def ev(id: Long, user: Long, minute: Long) = EventsStream.EventRow(
      id, new Timestamp(base + minute * 60000L), user, "click", 1.0)

    // batch 1: user 1 has two events 5 min apart (one open session)
    input.addData(ev(1, 1, 0), ev(2, 1, 5))
    query.processAllAvailable()
    assert(spark.table("sessions_stream").count() == 0, "session still open")

    // batch 2: 90-min gap => first session closes, new one opens
    input.addData(ev(3, 1, 95))
    query.processAllAvailable()
    val closed = spark.table("sessions_stream").as[EventsStream.SessionOut].collect()
    assert(closed.length == 1)
    assert(closed.head.n_events == 2 && closed.head.session_seq == 1)
    assert(!closed.head.closed_by_timeout)

    // batch 3: advance the watermark far past last+gap => timeout fires
    input.addData(ev(4, 2, 500))
    query.processAllAvailable()
    input.addData(ev(5, 2, 501))
    query.processAllAvailable()
    val all = spark.table("sessions_stream").as[EventsStream.SessionOut].collect()
    assert(all.exists(s => s.user_id == 1 && s.session_seq == 2 && s.closed_by_timeout),
      s"expected user 1 session 2 closed by timeout, got ${all.mkString(", ")}")
    query.stop()
  }

  test("restoring a v1 session state fails with the engine's message, not a decode trace") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val v1 = EventsStream.SessionState(1, 1L, 0L, 60000000L, 3L)
    val restored = TestGroupState.create[EventsStream.SessionState](
      org.apache.spark.api.java.Optional.of(v1), GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(0L), hasTimedOut = false)
    val arrival = EventsStream.EventRow(
      9L, new java.sql.Timestamp(120000L), 1L, "click", 1.0)
    val e = intercept[IllegalStateException] {
      EventsStream.sessionStep(1L, Iterator(arrival), restored)
    }
    assert(e.getMessage.contains("schema v1"), e.getMessage)
    assert(e.getMessage.contains("new checkpoint directory"), e.getMessage)

    // a current-version state restores and extends the open session
    val ok = TestGroupState.create[EventsStream.SessionState](
      org.apache.spark.api.java.Optional.of(EventsStream.SessionState(
        EventsStream.StateVersion, 1L, 0L, 60000000L, 3L)),
      GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(0L), hasTimedOut = false)
    val out = EventsStream.sessionStep(1L, Iterator(arrival), ok).toSeq
    assert(out.isEmpty) // within the gap: session extends, nothing closes
    assert(ok.get == EventsStream.SessionState(
      EventsStream.StateVersion, 1L, 0L, 120000000L, 4L))
  }
}
