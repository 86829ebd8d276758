package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming as-of: batch parity, micro-batch slicing invariance, and
  * watermark-gated emission. */
class AsOfStreamSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  // probes: (event_id, key, minute); versions: (key, minute, version_id)
  private val probes = Seq(
    (1L, 10L, 10L), (2L, 10L, 25L), (3L, 10L, 40L),
    (4L, 20L, 15L), (5L, 20L, 16L), (6L, 30L, 50L))
  private val versions = Seq(
    (10L, 5L, 100L), (10L, 25L, 101L), (10L, 30L, 102L),
    (20L, 15L, 200L), (20L, 15L, 201L), // same-time tie -> max id wins
    (40L, 1L, 400L)) // key with no probes

  /** expected as-of over the full data (key, probe minute ≥ version
    * minute, ties to max version_id). */
  private val expected: Map[Long, Option[Long]] = probes.map {
    case (id, k, t) =>
      val m = versions.filter(v => v._1 == k && v._2 <= t)
      id -> (if (m.isEmpty) None else Some(m.maxBy(v => (v._2, v._3))._3))
  }.toMap

  private def run(name: String,
      probeBatches: Seq[Seq[(Long, Long, Long)]],
      versionBatches: Seq[Seq[(Long, Long, Long)]]): Map[Long, Option[Long]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[AsOfStream.Probe]
    val vIn = MemoryStream[AsOfStream.Version]
    val q = AsOfStream.enrich(pIn.toDS(), vIn.toDS(), lateness = "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val n = math.max(probeBatches.size, versionBatches.size)
    (0 until n).foreach { i =>
      probeBatches.lift(i).foreach(b =>
        pIn.addData(b.map { case (id, k, t) => AsOfStream.Probe(id, k, ts(t)) }))
      versionBatches.lift(i).foreach(b =>
        vIn.addData(b.map { case (k, t, v) => AsOfStream.Version(k, ts(t), v) }))
      q.processAllAvailable()
    }
    // two far-future sentinels: the first advances the watermark past every
    // probe, the second runs one more trigger so event-time timeouts fire
    (1 to 2).foreach { i =>
      vIn.addData(AsOfStream.Version(-999L, ts(100000L + i), -1L))
      q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    rows
  }

  private val TolMin = 10L // forward tolerance: 10 minutes

  /** forward brute force: first version in [t, t + TolMin], ties to the
    * smallest version_id — the batch q118 rule under q119's tolerance. */
  private val expectedFwd: Map[Long, Option[Long]] = probes.map {
    case (id, k, t) =>
      val m = versions.filter(v => v._1 == k && v._2 >= t && v._2 - t <= TolMin)
      id -> (if (m.isEmpty) None else Some(m.minBy(v => (v._2, v._3))._3))
  }.toMap

  private def runFwd(name: String,
      probeBatches: Seq[Seq[(Long, Long, Long)]],
      versionBatches: Seq[Seq[(Long, Long, Long)]]): Map[Long, Option[Long]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[AsOfStream.Probe]
    val vIn = MemoryStream[AsOfStream.Version]
    val q = AsOfStream.enrichForward(pIn.toDS(), vIn.toDS(),
        toleranceUs = TolMin * 60000000L, lateness = "10 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val n = math.max(probeBatches.size, versionBatches.size)
    (0 until n).foreach { i =>
      probeBatches.lift(i).foreach(b =>
        pIn.addData(b.map { case (id, k, t) => AsOfStream.Probe(id, k, ts(t)) }))
      versionBatches.lift(i).foreach(b =>
        vIn.addData(b.map { case (k, t, v) => AsOfStream.Version(k, ts(t), v) }))
      q.processAllAvailable()
    }
    (1 to 2).foreach { i =>
      vIn.addData(AsOfStream.Version(-999L, ts(100000L + i), -1L))
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
  }

  test("forward+tolerance: single-batch arrival matches the batch forward as-of") {
    val got = runFwd("asof_fwd_one", Seq(probes), Seq(versions))
    assert(got === expectedFwd)
  }

  test("forward+tolerance: invariant to micro-batch slicing, matches arrive after probes") {
    // versions land AFTER the probes that need them (in-watermark
    // out-of-order): the probe must wait until its window is sealed, and
    // versions inside a pending probe's window must survive the prune even
    // once the watermark passes them
    val got = runFwd("asof_fwd_sliced",
      Seq(Seq(probes(0), probes(3)), Seq(probes(1), probes(4)),
        Seq(probes(2), probes(5))),
      Seq(Seq(versions(0), versions(3)), Seq(versions(4), versions(5)),
        Seq(versions(1), versions(2))))
    assert(got === expectedFwd)
  }

  test("single-batch arrival matches the batch as-of answer") {
    val got = run("asof_one", Seq(probes), Seq(versions))
    assert(got === expected)
  }

  test("output is invariant to micro-batch slicing and arrival order") {
    // versions arrive across three batches, probes across two, with the
    // key-25 version arriving AFTER the probe it must answer (in-watermark
    // out-of-order) — the watermark gate must hold the probe back
    val got = run("asof_sliced",
      Seq(Seq(probes(0), probes(3)), Seq(probes(1), probes(4)),
        Seq(probes(2), probes(5))),
      Seq(Seq(versions(0), versions(3)), Seq(versions(4), versions(5)),
        Seq(versions(1), versions(2))))
    assert(got === expected)
  }

  test("every probe is answered exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[AsOfStream.Probe]
    val vIn = MemoryStream[AsOfStream.Version]
    val q = AsOfStream.enrich(pIn.toDS(), vIn.toDS(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("asof_once")
      .outputMode("append").start()
    pIn.addData(probes.map { case (id, k, t) => AsOfStream.Probe(id, k, ts(t)) })
    vIn.addData(versions.map { case (k, t, v) => AsOfStream.Version(k, ts(t), v) })
    q.processAllAvailable()
    (1 to 3).foreach { i => // extra triggers must not re-emit
      vIn.addData(AsOfStream.Version(-999L, ts(100000L + i), -1L))
      q.processAllAvailable()
    }
    q.stop()
    val ids = spark.table("asof_once").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted === probes.map(_._1).sorted, "exactly-once emission")
  }

  test("a timeout-answered probe does not evict the carried version") {
    // regression: the pre-round-13 timeout branch removed the whole state
    // once the last pending probe ripened via timeout, so a LATER probe
    // (well within the idle retention) lost the carried newest-below-
    // watermark version and answered NULL — output depended on whether
    // the earlier probe happened to ripen via timeout or via an arrival
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[AsOfStream.Probe]
    val vIn = MemoryStream[AsOfStream.Version]
    val q = AsOfStream.enrich(pIn.toDS(), vIn.toDS(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("asof_timeout_carry")
      .outputMode("append").start()
    // key 10: one version, one probe after it
    vIn.addData(AsOfStream.Version(10L, ts(5), 100L))
    pIn.addData(AsOfStream.Probe(1L, 10L, ts(20)))
    q.processAllAvailable()
    // only OTHER keys advance the watermark: probe 1 must ripen via the
    // event-time TIMEOUT (key 10 receives no rows in these batches)
    (1 to 3).foreach { i =>
      vIn.addData(AsOfStream.Version(-999L, ts(60L + i), -1L))
      q.processAllAvailable()
    }
    // a later probe for key 10, inside the idle-retention horizon, must
    // still see the carried version
    pIn.addData(AsOfStream.Probe(2L, 10L, ts(60)))
    q.processAllAvailable()
    (4 to 5).foreach { i =>
      vIn.addData(AsOfStream.Version(-999L, ts(200L + i), -1L))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("asof_timeout_carry").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got.get(1L).flatten === Some(100L), s"probe 1: $got")
    assert(got.get(2L).flatten === Some(100L),
      s"probe 2 must still see the carried version: $got")
  }

  test("restoring a v1 state blob fails with the engine's message, not a decode trace") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val v1 = AsOfStream.AsOfState(1, Vector((1L, 100L)), Vector((2L, 7L)))
    val restored = TestGroupState.create[AsOfStream.AsOfState](
      org.apache.spark.api.java.Optional.of(v1), GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(60000L), hasTimedOut = false)
    val e = intercept[IllegalStateException] {
      AsOfStream.stateFn(1000L)(10L, Iterator.empty, restored)
    }
    assert(e.getMessage.contains("schema v1"), e.getMessage)
    assert(e.getMessage.contains("new checkpoint directory"), e.getMessage)

    // a current-version state restores and processes normally
    val ok = TestGroupState.create[AsOfStream.AsOfState](
      org.apache.spark.api.java.Optional.of(AsOfStream.AsOfState(
        AsOfStream.StateVersion, Vector((1L, 100L)), Vector((2L, 7L)))),
      GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(60000L), hasTimedOut = false)
    val out = AsOfStream.stateFn(1000L)(10L, Iterator.empty, ok).toSeq
    assert(out == Seq(AsOfStream.Enriched(7L, 10L, 2L, Some(100L))))
  }

  test("a FORWARD checkpoint cannot resume under BACKWARD semantics (and names the direction)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val fwdState = AsOfStream.AsOfState(AsOfStream.StateVersionForward,
      Vector((1L, 100L)), Vector((2L, 7L)))
    val restored = TestGroupState.create[AsOfStream.AsOfState](
      org.apache.spark.api.java.Optional.of(fwdState),
      GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(60000L), hasTimedOut = false)
    val e = intercept[IllegalStateException] {
      AsOfStream.stateFn(1000L)(10L, Iterator.empty, restored)
    }
    assert(e.getMessage.contains("FORWARD direction"), e.getMessage)
    assert(e.getMessage.contains("new checkpoint directory"), e.getMessage)
  }

  test("a BACKWARD checkpoint cannot resume under FORWARD semantics (and names the direction)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val bwdState = AsOfStream.AsOfState(AsOfStream.StateVersionBackward,
      Vector((1L, 100L)), Vector((2L, 7L)))
    val restored = TestGroupState.create[AsOfStream.AsOfState](
      org.apache.spark.api.java.Optional.of(bwdState),
      GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(60000L), hasTimedOut = false)
    val e = intercept[IllegalStateException] {
      AsOfStream.forwardFn(1000000L, 1000L)(10L, Iterator.empty, restored)
    }
    assert(e.getMessage.contains("BACKWARD direction"), e.getMessage)
    assert(e.getMessage.contains("new checkpoint directory"), e.getMessage)
  }

  test("strict watermark boundary: a probe at exactly the watermark is not ripe") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val wmMs = 60000L // watermark at minute 1 -> 60 000 000 us
    val st = AsOfStream.AsOfState(AsOfStream.StateVersion,
      Vector((1L, 100L)),
      Vector((wmMs * 1000, 41L), (wmMs * 1000 - 1, 40L)))
    val gs = TestGroupState.create[AsOfStream.AsOfState](
      org.apache.spark.api.java.Optional.of(st), GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(wmMs), hasTimedOut = false)
    val out = AsOfStream.stateFn(1000L)(10L, Iterator.empty, gs).toSeq
    // the probe strictly below the watermark ripens; the boundary probe
    // waits (a version at ts == watermark could still arrive — Spark's
    // late filter only drops ts < watermark)
    assert(out.map(_.event_id) == Seq(40L))
    assert(gs.get.pending.map(_._2) == Vector(41L))
  }

  test("event times keep sub-millisecond precision (tsUs carries micros)") {
    val t = Timestamp.valueOf("2026-01-01 00:00:00")
    t.setNanos(123456789) // .123456789 s -> 123 456 us (floor)
    assert(AsOfStream.tsUs(t) == t.getTime / 1000 * 1000 * 1000 + 123456)
    // two versions 1 us apart resolve to different instants: the probe
    // takes the newer one, as the batch as-of does at full precision
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def tsN(sec: Int, nanos: Int) = {
      val x = new Timestamp(sec * 1000L); x.setNanos(nanos); x
    }
    val gs = TestGroupState.create[AsOfStream.AsOfState](
      org.apache.spark.api.java.Optional.empty[AsOfStream.AsOfState](),
      GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(60000L), hasTimedOut = false)
    val ticks = Iterator(
      AsOfStream.Tick(0, 10L, tsN(10, 1000), 100L),  // version at 10s + 1 us
      AsOfStream.Tick(0, 10L, tsN(10, 2000), 101L),  // version at 10s + 2 us
      AsOfStream.Tick(1, 10L, tsN(10, 2000), 7L))    // probe at 10s + 2 us
    val out = AsOfStream.stateFn(1000L)(10L, ticks, gs).toSeq
    assert(out == Seq(AsOfStream.Enriched(7L, 10L, 10000002L, Some(101L))))
  }
}
