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
}
