package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the native as-of join (graft.plans.AsOf / q113): a
  * probe stream (events) enriched with the most recent version stream row
  * (dimension updates) at or before each probe's event time — the
  * streaming temporal join Structured Streaming lacks natively (its
  * stream-stream join offers range conditions, not "latest at or
  * before").
  *
  * Correctness contract: a probe is answered only once the watermark has
  * passed its event time — at that point every version row with
  * `version.ts <= probe.ts` has either arrived or been dropped as late by
  * the SAME watermark, so the answer equals the batch as-of over the
  * delivered rows no matter how arrivals are sliced into micro-batches
  * (spec-pinned: one batch vs three batches, identical output).
  *
  * State per key is O(pending probes + retained versions): versions older
  * than the newest version at-or-below the watermark are pruned (future
  * probes are necessarily newer than the watermark, so that newest-below
  * version is the only historical one they can ever need — the same
  * argument as the batch merge's O(1) carry); idle keys are evicted
  * whole after [[IdleRetentionMs]] without activity.
  */
object AsOfStream {

  final case class Probe(event_id: Long, key: Long, ts: Timestamp)
  final case class Version(key: Long, ts: Timestamp, version_id: Long)
  final case class Enriched(
      event_id: Long, key: Long, event_us: Long, version_id: Option[Long])

  /** side 0 = version (dimension), 1 = probe; seq carries version_id or
    * event_id respectively. */
  final case class Tick(side: Int, key: Long, ts: Timestamp, seq: Long)

  final case class AsOfState(
      versions: Vector[(Long, Long)], // (timeUs, version_id), sorted asc
      pending: Vector[(Long, Long)])  // (timeUs, event_id), unanswered

  val IdleRetentionMs: Long = 24L * 3600 * 1000

  def enrich(
      probes: Dataset[Probe],
      versions: Dataset[Version],
      lateness: String = "10 minutes"): Dataset[Enriched] = {
    import probes.sparkSession.implicits._
    // local copy: referencing the object member from inside the state
    // function would capture the (non-serializable) enclosing object
    val idleRetentionMs = IdleRetentionMs

    val ticks = probes.map(p => Tick(1, p.key, p.ts, p.event_id))
      .unionByName(versions.map(v => Tick(0, v.key, v.ts, v.version_id)))

    def answer(st: AsOfState, tUs: Long, id: Long): Enriched = {
      // newest version at or before tUs (versions sorted ascending by
      // (time, id) — ties resolved to the largest id, as in batch AsOf)
      val m = st.versions.takeWhile(_._1 <= tUs).lastOption
      Enriched(id, -1L, tUs, m.map(_._2)) // key patched by caller
    }

    def step(key: Long, rows: Iterator[Tick],
        state: GroupState[AsOfState]): Iterator[Enriched] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000
      val st0 = state.getOption.getOrElse(AsOfState(Vector.empty, Vector.empty))
      val arrivals = rows.toVector
      val newVersions =
        (st0.versions ++ arrivals.filter(_.side == 0)
          .map(t => (t.ts.getTime * 1000, t.seq))).sorted
      val allPending =
        (st0.pending ++ arrivals.filter(_.side == 1)
          .map(t => (t.ts.getTime * 1000, t.seq))).sorted

      val (ripe, stillPending) = allPending.partition(_._1 <= wmUs)
      val withVersions = st0.copy(versions = newVersions)
      val out = ripe.map { case (tUs, id) =>
        answer(withVersions, tUs, id).copy(key = key)
      }

      // prune: keep the newest version at-or-below the watermark plus
      // everything after it
      val cut = newVersions.lastIndexWhere(_._1 <= wmUs)
      val pruned = if (cut <= 0) newVersions else newVersions.drop(cut)

      if (stillPending.isEmpty && pruned.isEmpty) state.remove()
      else {
        state.update(AsOfState(pruned, stillPending))
        if (stillPending.nonEmpty)
          state.setTimeoutTimestamp(stillPending.head._1 / 1000 + 1)
        else
          state.setTimeoutTimestamp(math.max(wmUs / 1000, 0L) + idleRetentionMs)
      }
      out.iterator
    }

    def fn(key: Long, rows: Iterator[Tick],
        state: GroupState[AsOfState]): Iterator[Enriched] =
      if (state.hasTimedOut) {
        val wmUs = state.getCurrentWatermarkMs() * 1000
        val st = state.getOption.getOrElse(AsOfState(Vector.empty, Vector.empty))
        val (ripe, stillPending) = st.pending.partition(_._1 <= wmUs)
        val out = ripe.map { case (tUs, id) =>
          answer(st, tUs, id).copy(key = key)
        }
        if (stillPending.isEmpty) state.remove() // idle eviction
        else {
          state.update(st.copy(pending = stillPending))
          state.setTimeoutTimestamp(stillPending.head._1 / 1000 + 1)
        }
        out.iterator
      } else step(key, rows, state)

    ticks
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
