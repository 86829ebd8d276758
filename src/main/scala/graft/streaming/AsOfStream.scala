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
  * Correctness contract: a probe is answered only once the watermark is
  * STRICTLY past its event time — Spark's late filter only drops rows
  * with `ts < watermark`, so a version row at ts == watermark can still
  * arrive in a later batch; ripening strictly below the watermark
  * guarantees every version with `version.ts <= probe.ts` has either
  * arrived or been dropped as late by the SAME watermark, and the answer
  * equals the batch as-of over the delivered rows no matter how arrivals
  * are sliced into micro-batches (spec-pinned: one batch vs three
  * batches, identical output, including at the exact boundary).
  *
  * Event times are compared at FULL microsecond precision (getTime
  * millis + the sub-milli part of getNanos), matching the batch AsOf's
  * TimestampType micros — versions/probes that differ only at µs
  * resolution do not collapse to the same instant.
  *
  * State per key is O(pending probes + retained versions): versions older
  * than the newest version at-or-below the watermark are pruned (future
  * probes are necessarily newer than the watermark, so that newest-below
  * version is the only historical one they can ever need — the same
  * argument as the batch merge's O(1) carry); idle keys are evicted
  * whole after `idleRetentionMs` without activity. Eviction drops the
  * carried newest-below-watermark version too: a probe for that key
  * arriving AFTER eviction gets NULL enrichment even though a matching
  * version was once delivered — if probes can trail versions by more
  * than the default 24 h, raise `idleRetentionMs` to cover the
  * probe-arrival horizon (it is a per-pipeline parameter for exactly
  * this reason).
  *
  * STATE-SCHEMA COMPATIBILITY: [[AsOfState]] carries an in-band schema
  * version ([[StateVersion]]), checked on every restore. Changes that
  * alter the encoder's physical row layout (like the v1→v2 addition of
  * this very field) are rejected by Spark's own state-schema validation
  * at restart — Spark's error, before the operator runs; what the
  * in-band marker adds is protection against SAME-LAYOUT semantic
  * changes, which would otherwise resume silently wrong — those now
  * fail with an engine error naming this operator and the fix (new
  * checkpoint directory). The join DIRECTION is itself such a semantic:
  * backward ([[enrich]]) and forward ([[enrichForward]]) share the state
  * layout but not its meaning, so each writes its own version constant
  * ([[StateVersionBackward]] / [[StateVersionForward]]) and a checkpoint
  * written by one direction is rejected — by name — when resumed by the
  * other. Bump the direction's constant with any semantic change to its
  * state.
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
      version: Int,                   // [[StateVersion]] envelope
      versions: Vector[(Long, Long)], // (timeUs, version_id), sorted asc
      pending: Vector[(Long, Long)])  // (timeUs, event_id), unanswered

  /** v1 = pre-round-13 unversioned (versions, pending) pair; v2 = this
    * envelope + strict-watermark ripening + full-µs event times
    * (BACKWARD direction); v3 = the FORWARD direction's same-layout
    * state. Backward and forward share [[AsOfState]]'s physical layout
    * but not its semantics (carry-one-version vs window-pruned versions,
    * strict-past-ts vs strict-past-ts+tol ripening), so each direction
    * writes its OWN version constant and rejects the other's checkpoints
    * on restore — exactly the same-layout semantic divergence the
    * envelope exists to catch. */
  final val StateVersionBackward = 2
  final val StateVersionForward = 3

  /** Backward alias (the original single-direction constant). */
  final val StateVersion = StateVersionBackward

  val IdleRetentionMs: Long = 24L * 3600 * 1000

  /** Full-microsecond event time: Timestamp.getTime is millis and drops
    * the sub-milli part, which lives only in getNanos. */
  private[streaming] def tsUs(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  private[streaming] def checkVersion(
      st: AsOfState, expected: Int = StateVersionBackward): Unit =
    if (st.version != expected) {
      val crossMode = (expected, st.version) match {
        case (StateVersionBackward, StateVersionForward) =>
          "the checkpoint was written by the FORWARD direction " +
            "(enrichForward) and cannot resume under backward semantics"
        case (StateVersionForward, StateVersionBackward) =>
          // v2 is ambiguous: the BACKWARD direction writes it today, and
          // pre-direction-split builds of enrichForward also wrote it —
          // neither can resume under the current forward constant
          "v2 state was written either by the BACKWARD direction " +
            "(enrich) or by a pre-direction-split forward operator; " +
            "neither can resume under the current forward semantics"
        case _ =>
          "the checkpoint was written by an incompatible version of the " +
            "operator and cannot be resumed"
      }
      throw new IllegalStateException(
        s"AsOfStream state carries schema v${st.version}, but this " +
          s"operator writes v$expected: $crossMode. " +
          "Start a new checkpoint directory (stateful schema evolution " +
          "contract — see AsOfStream scaladoc).")
    }

  def enrich(
      probes: Dataset[Probe],
      versions: Dataset[Version],
      lateness: String = "10 minutes",
      idleRetentionMs: Long = IdleRetentionMs): Dataset[Enriched] = {
    import probes.sparkSession.implicits._

    val ticks = probes.map(p => Tick(1, p.key, p.ts, p.event_id))
      .unionByName(versions.map(v => Tick(0, v.key, v.ts, v.version_id)))

    ticks
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFn(idleRetentionMs) _)
  }

  private def answer(st: AsOfState, tUs: Long, id: Long): Enriched = {
    // newest version at or before tUs (versions sorted ascending by
    // (time, id) — ties resolved to the largest id, as in batch AsOf)
    val m = st.versions.takeWhile(_._1 <= tUs).lastOption
    Enriched(id, -1L, tUs, m.map(_._2)) // key patched by caller
  }

  private def step(idleRetentionMs: Long)(key: Long, rows: Iterator[Tick],
      state: GroupState[AsOfState]): Iterator[Enriched] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000
      val st0 = state.getOption.getOrElse(
        AsOfState(StateVersionBackward, Vector.empty, Vector.empty))
      checkVersion(st0, StateVersionBackward)
      val arrivals = rows.toVector
      val newVersions =
        (st0.versions ++ arrivals.filter(_.side == 0)
          .map(t => (tsUs(t.ts), t.seq))).sorted
      val allPending =
        (st0.pending ++ arrivals.filter(_.side == 1)
          .map(t => (tsUs(t.ts), t.seq))).sorted

      // strict: a version at ts == watermark can still arrive (Spark's
      // late filter drops only ts < watermark), so a probe at the exact
      // boundary is not ripe yet
      val (ripe, stillPending) = allPending.partition(_._1 < wmUs)
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
        state.update(AsOfState(StateVersionBackward, pruned, stillPending))
        if (stillPending.nonEmpty)
          // Registered at tsMs+1, and Spark fires timeouts once the
          // watermark EXCEEDS the registered instant — so the timeout
          // path ripens one watermark-millisecond later than the minimum
          // the strict rule needs (wmUs > tsUs). Arrival-path ripening is
          // not delayed; a timeout-answered probe just emits one
          // watermark tick later. Harmless in append mode (eventually
          // emitted, same answer) — documented asymmetry, not a bug.
          state.setTimeoutTimestamp(stillPending.head._1 / 1000 + 1)
        else
          state.setTimeoutTimestamp(math.max(wmUs / 1000, 0L) + idleRetentionMs)
      }
      out.iterator
    }

  /** FORWARD streaming as-of (the q118 direction): each probe is
    * enriched with the FIRST version at or after its event time, within
    * `toleranceUs`. Forward streaming REQUIRES a finite tolerance — the
    * batch operator can scan ahead arbitrarily, but a stream cannot wait
    * forever for a match that may never come, and unbounded waiting means
    * unbounded probe state. With the bound, a probe is answerable once
    * the watermark is strictly past `probe.ts + toleranceUs`: every
    * version in the probe's admissible window [ts, ts + tol] has either
    * arrived or been late-dropped by the SAME watermark, so the answer
    * equals batch `AsOf.join(direction = "forward", tolerance)` over the
    * delivered rows regardless of micro-batch slicing (spec-pinned).
    * Version pruning is simpler than backward's: a version strictly below
    * the watermark can only serve probes that the watermark has already
    * late-dropped, so only versions at or above the watermark are kept. */
  def enrichForward(
      probes: Dataset[Probe],
      versions: Dataset[Version],
      toleranceUs: Long,
      lateness: String = "10 minutes",
      idleRetentionMs: Long = IdleRetentionMs): Dataset[Enriched] = {
    require(toleranceUs >= 0, "forward streaming as-of needs tolerance >= 0")
    import probes.sparkSession.implicits._
    val ticks = probes.map(p => Tick(1, p.key, p.ts, p.event_id))
      .unionByName(versions.map(v => Tick(0, v.key, v.ts, v.version_id)))
    ticks
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        forwardFn(toleranceUs, idleRetentionMs) _)
  }

  /** forward prune cutoff: a version is dead only once it is below BOTH
    * the watermark (future probes carry ts >= watermark) and every
    * pending probe's event time (their windows may reach below it) */
  private def fwdCutoff(wmUs: Long, pending: Vector[(Long, Long)]): Long =
    math.min(wmUs, pending.headOption.map(_._1).getOrElse(Long.MaxValue))

  /** first version in [tUs, tUs + tol]; ascending (time, id) order makes
    * `find` the smallest-(time, id) winner — the batch forward tie rule */
  private def answerFwd(st: AsOfState, tolUs: Long, tUs: Long, id: Long,
      key: Long): Enriched = {
    val m = st.versions.find(v => v._1 >= tUs && v._1 - tUs <= tolUs)
    Enriched(id, key, tUs, m.map(_._2))
  }

  /** Saturating ts + tolerance: a caller passing an "effectively
    * unbounded" tolerance (e.g. Long.MaxValue) must not wrap negative —
    * the saturated window end never ripens and the timeout lands in the
    * far future, which is the semantics such a caller asked for. The
    * guard applies only for non-negative ts: for pre-epoch timestamps
    * (tsUs < 0) the sum cannot overflow upward, and the naive check
    * `tolUs > Long.MaxValue - tsUs` would itself wrap and wrongly
    * saturate, losing the probe forever. */
  private def windowEndUs(tsUs: Long, tolUs: Long): Long =
    if (tsUs > 0 && tolUs > Long.MaxValue - tsUs) Long.MaxValue
    else tsUs + tolUs

  /** One code path for arrivals and timeouts (see stateFn's rationale);
    * a timed-out invocation arrives with an empty iterator and flows
    * through the same transition. Unlike backward, forward keeps NO
    * explicit idle-eviction removal: there is no carry here — versions
    * below min(watermark, oldest pending probe) are pruned every
    * invocation, so state self-empties (and is removed) once the
    * watermark passes the last version; versions still AT OR ABOVE the
    * watermark are future-effective live data that a probe may yet need
    * and must survive idle periods (dropping them on an idle timeout
    * would silently null later enrichments). */
  private[streaming] def forwardFn(tolUs: Long, idleRetentionMs: Long)(
      key: Long, rows: Iterator[Tick],
      state: GroupState[AsOfState]): Iterator[Enriched] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000
    val st0 = state.getOption.getOrElse(
      AsOfState(StateVersionForward, Vector.empty, Vector.empty))
    checkVersion(st0, StateVersionForward)
    val arrivals = rows.toVector
    val newVersions =
      (st0.versions ++ arrivals.filter(_.side == 0)
        .map(t => (tsUs(t.ts), t.seq))).sorted
    val allPending =
      (st0.pending ++ arrivals.filter(_.side == 1)
        .map(t => (tsUs(t.ts), t.seq))).sorted
      // ripe once the watermark is STRICTLY past ts + tolerance: the
      // admissible window [ts, ts + tol] is then sealed by the late filter
      val (ripe, stillPending) =
        allPending.partition(p => windowEndUs(p._1, tolUs) < wmUs)
      val withVersions = st0.copy(versions = newVersions)
      val out = ripe.map { case (tUs, id) =>
        answerFwd(withVersions, tolUs, tUs, id, key)
      }
      // versions strictly below the watermark can only serve late-dropped
      // FUTURE probes (which must carry ts >= watermark) — but a PENDING
      // probe's window [ts, ts + tol] can reach below the watermark once
      // the watermark has entered it, so the prune cutoff is the older of
      // the watermark and the oldest pending probe's event time
      val pruned = newVersions.dropWhile(_._1 < fwdCutoff(wmUs, stillPending))
      if (stillPending.isEmpty && pruned.isEmpty) state.remove()
      else {
        state.update(AsOfState(StateVersionForward, pruned, stillPending))
        if (stillPending.nonEmpty)
          state.setTimeoutTimestamp(
            windowEndUs(stillPending.head._1, tolUs) / 1000 + 1)
        else
          state.setTimeoutTimestamp(math.max(wmUs / 1000, 0L) + idleRetentionMs)
      }
      out.iterator
  }

  /** The per-key state transition (package-visible so the version-gate
    * restore path is testable against a stubbed GroupState). A timed-out
    * invocation arrives with an empty row iterator and is handled by the
    * SAME transition — one code path, so probe-answering, version
    * pruning, carried-version retention and idle-timeout registration
    * cannot drift between the arrival and timeout cases (an earlier
    * hand-copied timeout branch dropped the retained versions whenever
    * the last pending probe ripened via timeout, making output depend on
    * micro-batch slicing — the bug this unification removes; regression
    * spec: "a timeout-answered probe does not evict the carried
    * version"). Idle eviction still happens: with no pending probes the
    * transition re-arms the idle timeout, and a later firing with still
    * nothing pending removes the state only once `pruned` has emptied —
    * or, for a pure-carry state, after the idle retention horizon via
    * the explicit removal below. */
  private[streaming] def stateFn(idleRetentionMs: Long)(key: Long,
      rows: Iterator[Tick],
      state: GroupState[AsOfState]): Iterator[Enriched] =
    if (state.hasTimedOut && state.exists &&
        state.get.pending.isEmpty && rows.isEmpty) {
      // idle-retention expiry: nothing pending and nothing arriving —
      // drop the whole key, including the carried version (documented:
      // post-eviction probes lose history; raise idleRetentionMs if
      // probes can trail versions further than the horizon)
      checkVersion(state.get)
      state.remove()
      Iterator.empty
    } else step(idleRetentionMs)(key, rows, state)
}
