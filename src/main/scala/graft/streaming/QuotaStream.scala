package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain frequency capping — the stateful twin of batch
  * q91 (RefinedWeb §3.2 / Gopher §A.1.2 domain quotas) for an INGEST
  * pipeline: documents arrive on a stream and each domain may admit at
  * most [[Cap]] documents, ever. Batch q91 ranks a sealed corpus and
  * keeps the top-K per domain; an ingest path cannot re-rank history, so
  * the streaming contract is: within a micro-batch, candidates are
  * considered in q91's rank order (n_chars desc, doc_id — micro-batch
  * iterators carry no order guarantee, so the group sorts first); across
  * batches, arrival order. One-batch arrival therefore reproduces q91's
  * kept set exactly (pinned by QuotaStreamSpec); streamed arrival admits
  * first-come within the quota, which is what ingest-time capping means.
  *
  * Emits a DECISION row for every document (kept or dropped, with the
  * domain's running admitted/seen counters at decision time) — the audit
  * stream a curation dashboard consumes; a training sink filters
  * `kept`.
  *
  * Scale shape: one keyed shuffle on `domain` per micro-batch; state is
  * two Longs per domain (admitted, seen) — O(|domains|) total, constant
  * per key, no watermark needed because state never grows with the
  * corpus. Mega-domain skew: the cap itself bounds per-domain admitted
  * work; the sort is per-batch-per-domain only.
  *
  * Exactly-once: decisions are pure given (state, sorted batch), so a
  * replayed batch reproduces identical decisions — sinks inherit
  * idempotency the same way PackStream's span assignment does.
  */
object QuotaStream {

  final val Cap = 20L

  /** State schema v1 — (admitted, seen). Versioned the DedupStream way:
    * bump [[StateVersion]] on any schema change so a checkpoint resume
    * across versions fails with the engine's message, not Spark's
    * deserialization stack trace. */
  final val StateVersion = 1
  final case class QuotaState(version: Int, admitted: Long, seen: Long)

  final case class QuotaDecision(
      doc_id: Long, domain: Long, n_chars: Long,
      kept: Boolean, admitted_after: Long, seen_after: Long)

  /** The quota state transition, factored out of [[capped]] so chain
    * compositions carrying a WIDER row (CurationChain keeps source/text
    * through the cap — the cross-twin schema handoff) run the IDENTICAL
    * fold against the identical [[QuotaState]]: q91's rank order within
    * the batch (largest docs first, doc_id ties), admit while under
    * [[Cap]], versioned-state resume check. Returns each input row with
    * (kept, admitted_after, seen_after). */
  private[streaming] def quotaFold[A](it: Iterator[A],
      state: GroupState[QuotaState])(
      docId: A => Long, nChars: A => Long): Iterator[(A, Boolean, Long, Long)] = {
    val st0 = state.getOption.getOrElse(QuotaState(StateVersion, 0L, 0L))
    require(st0.version == StateVersion,
      s"quota state v${st0.version} cannot resume under v$StateVersion " +
        "- restart from a fresh checkpoint")
    var admitted = st0.admitted
    var seen = st0.seen
    val out = it.toSeq.sortBy(a => (-nChars(a), docId(a))).map { a =>
      seen += 1
      val keep = admitted < Cap
      if (keep) admitted += 1
      (a, keep, admitted, seen)
    }
    state.update(QuotaState(StateVersion, admitted, seen))
    out.iterator
  }

  /** (doc_id, domain, n_chars) stream → per-document admit/drop decisions. */
  def capped(docs: DataFrame): Dataset[QuotaDecision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("domain").cast("long"),
        col("n_chars").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (domain: Long, it: Iterator[(Long, Long, Long)],
            state: GroupState[QuotaState]) =>
          quotaFold(it, state)(_._1, _._3).map {
            case ((docId, _, nChars), keep, admitted, seen) =>
              QuotaDecision(docId, domain, nChars, keep, admitted, seen)
          })
  }

  /** Convenience: derive q91's synthesized domain key from a
    * (doc_id, n_chars) document stream and cap it. */
  def cappedFromDocuments(docs: DataFrame): Dataset[QuotaDecision] =
    capped(docs.select(col("doc_id"),
      floor(sqrt((col("doc_id") % 10000).cast("double"))).cast("long")
        .as("domain"),
      col("n_chars")))
}
