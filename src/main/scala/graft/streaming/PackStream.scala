package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming training-sequence packing — the stateful twin of batch q53
  * (SURVEY §2.9 generalization; the reference is pure batch): documents
  * arriving on a stream are concatenated per stream key (`source`) and
  * cut into fixed [[SeqLen]]-token training sequences, without ever
  * re-scanning the already-packed corpus. Each arrival is assigned its
  * token span in the stream's concatenation — the only state a packer
  * needs is ONE cumulative token offset per stream (a Long: constant
  * state per key, the cheapest stateful operator in the engine).
  *
  * Determinism contract: within a micro-batch a stream's documents are
  * packed in doc_id order (the iterator is sorted before folding —
  * micro-batch iterators carry no order guarantee); across batches,
  * arrival order. When batches arrive in doc_id order the assignment is
  * byte-identical to batch q53's (pinned by PackStreamSpec); out-of-order
  * arrival packs in arrival order, which is what a real ingest pipeline
  * means by packing anyway.
  *
  * Scale shape: one keyed shuffle on `source` per micro-batch (the same
  * key q53 windows on), O(1) state per stream, append output mode — no
  * watermark needed because state never grows with the corpus. Mega-
  * stream skew has q53's documented fix: shard the stream key; chunk
  * identity is shard-local.
  *
  * Exactly-once: sequence assignment is pure given (state, sorted batch),
  * so replaying a failed batch from the checkpoint reproduces identical
  * spans — the sink inherits idempotency the same way SpansStream's
  * batchId-overwrite does.
  *
  * STATE-SCHEMA COMPATIBILITY: [[PackState]] carries an in-band schema
  * version ([[StateVersion]]), checked on every restore (the DedupStream
  * contract). The v1 bare-Long → v2 envelope migration itself changes
  * the physical layout, which Spark's own state-schema validation
  * rejects at restart (its error, before the operator runs); the in-band
  * marker guards the cases Spark cannot see — SAME-LAYOUT semantic
  * changes from v2 onward, which now fail with an engine error naming
  * this operator and the fix (new checkpoint directory) instead of
  * resuming silently wrong. Bump [[StateVersion]] with any semantic
  * change to the state.
  */
object PackStream {

  final val SeqLen = 256L

  /** v1 = pre-round-13 bare Long offset (no envelope); v2 = this
    * envelope. */
  final val StateVersion = 2

  final case class PackState(version: Int, offset: Long)

  final case class PackedDoc(
      doc_id: Long, source: String, n_tok: Long,
      start_tok: Long, first_seq: Long, last_seq: Long)

  /** (doc_id, source, n_tok) stream → per-document span assignments. */
  def packed(docs: DataFrame): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"),
        col("n_tok").cast("long"))
      // A document with no tokens occupies no span: the offset wouldn't
      // move and last_seq = (start-1)/SeqLen would PRECEDE first_seq —
      // invalid span metadata from a public API. Empty documents are
      // dropped before packing (they contribute nothing to the
      // concatenation, so there is no span to report); packedFromText can
      // never produce one (split always yields >= 1 token) but direct
      // callers can.
      .filter(col("n_tok") > 0)
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        packGroup _)
  }

  /** The per-stream state transition (package-visible so the version-gate
    * restore path is testable against a stubbed GroupState). */
  private[streaming] def packGroup(source: String,
      it: Iterator[(Long, String, Long)],
      state: GroupState[PackState]): Iterator[PackedDoc] = {
    state.getOption.foreach { s =>
      if (s.version != StateVersion) throw new IllegalStateException(
        s"PackStream state carries schema v${s.version}, but this engine " +
          s"writes v$StateVersion: the checkpoint was written by an " +
          "incompatible version of the operator and cannot be resumed. " +
          "Start a new checkpoint directory (stateful schema evolution " +
          "contract — see PackStream scaladoc).")
    }
    var offset = state.getOption.map(_.offset).getOrElse(0L)
    val out = it.toSeq.sortBy(_._1).map { case (docId, _, nTok) =>
      val start = offset
      offset += nTok
      PackedDoc(docId, source, nTok, start,
        start / SeqLen, (start + nTok - 1) / SeqLen)
    }
    state.update(PackState(StateVersion, offset))
    out.iterator
  }

  /** Convenience: tokenize a (doc_id, source, text) stream the same way
    * q53 does (whitespace tokens) and pack it. */
  def packedFromText(docs: DataFrame): Dataset[PackedDoc] =
    packed(docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok")))
}
