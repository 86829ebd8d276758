package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming temperature-reweighted mixture sampling — the stateful twin
  * of batch q56 (SURVEY §2.9 generalization; the reference is pure
  * batch): documents arriving on a stream are admitted or dropped so
  * that each stream's admission rate tracks the α = 0.5 temperature
  * rebalancing (∝ √tokens) over the token mass seen SO FAR.
  *
  * Batch q56 needs the whole corpus to compute per-source rates
  * min(1, 0.2·T·√t_g / z / t_g); a stream has no "whole corpus", so the
  * honest streaming contract is: the rates for micro-batch N are
  * computed from the cumulative per-source token counts INCLUDING
  * batch N. Two consequences, both pinned by MixStreamSpec:
  *
  *  - PARITY: if the entire corpus arrives in one batch, the emitted
  *    rows (and their `rate` doubles) are bit-identical to batch q56's —
  *    the z fold sorts the √t_g terms exactly as q56's
  *    `aggregate(array_sort(collect_list(...)))` does, every double op
  *    is the same IEEE op in the same order, and the per-doc gate is
  *    the identical md5-uniform Spark expression.
  *  - CONVERGENCE: under multi-batch arrival the rates drift toward the
  *    batch rates as counts accumulate; early batches are gated by
  *    less-informed rates (exactly what "sample while ingesting" means).
  *    A re-run over the same arrival order reproduces the output
  *    byte-for-byte (the gate is a pure function of (doc_id, cumulative
  *    counts)).
  *
  * Scale shape: per batch, one tiny per-source aggregate (partial-agg,
  * |sources| rows to the driver — the SAME driver-state bound as batch
  * q56's rates table), one broadcast join of the |sources|-row threshold
  * table, one narrow filter. Driver state is a Map[source, Long] — O(1)
  * per stream, like PackStream's offset. Exactly-once: absorption is
  * keyed by batchId, so a foreachBatch replay of a failed batch re-uses
  * the already-absorbed totals instead of double-counting (and the gate
  * is deterministic given totals, so the replayed emit is identical).
  */
object MixStream {

  private final val TwoPow32 = 4294967296L

  /** v1 = (lastBatchId, per-source token totals). Bump with any semantic
    * change to the snapshot. */
  final val StateVersion = 1

  /** Durable form of [[MixState]]: MixStream's state is DRIVER-side (the
    * foreachBatch accumulator), so it is not in Spark's checkpoint — a
    * query restart resets it unless the caller persists a snapshot
    * alongside the checkpoint and restores it via [[MixState.restore]].
    * The snapshot carries an in-band schema version, checked on restore —
    * an incompatible snapshot fails with an engine error naming this
    * operator (the DedupStream contract), not a silent mis-resume. */
  final case class MixSnapshot(
      version: Int, lastBatchId: Long, tok: Map[String, Long])

  /** Driver-side accumulator: cumulative per-source token counts with
    * batchId-idempotent absorption (replay-safe). */
  final class MixState private[streaming] (
      private var tok: Map[String, Long], private var last: Long) {
    def this() = this(Map.empty, -1L)
    def absorb(batchId: Long, counts: Map[String, Long]): Map[String, Long] =
      synchronized {
        if (batchId != last) {
          counts.foreach { case (s, n) => tok += s -> (tok.getOrElse(s, 0L) + n) }
          last = batchId
        }
        tok
      }
    def totals: Map[String, Long] = synchronized(tok)
    def snapshot: MixSnapshot = synchronized(MixSnapshot(StateVersion, last, tok))
  }

  object MixState {
    def restore(s: MixSnapshot): MixState = {
      if (s.version != StateVersion) throw new IllegalStateException(
        s"MixStream snapshot carries schema v${s.version}, but this engine " +
          s"writes v$StateVersion: the snapshot was written by an " +
          "incompatible version of the operator and cannot be restored. " +
          "Discard it and restart accumulation (stateful schema evolution " +
          "contract — see MixStream scaladoc).")
      new MixState(s.tok, s.lastBatchId)
    }
  }

  /** q56's rate arithmetic on driver-side totals — the SAME doubles in
    * the SAME order as the batch query: T is an exact integer sum, z is
    * the ascending-sorted fold of √t_g, and the rate expression is
    * ((0.2 · T) · √t_g) / z / t_g, left-associated. Returns
    * (rate, floor(rate·2³²)) per source. */
  def thresholds(tok: Map[String, Long]): Map[String, (Double, Long)] = {
    val total = tok.values.sum
    val z = tok.values.map(v => math.sqrt(v.toDouble)).toSeq.sorted
      .foldLeft(0.0)(_ + _)
    tok.map { case (s, tg) =>
      // tg == 0 makes the expression 0/0 = NaN; Spark's least(1.0, NaN)
      // resolves to 1.0 (NaN sorts greatest) while JVM math.min keeps
      // NaN — mirror Spark so even the degenerate zero-token-stream edge
      // (unreachable via writerFromText: split yields >= 1 token) stays
      // batch-identical
      val raw = 0.2 * total.toDouble * math.sqrt(tg.toDouble) / z / tg.toDouble
      val rate = if (raw.isNaN) 1.0 else math.min(1.0, raw)
      s -> (rate, math.floor(rate * TwoPow32).toLong)
    }
  }

  /** Gate one micro-batch against the current thresholds: q56's identical
    * md5-uniform filter, with the |sources|-row threshold table
    * broadcast. Output columns match batch q56: (doc_id, source, n_tok,
    * rate). */
  def gated(batch: DataFrame, thr: Map[String, (Double, Long)]): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val rates = thr.toSeq.map { case (s, (r, t)) => (s, r, t) }
      .toDF("source", "rate", "thr")
    batch.join(broadcast(rates), "source")
      .filter(graft.queries.Sampling.Rand.u32(
        md5(concat(lit("mix:"), col("doc_id").cast("string")))) < col("thr"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("rate"))
  }

  /** (doc_id, source, n_tok) stream → a foreachBatch writer that emits
    * each batch's admitted rows. The caller supplies the sink (`emit`)
    * and starts the query (checkpointing etc. stay caller-configured).
    * Pass `initial` (a [[MixSnapshot]] persisted next to the checkpoint)
    * to resume accumulation across restarts — see the MixSnapshot
    * scaladoc for the restart contract. */
  def writer(docs: DataFrame, initial: Option[MixSnapshot] = None)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val state = initial.map(MixState.restore).getOrElse(new MixState)
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // the batch is consumed twice (counts, then the gate): persist so
      // the source isn't re-read — the documented foreachBatch pattern
      val b = batch.select(col("doc_id").cast("long"), col("source"),
        col("n_tok").cast("long")).persist()
      try {
        val counts = b.groupBy("source").agg(sum("n_tok").as("t"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val tok = state.absorb(batchId, counts)
        emit(gated(b, thresholds(tok)), batchId)
      } finally b.unpersist()
    }
  }

  /** Convenience: tokenize a (doc_id, source, text) stream the way batch
    * q56 does (whitespace tokens) and sample it. */
  def writerFromText(docs: DataFrame)(emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    writer(docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok")))(emit)
}
