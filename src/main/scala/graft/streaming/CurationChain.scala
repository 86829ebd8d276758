package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode}

/** The streaming twins COMPOSED into one curation chain — the
  * cross-twin contract the individual twins' specs cannot exercise:
  * schema handoff between stages, verdict conventions, and state
  * co-existence of multiple stateful operators in a single streaming
  * plan and checkpoint.
  *
  * Two composition shapes, which together cover every twin style the
  * engine ships:
  *
  *  - [[curatedPacked]] — THREE STATEFUL TWINS IN ONE PLAN:
  *    exact dedup (EventsStream.dedupe, DeduplicateWithinWatermark) →
  *    per-source quota (QuotaStream's fold, flatMapGroupsWithState) →
  *    sequence packing (PackStream.packed, flatMapGroupsWithState).
  *    All three run in append mode — Spark's multiple-stateful-operator
  *    support (both fMGWS all-append; the dedup emits rows immediately,
  *    so no stage delays a downstream stateful operator) — and share
  *    ONE checkpoint, so exactly-once covers the whole chain, not each
  *    stage separately.
  *  - [[curatedVerdicts]] — the foreachBatch SPLICE: the same
  *    deduped → capped plan, terminated by the stateless decontamination
  *    kernel (DecontamStream) inside the sink, the composition rule for
  *    foreachBatch-shaped twins (Decontam/Mix): plan-native stateful
  *    stages first, stateless verdict stages in the terminal sink where
  *    they are plain batch code.
  *
  * Stage ORDER: dedup always first (every downstream stage's state
  * budget shrinks), caps before packing (pack offsets are meaningless
  * for docs the quota rejects) — matching the batch composite's
  * relative order for those stages. The verdict splice is the ONE
  * deliberate order deviation: q124 decontaminates BEFORE capping,
  * while [[curatedVerdicts]] must verdict after the cap (foreachBatch
  * is terminal), so a contaminated document can still consume a quota
  * slot here. The verdict itself is unaffected (it is a pure function
  * of (text, benchmark) — delivery- and position-invariant), but the
  * KEPT SET is the conservative one: treat contaminated-kept rows as
  * dropped-with-slot-consumed, or run DecontamStream as its own
  * upstream stage feeding this chain when q124's exact admission
  * accounting is required. Parity contract (StreamingChainSpec):
  * one-batch delivery reproduces the batch stages composed in THIS
  * chain's order; multi-batch delivery preserves each twin's own
  * cross-batch semantics (dedup drops re-deliveries, quota binds
  * across batches, pack offsets never re-scan).
  *
  * Scale shape: one keyed exchange per stateful stage — THREE total
  * (doc_id, then source, then source again; plan-verified). The
  * quota→pack re-exchange is real even though both key on source: each
  * typed groupByKey re-derives its key expression (appendColumns), and
  * Catalyst cannot prove the two derived keys equal across the fMGWS
  * boundary — the known cost of the typed API. It shuffles only the
  * quota's KEPT rows (cap-bounded per source per batch), so it is the
  * cheapest of the three; eliminating it would mean a combined
  * quota+pack state transition, a fusion to reach for only if the
  * exchange ever shows up in a profile. State per stage is the twin's
  * own documented bound (watermark-bounded dedup keys, O(1) per source
  * for quota and pack). Run under RocksDB in production
  * (SCALING.md round 15) — the chain's three state stores ride the same
  * provider config. */
object CurationChain {

  /** The chain's interchange row — what survives each handoff. `ts`
    * exists only for the dedup watermark and is dropped after it. */
  final case class ChainDoc(
      doc_id: Long, source: String, text: String, n_tok: Long, n_chars: Long)

  final case class ChainDecision(
      doc_id: Long, source: String, text: String, n_tok: Long, n_chars: Long,
      kept: Boolean, admitted_after: Long, seen_after: Long)

  /** (doc_id, ts, source, text) stream → exact-deduped, per-source
    * quota decisions with the document payload CARRIED THROUGH the cap
    * (the schema handoff [[QuotaStream.capped]]'s fixed decision row
    * cannot do) — same fold, same state schema, same cap. */
  def cappedDocs(docs: DataFrame, lateness: String = "1 hour")
      : Dataset[ChainDecision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val deduped = EventsStream.dedupe(docs, Seq("doc_id"), lateness)
    deduped.select(col("doc_id").cast("long"), col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"))
      .as[ChainDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[ChainDoc],
            state: org.apache.spark.sql.streaming.GroupState[QuotaStream.QuotaState]) =>
          QuotaStream.quotaFold(it, state)(_.doc_id, _.n_chars).map {
            case (d, keep, admitted, seen) =>
              ChainDecision(d.doc_id, d.source, d.text, d.n_tok, d.n_chars,
                keep, admitted, seen)
          })
  }

  /** dedup → quota → pack, one streaming plan, one checkpoint: span
    * assignments for exactly the quota-admitted, first-delivery
    * documents. */
  def curatedPacked(docs: DataFrame, lateness: String = "1 hour")
      : Dataset[PackStream.PackedDoc] =
    PackStream.packed(
      cappedDocs(docs, lateness).filter(col("kept"))
        .select(col("doc_id"), col("source"), col("n_tok")))

  /** dedup → quota → decontam: the kept documents of each micro-batch
    * run through the stateless benchmark-overlap kernel in the terminal
    * sink; `emit` receives (doc_id, source, n_tok, n_shared,
    * contaminated) per batch. The benchmark gram-distinct runs inside
    * the batch kernel — DecontamStream.writer's measured rule (the
    * per-batch aggregate broadcasts better than a hoisted checkpoint
    * join; SCALING.md round 16). */
  def curatedVerdicts(docs: DataFrame, benchGrams: DataFrame,
      lateness: String = "1 hour")(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    cappedDocs(docs, lateness).filter(col("kept"))
      .select(col("doc_id"), col("source"), col("text"), col("n_tok"))
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        val verdicts = DecontamStream.verdictsBatch(
          batch.select("doc_id", "text"), benchGrams)
        emit(batch.select("doc_id", "source", "n_tok")
          .join(verdicts, "doc_id"), batchId)
      }

  /** dedup → quota → RETRIEVAL decontam: the q133 kernel spliced into
    * the terminal sink — the THIRD decontam modality joins the chain
    * (q29's exact 8-grams ride [[curatedVerdicts]]; this catches the
    * paraphrase that shares a benchmark item's RARE TERMS but no 8-token
    * run, the case grams structurally miss — spec-planted in
    * StreamingChainSpec). BM25 is aggregation-shaped (df/stats
    * aggregations, a top-k window), so per the chain's composition rule
    * it cannot ride the streaming plan like the classifier's narrow map;
    * it runs per micro-batch in foreachBatch, where it is plain batch
    * code: the FIXED benchmark queries the batch's kept documents
    * through [[graft.queries.Retrieval.bm25On]] (benchmark = query
    * side, batch = collection side, the q133 framing), and every batch
    * doc surfacing in any benchmark item's lexical top-`k` comes back
    * flagged with (n_bench_hits, top_score).
    *
    * Stated deviation from the batch q133: collection stats (N, avgdl,
    * df) are BATCH-LOCAL — a doc's rank competes against its
    * micro-batch, not the full corpus, so a verdict is batch-relative
    * where the gram kernel is delivery-invariant. That is inherent to
    * rank-based flagging over an unbounded stream (the corpus "so far"
    * is exactly what a stream cannot re-scan per batch); consumers
    * needing corpus-calibrated ranks run q134's persisted-index probe
    * over the accumulated corpus instead — this splice is the
    * low-latency screen, q133/q134 the authoritative batch sweep.
    * Benchmark toks are derived once per stream and materialized (the
    * [[DecontamStream.benchmarkGrams]] rule); benchmark ids must not
    * collide with document ids (the kernel's self-exclusion is keyed on
    * id, the q133 same-table framing). */
  def curatedRetrievalVerdicts(docs: DataFrame, benchDocs: DataFrame,
      k: Int = 5, lateness: String = "1 hour")(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val benchToks = benchDocs
      .select(col("doc_id").as("query_id"),
        split(col("text"), " ").as("toks"))
      .localCheckpoint(true)
    cappedDocs(docs, lateness).filter(col("kept"))
      .select(col("doc_id"), col("source"), col("text"), col("n_tok"))
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        val corpusToks = batch
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val hits = graft.queries.Retrieval.bm25On(benchToks, corpusToks, k)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bench_hits"),
            max(col("score")).as("top_score"))
        emit(batch.select("doc_id", "source", "n_tok")
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"), col("n_tok"),
            coalesce(col("n_bench_hits"), lit(0L)).as("n_bench_hits"),
            col("top_score"),
            (coalesce(col("n_bench_hits"), lit(0L)) > 0).as("flagged")),
          batchId)
      }
  }

  /** dedup → quota → POSTINGS INDEX: the streaming half of the
    * build-once/probe-many deployment — each micro-batch's kept
    * documents append to the persisted
    * [[graft.sources.PostingsIndex]], so the index GROWS WITH THE
    * STREAM (bucketed-on-insert, stats folded per batch) and every
    * q134-style decontam probe between batches runs against the corpus
    * ingested so far. This closes the production loop end to end:
    * stream → dedup gate → quota → index → bucket-pruned probe
    * (IngestIndexSpec pinned the BATCH gate feeding append; the
    * StreamingChainSpec case pins this streaming spelling equal to the
    * batch rebuild over the same kept set).
    *
    * Delivery contract: the sink is IDEMPOTENT PER BATCH — every index
    * loop records the committed batchId as a table property
    * ([[graft.sources.Bucketing.recordBatch]]; the postings loop folds
    * it into the same property statement as the stats, so marker and
    * stats commit together) and SKIPS any batch at or under the marker:
    * a foreachBatch retry after a sink-side failure re-delivers the same
    * id and appends nothing (Spark's own foreachBatch recipe —
    * exactly-once covers sources and state, the marker extends it to
    * this external write). The residual window is a crash BETWEEN the
    * insert and the marker write — that one replay double-appends;
    * recover with [[graft.sources.PostingsIndex.refreshStats]] plus a
    * doc_id-dedup rebuild. Marker scope: one stream lineage (checkpoint
    * + restarts) per table — a FRESH checkpoint restarts batchIds at 0,
    * so call [[graft.sources.Bucketing.resetBatchMarker]] before
    * re-pointing a new stream at an old table
    * ([[graft.sources.Bucketing.lastCommittedBatch]]'s contract).
    * Distinct from re-delivery: a duplicate DOCUMENT arriving more than
    * `lateness` of event time after its first delivery passes the
    * evicted dedup state under a fresh batchId and appends permanently —
    * size `lateness` to the source's real re-delivery horizon, or run
    * [[curatedGatedIndexed]] when the horizon is unbounded.
    * Single-writer like every append path.
    * Maintenance rides IN the loop: each batch's insert adds a file per
    * touched bucket, so after every append the sink reads the table's
    * data-file count (a driver-side listing — the same walk the
    * listingSignature machinery does) and past `compactAboveFiles` runs
    * [[graft.sources.PostingsIndex.compact]] on the pair — probes are
    * row-identical across it (CompactionSpec) and the staged swap keeps
    * the table readable for the whole rewrite. The trigger is
    * file-count-based, not batch-count-based, because files-per-append
    * varies with how many buckets a batch touches; 0 disables it (run
    * compact on an external cadence instead). The sink is the
    * single writer, so the trigger can never race an append — but a
    * concurrent PROBE can land on the swap instant and must retry
    * (the compact contract). */
  def curatedIndexed(docs: DataFrame, table: String,
      lateness: String = "1 hour",
      compactAboveFiles: Int = 0): DataStreamWriter[Row] =
    cappedDocs(docs, lateness).filter(col("kept"))
      .select(col("doc_id"), col("text"))
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        postingsBatch(table, batch, batchId, compactAboveFiles)
      }

  /** [[curatedIndexed]]'s sink body — exposed so the idempotence spec
    * can replay a batch the way a foreachBatch retry does. Skips
    * no-data batches (watermark ticks) and all-rejected ones — an empty
    * append would still pay a write commit + two catalog property
    * operations per tick (and must NOT advance the marker: an empty
    * replay appends nothing anyway) — and any batch at or under the
    * table's committed marker (the retry case). The marker write rides
    * in appendDocs's own stats statement; compaction carries it
    * through. */
  private[graft] def postingsBatch(table: String, batch: DataFrame,
      batchId: Long, compactAboveFiles: Int = 0): Unit =
    if (!batch.isEmpty && batchId >
        graft.sources.Bucketing.lastCommittedBatch(
          batch.sparkSession, table)) {
      graft.sources.PostingsIndex.appendDocs(table, batch, Some(batchId))
      if (compactAboveFiles > 0 &&
          graft.sources.Bucketing.dataFileCount(
            batch.sparkSession, table) > compactAboveFiles)
        graft.sources.PostingsIndex.compact(batch.sparkSession, table)
    }

  /** dedup → quota → Q126 GATE → POSTINGS INDEX: [[curatedIndexed]]
    * with the CONTENT-level, UNBOUNDED-HORIZON dedup its scaladoc
    * defers to ("doc_id anti-join the index in the sink when the
    * horizon is unbounded") — realized properly as the q126 ingest gate
    * composed into the sink: each micro-batch's kept docs fingerprint
    * (bag-of-words, [[graft.queries.Curation.bowFingerprint]] — the
    * gate's content identity, not the stream's delivery identity), the
    * bloom-routed probe + exact anti-join admit them against the
    * BUCKETED SEALED STORE ([[graft.queries.Curation.ingestEpochStored]]:
    * O(admitted) append per batch, shuffle-free sealed side), and only
    * admissions reach [[graft.sources.PostingsIndex.appendDocs]]. What
    * this closes that the chain's dedup stage cannot: the dedup stage
    * keys on doc_id within its WATERMARK — a content duplicate arriving
    * under a fresh doc_id, or any duplicate past the lateness horizon,
    * sails through it; the store rejects both, forever, at
    * bloom-probe cost (spec-planted in StreamingChainSpec). The bloom
    * is DRIVER state advanced in place per batch — single-writer by the
    * foreachBatch contract, persisted between runs via the
    * [[graft.queries.Curation.saveIngestState]] bytes; the store and
    * the index recover independently ([[graft.queries.Curation]] /
    * [[graft.sources.PostingsIndex.refreshStats]]). */
  def curatedGatedIndexed(docs: DataFrame, sealedTable: String,
      indexTable: String,
      bloom: org.apache.spark.util.sketch.BloomFilter, capacity: Long,
      lateness: String = "1 hour",
      compactAboveFiles: Int = 0): DataStreamWriter[Row] =
    cappedDocs(docs, lateness).filter(col("kept"))
      .select(col("doc_id"), col("text"))
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        gatedBatch(sealedTable, indexTable, bloom, capacity, batch,
          batchId, compactAboveFiles)
      }

  /** [[curatedGatedIndexed]]'s sink body. This loop is idempotent under
    * replay TWICE over: the content gate alone already rejects a
    * replayed batch (its fingerprints sit in the sealed store, so the
    * exact anti-join admits nothing and no append runs — content
    * idempotence, independent of any marker), and the batchId marker on
    * the index table skips the replay before the gate even fingerprints
    * it — defense in depth that also saves the replay's gate probe. The
    * marker advances AFTER the sealed-store append and the index append
    * (it records "this batch's sink completed", covering both tables),
    * and advances even when the gate admits nothing — an all-rejected
    * batch is still a completed batch. */
  private[graft] def gatedBatch(sealedTable: String, indexTable: String,
      bloom: org.apache.spark.util.sketch.BloomFilter, capacity: Long,
      batch: DataFrame, batchId: Long,
      compactAboveFiles: Int = 0): Unit =
    if (!batch.isEmpty && batchId >
        graft.sources.Bucketing.lastCommittedBatch(
          batch.sparkSession, indexTable)) {
      // fingerprint once, reuse for the gate and the text join-back
      val withFp = batch
        .withColumn("fp", graft.queries.Curation.bowFingerprint)
        .localCheckpoint(true)
      val admitted = graft.queries.Curation.ingestEpochStored(
        sealedTable, withFp.select(col("doc_id"), col("fp")),
        bloom, capacity)
      val admittedDocs = withFp
        .join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("text"))
      if (!admittedDocs.isEmpty) {
        graft.sources.PostingsIndex.appendDocs(indexTable, admittedDocs,
          Some(batchId))
        if (compactAboveFiles > 0 &&
            graft.sources.Bucketing.dataFileCount(
              batch.sparkSession, indexTable) > compactAboveFiles)
          graft.sources.PostingsIndex.compact(
            batch.sparkSession, indexTable)
      } else
        graft.sources.Bucketing.recordBatch(
          batch.sparkSession, indexTable, batchId)
    }

  /** dedup → quota → NEAR-DUP GATE → BAND STORE: the near-dup sibling
    * of [[curatedGatedIndexed]] — that gate rejects CONTENT-IDENTICAL
    * re-crawls (bag-of-words fingerprint equality against the sealed
    * store); this one rejects the LIGHTLY-EDITED ones (the templated
    * rewrite, the boilerplate variant) by probing each micro-batch's
    * MinHash band rows against the persisted
    * [[graft.sources.BandIndex]] and appending only the survivors' rows
    * back, so the store IS the gate's memory and grows with the stream
    * (gate-grown == batch rebuild over admissions, spec-pinned). Two
    * collision scopes per batch, both deterministic: (a) CROSS-BATCH —
    * any doc sharing a (band, sig) with the store drops
    * ([[graft.sources.BandIndex.collidingIds]]: bucket-pruned
    * size-routed probe, no exact verify — the store holds no text; an
    * LSH-positive at the 4×3 banding is the gate signal, and
    * deployments needing exact-Jaccard confirmation keep a document
    * store and sweep with q139's verified probe); (b) WITHIN-BATCH —
    * any doc band-colliding with a SMALLER-id doc of the same batch
    * drops. The within-batch rule is deliberately CONSERVATIVE: it
    * drops against all smaller-id colliders, admitted or not (a doc
    * whose only collider was itself dropped still drops), which
    * over-drops relative to greedy sequential admission but never
    * under-drops — for a dedup gate the failure mode must be lost
    * coverage, not admitted near-dups — and it needs one self-join
    * where greedy needs an order-dependent iteration. Docs too short to
    * shingle (< 3 tokens) band nowhere: they are admitted (they cannot
    * near-dup) and add no store rows. `emit` receives the admitted
    * (doc_id, text) rows per batch — the gate's output a downstream
    * consumer (postings index, pack) chains on. Same batchId-marker
    * append / watermark-horizon / single-writer / compaction-trigger
    * contracts as [[curatedIndexed]]. */
  def curatedBandIndexed(docs: DataFrame, bandTable: String,
      lateness: String = "1 hour",
      compactAboveFiles: Int = 0)(
      emit: (DataFrame, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] =
    cappedDocs(docs, lateness).filter(col("kept"))
      .select(col("doc_id"), col("text"))
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        bandBatch(bandTable, batch, batchId, compactAboveFiles)(emit)
      }

  /** [[curatedBandIndexed]]'s sink body. The STORE is already idempotent
    * under replay without any marker: a replayed doc's band rows sit in
    * the store, so it collides with ITSELF and drops — but that same
    * mechanism makes the replay's EMIT wrong (the batch's true
    * admissions re-emit as empty, and sub-shingle docs re-emit as
    * duplicates), so the batchId marker matters here for the emitted
    * stream's consistency, not the store's: a replayed batch is skipped
    * whole, appending nothing and emitting nothing. The marker advances
    * after the append (or immediately, when the gate admits nothing). */
  private[graft] def bandBatch(bandTable: String, batch0: DataFrame,
      batchId: Long, compactAboveFiles: Int = 0)(
      emit: (DataFrame, Long) => Unit): Unit =
    if (!batch0.isEmpty && batchId >
        graft.sources.Bucketing.lastCommittedBatch(
          batch0.sparkSession, bandTable)) {
      val spark = batch0.sparkSession
      // band once, reuse thrice (probe, within-batch self-join,
      // admitted append) — the curatedGatedIndexed checkpoint rule.
      // Banded at the store's RECORDED banding (the recordedBanding
      // rule): after a mid-stream reband the next batch signs at the
      // new parameters automatically, instead of appending rows that
      // never collide.
      val storeBanding = graft.sources.BandIndex.recordedBanding(
        spark, bandTable)
      val batch = batch0.localCheckpoint(true)
      val bands = graft.queries.Dedup.bandRowsOn(spark, batch, storeBanding)
        .localCheckpoint(true)
      val storeHits = graft.sources.BandIndex.collidingIds(
        spark, bandTable, bands)
      val batchHits = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.sig") === col("y.sig") &&
            col("x.doc_id") > col("y.doc_id"))
        .select(col("x.doc_id")).distinct()
      val dropIds = storeHits.union(batchHits).distinct()
        .localCheckpoint(true)
      val admittedBands = bands.join(dropIds, Seq("doc_id"), "left_anti")
      if (!admittedBands.isEmpty) {
        graft.sources.BandIndex.appendBandRowsAt(bandTable, admittedBands,
          storeBanding)
        if (compactAboveFiles > 0 &&
            graft.sources.Bucketing.dataFileCount(
              spark, bandTable) > compactAboveFiles)
          graft.sources.Bucketing.compact(spark, bandTable)
      }
      graft.sources.Bucketing.recordBatch(spark, bandTable, batchId)
      emit(batch.join(dropIds, Seq("doc_id"), "left_anti"), batchId)
    }

  /** dedup → ANN INDEX: the VECTOR half of the streaming index loop —
    * [[curatedIndexed]]'s twin on the embedding side, closing the
    * build-once/probe-many symmetry for streams: each micro-batch's
    * first-delivery vectors are signed with the table's recorded
    * banding and appended to the persisted
    * [[graft.sources.AnnIndex]] (bucketed-on-insert, the banding
    * require() guarding every batch), so
    * [[graft.sources.AnnIndex.topKFor]] probes between batches serve
    * exactly the vectors ingested so far. The gate here is the dedup
    * stage alone: vectors carry (vec_id, label, embedding) — no
    * `source`, so the chain's per-source quota has no key; a deployment
    * that caps vector ingest runs its quota upstream on whatever key it
    * owns. Same batchId-marker delivery contract as the postings loop
    * (foreachBatch retries skip at the table's committed marker; the
    * dedup stage additionally suppresses re-delivered DOCUMENTS within
    * `lateness` of event time), same single-writer rule, and the same
    * in-loop maintenance trigger:
    * past `compactAboveFiles` data files the sink runs
    * [[graft.sources.Bucketing.compact]] (no df companion on this
    * side — signatures carry no per-term statistic). */
  def curatedVectorIndexed(vecs: DataFrame, table: String,
      lateness: String = "1 hour",
      compactAboveFiles: Int = 0,
      rebandOnAdaptive: Boolean = false,
      rebandCheckEvery: Int = 8,
      rebandAnchors: Long = 20L): DataStreamWriter[Row] =
    EventsStream.dedupe(vecs, Seq("vec_id"), lateness)
      .select(col("vec_id"), col("label"), col("embedding"))
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        vectorBatch(table, batch, batchId, compactAboveFiles,
          rebandOnAdaptive, rebandCheckEvery, rebandAnchors)
      }

  /** The guard/marker/compaction skeleton every VECTOR-side index loop
    * shares ([[vectorBatch]], [[cellBatch]], [[sqCellBatch]]): skip
    * empty and replayed batches, run the family's append, advance the
    * marker, compact past the file threshold, then run the family's own
    * maintenance trigger. ONE body so a fix to the replay guard or the
    * compaction trigger can never apply to one loop and silently leave
    * another with different idempotency behavior. (The DOC-side loops
    * keep their own bodies: postingsBatch folds the marker into the
    * stats statement, gatedBatch/bandBatch advance it even on
    * all-rejected batches — different contracts, stated there.) */
  private def indexLoopBatch(table: String, batch: DataFrame,
      batchId: Long, compactAboveFiles: Int)(append: DataFrame => Unit)(
      maintain: => Unit): Unit =
    if (!batch.isEmpty && batchId >
        graft.sources.Bucketing.lastCommittedBatch(
          batch.sparkSession, table)) {
      val spark = batch.sparkSession
      append(batch)
      graft.sources.Bucketing.recordBatch(spark, table, batchId)
      if (compactAboveFiles > 0 &&
          graft.sources.Bucketing.dataFileCount(
            spark, table) > compactAboveFiles)
        graft.sources.Bucketing.compact(spark, table)
      maintain
    }

  /** [[curatedVectorIndexed]]'s sink body — the curatedIndexed
    * empty-batch rule (watermark ticks and all-duplicate batches must
    * not pay a write commit) plus the batchId marker (a retried batch
    * appends nothing; the marker write follows the insert, the stated
    * residual window). Each batch signs with the table's RECORDED
    * banding (the catalog truth — never a hardcoded (tables, bits) the
    * store may have outgrown), so the loop keeps appending correctly
    * across a reband, whether ops ran it or the trigger below did.
    *
    * The LSH family's maintenance trigger is
    * [[graft.queries.Similarity.adaptiveBanding]] ITSELF, not a skew
    * metric: the right (tables, bits) is a FUNCTION of corpus size (the
    * measured 8×4 → 16×6 transition past ~590 k vectors, SCALING.md
    * rounds 15/18), so every `rebandCheckEvery` batches the sink
    * compares the recorded banding against what the rule would pick for
    * the store's current vector count (rows / tables — one metadata
    * count) and [[graft.sources.AnnIndex.reband]]s on a difference.
    * `rebandAnchors` is the rule's probe-set-size estimate — the
    * default 20 matches the engine's decontam/probe-serving shape; a
    * mine-negatives-for-everything deployment passes anchors ≈ n (the
    * adaptiveBanding scaladoc's warning). Single-writer: the sink owns
    * both the appends and the reband, so they never race; probes across
    * the swap instant retry (the reband contract). */
  private[graft] def vectorBatch(table: String, batch: DataFrame,
      batchId: Long, compactAboveFiles: Int = 0,
      rebandOnAdaptive: Boolean = false, rebandCheckEvery: Int = 8,
      rebandAnchors: Long = 20L): Unit =
    indexLoopBatch(table, batch, batchId, compactAboveFiles) { b =>
      val (bTables, bBits) =
        graft.sources.AnnIndex.recordedBanding(b.sparkSession, table)
      graft.sources.AnnIndex.appendVectors(table, b, bTables, bBits)
    } {
      if (rebandOnAdaptive && batchId % rebandCheckEvery.max(1) == 0) {
        val spark = batch.sparkSession
        val (bTables, bBits) =
          graft.sources.AnnIndex.recordedBanding(spark, table)
        spark.catalog.refreshTable(table)
        val n = spark.table(table).count() / bTables
        val target =
          graft.queries.Similarity.adaptiveBanding(n, rebandAnchors)
        if (target != ((bTables, bBits)))
          graft.sources.AnnIndex.reband(spark, table, target._1, target._2)
      }
    }

  /** dedup → IVF CELL STORE: [[curatedVectorIndexed]]'s twin on the
    * third vector family — each micro-batch's first-delivery vectors
    * assign against the table's RECORDED centroid companion
    * ([[graft.sources.IvfIndex.appendVectors]]: the frozen-fit
    * contract — a missing companion fails loudly, so the store MUST be
    * built before the stream starts; an IVF fit is training-time state,
    * never derived from a batch) and insert bucket-aligned into their
    * cells, so [[graft.sources.IvfIndex.topKFor]] probes between
    * batches serve exactly the vectors ingested so far. Same
    * batchId-marker / watermark-horizon / single-writer /
    * compaction-trigger contracts as the other index loops; compaction
    * via [[graft.sources.Bucketing.compact]] (the centroid companion is
    * a separate one-file table — maintenance never touches it). */
  def curatedCellIndexed(vecs: DataFrame, table: String,
      lateness: String = "1 hour",
      compactAboveFiles: Int = 0,
      refitAboveSkew: Double = 0.0,
      refitCheckEvery: Int = 8): DataStreamWriter[Row] =
    EventsStream.dedupe(vecs, Seq("vec_id"), lateness)
      .select(col("vec_id"), col("label"), col("embedding"))
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        cellBatch(table, batch, batchId, compactAboveFiles,
          refitAboveSkew, refitCheckEvery)
      }

  /** [[curatedCellIndexed]]'s sink body — the curatedIndexed
    * empty-batch rule plus the batchId marker ([[vectorBatch]]'s
    * contract on the IVF family), plus the SECOND maintenance trigger
    * this family alone needs: FIT DRIFT. Past `refitAboveSkew`
    * (max/mean cell occupancy — the [[graft.sources.IvfIndex.cellStats]]
    * metric; 0 disables), the sink refits the store with the engine's
    * own Lloyd fit ([[graft.queries.Clustering.kmeansFitOf]]) at the
    * CURRENT fit size, seeded from a deterministic uniform sample of
    * the store's own ids (the k smallest xxhash64(vec_id) values — the
    * seeding-is-destiny rule measured in SCALING.md round 18: seeds
    * must track the current distribution, which is exactly what a
    * drifted store's first-k ids do not). The skew check is one
    * cell-column aggregation over the store, so it runs every
    * `refitCheckEvery` batches, not every batch; the refit itself is a
    * full reassign + staged swap (cost measured: ~16 s at a 400 k
    * store), amortized across every probe until the next drift. The
    * sink is the single writer, so neither trigger races an append;
    * concurrent PROBES land on the version guard during the swap and
    * must retry (the refit contract — loud, never silently wrong). */
  private[graft] def cellBatch(table: String, batch: DataFrame,
      batchId: Long, compactAboveFiles: Int = 0,
      refitAboveSkew: Double = 0.0, refitCheckEvery: Int = 8): Unit =
    indexLoopBatch(table, batch, batchId, compactAboveFiles)(
      graft.sources.IvfIndex.appendVectors(table, _)) {
      val spark = batch.sparkSession
      if (refitAboveSkew > 0 && batchId % refitCheckEvery.max(1) == 0) {
        val occ = graft.sources.IvfIndex.cellStats(spark, table)
          .agg(max(col("n_vectors")), avg(col("n_vectors"))).head()
        if (occ.getLong(0) > refitAboveSkew * occ.getDouble(1)) {
          val k = graft.sources.IvfIndex.fitSize(spark, table)
          val store = spark.table(table)
            .select(col("vec_id"), lit(0).as("label"),
              col("v").as("embedding"))
            .localCheckpoint(true)
          val seeds = store.select(col("vec_id"))
            .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
            .collect().map(_.getLong(0)).toSeq
          graft.sources.IvfIndex.refit(spark, table,
            graft.queries.Clustering.kmeansFitOf(spark, store,
              k = k, seedIds = Some(seeds)))
        }
      }
    }

  /** dedup → IVF-SQ CELL STORE: [[curatedCellIndexed]]'s twin on the
    * QUANTIZED store — each first-delivery batch quantizes with the
    * shared quantizer, assigns its floats against the recorded centroid
    * companion, and appends codes
    * ([[graft.sources.IvfIndex.appendVectorsSq]]); probes between
    * batches are [[graft.sources.IvfIndex.topKForSq]]. Same
    * batchId-marker / empty-batch / single-writer / compaction-trigger
    * contracts as [[curatedCellIndexed]]. DELIBERATELY NO refit
    * trigger: the SQ store keeps only codes, and reassignment needs the
    * floats (the [[graft.sources.IvfIndex.refit]] guard) — fit
    * maintenance here is a REBUILD from the source corpus, an operation
    * outside a sink's remit. Deployments therefore watch
    * [[graft.sources.IvfIndex.cellStats]] (drift stays DETECTABLE —
    * occupancy is storage-format-independent) and schedule the rebuild;
    * this asymmetry is the operational half of the 7× compression's
    * stated price (the other half is the scale-grid ranking error q144
    * audits). */
  def curatedSqCellIndexed(vecs: DataFrame, table: String,
      lateness: String = "1 hour",
      compactAboveFiles: Int = 0,
      adviseAboveSkew: Double = 0.0,
      adviseCheckEvery: Int = 8): DataStreamWriter[Row] =
    EventsStream.dedupe(vecs, Seq("vec_id"), lateness)
      .select(col("vec_id"), col("label"), col("embedding"))
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        sqCellBatch(table, batch, batchId, compactAboveFiles,
          adviseAboveSkew, adviseCheckEvery)
      }

  /** [[curatedSqCellIndexed]]'s sink body — [[cellBatch]]'s contracts
    * with the refit trigger replaced by an ADVISORY: the SQ store
    * cannot self-refit (codes, not floats), but drift stays detectable
    * (occupancy is storage-format-independent), so past
    * `adviseAboveSkew` × mean occupancy the sink LOGS the rebuild
    * instruction and enqueues it on [[SqDriftAdvisor]]'s inspectable
    * queue (the CellContract warn-don't-throw pattern: skew is a
    * probe-cost cliff, not wrong answers — the loop keeps ingesting
    * while the deployment schedules
    * [[graft.sources.IvfIndex.rebuildSq]] with the source corpus). */
  private[graft] def sqCellBatch(table: String, batch: DataFrame,
      batchId: Long, compactAboveFiles: Int = 0,
      adviseAboveSkew: Double = 0.0, adviseCheckEvery: Int = 8): Unit =
    indexLoopBatch(table, batch, batchId, compactAboveFiles)(
      graft.sources.IvfIndex.appendVectorsSq(table, _)) {
      if (adviseAboveSkew > 0 && batchId % adviseCheckEvery.max(1) == 0)
        SqDriftAdvisor.check(batch.sparkSession, table, adviseAboveSkew)
    }

  /** dedup → quota → CLASSIFIER GATE → pack: the trained-weights quality
    * filter (ClassifierStream's fused literal-weights margin) rides IN
    * the streaming plan between the cap and packing — it is a stateless
    * narrow map, so unlike the aggregation-shaped decontam kernel it
    * needs no foreachBatch splice: four logical stages, still ONE plan,
    * one checkpoint, the same three state stores. Only documents the
    * classifier predicts positive (margin > 0) reach packing — the
    * production "filter before you pay sequence budget" order. */
  def curatedQualityPacked(docs: DataFrame, weights: Array[Long],
      lateness: String = "1 hour"): Dataset[PackStream.PackedDoc] =
    PackStream.packed(
      cappedDocs(docs, lateness).filter(col("kept"))
        .filter(ClassifierStream.marginCol(weights, col("text")) > 0)
        .select(col("doc_id"), col("source"), col("n_tok")))
}

/** The SQ loop's drift ADVISOR — the warn-don't-throw surface for the
  * one maintenance operation a streaming sink must not run itself: an
  * SQ store's fit rebuild needs the source corpus back
  * ([[graft.sources.IvfIndex.rebuildSq]]), which is a scheduled batch
  * job, not a micro-batch side effect. The sink detects (occupancy skew
  * from [[graft.sources.IvfIndex.cellStats]], the same metric the float
  * loop's auto-refit triggers on), logs, and enqueues the instruction;
  * the queue is bounded (the CellContract rule: a loop hammering a
  * drifted store must not grow driver memory one advisory at a time)
  * and inspectable so a deployment's scheduler — or a spec — can read
  * what was advised. */
private[graft] object SqDriftAdvisor {
  /** Per-TABLE ring cap (round-19 advice applied): the r19 global
    * 64-entry lifetime queue meant a loop hammering one drifted store
    * crowded out every OTHER table's first advisory for the process
    * lifetime — and kept the 64 oldest messages, whose skew numbers a
    * scheduler cares least about. Each table now keeps its own bounded
    * ring of the LATEST advisories; a long-lived driver running many SQ
    * streams stays O(tables × cap) and never loses a fresh table's
    * signal. */
  final val MaxPerTable = 8
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val byTable = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.concurrent.ConcurrentLinkedQueue[String]]

  /** One occupancy aggregation over the cell key; advises when max
    * occupancy exceeds `skewThreshold` × mean. */
  def check(spark: org.apache.spark.sql.SparkSession, table: String,
      skewThreshold: Double): Unit = {
    val occ = graft.sources.IvfIndex.cellStats(spark, table)
      .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col("n_vectors")),
        org.apache.spark.sql.functions.avg(
          org.apache.spark.sql.functions.col("n_vectors"))).head()
    if (occ.getLong(0) > skewThreshold * occ.getDouble(1)) {
      val msg = s"SQ store $table cell occupancy skew: max=${occ.getLong(0)} " +
        f"mean=${occ.getDouble(1)}%.1f exceeds ${skewThreshold}x - codes " +
        "cannot refit in place; schedule IvfIndex.rebuildSq(table, " +
        "sourceCorpus, newFit)"
      log.warn(msg)
      val q = byTable.computeIfAbsent(table,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[String])
      q.add(msg)
      while (q.size > MaxPerTable) q.poll() // ring: keep the latest
    }
  }

  /** The advisories currently pending for `table`, oldest first —
    * the inspection surface (specs; a scheduler that polls). */
  def advised(table: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Option(byTable.get(table)).map(_.iterator.asScala.toSeq).getOrElse(Nil)
  }

  /** Read-AND-CLEAR for `table` — the scheduler verb: act on the batch
    * of advisories and acknowledge them in one call, so the next drift
    * detection is a fresh signal, not a re-read. */
  def drain(table: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Option(byTable.remove(table)).map(_.iterator.asScala.toSeq).getOrElse(Nil)
  }

  /** Spec reset. */
  def clearAll(): Unit = byTable.clear()
}
