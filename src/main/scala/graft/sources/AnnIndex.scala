package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** PERSISTED ANN index — the build-once / query-many deployment of the
  * LSH family (q35/q125 recompute signatures per run; a production
  * vector store computes them at ingest and serves point queries):
  * [[build]] writes one signature row per (vector, table) as a table
  * BUCKETED BY `sig`, and [[topK]] probes it with the anchor
  * signatures as LITERALS, so Spark's bucket pruning skips every
  * bucket holding no probed signature — the scan reads
  * `SelectedBucketsCount: k out of N` (plan-visible, spec-pinned), not
  * the corpus. That is what makes it an INDEX rather than a cached
  * scan: query cost tracks the probed buckets' occupancy, the q35
  * candidate argument applied to I/O.
  *
  * Layout choices, stated: (a) `sig` is the bucket key (single-column,
  * because bucket pruning works on single-key `isin` predicates); the
  * (tbl, sig) correctness rendezvous is the broadcast join — the
  * pruning predicate is the IO filter, the join is the semantics.
  * (b) v and nrm are stored per signature row (×tables storage) so the
  * exact re-rank reads no second corpus table; at 100 TB the trade is
  * tables× the vector bytes for a self-contained single-scan probe —
  * the same trade FAISS-style IVF lists make (vectors live in the
  * list). (c) Anchor signatures collect to the driver (anchors are
  * query-scale by the q122/q125 contract — a point query carries its
  * own signatures, exactly like a vector-DB client).
  *
  * Re-rank parity: candidates are the identical (tbl, sig) collisions
  * lshTopK derives, deduped and re-ranked by the same compiled dot fold
  * and tie rule — [[topK]] output is spec-pinned EQUAL to
  * `Similarity.lshTopK` at the same banding. */
object AnnIndex {

  /** Compute signatures for every corpus vector and persist them
    * bucketed by `sig` in the session catalog (the [[Bucketing]]
    * warehouse rules apply: one write, every later probe prunes). The
    * banding is RECORDED as table properties so [[append]] can enforce
    * it — the banding is part of the index's physical identity, exactly
    * like the bucket count. */
  def build(spark: SparkSession, dir: String, table: String,
      tables: Int = 4, bits: Int = 8, buckets: Int = 16): Unit = {
    Bucketing.writeBucketed(
      Similarity.signatureRows(spark, dir, tables, bits),
      table, "sig", buckets)
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
      s"'graft.lsh.tables' = '$tables', 'graft.lsh.bits' = '$bits')")
  }

  /** Build-once memo for dir-derived indexes — the deployment shape the
    * registered q135 runs through (PostingsIndex.ensureFor's rule on the
    * vector side): first call builds, later calls return the table name
    * for free; keyed on the embeddings listing signature so an
    * in-process corpus rewrite rebuilds instead of probing stale
    * signatures, with (tables, bits, buckets) folded into the memo key
    * AND the table name ([[IndexMemo]]) so a different banding can
    * never be served a table built at another. */
  def ensureFor(spark: SparkSession, dir: String, tag: String,
      tables: Int = 4, bits: Int = 8, buckets: Int = 16): String =
    IndexMemo.ensure(s"ann|$tag|$dir|$tables|$bits|$buckets",
      graft.Tables.listingSignature(dir, "embeddings"), s"ann_$tag")(
      t => build(spark, dir, t, tables, bits, buckets))

  /** The banding the table was built at — PUBLIC so a serving-path
    * caller signs its query vectors with the RECORDED banding
    * (Similarity.signatureRowsOf(queries, tables, bits)) instead of a
    * hardcoded one: after a [[reband]] a caller still signing at the
    * old banding would probe signatures that never collide — the silent
    * recall loss the append require() guards, closed on the query side
    * by reading the truth from the catalog. */
  def recordedBanding(spark: SparkSession, table: String): (Int, Int) =
    banding(spark, table)

  /** RE-BAND maintenance — the ANN analog of IvfIndex.refit, for the
    * banding-transition rule instead of fit drift:
    * [[Similarity.adaptiveBanding]] sizes (tables, bits) to the corpus
    * (8×4 at the test corpora, 16×6 past ~590 k vectors — the measured
    * transition, SCALING.md round 15), so a store that grew past its
    * built banding probes at the wrong occupancy. Every store row
    * carries `v` (the self-contained-scan trade), so rebanding needs NO
    * corpus re-read: one pass re-signs the store's distinct vectors at
    * the new banding and the staged swap replaces rows AND the recorded
    * banding properties in the same table — unlike the IVF pair there
    * is no torn-state window at all (one table, one swap instant; the
    * banding props land on the staging table before the swap). User
    * properties (the streaming loop's batch marker) carry through.
    * Single-writer; probes may retry across the swap instant. Spec:
    * reband == fresh build at the new banding, bit-for-bit. */
  def reband(spark: SparkSession, table: String,
      tables: Int, bits: Int): Unit = {
    banding(spark, table) // refuse a table this object did not build
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val buckets = meta.bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$table carries no bucket spec — not built by AnnIndex.build"))
    val carried = meta.properties.filterNot { case (k, _) =>
      k.startsWith("spark.") || k.startsWith("transient_") ||
        k == "comment" || k == "owner"
    }
    // one row per vector: every vector owns a row in table 0; LIVE rows
    // only — a full rewrite re-signs the store's logical membership and
    // folds the pending tombstones (cleared after the swap)
    val vecs = Bucketing.liveRows(spark, table, "vec_id")
      .filter(col("tbl") === 0)
      .select("vec_id", "label", "v", "nrm")
    val resigned = Similarity.signatureRowsOf(vecs, tables, bits)
      .localCheckpoint(true)
    Bucketing.stagedSwapIn(spark, table, resigned, "sig", buckets,
      carried ++ Map("graft.lsh.tables" -> tables.toString,
        "graft.lsh.bits" -> bits.toString))
    Bucketing.clearTombstones(spark, table)
  }

  /** DELETE vectors from the store — the retroactive-removal verb
    * ([[graft.sources.Bucketing.deleteByKey]]'s contract: anti-join
    * staged rewrite, idempotent on absent ids, user properties — the
    * recorded banding, the streaming loop's batch marker — carried, swap-
    * instant reader outage). The signature-row layout keeps no derived
    * statistics, so the purge IS the whole operation: after the swap a
    * probe's candidate stream simply never collides with the removed
    * vectors, row-identical to a store rebuilt over the survivors
    * (DeleteSpec pins it). `vecIds` is any one-column frame of vec ids. */
  def delete(spark: SparkSession, table: String, vecIds: DataFrame): Unit = {
    banding(spark, table) // refuse a table this object did not build
    spark.catalog.refreshTable(table)
    Bucketing.deleteByKey(spark, table, "vec_id", vecIds)
  }

  /** DEFERRED delete — [[graft.sources.PostingsIndex.deleteDeferred]]'s
    * O(condemned) economics on the vector family: the condemned vec_ids
    * append to the tombstone side-table; probes subtract them as a
    * broadcast anti-join; the physical purge rides the next full
    * rewrite ([[graft.sources.Bucketing.compact]], eager [[delete]],
    * [[reband]], [[reindexVectors]]). No derived statistics here, so
    * the append IS the whole operation; probes after are row-identical
    * to the eager verb's (DeleteSpec). Idempotent: only ids with live
    * rows tombstone. */
  def deleteDeferred(spark: SparkSession, table: String,
      vecIds: DataFrame): Unit = {
    banding(spark, table) // refuse a table this object did not build
    spark.catalog.refreshTable(table)
    val ids = vecIds
      .select(vecIds(vecIds.columns.head).cast("long").as("vec_id"))
      .distinct().localCheckpoint(true)
    val doomed = Bucketing.liveRows(spark, table, "vec_id")
      .join(ids, Seq("vec_id"), "left_semi")
      .select("vec_id").distinct().localCheckpoint(true)
    if (!doomed.isEmpty)
      Bucketing.tombstone(spark, table, "vec_id", doomed)
  }

  /** UPSERT/re-crawl ([[graft.sources.PostingsIndex.reindex]]'s rule on
    * the vector family): the SAME vec_id arrives with a CHANGED
    * embedding (the source re-crawled and re-embedded) — the append
    * contract's disjoint-ids rule excludes it, and a caller-composed
    * delete+append pays two rewrites with a neither-version window. One
    * staged rewrite ([[Bucketing.upsertByKey]]): the batch re-signs at
    * the RECORDED banding, old signature rows for its ids drop, pending
    * tombstones fold. Probes after equal a fresh build over the updated
    * corpus (ReindexSpec). */
  def reindexVectors(table: String, embeddings: DataFrame): Unit = {
    val spark = embeddings.sparkSession
    val (tables, bits) = banding(spark, table)
    spark.catalog.refreshTable(table)
    val normed = Similarity.normedVectorsOf(spark, embeddings)
      .localCheckpoint(true)
    require(normed.groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "reindex batch carries duplicate vec_ids — one embedding per vector " +
        "is the re-crawl contract (dedupe the batch first)")
    Bucketing.upsertByKey(spark, table, "vec_id",
      Similarity.signatureRowsOf(normed, tables, bits),
      replacedKeys = Some(normed.select("vec_id")))
  }

  private def banding(spark: SparkSession, table: String): (Int, Int) = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (props.get("graft.lsh.tables"), props.get("graft.lsh.bits")) match {
      case (Some(t), Some(b)) => (t.toInt, b.toInt)
      case _ => throw new IllegalStateException(
        s"$table carries no graft.lsh.* banding properties — not built by AnnIndex.build")
    }
  }

  /** Incremental maintenance — the ingest path: compute signatures for a
    * NEW batch of vectors and append them honoring the table's bucket
    * spec (datasource bucketed tables bucket on insert, so probes keep
    * pruning over the union with no rebuild). The batch's (tables, bits)
    * are CHECKED against the build's recorded properties — signatures
    * from a different banding would silently never collide, a recall
    * loss with no error, so a mismatch fails here instead. Remaining
    * caller contract: the new vec_ids are disjoint from the indexed set
    * (the q81/q126 ingest gate runs upstream of indexing — pinned
    * end-to-end by IngestIndexSpec). insertInto is POSITIONAL; [[build]]
    * and this method both emit [[Similarity.signatureRows]]'s column
    * order. */
  def append(spark: SparkSession, dir: String, table: String,
      tables: Int = 4, bits: Int = 8): Unit =
    appendVectors(table, graft.Tables.embeddings(spark, dir), tables, bits)

  /** [[append]] over an (vec_id, label, embedding) FRAME — the form a
    * streaming vector-ingestion path uses (the PostingsIndex.appendDocs
    * twin): sign the batch with the table's banding and insert
    * bucketed. The session derives from the frame (the appendDocs
    * rule). Same banding require() and disjoint-ids contract as the
    * dir-based entry. */
  def appendVectors(table: String, embeddings: DataFrame,
      tables: Int = 4, bits: Int = 8): Unit = {
    val spark = embeddings.sparkSession
    val built = banding(spark, table)
    require(built == ((tables, bits)),
      s"$table was built at banding $built but append was asked for " +
        s"(${tables}, ${bits}) — mismatched signatures never collide")
    val buckets = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(throw new IllegalStateException(
        s"$table carries no bucket spec — not built by AnnIndex.build"))
    // bucket-aligned insert (the PostingsIndex.appendDocs rule): one
    // file per touched bucket per append, not tasks × buckets
    Similarity.signatureRowsOf(
        Similarity.normedVectorsOf(spark, embeddings), tables, bits)
      .repartition(buckets, col("sig"))
      .write.mode("append").insertInto(table)
  }

  /** Top-k nearest (exact re-rank over bucket-pruned candidates) for the
    * anchor set `vec_id < nAnchors` of the INDEXED corpus itself —
    * mirroring lshTopK's more-like-this anchor convention. SELF-PROBE
    * CONVENIENCE: deriving the anchors from the index means one
    * UN-pruned scan of the index (the table is bucketed by sig, so a
    * vec_id predicate prunes nothing) to fetch them before the pruned
    * candidate scan — fine for specs and more-like-this batch jobs,
    * wrong for a serving path. A point-query caller holds its anchor
    * signature rows already (the vector-DB-client model: a query carries
    * its own signatures) and calls [[topKFor]] directly, which scans the
    * index exactly once, pruned. */
  def topK(spark: SparkSession, table: String, nAnchors: Int,
      k: Int): DataFrame = {
    // refresh BEFORE resolving the anchor scan: topKFor's own refresh
    // runs after this spark.table call has captured a file listing, and
    // a stale anchor side against a fresh candidate side would make the
    // self-probe internally inconsistent under concurrent appends
    spark.catalog.refreshTable(table)
    // LIVE anchors only: a tombstoned vector must not probe on behalf
    // of the more-like-this batch (the candidate side subtracts in
    // probeCore; the anchor side subtracts here)
    topKFor(spark, table,
      Bucketing.liveRows(spark, table, "vec_id")
        .filter(col("vec_id") < nAnchors), k)
  }

  /** The serving-path probe: `anchors` are the query's OWN signature
    * rows in [[Similarity.signatureRows]] layout (vec_id, tbl, sig, v,
    * nrm) — one row per (query, table), computed at query time by the
    * caller ([[Similarity.signatureRowsOf]] over the query vectors),
    * never read from the index. The index is scanned ONCE, bucket-pruned
    * by the anchors' signature literals.
    * `signedAt` is the banding the caller signed `anchorRows` at (the
    * [[recordedBanding]] it read): when passed, the probe RE-CHECKS it
    * against the catalog after the anchor side executes — a [[reband]]
    * landing between the caller's banding read and the probe (the
    * signing job is seconds of Spark work — the live window) would make
    * the old-banding signatures collide with NOTHING, a silently-empty
    * result where the family's contract promises loud-retry (the
    * BandIndex.requireBandingStable rule on the serving path). The
    * residual window — a reband after this check, before the lazy scan
    * executes — fails LOUD by construction: the swap's DROP deletes the
    * old table's files, so a stale captured listing dies on read. */
  def topKFor(spark: SparkSession, table: String, anchorRows: DataFrame,
      k: Int, signedAt: Option[(Int, Int)] = None,
      sorted: Boolean = true): DataFrame =
    probeCore(spark, table, anchorRows, k, crossLabel = false, signedAt,
      sorted)

  /** The CROSS-LABEL serving probe — q125's hard-negative semantics
    * over the persisted store (the training-data shape: for each
    * anchor, the most-similar items under a DIFFERENT label are the
    * informative negatives — ANCE/DPR, public papers, q122's scaladoc).
    * Identical to [[topKFor]] except the label filter rides IN the
    * candidate join — same-label pairs die at the bucket probe before
    * any cosine, q125's rule, and the store ALREADY carries the label
    * on every signature row (build persists signatureRows whole) — and
    * both labels ride out so the pair table feeds a training loader
    * directly. `anchorRows` carry signatureRowsOf's full layout
    * (vec_id, label, tbl, sig, v, nrm); sign them at
    * [[recordedBanding]], never a hardcoded pair. */
  def hardNegativesFor(spark: SparkSession, table: String,
      anchorRows: DataFrame, k: Int,
      signedAt: Option[(Int, Int)] = None): DataFrame =
    probeCore(spark, table, anchorRows, k, crossLabel = true, signedAt)

  /** The ONE probe chain both serving entries share (refresh, anchor
    * checkpoint, driver sig collect, isin pruning, broadcast rendezvous,
    * pair dedup, rank) — the label predicate and its two output columns
    * are the only fork, so a fix to the shared contract (the refresh
    * rule, the dedup rule, the pruning predicate) can never apply to
    * one entry and silently miss the other.
    *
    * Broadcast shape (round-18 advice applied): the rendezvous
    * broadcasts only the SLIM probe keys (query_id[, label], tbl, sig)
    * — a multi-probe-expanded anchor set carries (bits+1) rows per
    * (query, table), and shipping qv/qnrm on every expanded row grew
    * the broadcast and the driver collect ~9× at 4×8 banding for a
    * payload that is identical across a query's rows. The query payload
    * joins back as ONE broadcast row per query (no exchange); the
    * neighbor payload still rides the index scan row (the
    * self-contained-single-scan trade); and the pair dedup stays the
    * narrow groupBy/max — keys plus one cosine double through the
    * exchange with map-side partial max, never the 64-double vector per
    * colliding row. Same fold on the same vectors → identical values,
    * identical tie rule → every output bit-equal to the pre-slim
    * spelling. */
  private def probeCore(spark: SparkSession, table: String,
      anchorRows: DataFrame, k: Int, crossLabel: Boolean,
      signedAt: Option[(Int, Int)] = None,
      sorted: Boolean = true): DataFrame = {
    // read-your-committed-appends: a writer in another session (the
    // streaming ingestion pattern) cannot invalidate this session's
    // cached file listing — refresh before probing (PostingsIndex rule)
    spark.catalog.refreshTable(table)
    // materialize the anchor rows ONCE (they are query-scale by the
    // q122/q125 contract): the consumers below — the driver-side
    // signature collect, the slim broadcast, the payload broadcast —
    // would otherwise re-execute the caller's whole anchor pipeline
    // (topK's index scan, or a client's read→norm→sign chain)
    val anchors = anchorRows
      .select(Seq(col("vec_id").as("query_id")) ++
        (if (crossLabel) Seq(col("label").as("query_label")) else Nil) ++
        Seq(col("tbl").as("qtbl"), col("sig").as("qsig"),
          col("v").as("qv"), col("nrm").as("qnrm")): _*)
      .localCheckpoint(true)
    // SINGLE-PARTITION anchor derivations (round 21, guide §2.4): the
    // slim-key distinct, the payload dedup and the driver signature
    // collect each planned their own 32-partition hash exchange over a
    // frame that is query-scale by contract — three shuffles (and
    // 3 × cpus scheduled tasks) whose only job was deduplicating a few
    // hundred rows. coalesce(1) over the checkpointed anchor RDD is a
    // narrow merge, and a one-partition child satisfies every clustering
    // requirement, so all three aggregations now plan exchange-FREE.
    // Same rows either way (distinct/dropDuplicates semantics are
    // partitioning-independent; payload rows are identical per query by
    // construction, so any representative is the same value).
    val one = anchors.coalesce(1)
    val slim = one
      .select(Seq(col("query_id")) ++
        (if (crossLabel) Seq(col("query_label")) else Nil) ++
        Seq(col("qtbl"), col("qsig")): _*)
      .distinct()
    val payload = one.select("query_id", "qv", "qnrm")
      .dropDuplicates("query_id")
    // anchor signatures collect to the driver for the pruning predicate
    val probeSigs = slim.select("qsig").distinct()
      .collect().map(_.getString(0)).toSeq
    // the anchor side has EXECUTED (checkpoint + collect above) — the
    // caller's signing pipeline included. Refuse a reband that landed
    // since the caller read the banding it signed at: the old-banding
    // signatures would collide with nothing (silent-empty, where the
    // contract promises loud-retry). The residual window past this
    // check fails loud on its own (the swap deletes the old files).
    signedAt.foreach { sa =>
      val now = banding(spark, table)
      if (now != sa)
        throw new IllegalStateException(
          s"$table was rebanded mid-probe ($sa -> $now) — the anchors " +
            "signed at the old banding and their collisions are void; " +
            "retry the probe (sign at the new recordedBanding)")
    }
    val baseCond = col("tbl") === col("qtbl") && col("sig") === col("qsig") &&
      col("vec_id") =!= col("query_id")
    val cond =
      if (crossLabel) baseCond && col("label") =!= col("query_label")
      else baseCond
    val outKeys =
      if (crossLabel) Seq(col("query_id"), col("query_label"),
        col("vec_id").as("neighbor_id"), col("label").as("neighbor_label"))
      else Seq(col("query_id"), col("vec_id").as("neighbor_id"))
    val keyNames =
      if (crossLabel)
        Seq("query_id", "query_label", "neighbor_id", "neighbor_label")
      else Seq("query_id", "neighbor_id")
    // ONE index scan: bucket-pruned by the literal signature set, hash-
    // probed against the broadcast slim keys on the (tbl, sig)
    // rendezvous; the query payload joins back BROADCAST (no exchange)
    // and the cosine computes BEFORE the pair dedup, so the dedup
    // exchange carries the pair keys plus ONE double with a map-side
    // partial max — not the 64-double neighbor vector per colliding row
    // (the dropDuplicates first spelling shuffled ~30× the bytes on the
    // probe hot path, and multi-probe multiplies collisions). Colliding
    // (query, neighbor) pairs from multiple tables/probes carry the
    // identical cosine; max() is the deterministic dedup.
    val cos = Similarity.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    Bucketing.subtractTombstones(spark, table, "vec_id",
        spark.table(table)
          .filter(col("sig").isin(probeSigs: _*))) // bucket pruning HERE
      .join(broadcast(slim), cond)
      .select(outKeys :+ col("v") :+ col("nrm"): _*)
      .join(broadcast(payload), Seq("query_id"))
      .select(keyNames.map(col) :+ cos.as("cosine"): _*)
      // ONE exchange for the dedup+rank tail (round-20, guide §2.4):
      // query_id-only hash partitioning satisfies both the pair-dedup
      // groupBy's clustering and the rank window's, replacing the two
      // planner exchanges with one; explicit count pins it against AQE
      // byte-coalescing. Anchor sets are query-scale by contract, and
      // the window already required a query's rows co-located.
      .repartition(spark.sparkContext.defaultParallelism, col("query_id"))
      .groupBy(keyNames.map(col): _*)
      .agg(max("cosine").as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // `sorted = false` (round 21, guide §2.4): a COMPOSING caller —
      // q136's RRF fusion, which unions this frame and re-aggregates by
      // query_id — pays a full range-partitioning Sort exchange here for
      // an order the union immediately destroys. Registered probe rows
      // (q135/q146/q147) keep the sorted output; same rows either way.
      .transform(df => if (sorted) df.orderBy("query_id", "rank") else df)
  }
}
