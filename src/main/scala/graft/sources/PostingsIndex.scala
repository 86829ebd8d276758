package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Retrieval

/** PERSISTED LEXICAL (postings) index — the BM25 twin of [[AnnIndex]],
  * closing the engine's build-once/probe-many symmetry: the recompute
  * path (Retrieval.bm25RankedWhere) re-derives the postings slice
  * (tokenize → explode → aggregate → checkpoint, the measured ~1.5 s
  * fixed cost of every q127/q133 run — Retrieval.scala's barrier note)
  * on EVERY query, which is the wrong shape for recurring retrieval
  * against a growing corpus (q133's production decontam: fixed
  * benchmark, new crawl every day). [[build]] pays the full tokenize +
  * (term, doc) aggregation ONCE and persists (term, doc_id, dl, tf)
  * BUCKETED BY `term`; [[topKFor]] probes it with the query vocabulary
  * as literals, so Spark's bucket pruning skips every bucket holding no
  * query term — the scan reads `SelectedBucketsCount: k out of N`
  * (plan-visible, spec-pinned), never the corpus.
  *
  * Layout choices, stated: (a) `term` is the bucket key — the probe
  * predicate is a single-key `isin` over the query vocabulary, the same
  * pruning contract as AnnIndex's `sig`. Term frequency is Zipf-skewed,
  * so buckets are UNEVEN (the head term's bucket is hot); that skews
  * probe I/O, not correctness, and the scale lever is the bucket count
  * (hash spreads head terms across more, smaller buckets) — pruning
  * effectiveness depends on |query vocab| / |buckets hit|, not bucket
  * uniformity. (b) `dl` rides every posting row (×terms-per-doc
  * storage) so scoring reads no second document-length table — the same
  * self-contained-single-scan trade AnnIndex makes storing v/nrm per
  * signature row. (c) Collection stats (n_docs, sum_dl) are TABLE
  * PROPERTIES — they are metadata-class one-row aggregates in the
  * recompute plan, and the catalog is exactly where a production engine
  * keeps them; [[append]] updates them transactionally with the rows it
  * inserts, which is what keeps append≡rebuild bit-exact. (d) Per-term
  * DOCUMENT FREQUENCY persists as a COMPANION table `<table>_df`
  * (term, df), bucketed by term like the postings — the stats-fold
  * pattern applied to the one collection statistic a probe otherwise
  * recomputes from the slice on every query. It cannot be a property
  * (it is vocabulary-sized, not one row), so the fold is realized as
  * APPEND-ONLY DELTAS: [[build]] writes one total row per term,
  * [[appendDocs]] appends the batch's per-term counts, and the probe
  * sums the pruned delta rows — exact integer arithmetic, so the fold
  * commutes with the rebuild ([[compact]] collapses the deltas back to
  * one row per term when maintenance runs).
  *
  * Scoring parity: the probe feeds the pruned slice into the SAME
  * scoring tail as the recompute path ([[Retrieval.scoreTail]]: idf
  * from the handed-in df frame via DetMath on the per-term frame,
  * once-per-posting contribution, ordered fold, top-k) — identical IEEE
  * arithmetic on identical inputs (df is the same integer whether
  * summed from deltas or counted from the slice), so [[topKFor]] output
  * is spec-pinned EQUAL to `bm25RankedWhere` at the same corpus
  * (PostingsIndexSpec, the AnnIndexSpec parity pattern), and q134 runs
  * it against q133's own DuckDB oracle.
  */
object PostingsIndex {

  private val NDocsProp = "graft.bm25.n_docs"
  private val SumDlProp = "graft.bm25.sum_dl"

  /** The df companion's name — derived, never chosen: every build/append/
    * compact/refresh path addresses the pair through this one rule. */
  private[sources] def dfTableOf(table: String): String = s"${table}_df"

  /** Tokenize the corpus docs of `dir` (restricted to `corpusPred`),
    * aggregate (term, doc_id, dl, tf), persist bucketed by `term`, write
    * the (term, df) companion, and record the collection stats as table
    * properties. One full-corpus shuffle on the term key — the one-time
    * cost every later probe amortizes; the df companion derives from the
    * just-written postings table (a narrow re-read of the compact index,
    * not a second tokenize). */
  def build(spark: SparkSession, dir: String, table: String,
      corpusPred: Column = lit(true), buckets: Int = 64): Unit = {
    val toks = Retrieval.tokenizedDocs(spark, dir).filter(corpusPred)
    Bucketing.writeBucketed(postingsOf(toks), table, "term", buckets)
    Bucketing.writeBucketed(dfOf(spark.table(table)),
      dfTableOf(table), "term", buckets)
    writeStats(spark, table, collectionStats(toks))
  }

  /** Incremental maintenance — the ingest path: tokenize a NEW batch of
    * documents ONCE (the batch's token arrays checkpoint so the insert
    * and the stats aggregate share one scan — batches are epoch-sized,
    * so materializing them is cheap, unlike [[build]]'s corpus where the
    * two-pass C4 rule applies), append their postings honoring the
    * table's bucket spec (datasource bucketed tables bucket on insert,
    * so probes keep pruning over the union with no rebuild), append the
    * batch's per-term df DELTAS to the companion, and FOLD the batch's
    * (n_docs, sum_dl) into the recorded collection stats — stale stats
    * would silently mis-weight every idf/avgdl, so the stats update
    * rides in the same driver call as the insert, not a caller chore.
    * Honesty about the failure window: the two inserts and the property
    * write are three catalog operations, not one transaction — a crash
    * between them leaves the new rows in with old stats/df, and
    * concurrent appends can lose a fold (last property write wins).
    * Appends are SINGLE-WRITER by contract, like the bucketed table
    * itself; after a suspected partial append, [[refreshStats]]
    * recomputes the properties AND the df companion from the postings
    * table. Caller contract: the new doc_ids are disjoint from the
    * indexed set (the q81/q126 ingest gate runs upstream — pinned
    * end-to-end by IngestIndexSpec). insertInto is POSITIONAL; build and
    * append both emit [[postingsOf]]'s column order. */
  def append(spark: SparkSession, dir: String, table: String,
      pred: Column = lit(true)): Unit =
    appendDocs(table,
      graft.Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .filter(pred).select(col("doc_id"), col("text")))

  /** [[append]] over a (doc_id, text) FRAME — the form the streaming
    * ingestion path uses (CurationChain.curatedIndexed appends each
    * micro-batch's kept documents). The session derives from the frame
    * (a split insert-session/stats-session would only be correct by the
    * accident of a shared catalog). Same single-tokenize-pass shape,
    * the same [[Retrieval.tokenizedDocsOf]] tokenizer as build, and the
    * same stats fold / single-writer contract as the dir-based entry.
    * The batch's postings checkpoint once and feed BOTH inserts — the
    * df delta is a groupBy over rows already materialized, never a
    * second tokenize. Both inserts are REPARTITIONED TO THE BUCKET
    * LAYOUT first (numBuckets partitions on the bucket key —
    * repartition's Murmur3 pmod IS the bucketing hash, the
    * Bucketing.compact trick applied at insert time): a bucketed insert
    * writes one file per (task, bucket) pair, so an unaligned
    * batch fragments at tasks × buckets per append — measured 841
    * files/epoch vs ~110 aligned on the 20-epoch stream probe
    * (SCALING.md round 18), a 13× slower small-files accumulation for
    * one batch-sized shuffle. */
  def appendDocs(table: String, docs: DataFrame,
      committedBatch: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    val buckets = bucketCount(spark, table)
    val toks = Retrieval.tokenizedDocsOf(docs).localCheckpoint(true)
    val post = postingsOf(toks).localCheckpoint(true)
    post.repartition(buckets, col("term"))
      .write.mode("append").insertInto(table)
    dfOf(post).repartition(buckets, col("term"))
      .write.mode("append").insertInto(dfTableOf(table))
    val (n0, s0) = stats(spark, table)
    val (n1, s1) = collectionStats(toks)
    // the streaming loop's idempotence marker rides in the SAME property
    // statement as the stats fold — one catalog commit for both, so the
    // marker can never say "committed" while the stats say otherwise
    writeStats(spark, table, (n0 + n1, s0 + s1),
      committedBatch.map(Bucketing.batchMarkerClause).getOrElse(""))
  }

  /** Recompute (n_docs, sum_dl) FROM the postings table, rewrite the
    * properties, and REBUILD the df companion — the recovery path for an
    * interrupted [[appendDocs]] (any of its three catalog operations may
    * have committed without the rest). Exact because every document owns
    * ≥ 1 posting row — [[Retrieval.tokenizedDocsOf]] coalesces null text
    * to "" and Spark's split("", " ") yields [""], so the invariant
    * holds by construction — and dl is constant across a doc's rows. */
  def refreshStats(spark: SparkSession, table: String): Unit = {
    // LIVE rows only: a recompute that restated tombstoned docs' stats
    // would undo their deferred delete's fold — the recovery path must
    // agree with what probes serve
    val live = Bucketing.liveRows(spark, table, "doc_id")
      .localCheckpoint(true)
    val r = live
      .groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    writeStats(spark, table, (r.getLong(0), r.getLong(1)))
    Bucketing.writeBucketed(dfOf(live), dfTableOf(table),
      "term", bucketCount(spark, table))
  }

  /** DELETE documents from the index pair — the retroactive-removal verb
    * the recurring sweeps imply: q133/q134's decontam names contaminated
    * doc_ids, q140/q141's dedup names near-dup losers, and the ingest
    * gate can only refuse NEW arrivals — purging docs already indexed
    * took a full rebuild until this. Mechanics: the doomed rows read
    * FROM THE STORE first (so deleting absent or already-deleted ids is
    * a no-op by construction — the sweep re-feeds its whole condemned
    * set without tracking prior runs), then three operations in the
    * order that keeps the failure windows benign:
    *   1. the postings purge ([[Bucketing.deleteByKey]] — anti-join
    *      staged rewrite; the correctness-critical step: at the swap
    *      instant deleted docs stop being served, unconditionally);
    *   2. NEGATIVE df deltas appended to the companion — the append-only
    *      delta design's payoff: a delete is O(deleted vocabulary) rows,
    *      never a companion rewrite; probe sums stay exact integers
    *      (totals + positive deltas − negative deltas = survivor df,
    *      the arithmetic DeleteSpec pins against a rebuild);
    *   3. (n_docs, sum_dl) folded DOWN in the property statement.
    * A crash between 1 and 3 leaves stats/df overstated — probes score
    * with slightly-damped idf until [[refreshStats]] recovers, but no
    * deleted document is ever served (the window's one invariant, and
    * why the purge goes first). Single-writer like every maintenance
    * path; probes may retry across the swap instant. `docIds` is any
    * one-column frame of doc ids. */
  def delete(spark: SparkSession, table: String, docIds: DataFrame): Unit = {
    val doomed = doomedSlice(spark, table, docIds)
    val (nDel, sDel, ids) = doomedStats(doomed)
    if (nDel > 0L) {
      Bucketing.deleteByKey(spark, table, "doc_id", ids)
      foldDown(spark, table, doomed, nDel, sDel)
    }
  }

  /** DEFERRED delete — the O(condemned) verb for the frequent-delete
    * deployment (a recurring decontam sweep whose verdict set is tiny
    * against the store): where [[delete]] pays the compaction-class
    * full rewrite per purge batch, this appends the condemned doc ids
    * to the store's tombstone side-table ([[Bucketing.tombstone]]) and
    * lets every probe subtract them as a broadcast anti-join — probe
    * results are BIT-EQUAL to the eager verb's (DeleteSpec pins deferred
    * ≡ eager ≡ rebuild-over-survivors), because the derived state folds
    * identically at delete time: negative df deltas append
    * (O(deleted vocabulary)) and (n_docs, sum_dl) fold down, exactly
    * [[delete]]'s steps 2–3 — only the physical purge (step 1) defers to
    * the maintenance cadence ([[compact]] and every full rewrite fold
    * the tombstones and drop the side-table). Idempotent like the eager
    * verb: the doomed slice reads LIVE rows only, so a re-fed condemned
    * set finds nothing to fold. Crash windows mirror eager's: the
    * tombstone append is the commit point (no deleted doc served past
    * it); a crash before the deltas/stats leaves them overstated —
    * damped idf, never inverting, recovered by [[refreshStats]]. */
  def deleteDeferred(spark: SparkSession, table: String,
      docIds: DataFrame): Unit = {
    val doomed = doomedSlice(spark, table, docIds)
    val (nDel, sDel, _) = doomedStats(doomed)
    if (nDel > 0L) {
      Bucketing.tombstone(spark, table, "doc_id",
        doomed.select("doc_id").distinct())
      foldDown(spark, table, doomed, nDel, sDel)
    }
  }

  /** UPSERT/re-crawl — the production event the append contract's
    * disjoint-ids rule excludes: the SAME doc_id arrives with CHANGED
    * text (a re-crawl), and appending without deleting first would leave
    * the old text's postings silently coexisting with the new (double
    * df, phantom matches). One composed operation per store pair, never
    * a caller-composed delete+append (two rewrites, plus a window where
    * neither version serves): the postings swap is ONE staged rewrite
    * ([[Bucketing.upsertByKey]]: survivors minus re-crawled ids, plus
    * the fresh batch's rows, pending tombstones folded — a re-crawled
    * id that was tombstoned is alive again with the new content), the
    * df companion gets the old rows' negative deltas and the new rows'
    * positive deltas in one append, and the stats fold both directions.
    * Brand-new doc_ids ride along (they replace nothing). Probes after
    * equal a fresh build over the UPDATED corpus (ReindexSpec). Crash
    * windows: the swap is the commit point (old text never served past
    * it); deltas/stats lag a crash like delete's, recovered by
    * [[refreshStats]]. Single-writer like every maintenance path. */
  def reindex(spark: SparkSession, table: String, docs: DataFrame): Unit = {
    val batch = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"))
    require(batch.groupBy("doc_id").count().filter(col("count") > 1).isEmpty,
      "reindex batch carries duplicate doc_ids — one text per doc is the " +
        "re-crawl contract (dedupe the batch first)")
    val doomed = doomedSlice(spark, table, batch.select("doc_id"))
    val (nDel, sDel, _) = doomedStats(doomed)
    val toks = Retrieval.tokenizedDocsOf(batch).localCheckpoint(true)
    val post = postingsOf(toks).localCheckpoint(true)
    val (nNew, sNew) = collectionStats(toks)
    val buckets = bucketCount(spark, table)
    Bucketing.upsertByKey(spark, table, "doc_id", post)
    doomed.groupBy("term").agg((-count(lit(1))).as("df"))
      .unionByName(dfOf(post))
      .groupBy("term").agg(sum(col("df")).as("df"))
      .filter(col("df") =!= 0L)
      .repartition(buckets, col("term"))
      .write.mode("append").insertInto(dfTableOf(table))
    val (n0, s0) = stats(spark, table)
    writeStats(spark, table, (n0 - nDel + nNew, s0 - sDel + sNew))
  }

  /** The LIVE doomed slice for a condemned id frame: rows the store
    * still serves for those ids — already-tombstoned (or never-indexed,
    * or eagerly-purged) ids contribute nothing, which is what makes
    * every delete verb idempotent AND keeps the two verbs composable
    * (a deferred delete followed by an eager re-feed of the same set
    * must not fold the stats twice). Materialized BEFORE any purge or
    * tombstone lands: it feeds the stats decrement and the negative df
    * deltas, and after the verb commits the rows it aggregates are no
    * longer visible. */
  private def doomedSlice(spark: SparkSession, table: String,
      docIds: DataFrame): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(dfTableOf(table))
    stats(spark, table) // refuse a table this object did not build
    val ids = docIds
      .select(docIds(docIds.columns.head).cast("long").as("doc_id"))
      .distinct().localCheckpoint(true)
    Bucketing.liveRows(spark, table, "doc_id")
      .join(ids, Seq("doc_id"), "left_semi").localCheckpoint(true)
  }

  private def doomedStats(doomed: DataFrame): (Long, Long, DataFrame) = {
    val st = doomed.groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    (st.getLong(0), st.getLong(1), doomed.select("doc_id").distinct())
  }

  /** Steps 2–3 of both delete verbs: the batch's negative df deltas
    * append to the companion and (n_docs, sum_dl) fold down. */
  private def foldDown(spark: SparkSession, table: String,
      doomed: DataFrame, nDel: Long, sDel: Long): Unit = {
    doomed.groupBy("term").agg((-count(lit(1))).as("df"))
      .repartition(bucketCount(spark, table), col("term"))
      .write.mode("append").insertInto(dfTableOf(table))
    val (n0, s0) = stats(spark, table)
    writeStats(spark, table, (n0 - nDel, s0 - sDel))
  }

  /** Compact the index pair — [[Bucketing.compact]] on the postings
    * (one file per bucket, properties carried, staged swap) plus the
    * df-specific MERGE: the companion's append-only deltas collapse
    * back to one total row per term (sum is the fold the probe would
    * otherwise realize per query), staged and swapped the same way.
    * Probes before and after are row-identical (CompactionSpec);
    * single-writer, with each table's reader outage confined to its own
    * two-metadata-op swap instant, per [[Bucketing.compact]]'s
    * contract. */
  def compact(spark: SparkSession, table: String): Unit = {
    Bucketing.compact(spark, table)
    val dfTable = dfTableOf(table)
    // terms whose deltas sum to zero (every holder deleted) drop out —
    // a rebuild over the survivors would have no row for them either,
    // so compact-after-delete stays row-identical to that rebuild
    val merged = spark.table(dfTable)
      .groupBy("term").agg(sum(col("df")).as("df"))
      .filter(col("df") =!= 0L)
      .localCheckpoint(true)
    Bucketing.stagedSwapIn(spark, dfTable, merged, "term",
      bucketCount(spark, table), Map.empty)
  }

  private def bucketCount(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(throw new IllegalStateException(
        s"$table carries no bucket spec — not built by PostingsIndex.build"))

  /** (term, doc_id, dl, tf) for a tokenized (doc_id, toks) frame — the
    * index's row shape, identical to the recompute path's postings slice
    * modulo column order (term leads because it is the bucket key). */
  private def postingsOf(toks: DataFrame): DataFrame =
    toks
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .select("term", "doc_id", "dl", "tf")

  /** Per-term document frequency of a postings frame — one row per
    * (term, doc), so a plain count per term IS df. */
  private def dfOf(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  private def collectionStats(toks: DataFrame): (Long, Long) = {
    val r = toks.agg(
      count(lit(1)), coalesce(sum(size(col("toks"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def writeStats(spark: SparkSession, table: String,
      ns: (Long, Long), extraProps: String = ""): Unit =
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
      s"'$NDocsProp' = '${ns._1}', '$SumDlProp' = '${ns._2}'$extraProps)")

  /** Build-once memo for dir-derived indexes — the deployment shape the
    * registered q134 runs through: the first call for a (tag, dir) pair
    * builds the index, every later call (bench passes, repeated probes)
    * returns the table name for free. Keyed on the corpus dir's
    * file-listing signature so an in-process rewrite rebuilds instead of
    * probing a stale index (the corpusCount memo's rule), with `buckets`
    * AND a fingerprint of `corpusPred`'s structural rendering folded
    * into the key and table name ([[IndexMemo]]) — two callers reusing a
    * tag with DIFFERENT predicates on the same dir resolve to different
    * tables instead of silently sharing the first predicate's index (the
    * silent-wrong-result class the banding require() closes on the ANN
    * side). The rendering is Column#toString — deterministic for a given
    * expression tree; `tag` remains part of the identity for callers
    * whose predicates render equal but mean different things (none in
    * the engine today). */
  def ensureFor(spark: SparkSession, dir: String, tag: String,
      corpusPred: Column = lit(true), buckets: Int = 64,
      afterBuild: String => Unit = _ => ()): String = {
    val predFp = java.security.MessageDigest.getInstance("MD5")
      .digest(corpusPred.toString().getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    // `afterBuild` runs INSIDE the memoized build (once per (key,
    // listing)): the hook is for maintenance that is part of the index's
    // identity — q148 derives a condemned set from the fresh index and
    // [[delete]]s it, so every later ensure call probes the post-purge
    // store, never re-deriving verdicts against an already-purged one.
    // The tag distinguishes hooked from plain builds; callers reusing a
    // tag with a different hook own that contract (the tag rule).
    IndexMemo.ensure(s"postings|$tag|$predFp|$dir|$buckets",
      graft.Tables.listingSignature(dir, "documents"), s"postings_$tag")(
      t => { build(spark, dir, t, corpusPred, buckets); afterBuild(t) })
  }

  /** The recorded collection stats (n_docs, sum_dl). */
  def stats(spark: SparkSession, table: String): (Long, Long) = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (props.get(NDocsProp), props.get(SumDlProp)) match {
      case (Some(n), Some(s)) => (n.toLong, s.toLong)
      case _ => throw new IllegalStateException(
        s"$table carries no graft.bm25.* stats properties — not built by PostingsIndex.build")
    }
  }

  /** BM25 top-k for `queryDocs` = (query_id, text) against the indexed
    * collection. The store reads are SIZE-ROUTED per
    * [[Bucketing.PruneLiteralLimit]]: a point-query-scale vocabulary
    * collects to the driver as the bucket-pruning `isin` literal
    * (`SelectedBucketsCount`, spec-pinned); a benchmark-sweep-scale
    * vocabulary restricts both reads by a BROADCAST VOCAB SEMI-JOIN
    * instead — the q127 below-the-aggregation rule, same restriction
    * with no giant plan literal and no driver collect (the literal
    * stopped skipping buckets at that size anyway; measured in
    * SCALING.md round 18). Either way the probe pays ONE
    * vocabulary-restricted postings read (the scoring join) plus a
    * vocabulary-sized read of the (term, df) deltas —
    * [[Retrieval.scoreTail]]'s handed-in df form. No localCheckpoint
    * barrier: the recompute path's barrier guards an expensive
    * tokenize→explode→aggregate prefix this probe no longer has, and
    * skipping it keeps the pruned route plan-visible and the block
    * store untouched. Self-matches are excluded by doc_id, matching the
    * recompute path. */
  def topKFor(spark: SparkSession, table: String, queryDocs: DataFrame,
      k: Int): DataFrame = {
    // a probe against a GROWING index must see committed appends: writers
    // may run in another session (the streaming ingestion path's cloned
    // micro-batch session), whose inserts cannot invalidate THIS
    // session's cached file listing for the table — refresh is the
    // read-your-committed-appends contract, and costs one listing per
    // table of the pair
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(dfTableOf(table))
    val qterms = queryDocs
      .select(col("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    val qvocab = qterms.select("term").distinct().localCheckpoint(true)
    // ONE job decides the route AND fetches the literals (round 21,
    // guide §5): collecting limit+1 rows subsumes the old count()-then-
    // collect() pair — the sample exceeds the limit exactly when the
    // count does, and under the limit the sample IS the whole
    // vocabulary. Driver payload stays capped at limit+1 terms on the
    // over-limit route (the old spelling's count was free but its
    // under-limit collect was the same full vocabulary).
    val sample = qvocab.limit(Bucketing.PruneLiteralLimit + 1).collect()
    val lits =
      if (sample.length <= Bucketing.PruneLiteralLimit)
        Some(sample.map(_.getString(0)).toSeq)
      else None
    def restricted(t: String): DataFrame = lits match {
      case Some(ts) =>
        spark.table(t).filter(col("term").isin(ts: _*)) // bucket pruning
      case None => spark.table(t).join(broadcast(qvocab), Seq("term"))
    }
    // the DEFERRED-delete subtraction: pending tombstones anti-join the
    // pruned slice (broadcast — condemned sets are verdict-scale), so a
    // deferred-deleted doc stops being served the instant its tombstone
    // lands, with df/stats already folded down at delete time — the
    // probe arithmetic is bit-equal to the eager verb's. With nothing
    // pending this is the plain pruned scan (one driver-side catalog
    // lookup, no job).
    val slice0 = restricted(table).select("doc_id", "dl", "term", "tf")
    val slice = Bucketing.pendingTombstones(spark, table) match {
      case Some(tomb) =>
        slice0.join(broadcast(tomb), Seq("doc_id"), "left_anti")
          .select("doc_id", "dl", "term", "tf")
      case None => slice0
    }
    // the companion's delta rows fold here — exact integer sum, the same
    // df the recompute path counts from its slice
    val dfreq = restricted(dfTableOf(table))
      .groupBy("term").agg(sum(col("df")).as("df"))
    // READ-COMMITTED over the three-operation append: the stats property
    // statement is an append's COMMIT POINT (appendDocs's contract — the
    // marker rides in it), so rows visible while the recorded n_docs is
    // still 0 belong to an in-flight append. Serve the committed-empty
    // result and read NO slice rows, rather than evaluate idf/avgdl at
    // n_docs = 0 (ANSI DIVIDE_BY_ZERO — found by SoakProbe's first run,
    // where the serving thread raced the stream's first batch). Past the
    // first commit the residual mid-append window is BENIGN-BUT-STATED-
    // FULLY: a probe may transiently score a later batch's already-
    // inserted postings under the previous commit's stats — a bounded
    // idf/avgdl deviation, and in the worst case (a term held by more
    // in-flight docs than the recorded n_docs admits) the Lucene idf's
    // (n_docs − df + ½)/(df + ½) term can go NEGATIVE, which is not just
    // a score shift but a possible transient RANKING INVERSION for that
    // term's matches (round-18 advice, now stated). It disappears when
    // the append's property statement lands, never crashes, and never
    // misses a committed document; deployments for which a transient
    // inversion matters gate probes on the batch marker (probe only
    // between batches — the SoakProbe serving pattern) rather than
    // paying a per-row batch column on every posting. The mirror-image
    // DELETE window (purged rows with stats not yet folded down) only
    // DAMPS idf — df never exceeds n_docs there — so it cannot invert.
    val (n, s) = stats(spark, table)
    val committed = n > 0
    val statsDf = spark.range(1)
      .select(lit(if (committed) n else 1L).as("n_docs"),
        lit(if (committed) s else 1L).as("sum_dl"))
    Retrieval.scoreTail(qterms,
      if (committed) slice else slice.limit(0),
      if (committed) dfreq else dfreq.limit(0), statsDf, k)
  }
}
