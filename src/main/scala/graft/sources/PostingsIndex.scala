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
  * inserts, which is what keeps append≡rebuild bit-exact.
  *
  * Scoring parity: the probe feeds the pruned slice into the SAME
  * scoring tail as the recompute path ([[Retrieval.scoreTail]]: df over
  * the slice, DetMath idf on the per-term frame, once-per-posting
  * contribution, ordered fold, top-k) — identical IEEE arithmetic on
  * identical inputs, so [[topKFor]] output is spec-pinned EQUAL to
  * `bm25RankedWhere` at the same corpus (PostingsIndexSpec, the
  * AnnIndexSpec parity pattern), and q134 runs it against q133's own
  * DuckDB oracle.
  */
object PostingsIndex {

  private val NDocsProp = "graft.bm25.n_docs"
  private val SumDlProp = "graft.bm25.sum_dl"

  /** Tokenize the corpus docs of `dir` (restricted to `corpusPred`),
    * aggregate (term, doc_id, dl, tf), persist bucketed by `term`, and
    * record the collection stats as table properties. One full-corpus
    * shuffle on the term key — the one-time cost every later probe
    * amortizes. */
  def build(spark: SparkSession, dir: String, table: String,
      corpusPred: Column = lit(true), buckets: Int = 64): Unit = {
    val toks = Retrieval.tokenizedDocs(spark, dir).filter(corpusPred)
    Bucketing.writeBucketed(postingsOf(toks), table, "term", buckets)
    writeStats(spark, table, collectionStats(toks))
  }

  /** Incremental maintenance — the ingest path: tokenize a NEW batch of
    * documents ONCE (the batch's token arrays checkpoint so the insert
    * and the stats aggregate share one scan — batches are epoch-sized,
    * so materializing them is cheap, unlike [[build]]'s corpus where the
    * two-pass C4 rule applies), append their postings honoring the
    * table's bucket spec (datasource bucketed tables bucket on insert,
    * so probes keep pruning over the union with no rebuild), and FOLD
    * the batch's (n_docs, sum_dl) into the recorded collection stats —
    * stale stats would silently mis-weight every idf/avgdl, so the
    * stats update rides in the same driver call as the insert, not a
    * caller chore. Honesty about the failure window: the insert and the
    * property write are two catalog operations, not one transaction — a
    * crash between them leaves the new rows in with old stats, and
    * concurrent appends can lose a fold (last property write wins).
    * Appends are SINGLE-WRITER by contract, like the bucketed table
    * itself; after a suspected partial append, [[refreshStats]]
    * recomputes the properties from the table in one scan. Caller
    * contract: the new doc_ids are disjoint from the indexed set (the
    * q81/q126 ingest gate runs upstream — pinned end-to-end by
    * IngestIndexSpec). insertInto is POSITIONAL; build and append both
    * emit [[postingsOf]]'s column order. */
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
    * same stats fold / single-writer contract as the dir-based entry. */
  def appendDocs(table: String, docs: DataFrame): Unit = {
    val spark = docs.sparkSession
    val toks = Retrieval.tokenizedDocsOf(docs).localCheckpoint(true)
    postingsOf(toks).write.mode("append").insertInto(table)
    val (n0, s0) = stats(spark, table)
    val (n1, s1) = collectionStats(toks)
    writeStats(spark, table, (n0 + n1, s0 + s1))
  }

  /** Recompute (n_docs, sum_dl) FROM the postings table and rewrite the
    * properties — the recovery path for an interrupted [[append]].
    * Exact because every document owns ≥ 1 posting row (Spark's
    * split("", " ") yields [""], so even an empty text emits one term)
    * and dl is constant across a doc's rows. */
  def refreshStats(spark: SparkSession, table: String): Unit = {
    val r = spark.table(table)
      .groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    writeStats(spark, table, (r.getLong(0), r.getLong(1)))
  }

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

  private def collectionStats(toks: DataFrame): (Long, Long) = {
    val r = toks.agg(
      count(lit(1)), coalesce(sum(size(col("toks"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def writeStats(spark: SparkSession, table: String,
      ns: (Long, Long)): Unit =
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
      s"'$NDocsProp' = '${ns._1}', '$SumDlProp' = '${ns._2}')")

  /** Build-once memo for dir-derived indexes — the deployment shape the
    * registered q134 runs through: the first call for a (tag, dir) pair
    * builds the index, every later call (bench passes, repeated probes)
    * returns the table name for free. Keyed on the corpus dir's
    * file-listing signature so an in-process rewrite rebuilds instead of
    * probing a stale index (the corpusCount memo's rule), with `buckets`
    * folded into the key and table name ([[IndexMemo]]). `tag` is part
    * of the identity too — callers with different `corpusPred`s use
    * different tags (a Column has no stable serialized form to key on,
    * so the tag CARRIES the predicate identity by contract). */
  def ensureFor(spark: SparkSession, dir: String, tag: String,
      corpusPred: Column = lit(true), buckets: Int = 64): String =
    IndexMemo.ensure(s"postings|$tag|$dir|$buckets",
      graft.Tables.listingSignature(dir, "documents"), s"postings_$tag")(
      t => build(spark, dir, t, corpusPred, buckets))

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
    * collection. The query vocabulary collects to the driver for the
    * pruning predicate (the query side is eval-set-bounded by the q133
    * contract — a benchmark, a query batch — never corpus-sized).
    * [[Retrieval.scoreTail]] consumes the slice twice (df + scoring);
    * here that is two bucket-PRUNED READS of query-vocab-bounded bytes,
    * NOT two recomputations — the recompute path's localCheckpoint
    * barrier guards an expensive tokenize→explode→aggregate prefix that
    * this probe no longer has, and skipping the barrier keeps the
    * pruning plan-visible (`SelectedBucketsCount`, spec-pinned) and the
    * block store untouched. Self-matches are excluded by doc_id,
    * matching the recompute path. */
  def topKFor(spark: SparkSession, table: String, queryDocs: DataFrame,
      k: Int): DataFrame = {
    // a probe against a GROWING index must see committed appends: writers
    // may run in another session (the streaming ingestion path's cloned
    // micro-batch session), whose inserts cannot invalidate THIS
    // session's cached file listing for the table — refresh is the
    // read-your-committed-appends contract, and costs one listing
    spark.catalog.refreshTable(table)
    val qterms = queryDocs
      .select(col("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    val queryTerms = qterms.select("term").distinct()
      .collect().map(_.getString(0)).toSeq
    val slice = spark.table(table)
      .filter(col("term").isin(queryTerms: _*)) // bucket pruning happens HERE
      .select("doc_id", "dl", "term", "tf")
    val (n, s) = stats(spark, table)
    val statsDf = spark.range(1)
      .select(lit(n).as("n_docs"), lit(s).as("sum_dl"))
    Retrieval.scoreTail(qterms, slice, statsDf, k)
  }
}
