package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The UPSERT/re-crawl verb on every persisted family: `reindex` must
  * leave every probe row-identical to a store REBUILT over the UPDATED
  * corpus — the production event the append paths' disjoint-ids
  * contract excludes (same doc_id, changed content) and the delete verb
  * only half handles (a caller-composed delete+append pays two rewrites
  * and leaves stale rows if the caller forgets the delete — the silent
  * coexistence this verb closes). Plus the tombstone interaction: a
  * re-crawled id that was deferred-deleted is ALIVE again (the new
  * content is a fresh observation), while other tombstoned ids stay
  * deleted and fold physically with the rewrite. */
class ReindexSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sfDir)

  /** Re-crawled ids ≥ 20 so probe anchor sets and the IVF fit (first 8
    * vectors) are unchanged between the store and its twin. */
  private val recrawled = Seq(25L, 40L, 77L, 123L, 250L)

  /** The updated corpus: the re-crawled docs carry NEW text (old rare
    * terms gone, fresh ones in), and one brand-new doc arrives with the
    * same batch — the upsert's insert half. */
  private def updatedDocs = {
    val changed = docs.withColumn("text",
      when(col("doc_id").isin(recrawled: _*),
        concat(lit("freshly recrawled corpus content revision "),
          col("doc_id"), lit(" zqx"), col("doc_id")))
        .otherwise(col("text")))
    val newDoc = docs.filter(col("doc_id") === 1L)
      .withColumn("doc_id", lit(900001L))
      .withColumn("text", lit("brand new crawl arrival zqxnovel tokens"))
    changed.unionByName(newDoc)
  }

  /** Write the updated corpus to a temp dir so the twin builds over
    * exactly the post-reindex population (the DeleteSpec survivorDir
    * trick). */
  private def updatedDocsDir(sub: String): String = {
    val d = java.nio.file.Files.createTempDirectory(sub).toString
    updatedDocs.coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  private def batch = updatedDocs
    .filter(col("doc_id").isin(recrawled :+ 900001L: _*))
    .select("doc_id", "text")

  private def queryDocs =
    docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("text"))

  private def probeRows(table: String) =
    PostingsIndex.topKFor(spark, table, queryDocs, k = 10)
      .select("query_id", "doc_id", "n_terms", "score", "rank")
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
      .toSeq

  private def dfTotals(table: String): Map[String, Long] =
    spark.table(PostingsIndex.dfTableOf(table))
      .groupBy("term").agg(sum(col("df")).as("df"))
      .filter(col("df") =!= 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("PostingsIndex.reindex == fresh build over the updated corpus: " +
      "stats, df totals, probe rows — changed text replaces, new doc inserts") {
    PostingsIndex.build(spark, sfDir, "post_re")
    PostingsIndex.reindex(spark, "post_re", batch)
    PostingsIndex.build(spark, updatedDocsDir("postre"), "post_re_twin")
    assert(PostingsIndex.stats(spark, "post_re") ==
      PostingsIndex.stats(spark, "post_re_twin"),
      "reindex stats must fold both directions to the updated corpus's")
    assert(dfTotals("post_re") == dfTotals("post_re_twin"),
      "reindex df deltas must sum to the updated corpus's df")
    assert(probeRows("post_re") == probeRows("post_re_twin"),
      "post-reindex probe diverges from the updated-corpus rebuild")
    // no stale postings: the OLD text's rows for re-crawled ids are gone
    val stale = spark.table("post_re")
      .filter(col("doc_id").isin(recrawled: _*))
      .join(spark.table("post_re_twin")
        .filter(col("doc_id").isin(recrawled: _*)),
        Seq("term", "doc_id", "dl", "tf"), "left_anti").count()
    assert(stale == 0L, s"$stale stale old-text postings survived reindex")
    // column order held for the positional append path, and appends land
    assert(spark.table("post_re").columns.toSeq ==
      spark.table("post_re_twin").columns.toSeq)
    import spark.implicits._
    PostingsIndex.appendDocs("post_re",
      Seq((910001L, "alpha beta")).toDF("doc_id", "text"))
  }

  test("PostingsIndex.reindex refuses a batch with duplicate doc_ids " +
      "(one text per doc is the re-crawl contract)") {
    PostingsIndex.build(spark, sfDir, "post_re_dup")
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      PostingsIndex.reindex(spark, "post_re_dup",
        Seq((25L, "one"), (25L, "two")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("duplicate doc_ids"), e.getMessage)
  }

  test("reindex after a deferred delete: the re-crawled tombstoned id is " +
      "ALIVE again, other tombstoned ids stay deleted and fold physically") {
    PostingsIndex.build(spark, sfDir, "post_re_tomb")
    import spark.implicits._
    // two ids deferred-deleted; one of them re-crawls in the batch
    PostingsIndex.deleteDeferred(spark, "post_re_tomb",
      Seq(25L, 33L).toDF("doc_id"))
    PostingsIndex.reindex(spark, "post_re_tomb", batch)
    // twin: the updated corpus minus the STILL-deleted id 33
    PostingsIndex.build(spark, updatedDocsDir("postretomb"),
      "post_re_tomb_twin", corpusPred = col("doc_id") =!= 33L)
    assert(Bucketing.pendingTombstones(spark, "post_re_tomb").isEmpty,
      "the reindex rewrite must fold and clear the tombstones")
    assert(PostingsIndex.stats(spark, "post_re_tomb") ==
      PostingsIndex.stats(spark, "post_re_tomb_twin"),
      "stats after reindex-over-tombstones diverge from the twin")
    assert(probeRows("post_re_tomb") == probeRows("post_re_tomb_twin"),
      "probe after reindex-over-tombstones diverges from the twin")
    assert(spark.table("post_re_tomb").filter(col("doc_id") === 33L)
      .isEmpty, "the non-recrawled tombstoned id must stay deleted")
    assert(!spark.table("post_re_tomb").filter(col("doc_id") === 25L)
      .isEmpty, "the re-crawled tombstoned id must be alive again")
  }

  test("BandIndex.reindex == fresh build over the updated corpus; a " +
      "re-crawl shorter than the shingle width still drops the old rows") {
    import graft.queries.Dedup
    BandIndex.build(spark, sfDir, "band_re")
    // one re-crawl shrinks below the 3-word shingle width: its band
    // rows must VANISH (a fresh build over the updated corpus has none)
    import spark.implicits._
    val shortBatch = batch.withColumn("text",
      when(col("doc_id") === 25L, lit("too short")).otherwise(col("text")))
    BandIndex.reindex(spark, "band_re", shortBatch)
    val d = java.nio.file.Files.createTempDirectory("bandre").toString
    updatedDocs.withColumn("text",
      when(col("doc_id") === 25L, lit("too short")).otherwise(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    BandIndex.build(spark, d, "band_re_twin")
    val got = spark.table("band_re").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val want = spark.table("band_re_twin").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want,
      "reindexed band rows must equal the updated-corpus rebuild's")
    assert(spark.table("band_re").filter(col("doc_id") === 25L).isEmpty,
      "the below-shingle-width re-crawl must lose its old band rows")
    // and the sweep agrees end-to-end
    def sweep(t: String, dir: String) =
      BandIndex.nearDupPairs(spark, t, graft.Tables.documents(spark, dir))
        .orderBy("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(sweep("band_re", d) == sweep("band_re_twin", d),
      "post-reindex sweep diverges from the updated-corpus rebuild")
  }

  // ---- vector families ------------------------------------------------

  /** Updated embeddings: re-crawled vectors point in a NEW direction
    * (reversed — scale changes would be cosine-invariant and prove
    * nothing), vec_ids ≥ 20 so the IVF fit (first 8) is unchanged. */
  private val reVecs = Seq(25L, 40L, 77L)

  private def updatedEmbeddings =
    graft.Tables.embeddings(spark, sfDir).withColumn("embedding",
      when(col("vec_id").isin(reVecs: _*), reverse(col("embedding")))
        .otherwise(col("embedding")))

  private def updatedVecsDir(sub: String): String = {
    val d = java.nio.file.Files.createTempDirectory(sub).toString
    updatedEmbeddings.coalesce(1).write.mode("overwrite")
      .parquet(s"$d/embeddings.parquet")
    d
  }

  private def vecBatch = updatedEmbeddings.filter(col("vec_id").isin(reVecs: _*))

  test("AnnIndex.reindexVectors == fresh build over the updated corpus: " +
      "the re-embedded vectors re-sign at the recorded banding") {
    AnnIndex.build(spark, sfDir, "ann_re", tables = 4, bits = 8, buckets = 16)
    AnnIndex.reindexVectors("ann_re", vecBatch)
    AnnIndex.build(spark, updatedVecsDir("annre"), "ann_re_twin",
      tables = 4, bits = 8, buckets = 16)
    def rows(t: String) = AnnIndex.topK(spark, t, nAnchors = 20, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(rows("ann_re") == rows("ann_re_twin"),
      "post-reindex ANN probe diverges from the updated-corpus rebuild")
    assert(AnnIndex.recordedBanding(spark, "ann_re") == ((4, 8)))
  }

  test("IvfIndex.reindexVectors == fresh build over the updated corpus on " +
      "BOTH storages (float re-assigns cells; SQ re-quantizes the batch)") {
    val twinDir = updatedVecsDir("ivfre")
    IvfIndex.build(spark, sfDir, "ivf_re")
    IvfIndex.reindexVectors("ivf_re", vecBatch)
    IvfIndex.build(spark, twinDir, "ivf_re_twin")
    def rows(t: String) = IvfIndex.topK(spark, t, nAnchors = 20, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(rows("ivf_re") == rows("ivf_re_twin"),
      "post-reindex IVF probe diverges from the updated-corpus rebuild")
    IvfIndex.buildSq(spark, sfDir, "ivfsq_re")
    IvfIndex.reindexVectors("ivfsq_re", vecBatch)
    IvfIndex.buildSq(spark, twinDir, "ivfsq_re_twin")
    def anchors = graft.queries.Similarity.normedVectors(spark, sfDir)
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v"), col("nrm"))
    def sqRows(t: String) = IvfIndex.topKForSq(spark, t, anchors, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(sqRows("ivfsq_re") == sqRows("ivfsq_re_twin"),
      "post-reindex SQ probe diverges from the updated-corpus rebuild")
  }
}
