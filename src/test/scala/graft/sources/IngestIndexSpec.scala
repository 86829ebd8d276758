package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.Curation

/** The ingest→index LOOP, end-to-end: q126's iterated ingest gate
  * produces the admitted epochs, each epoch appends to the persisted
  * indexes (AnnIndex on the vector side, PostingsIndex on the lexical
  * side), and the incrementally-maintained index probes EQUAL the full
  * rebuild over the same final corpus. This pins the caller contract
  * both append scaladocs state — "the ingest gate runs upstream of
  * indexing" — with the gate's ACTUAL output instead of trusting it,
  * and exercises the banding/stats parity checks on the real path.
  *
  * The gate run mirrors q126 exactly (sealed = doc_id % 10 = 7 seed,
  * three arrival batches by doc_id % 3, bow fingerprints), so the
  * admitted set is the oracle-proven one. */
class IngestIndexSpec extends SparkSpec {

  /** (sealedIds, admitted epoch id lists) from the q126 gate at sfDir. */
  private lazy val gate: (Seq[Long], Seq[Seq[Long]]) = {
    val fp = Curation.bowFingerprint
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val sealedIds = docs.filter(col("doc_id") % 10 === 7)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val sealed0 = docs.filter(col("doc_id") % 10 === 7).select(fp.as("fp"))
    val rest = docs.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), fp.as("fp"))
    val batches = (0 until 3).map(k => rest.filter(col("doc_id") % 3 === k))
    val admitted = Curation.iteratedIngest(sealed0, batches,
        capacity = docs.count())
      .select("epoch", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    (sealedIds, (1 to 3).map(e => admitted.filter(_._1 == e).map(_._2).toSeq))
  }

  test("gate → AnnIndex.append over 3 epochs probes equal to the full rebuild") {
    val (sealedIds, epochs) = gate
    val e = Tables.embeddings(spark, sfDir)
    val d = java.nio.file.Files.createTempDirectory("ingestann").toString
    def dump(ids: Seq[Long], sub: String): String = {
      e.filter(col("vec_id").isin(ids: _*)).coalesce(1)
        .write.mode("overwrite").parquet(s"$d/$sub/embeddings.parquet")
      s"$d/$sub"
    }
    AnnIndex.build(spark, dump(sealedIds, "seed"), "gate_ann")
    epochs.zipWithIndex.foreach { case (ids, i) =>
      assert(ids.nonEmpty, s"epoch ${i + 1} admitted nothing — vacuous loop")
      AnnIndex.append(spark, dump(ids, s"ep${i + 1}"), "gate_ann")
    }
    AnnIndex.build(spark,
      dump(sealedIds ++ epochs.flatten, "all"), "gate_ann_whole")
    def rows(t: String) = AnnIndex.topK(spark, t, nAnchors = 20, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val inc = rows("gate_ann")
    assert(inc.nonEmpty, "the gate-fed index must serve neighbors")
    assert(inc == rows("gate_ann_whole"),
      "gate→append→probe diverges from the full rebuild")
    // the incrementally-fed index still prunes at the I/O layer
    val plan = AnnIndex.topK(spark, "gate_ann", nAnchors = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"gate-fed appends broke bucket pruning:\n$plan")
  }

  test("gate → PostingsIndex.append over 3 epochs: stats fold and probes " +
      "equal the full rebuild") {
    val (sealedIds, epochs) = gate
    PostingsIndex.build(spark, sfDir, "gate_post",
      corpusPred = col("doc_id").isin(sealedIds: _*))
    epochs.foreach { ids =>
      PostingsIndex.append(spark, sfDir, "gate_post",
        pred = col("doc_id").isin(ids: _*))
    }
    val allIds = sealedIds ++ epochs.flatten
    PostingsIndex.build(spark, sfDir, "gate_post_whole",
      corpusPred = col("doc_id").isin(allIds: _*))
    assert(PostingsIndex.stats(spark, "gate_post") ==
      PostingsIndex.stats(spark, "gate_post_whole"),
      "per-epoch stats folds diverge from the rebuild's collection stats")
    def dfTotals(t: String): Map[String, Long] =
      spark.table(PostingsIndex.dfTableOf(t))
        .groupBy("term").agg(sum(col("df")).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfTotals("gate_post") == dfTotals("gate_post_whole"),
      "per-epoch df deltas diverge from the rebuild's per-term df")
    val q = Tables.documents(spark, sfDir).filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("text"))
    def rows(t: String) = PostingsIndex.topKFor(spark, t, q, k = 10)
      .select("query_id", "doc_id", "n_terms", "score", "rank")
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
      .toSeq
    assert(rows("gate_post") == rows("gate_post_whole"),
      "gate→append→probe diverges from the full rebuild")
  }

  test("a banding-mismatched append fails loudly instead of silently never colliding") {
    val (sealedIds, _) = gate
    val e = Tables.embeddings(spark, sfDir)
    val d = java.nio.file.Files.createTempDirectory("bandmismatch").toString
    e.filter(col("vec_id").isin(sealedIds: _*)).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    AnnIndex.build(spark, d, "band_ann", tables = 4, bits = 8)
    val err = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, d, "band_ann", tables = 2, bits = 4)
    }
    assert(err.getMessage.contains("banding"))
  }
}
