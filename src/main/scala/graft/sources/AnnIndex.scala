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
    * warehouse rules apply: one write, every later probe prunes). */
  def build(spark: SparkSession, dir: String, table: String,
      tables: Int = 4, bits: Int = 8, buckets: Int = 16): Unit =
    Bucketing.writeBucketed(
      Similarity.signatureRows(spark, dir, tables, bits),
      table, "sig", buckets)

  /** Incremental maintenance — the ingest path: compute signatures for a
    * NEW batch of vectors and append them honoring the table's bucket
    * spec (datasource bucketed tables bucket on insert, so probes keep
    * pruning over the union with no rebuild). Caller contract: the new
    * vec_ids are disjoint from the indexed set (the q81/q126 ingest gate
    * runs upstream of indexing) and (tables, bits) match the build —
    * signatures from a different banding would silently never collide.
    * insertInto is POSITIONAL; [[build]] and this method both emit
    * [[Similarity.signatureRows]]'s column order. */
  def append(spark: SparkSession, dir: String, table: String,
      tables: Int = 4, bits: Int = 8): Unit =
    Similarity.signatureRows(spark, dir, tables, bits)
      .write.mode("append").insertInto(table)

  /** Top-k nearest (exact re-rank over bucket-pruned candidates) for the
    * anchor set `vec_id < nAnchors` of the INDEXED corpus itself —
    * mirroring lshTopK's more-like-this anchor convention. */
  def topK(spark: SparkSession, table: String, nAnchors: Int,
      k: Int): DataFrame = {
    val idx = spark.table(table)
    // the probe side: anchor signature rows (with their vectors),
    // collected as literals for the pruning predicate (anchors are
    // query-scale)
    val anchors = idx.filter(col("vec_id") < nAnchors)
      .select(col("vec_id").as("query_id"), col("tbl").as("qtbl"),
        col("sig").as("qsig"), col("v").as("qv"), col("nrm").as("qnrm"))
    val probeSigs = anchors.select("qsig").distinct()
      .collect().map(_.getString(0)).toSeq
    // ONE index scan: bucket-pruned by the literal signature set, hash-
    // probed against the broadcast anchors on the (tbl, sig) rendezvous;
    // neighbor v/nrm ride the index row and query v/nrm the broadcast,
    // so the cosine computes in the same pass — no second corpus read.
    // Colliding (query, neighbor) pairs from multiple tables carry the
    // identical cosine; max() is the deterministic dedup.
    val cos = Similarity.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    idx
      .filter(col("sig").isin(probeSigs: _*)) // bucket pruning happens HERE
      .join(broadcast(anchors),
        col("tbl") === col("qtbl") && col("sig") === col("qsig") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cos.as("cosine"))
      .groupBy("query_id", "neighbor_id")
      .agg(max("cosine").as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
