package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** PERSISTED IVF index — the third index family, closing the serving
  * symmetry for q37's coarse-quantized ANN the way [[AnnIndex]] closed
  * it for LSH and [[PostingsIndex]] for BM25: q37 re-derives the cell
  * assignment of EVERY corpus vector on every run (a broadcast cross
  * join + a per-vector window — linear in the corpus); a production
  * IVF store assigns at ingest and serves point queries from the
  * n-probe cells alone. [[build]] persists (cell, vec_id, v, nrm)
  * BUCKETED BY `cell`; [[topKFor]] ranks the query against the
  * centroids, collects its n-probe cell ids as LITERALS, and the scan
  * reads `SelectedBucketsCount: k out of N` — query cost tracks probed
  * CELL OCCUPANCY, which is precisely the IVF recall-for-scan-volume
  * trade (FAISS's nlist/nprobe), now realized at the I/O layer.
  *
  * The CENTROIDS are the index's physical identity — the banding
  * analog: vectors assigned against different centroids land in
  * incomparable cells and a probe would silently miss them. They
  * persist in a companion table `<table>_cent` written at build, and
  * [[appendVectors]] assigns every new batch against the RECORDED
  * centroids (never re-derived from the batch — q37's "first 8
  * vectors" rule is a training-time choice, frozen at build like a
  * k-means fit), so append≡rebuild holds by construction whenever the
  * rebuild's corpus yields the same centroid set (IvfIndexSpec pins
  * it). v and nrm ride every row — the AnnIndex self-contained
  * single-scan trade.
  *
  * Parity: candidates are the identical (probe-cell = assigned-cell,
  * self excluded) pairs q37 derives — each database vector lives in
  * exactly ONE cell, so the candidate set needs no dedup — re-ranked
  * by the same compiled dot fold and tie rule; q137 registers the
  * probe against q37's own DuckDB oracle (the q134/q135 trick on the
  * third family). */
object IvfIndex {

  /** q37's geometry — the DEFAULTS, kept for oracle parity (q137 probes
    * against q37's own DuckDB SQL, so the registered row freezes 8
    * deterministic centroids / 2-cell probes). Production sizes the fit
    * at build (`build(nCentroids = ...)` — FAISS's √n rule: more,
    * smaller cells so probed volume tracks n/nlist × nprobe) and the
    * probe depth per query (`topKFor(nProbe = ...)` — the
    * recall-for-scan-volume dial). The fit size is physical identity
    * and rides the centroid companion itself (appends assign against
    * the RECORDED centroids, so geometry can never silently fork);
    * nProbe is a per-query choice, not index state. */
  val NCentroids = 8
  val NProbe = 2

  private[sources] def centTableOf(table: String): String = s"${table}_cent"

  /** Assign `vectors` (vec_id, v, nrm, ...) to their nearest centroid —
    * ONE cell per vector, ties to the smaller centroid id (q37's
    * assignment, verbatim). */
  private def assignOf(vectors: DataFrame, cent: DataFrame): DataFrame = {
    val simToCent = Similarity.dot(col("v"), col("cv")) /
      (col("nrm") * col("cnrm"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("c_sim").desc, col("c_id"))
    vectors.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id"),
        simToCent.as("c_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_id").as("cell"), col("vec_id"), col("v"), col("nrm"))
  }

  /** Build the cell store + the centroid companion from the corpus at
    * `dir`. Centroids = the corpus's first `nCentroids` vectors (q37's
    * deterministic stand-in for a k-means fit — the fit, not the
    * fitting procedure, is what an index persists; a production build
    * passes its √n-sized fit here and every append/probe inherits it
    * through the companion). */
  def build(spark: SparkSession, dir: String, table: String,
      buckets: Int = 8, nCentroids: Int = NCentroids): Unit = {
    val e = Similarity.normedVectors(spark, dir)
    val cent = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))
      .localCheckpoint(true)
    Bucketing.writeBucketed(assignOf(e, cent), table, "cell", buckets)
    Bucketing.writeBucketed(cent, centTableOf(table), "c_id", 1)
  }

  /** Incremental maintenance: assign a new batch against the RECORDED
    * centroids and insert bucket-aligned. A missing companion fails
    * loudly (the centroid-identity guard — assignment against anything
    * else would silently mis-cell the batch). Caller contract: new
    * vec_ids disjoint from the indexed set (the ingest-gate rule). */
  def appendVectors(table: String, embeddings: DataFrame): Unit = {
    val spark = embeddings.sparkSession
    val centTable = centTableOf(table)
    require(spark.catalog.tableExists(centTable),
      s"$table carries no centroid companion ($centTable) — not built by IvfIndex.build")
    val cent = spark.table(centTable).localCheckpoint(true)
    val buckets = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(throw new IllegalStateException(
        s"$table carries no bucket spec — not built by IvfIndex.build"))
    val e = Similarity.normedVectorsOf(spark, embeddings)
    assignOf(e, cent).repartition(buckets, col("cell"))
      .write.mode("append").insertInto(table)
  }

  /** Self-probe convenience (the AnnIndex.topK rule): anchors are the
    * indexed corpus's own `vec_id < nAnchors` rows — one un-pruned scan
    * to fetch them, then the pruned candidate scan. A point-query
    * caller holds its own (query_id, v, nrm) rows and calls
    * [[topKFor]], which scans the index exactly once, pruned. */
  def topK(spark: SparkSession, table: String, nAnchors: Int,
      k: Int, nProbe: Int = NProbe): DataFrame = {
    spark.catalog.refreshTable(table)
    topKFor(spark, table,
      spark.table(table).filter(col("vec_id") < nAnchors)
        .select(col("vec_id").as("query_id"), col("v"), col("nrm")), k,
      nProbe)
  }

  /** The serving-path probe: `anchors` = (query_id, v, nrm) — normed
    * query vectors (callers norm via Similarity.normedVectorsOf). Ranks
    * each anchor against the broadcast centroid companion, collects the
    * union of `nProbe` cell ids to the driver (≤ anchors × nProbe of at
    * most fit-size values — trivially query-scale), and reads ONE
    * bucket-pruned scan of exactly those cells. `nProbe` is the
    * per-query recall-for-scan-volume dial (probe cost tracks
    * n/nlist × nProbe); the default is q37's 2. */
  def topKFor(spark: SparkSession, table: String, anchors: DataFrame,
      k: Int, nProbe: Int = NProbe): DataFrame = {
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(centTableOf(table))
    val cent = spark.table(centTableOf(table))
    val simToCent = Similarity.dot(col("qv"), col("cv")) /
      (col("qnrm") * col("cnrm"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("c_sim").desc, col("c_id"))
    // (query_id, cell, qv, qnrm): each anchor's NProbe nearest cells,
    // query vector riding along for the single-pass re-rank
    val probes = anchors
      .select(col("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("qnrm"), col("c_id"),
        simToCent.as("c_sim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("c_id").as("cell"), col("qv"),
        col("qnrm"))
      .localCheckpoint(true)
    val probeCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val cos = Similarity.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    spark.table(table).as("ix")
      .filter(col("cell").isin(probeCells: _*)) // bucket pruning happens HERE
      .join(broadcast(probes.as("pr")),
        col("ix.cell") === col("pr.cell") &&
          col("ix.vec_id") =!= col("pr.query_id"))
      .select(col("pr.query_id"), col("ix.vec_id").as("neighbor_id"),
        cos.as("cosine"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Build-once memo for dir-derived indexes — the registered q137 runs
    * through it (the AnnIndex/PostingsIndex ensureFor rule: keyed on the
    * embeddings listing signature with the layout parameters folded into
    * the key and table name). */
  def ensureFor(spark: SparkSession, dir: String, tag: String,
      buckets: Int = 8, nCentroids: Int = NCentroids): String =
    IndexMemo.ensure(s"ivf|$tag|$dir|$buckets|$nCentroids",
      graft.Tables.listingSignature(dir, "embeddings"), s"ivf_$tag")(
      t => build(spark, dir, t, buckets, nCentroids))
}
