package graft.queries

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-corpus clustering: Lloyd's k-means over int8-quantized
  * vectors (q57) and SemDeDup — within-cluster semantic dedup (q58,
  * Abbas et al. 2023, arXiv 2303.09540 — public paper). This closes the
  * round-9 verdict's open contract on q33: the coarse quantizer now lives
  * IN the engine instead of upstream, so the cell structure that blocks
  * the similarity joins is something the engine computes, checks
  * (CellContract) and scales itself.
  *
  * Scale shape (the MLlib KMeans pattern, reimplemented relationally):
  * each Lloyd iteration is one broadcast cross join of the corpus against
  * k centroids (narrow — candidates never shuffle), one argmin window
  * keyed on vec_id, and one partial-agg centroid update whose k×64
  * result is collected to the driver and re-broadcast as literals — the
  * canonical way distributed k-means bounds its per-round driver state
  * to O(k·dims) regardless of corpus size. k is 8 here for oracle
  * tractability; at 100 TB k grows ~√n (the q31/q33 fixed-keyspace
  * lesson) and the per-iteration cost stays one corpus scan.
  *
  * Cross-engine bit-exactness: vectors are quantized to exact small
  * integers carried as doubles (q38's quantizer), so centroid sums are
  * exact and ORDER-INDEPENDENT no matter how Spark partitions the
  * aggregation; each mean is a single double division both engines
  * perform identically; every distance is the same left-fold expression
  * tree (`qq − 2·q·c + c·c`) in both dialects. The only non-integer
  * values anywhere are the centroid means and distances — each produced
  * by one deterministic expression, never re-aggregated across rows.
  */
object Clustering {
  import Similarity.{dot, dotSql}

  private val K = 8
  private val Iters = 3

  /** q38's int8 scalar quantizer ([[Similarity.int8Quantized]] — ONE
    * definition, so the clustering cells and the quantized search live in
    * the same domain) plus the self-dot, as a shared frame (vec_id, qv,
    * qq). localCheckpoint: the frame feeds 3 assignment passes + 2
    * centroid updates, and without a real barrier each action would
    * re-read the parquet and re-quantize (the q32 multi-consumer lesson;
    * at cluster scale this is a persisted table). */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Similarity.int8Quantized(spark, dir)
      .withColumn("qq", dot(col("qv"), col("qv")))
      .select(col("vec_id"), col("qv"), col("qq"))
      .localCheckpoint(true)

  /** DuckDB mirror of [[quantized]]; assumes normedVectorsSql's `e` CTE
    * is in scope. */
  private val quantizedSql: String = s"""
    ${Similarity.int8QuantizedSql},
    qe AS (
      SELECT vec_id, qv, ${dotSql("qv", "qv")} AS qq
      FROM qz)"""

  /** One assignment pass: argmin_{c} ||q − c||² via qq − 2·q·c + c·c,
    * ties to the lowest centroid id. `cc` arrives precomputed from the
    * driver so the broadcast row carries everything the distance needs. */
  private def assign(
      spark: SparkSession,
      e: DataFrame,
      cents: Seq[(Long, Seq[Double], Double)]): DataFrame = {
    import spark.implicits._
    val centDf = broadcast(cents.toDF("c_id", "cv", "cc"))
    val dist = col("qq") - lit(2.0) * dot(col("qv"), col("cv")) + col("cc")
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("c_id"))
    e.crossJoin(centDf)
      .select(col("vec_id"), col("qv"), col("c_id"), dist.as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("c_id").as("cluster"), col("dist"))
  }

  /** Centroid update: per-(cluster, dim) exact integer sums → one double
    * division each; k×64 values collected to the driver (bounded by k,
    * not the corpus — the MLlib pattern). cc is the same left-fold both
    * dialects use for dot(cv, cv). */
  private def update(asg: DataFrame): Seq[(Long, Seq[Double], Double)] =
    asg.select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "val")))
      .groupBy("cluster", "dim")
      .agg((sum("val") / count(lit(1))).as("mv"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mv")))),
        s => s.getField("mv")).as("cv"))
      .collect()
      .toSeq
      .map { r =>
        val cv = r.getSeq[Double](1)
        (r.getLong(0), cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
      .sortBy(_._1)

  /** Final (vec_id, qv, cluster, dist) after `iters` Lloyd iterations
    * from deterministic seeds (the first k vectors, as q37). Public: this
    * is the library's clustering entry point; q57 runs it at k = [[K]]
    * for oracle tractability, real corpora size k ∝ √n (the CellContract
    * rule) — which only changes the seed predicate and the size of the
    * broadcast list, never the plan shape. */
  def kmeansAssignments(
      spark: SparkSession, dir: String,
      iters: Int = Iters, k: Int = K): DataFrame =
    lloyd(spark, quantized(spark, dir), iters, k)._1

  /** The Lloyd loop over a quantized frame: deterministic seeds (the
    * first k vec_ids, as q37 — or the caller's explicit k-bounded id
    * set), `iters` assign/update rounds. Returns the FINAL assignment
    * and the centroids it was computed against — the pair
    * [[kmeansAssignments]] and [[kmeansFitOf]] each take one half of. */
  private def lloyd(spark: SparkSession, e: DataFrame, iters: Int, k: Int,
      seedIds: Option[Seq[Long]] = None)
      : (DataFrame, Seq[(Long, Seq[Double], Double)]) = {
    val seedPred = seedIds
      .map(ids => col("vec_id").isin(ids: _*))
      .getOrElse(col("vec_id") < k)
    var cents = e.filter(seedPred)
      .select(col("vec_id"), col("qv")).collect().toSeq
      .map { r =>
        val cv = r.getSeq[Double](1)
        (r.getLong(0), cv, cv.foldLeft(0.0)((a, x) => a + x * x))
      }
      .sortBy(_._1)
    var asg = assign(spark, e, cents)
    for (_ <- 2 to iters) {
      cents = update(asg)
      asg = assign(spark, e, cents)
    }
    (asg, cents)
  }

  /** A TRAINED k-means fit in [[graft.sources.IvfIndex]]'s fit shape
    * (c_id, cv, cnrm) — the production realization of the refit
    * scaladoc's "a k-means pass in production": the engine's own Lloyd
    * kernel (q57's, oracle-checked) over any (vec_id, label, embedding)
    * frame, e.g. an index store's accumulated rows when cellStats shows
    * the built fit has drifted. Centroids are means in the int8-
    * quantized domain — cosine assignment is per-vector scale-invariant,
    * so they serve as IVF fit vectors directly. Empty clusters drop out
    * of the fit (fewer cells, the standard Lloyd behavior); a degenerate
    * all-zero centroid (possible only if a whole cluster quantizes to
    * zero) is filtered rather than allowed to NaN the cosine. Seeds
    * default to the frame's `vec_id < k` rows (the build-rule contract);
    * `seedIds` overrides with an explicit k-bounded id set — SEEDING IS
    * THE FIT'S DESTINY at few iterations, so a fit meant to cover a
    * drifted store must seed from a sample of the CURRENT distribution
    * (the k-means++ practice; an evenly-spaced id pick is the
    * deterministic stand-in — measured in SCALING.md round 18's drift
    * probe, where base-only seeds converge to an SSE-fine fit that
    * still keeps the drifted mass in one hot cell). */
  def kmeansFitOf(spark: SparkSession, embeddings: DataFrame,
      iters: Int = Iters, k: Int = K,
      seedIds: Option[Seq[Long]] = None): DataFrame = {
    import spark.implicits._
    val e = Similarity.int8QuantizedOf(spark, embeddings)
      .withColumn("qq", dot(col("qv"), col("qv")))
      .select(col("vec_id"), col("qv"), col("qq"))
      .localCheckpoint(true)
    val (_, cents) = lloyd(spark, e, iters, k, seedIds)
    cents.map { case (cId, cv, cc) => (cId, cv, math.sqrt(cc)) }
      .toDF("c_id", "cv", "cnrm")
      .filter(col("cnrm") > 0)
  }

  /** The same [[Iters]] iterations unrolled as DuckDB CTEs; `qe` must be
    * in scope. Exposes the final assignment as `a$Iters`. */
  private val kmeansSql: String = {
    def distSql(cv: String): String =
      s"qe.qq - 2 * ${dotSql("qe.qv", cv)} + ${dotSql(cv, cv)}"
    def assignSql(i: Int): String = s"""
      a$i AS (
        SELECT vec_id, cluster, dist FROM (
          SELECT qe.vec_id, c.c_id AS cluster, ${distSql("c.cv")} AS dist,
                 row_number() OVER (PARTITION BY qe.vec_id
                   ORDER BY ${distSql("c.cv")}, c.c_id) AS rn
          FROM qe CROSS JOIN c${i - 1} c)
        WHERE rn = 1)"""
    def updateSql(i: Int): String = s"""
      c$i AS (
        SELECT cluster AS c_id, list(mv ORDER BY dim) AS cv
        FROM (SELECT a.cluster, t.dim, sum(qe.qv[t.dim]) / count(*) AS mv
              FROM qe JOIN a$i a USING (vec_id)
              CROSS JOIN generate_series(1, 64) AS t(dim)
              GROUP BY a.cluster, t.dim)
        GROUP BY cluster)"""
    val iters = (1 to Iters).map { i =>
      assignSql(i) + (if (i < Iters) "," + updateSql(i) else "")
    }.mkString(",")
    s"""c0 AS (SELECT vec_id AS c_id, qv AS cv FROM qe WHERE vec_id < $K),
       $iters"""
  }

  /** Q57: Lloyd's k-means — the in-engine coarse quantizer (SemDeDup's
    * stage 1, q33/q37's missing upstream). Output: each vector's final
    * cell and squared quantized distance to its centroid. */
  private val q57 = GraftQuery(
    "q57_kmeans",
    (spark, dir) =>
      kmeansAssignments(spark, dir)
        .select(col("vec_id"), col("cluster"), col("dist"))
        .orderBy("vec_id"),
    Some(s"""
      WITH ${Similarity.normedVectorsSql}, $quantizedSql, $kmeansSql
      SELECT vec_id, cluster, dist
      FROM a$Iters
      ORDER BY vec_id"""),
    headline = true)

  /** Q58: SemDeDup — within each k-means cell, exact cosine (on the
    * ORIGINAL float vectors, per the paper) over same-cell pairs; a
    * vector is DROPPED when any lower-id cell-mate sits above the
    * threshold. `dup_of` is the smallest such WITNESS — duplicate
    * evidence, not necessarily itself a survivor: under the greedy
    * per-pair rule a chain 1~2~3 (1≁3) drops both 2 and 3 with
    * dup_of 1 and 2 respectively. The retained corpus is exactly
    * {vectors not in the output} (ClusteringSpec pins the partition);
    * consumers wanting one representative per CONNECTED duplicate set
    * compose with q36's label propagation on the pair stream — the
    * published SemDeDup is the greedy per-pair form, which never
    * retains two similar vectors (any surviving pair would have
    * witnessed each other).
    * The cosine lives in the join CONDITION, so non-duplicate pairs die
    * on the transient joined row and never materialize (the q32 verify
    * lesson); pair volume is per-cell occupancy², which is exactly what
    * growing k ~√n keeps linear (CellContract's rule). */
  private val q58 = GraftQuery(
    "q58_semdedup",
    (spark, dir) => {
      val asg = kmeansAssignments(spark, dir).select(col("vec_id"), col("cluster"))
      val e = Similarity.normedVectors(spark, dir)
        .select(col("vec_id"), col("v"), col("nrm"))
      val withV = asg.join(e, "vec_id").localCheckpoint(true)
      // the q33 scaling contract, enforced for the k-means cells too:
      // cells² < n ⇒ the pair join below stops tracking the corpus
      // linearly (at the demo k = 8 this warns by design — the scaladoc's
      // k ∝ √n rule is what production must follow)
      val observed = CellContract.observedOn(spark, withV, "cluster", "q58_cell_contract")
      val cos = dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
      observed.as("a").join(withV.as("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.vec_id") < col("b.vec_id") && cos >= 0.35)
        .select(col("b.vec_id").as("dropped"), col("b.cluster").as("cluster"),
          col("a.vec_id").as("vec_a"))
        .groupBy("dropped", "cluster")
        .agg(min(col("vec_a")).as("dup_of"), count(lit(1)).as("n_dups"))
        .orderBy("dropped")
    },
    Some(s"""
      WITH ${Similarity.normedVectorsSql}, $quantizedSql, $kmeansSql,
      pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, b.cluster AS cluster
        FROM a$Iters a JOIN a$Iters b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE ${dotSql("ea.v", "eb.v")} / (ea.nrm * eb.nrm) >= 0.35)
      SELECT vec_b AS dropped, cluster, min(vec_a) AS dup_of,
             count(*) AS n_dups
      FROM pairs
      GROUP BY vec_b, cluster
      ORDER BY dropped"""),
    headline = true)

  val all: Seq[GraftQuery] = Seq(q57, q58)
}
