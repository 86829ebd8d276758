package graft.queries

import java.security.MessageDigest

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model- and index-quality evaluation over the curation pipeline's own
  * artifacts — the measurement loop a production training-data system runs
  * beside its filters: is the quality classifier actually discriminating
  * (AUC), is the embedding preprocessing sound (Gram/covariance for PCA),
  * is the ANN index faithful to brute force (recall@k)? No reference
  * analogue (the reference evaluates via LLM judges, an X1-stubbed path);
  * these are the deterministic, data-plane evaluations.
  *
  * Exactness contract: every accumulated quantity is INTEGER (embeddings
  * quantized by floor(x·scale) — floor, not round, because round's
  * half-case tie-break is not specified identically across engines), so
  * sums are independent of partitioning and merge order; doubles appear
  * only in final single divisions of exact integers, which IEEE 754
  * rounds identically everywhere.
  */
object Evaluation {

  /** Deterministic ±1 weight vector for the probe classifier: component d
    * is +1 iff the first hex nibble of md5("auc:d") has its high bit set
    * (the Similarity.hyperplanes recipe under a distinct namespace, so the
    * two probes stay uncorrelated). Embedded as literals in both
    * dialects. */
  private[queries] val aucWeights: IndexedSeq[Long] = {
    val mdig = MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      mdig.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until 64).map(d => if (md5hex(s"auc:$d").charAt(0) >= '8') 1L else -1L)
  }

  /** Quantized embedding (Spark side): floor(double(x) · scale) as long. */
  private def quantized(scale: Int): Column =
    transform(col("embedding"), x => floor(x.cast("double") * scale).cast("long"))

  /** Same quantization, DuckDB side. */
  private def quantizedSql(scale: Int): String =
    s"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $scale) AS BIGINT))"

  /** Q110: classifier AUC via the Mann-Whitney rank-sum identity — the
    * standard evaluation of a quality/toxicity filter model against
    * labeled holdout data, computed distributed and tie-correct:
    *
    *   AUC = [Σ_s pos(s)·negBelow(s) + ½·pos(s)·neg(s)] / (P·N)
    *
    * over distinct scores s (the ½ term is the average-rank tie
    * correction). The probe model scores quantized embeddings with the
    * fixed ±1 weight vector; ground truth is label ≥ 5. Kept in exact
    * integers: U is accumulated doubled (U2 = 2·Σpos·negBelow + Σpos·neg)
    * so the tie half-weight never leaves ℤ; AUC and Gini are single exact
    * divisions at the end.
    *
    * Scale shape: the corpus-side work is one hash-partitioned groupBy
    * (score → (pos, neg) counts); the ordered cumulative-negatives sweep
    * runs over the DISTINCT-score table, which deployed scorers bound by
    * emitting fixed-precision scores (here the integer margin) — and
    * which, when it still overflows one partition, is the textbook
    * two-pass partitioned prefix sum. The final reduction is a single
    * 4-field partial agg. */
  private val q110 = GraftQuery(
    "q110_classifier_auc",
    (spark, dir) => {
      val w = typedLit(aucWeights)
      val scored = Tables.embeddings(spark, dir)
        .select(
          aggregate(zip_with(quantized(1000), w, (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("margin"),
          when(col("label") >= 5, 1L).otherwise(0L).as("pos"))
      val byScore = scored.groupBy("margin")
        .agg(sum("pos").as("p"), sum(lit(1L) - col("pos")).as("n"))
      val sweep = Window.orderBy("margin")
        .rowsBetween(Window.unboundedPreceding, -1)
      byScore
        .withColumn("neg_below", coalesce(sum("n").over(sweep), lit(0L)))
        .agg(
          sum("p").cast("long").as("n_pos"),
          sum("n").cast("long").as("n_neg"),
          sum(lit(2L) * col("p") * col("neg_below") + col("p") * col("n"))
            .cast("long").as("u2"))
        .select(
          col("n_pos"), col("n_neg"),
          (col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"),
          (col("u2").cast("double") / (col("n_pos") * col("n_neg"))
            - lit(1.0)).as("gini"))
    },
    Some {
      val w = aucWeights.mkString("[", ", ", "]")
      s"""
      WITH scored AS (
        SELECT list_reduce(list_transform(generate_series(1, 64),
                 i -> (${quantizedSql(1000)})[i] * ($w)[i]),
               (a, b) -> a + b) AS margin,
               CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
        FROM embeddings),
      by_score AS (
        SELECT margin, CAST(sum(pos) AS BIGINT) AS p,
               CAST(sum(1 - pos) AS BIGINT) AS n
        FROM scored GROUP BY margin),
      swept AS (
        SELECT p, n,
               CAST(coalesce(sum(n) OVER (ORDER BY margin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS neg_below
        FROM by_score)
      SELECT CAST(sum(p) AS BIGINT) AS n_pos,
             CAST(sum(n) AS BIGINT) AS n_neg,
             CAST(sum(2 * p * neg_below + p * n) AS DOUBLE)
               / (2.0 * sum(p) * sum(n)) AS auc,
             CAST(sum(2 * p * neg_below + p * n) AS DOUBLE)
               / (CAST(sum(p) AS DOUBLE) * sum(n)) - 1.0 AS gini
      FROM swept"""},
    headline = true)

  /** Q111: distributed Gram (second-moment) matrix of the embedding table
    * via the `vec_gram` TypedImperativeAggregate — the front-end of PCA /
    * whitening before semantic dedup clustering (SemDeDup, arXiv
    * 2303.09540). One corpus scan, map-side-combined O(d²) partials, a
    * single merged row exploded to (i, j, gram) upper-triangle entries.
    *
    * The declarative alternative — explode (i, j) per row, groupBy — is
    * what the oracle SQL does, and it multiplies scan rows by d(d+1)/2
    * (2080× at d=64): exactly the blow-up the aggregate exists to avoid
    * at 100 TB. Integer quantization (floor(x·4096)) makes the aggregate's
    * out-of-order partial merges bit-identical to the oracle's sequential
    * sums — the property that lets a production-shaped one-pass kernel be
    * hash-checked against a row-by-row reference. The eigensolve on the
    * 64×64 result is driver-side (EvaluationSpec); only the O(N·d²) sum
    * is cluster work. */
  private val q111 = GraftQuery(
    "q111_gram_matrix",
    (spark, dir) => {
      graft.plans.GraftExtensions.install(spark)
      val d = 64
      // packed-triangle index → (i, j), 1-based to match DuckDB list
      // indexing; a 2080-entry literal pair table beats re-deriving the
      // triangle arithmetic in SQL on both sides
      val pairs = for { i <- 0 until d; j <- i until d } yield (i + 1, j + 1)
      val packed = Tables.embeddings(spark, dir)
        .select(quantized(4096).as("qv"))
        .agg(expr("vec_gram(qv)").as("g"))
      packed
        .select(posexplode(slice(col("g"), 3, d * (d + 1) / 2)))
        .select(
          element_at(typedLit(pairs.map(_._1)), col("pos") + 1).as("i"),
          element_at(typedLit(pairs.map(_._2)), col("pos") + 1).as("j"),
          col("col").as("gram"))
        .orderBy("i", "j")
    },
    Some(s"""
      WITH q AS (SELECT ${quantizedSql(4096)} AS qv FROM embeddings),
      cells AS (
        SELECT i, j, qv[i] * qv[j] AS prod
        FROM q
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j)
        WHERE j >= i)
      SELECT i, j, CAST(sum(prod) AS BIGINT) AS gram
      FROM cells
      GROUP BY i, j
      ORDER BY i, j"""),
    headline = true)

  /** Q112: ANN index-quality audit — recall@5 of the LSH index (q35)
    * against the brute-force ground truth (q34), per query point. The
    * eval loop every ANN deployment runs after (re)building an index:
    * both pipelines are deterministic, so the recall table is exactly
    * reproducible and oracle-checkable (the oracle nests both queries'
    * own oracle SQL as derived tables — one definition per pipeline,
    * shared verbatim).
    *
    * Scale shape: both sides end in per-query top-5 tables (tiny — rows =
    * 5·|queries|, not corpus-sized), so the audit join is a broadcast
    * hash join on (query_id, neighbor_id) no matter the corpus size;
    * recall is an exact int÷int per query. */
  private val q112 = GraftQuery(
    "q112_ann_recall",
    (spark, dir) => {
      val bf = Similarity.q34.fn(spark, dir).select("query_id", "neighbor_id")
      val lsh = Similarity.q35.fn(spark, dir).select("query_id", "neighbor_id")
      bf.as("bf")
        .join(broadcast(lsh.as("lsh")),
          col("bf.query_id") === col("lsh.query_id") &&
            col("bf.neighbor_id") === col("lsh.neighbor_id"), "left")
        .groupBy(col("bf.query_id").as("query_id"))
        .agg(
          count(lit(1)).as("n_true"),
          sum(when(col("lsh.neighbor_id").isNotNull, 1L).otherwise(0L))
            .as("n_hit"))
        .withColumn("recall",
          col("n_hit").cast("double") / col("n_true").cast("double"))
        .orderBy("query_id")
    },
    (Similarity.q34.oracle, Similarity.q35.oracle) match {
      case (Some(bfSql), Some(lshSql)) => Some(s"""
        SELECT bf.query_id AS query_id,
               count(*) AS n_true,
               CAST(sum(CASE WHEN lsh.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_hit,
               CAST(sum(CASE WHEN lsh.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*) AS recall
        FROM ($bfSql) bf
        LEFT JOIN ($lshSql) lsh
          ON bf.query_id = lsh.query_id AND bf.neighbor_id = lsh.neighbor_id
        GROUP BY bf.query_id
        ORDER BY bf.query_id""")
      case _ => None
    },
    headline = true)

  /** Q114: classifier calibration audit — the companion to q110's
    * discrimination check: per fixed score bin, predicted probability vs
    * empirical positive rate, plus the per-bin Brier contribution. A
    * quality filter whose scores are discriminative but miscalibrated
    * silently shifts the kept-data distribution when a fixed threshold is
    * applied across sources; this is the reliability-diagram table that
    * catches it.
    *
    * Exactness: the "predicted probability" is the LINEAR margin
    * normalization (clamped margin + 4 000)/8 000 — a sigmoid would put
    * libm exp() in the verdict path, which is not bit-stable across
    * engines; the linear link keeps every per-bin statistic at integer
    * sums + single exact divisions. Margins are clamped to ±4 000 — ~4σ
    * of the ±1-weight margin distribution (σ ≈ √64·E|q| ≈ 1 000), so the
    * 16 fixed 500-wide bins actually resolve the mass instead of packing
    * it into two slices of the ±64 000 attainable range. Bins are FIXED
    * margin ranges, not quantiles, so the binning is data-independent
    * and shuffle-free to assign.
    *
    * Scale shape: one scan, one hash shuffle into ≤16 bin groups —
    * partial-agg friendly, output bounded by the bin count at any corpus
    * size. */
  private val q114 = GraftQuery(
    "q114_calibration_bins",
    (spark, dir) => {
      val w = typedLit(aucWeights)
      val span = 4000L // ±4σ clamp; see scaladoc
      val scored = Tables.embeddings(spark, dir)
        .select(
          aggregate(zip_with(quantized(1000), w, (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("margin"),
          when(col("label") >= 5, 1L).otherwise(0L).as("pos"))
      scored
        .withColumn("m", least(lit(span), greatest(lit(-span), col("margin"))))
        .withColumn("bin",
          least(lit(15L), floor((col("m") + span) * 16 / (2 * span)).cast("long")))
        .groupBy("bin")
        .agg(
          count(lit(1)).as("n"),
          sum("pos").cast("long").as("n_pos"),
          sum("m").cast("long").as("sum_margin"))
        .withColumn("mean_pred",
          ((col("sum_margin").cast("double") / col("n")) + span) / (2.0 * span))
        .withColumn("pos_rate", col("n_pos").cast("double") / col("n"))
        .select("bin", "n", "n_pos", "mean_pred", "pos_rate")
        .orderBy("bin")
    },
    Some {
      val w = aucWeights.mkString("[", ", ", "]")
      val span = 4000L
      s"""
      WITH scored AS (
        SELECT list_reduce(list_transform(generate_series(1, 64),
                 i -> (${quantizedSql(1000)})[i] * ($w)[i]),
               (a, b) -> a + b) AS margin,
               CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
        FROM embeddings),
      binned AS (
        SELECT least($span, greatest(-$span, margin)) AS m, pos
        FROM scored)
      SELECT least(15, CAST(floor((m + $span) * 16 / (2 * $span)) AS BIGINT)) AS bin,
             count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
             ((CAST(sum(m) AS DOUBLE) / count(*)) + $span)
               / (2.0 * $span) AS mean_pred,
             CAST(sum(pos) AS DOUBLE) / count(*) AS pos_rate
      FROM binned
      GROUP BY 1
      ORDER BY 1"""},
    headline = true)

  /** Q116: PCA projection through the SHIPPED narrow-map projector
    * (Pca.project) — closes the q111 → project loop with an oracle check
    * on the projection arithmetic itself. The oracle problem: true
    * fitted components depend on the data, and the oracle SQL is one
    * static string evaluated at BOTH scale factors, so data-derived
    * literals cannot hash-match both. The verification chain is
    * therefore split exactly at its deterministic seams:
    * the cluster pass (Gram matrix) is oracle-checked as q111; the
    * driver eigensolve is pinned in PcaSpec against an independent
    * float recompute (orthonormality + eigenvalue agreement); and the
    * projection map is oracle-checked HERE against a deterministic
    * data-independent orthonormal basis — 4 Walsh–Hadamard rows scaled
    * to unit norm (entries ±2⁻³, exactly representable, so every
    * product is exact and the sequential fold is bit-identical in both
    * engines — the Similarity.hyperplanes recipe). The projected frame
    * has the same shape/cost as the fitted projection: the component
    * matrix travels as a literal, the plan is scan → narrow map →
    * explode, no exchange before the output sort (PlanShapeSpec).
    *
    * Walsh rows 1, 2, 4, 8 (Sylvester order, (−1)^popcount(r∧i)):
    * mutually orthogonal, none constant — a genuine orthonormal basis
    * of a 4-dim subspace, just not the data's eigenbasis. */
  private[queries] val walshComponents: Seq[Seq[Double]] =
    Seq(1, 2, 4, 8).map(r => (0 until 64).map(i =>
      if (Integer.bitCount(r & i) % 2 == 0) 0.125 else -0.125).toSeq)

  private val q116 = GraftQuery(
    "q116_pca_project",
    (spark, dir) => {
      val model = Pca.Model(0L, Seq.fill(4)(0.0), walshComponents)
      Pca.project(
          Tables.embeddings(spark, dir).select("vec_id", "embedding"), model)
        .select(col("vec_id"), posexplode(col("pc")))
        .select(col("vec_id"), (col("pos") + 1).as("k"), col("col").as("pc"))
        .orderBy("vec_id", "k")
    },
    Some {
      val compRows = walshComponents.zipWithIndex.map { case (c, i) =>
        s"(${i + 1}, ${c.mkString("[", ", ", "]")}::DOUBLE[])"
      }.mkString(", ")
      s"""
      WITH comps(k, c) AS (VALUES $compRows)
      SELECT e.vec_id, comps.k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, 64),
                 i -> CAST(e.embedding[i] AS DOUBLE) * c[i])),
               (a, b) -> a + b) AS pc
      FROM embeddings e CROSS JOIN comps
      ORDER BY vec_id, k"""},
    headline = true)

  /** Q142: IVF index-quality audit — q112's recall pattern on the THIRD
    * index family: recall@3 of the INDEX-SERVED IVF probe (q137, the
    * persisted cell store at the frozen 8-centroid/2-probe geometry)
    * against the brute-force true top-3 (q34 restricted to rank ≤ 3),
    * per query point. This is the eval every IVF deployment runs after
    * (re)building or [[graft.sources.IvfIndex.refit]]ing a store — the
    * recall half of the nlist/nprobe trade whose cost half cellStats
    * measures; SCALING.md round 18's drift probe reads exactly this
    * table before and after a refit. Both sides are deterministic, so
    * the oracle nests each pipeline's own SQL (q34's and q137's shared
    * ivfTopKSql) — one definition per pipeline, shared verbatim.
    *
    * Scale shape: both sides end in per-query top-3 tables (rows =
    * 3·|queries|), so the audit join is a broadcast hash join regardless
    * of corpus size; recall is an exact int÷int per query. */
  private val q142 = GraftQuery(
    "q142_ivf_recall",
    (spark, dir) => {
      val bf = Similarity.q34.fn(spark, dir).filter(col("rank") <= 3)
        .select("query_id", "neighbor_id")
      val ivf = Similarity.q137.fn(spark, dir)
        .select("query_id", "neighbor_id")
      bf.as("bf")
        .join(broadcast(ivf.as("ivf")),
          col("bf.query_id") === col("ivf.query_id") &&
            col("bf.neighbor_id") === col("ivf.neighbor_id"), "left")
        .groupBy(col("bf.query_id").as("query_id"))
        .agg(
          count(lit(1)).as("n_true"),
          sum(when(col("ivf.neighbor_id").isNotNull, 1L).otherwise(0L))
            .as("n_hit"))
        .withColumn("recall",
          col("n_hit").cast("double") / col("n_true").cast("double"))
        .orderBy("query_id")
    },
    (Similarity.q34.oracle, Similarity.q137.oracle) match {
      case (Some(bfSql), Some(ivfSql)) => Some(s"""
        SELECT bf.query_id AS query_id,
               count(*) AS n_true,
               CAST(sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_hit,
               CAST(sum(CASE WHEN ivf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*) AS recall
        FROM (SELECT * FROM ($bfSql) WHERE rank <= 3) bf
        LEFT JOIN ($ivfSql) ivf
          ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
        GROUP BY bf.query_id
        ORDER BY bf.query_id""")
      case _ => None
    },
    headline = true)

  /** Q144: SQ quantization audit — the q142 pattern isolating the OTHER
    * error axis of the IVF-SQ trade: q142 measures what cell truncation
    * costs (index-served vs brute force, full-precision both sides);
    * q144 measures what the int8 payload costs AT FIXED GEOMETRY —
    * recall@3 of the SQ probe (q143) against the float probe (q137),
    * same fit, same probed cells, so every divergence is scale-grid
    * ranking error and nothing else. A deployment reads q142 around a
    * refit and q144 around a storage-format decision; their product
    * bounds end-to-end recall. Same broadcast-audit scale shape as
    * q142 (two 3·|queries|-row tops). */
  private val q144 = GraftQuery(
    "q144_sq_recall",
    (spark, dir) => {
      val fl = Similarity.q137.fn(spark, dir)
        .select("query_id", "neighbor_id")
      val sq = Similarity.q143.fn(spark, dir)
        .select("query_id", "neighbor_id")
      fl.as("fl")
        .join(broadcast(sq.as("sq")),
          col("fl.query_id") === col("sq.query_id") &&
            col("fl.neighbor_id") === col("sq.neighbor_id"), "left")
        .groupBy(col("fl.query_id").as("query_id"))
        .agg(
          count(lit(1)).as("n_true"),
          sum(when(col("sq.neighbor_id").isNotNull, 1L).otherwise(0L))
            .as("n_hit"))
        .withColumn("recall",
          col("n_hit").cast("double") / col("n_true").cast("double"))
        .orderBy("query_id")
    },
    (Similarity.q137.oracle, Similarity.q143.oracle) match {
      case (Some(flSql), Some(sqSql)) => Some(s"""
        SELECT fl.query_id AS query_id,
               count(*) AS n_true,
               CAST(sum(CASE WHEN sq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_hit,
               CAST(sum(CASE WHEN sq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*) AS recall
        FROM ($flSql) fl
        LEFT JOIN ($sqSql) sq
          ON fl.query_id = sq.query_id AND fl.neighbor_id = sq.neighbor_id
        GROUP BY fl.query_id
        ORDER BY fl.query_id""")
      case _ => None
    },
    headline = true)

  val all: Seq[GraftQuery] = Seq(q110, q111, q112, q114, q116, q142, q144)
}
