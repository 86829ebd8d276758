package graft.queries

import graft.SparkSpec
import graft.core.linalg.PowerIteration
import org.apache.spark.sql.functions._

class EvaluationSpec extends SparkSpec {

  private def eval(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  // ---- q110 AUC ----------------------------------------------------------

  test("q110 AUC equals the brute-force pair count (tie-correct)") {
    val row = eval("q110_classifier_auc").collect().head
    val (nPos, nNeg, auc) =
      (row.getLong(0), row.getLong(1), row.getDouble(2))

    // independent reference: score every vector locally, count pairs
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("embedding"), col("label")).collect()
    val scored = vecs.map { r =>
      val v = r.getSeq[Float](0)
      val margin = v.indices.map(i =>
        math.floor(v(i).toDouble * 1000).toLong * Evaluation.aucWeights(i)).sum
      (margin, r.getInt(1) >= 5)
    }
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(nPos === pos.length && nNeg === neg.length)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(auc === expected, s"auc $auc != brute-force $expected")
    assert(row.getDouble(3) === 2 * expected - 1) // gini
  }

  // ---- q111 Gram + PCA ---------------------------------------------------

  test("q111 gram matches a local recompute and is partition-invariant") {
    graft.plans.GraftExtensions.install(spark)
    val got = eval("q111_gram_matrix").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap

    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 4096).toLong))
    val d = 64
    for (i <- 0 until d; j <- i until d) {
      val want = vecs.map(v => v(i) * v(j)).sum
      assert(got((i + 1, j + 1)) === want, s"gram($i,$j)")
    }

    // merge-order invariance: a skewed repartition must not change a bit
    val repart = graft.Tables.embeddings(spark, sfDir)
      .repartition(7, col("label"))
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 4096).cast("long")).as("qv"))
      .agg(expr("vec_gram(qv)")).collect().head.getSeq[Long](0)
    val once = graft.Tables.embeddings(spark, sfDir)
      .coalesce(1)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 4096).cast("long")).as("qv"))
      .agg(expr("vec_gram(qv)")).collect().head.getSeq[Long](0)
    assert(repart === once)
  }

  test("q111 gram feeds a converged driver-side top eigenpair (PCA)") {
    graft.plans.GraftExtensions.install(spark)
    val packed = graft.Tables.embeddings(spark, sfDir)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 4096).cast("long")).as("qv"))
      .agg(expr("vec_gram(qv)")).collect().head.getSeq[Long](0).toArray
    val (n, m) = PowerIteration.unpackGram(packed, 4096.0)
    assert(n === graft.Tables.embeddings(spark, sfDir).count())
    val (lambda, v) = PowerIteration.topEigen(m)
    assert(lambda > 0)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    // residual small relative to the eigenvalue => actually an eigenpair
    assert(PowerIteration.residual(m, lambda, v) < 1e-6 * lambda)
    // top eigenvalue is bounded by the trace and dominates the average
    val trace = (0 until 64).map(i => m(i)(i)).sum
    assert(lambda <= trace * (1 + 1e-12) && lambda >= trace / 64)
  }

  // ---- q114 calibration --------------------------------------------------

  test("q114 bins partition the scored set; rates consistent with q110 totals") {
    val bins = eval("q114_calibration_bins").collect()
    val auc = eval("q110_classifier_auc").collect().head
    assert(bins.map(_.getLong(1)).sum === auc.getLong(0) + auc.getLong(1),
      "bin counts must partition all scored vectors")
    assert(bins.map(_.getLong(2)).sum === auc.getLong(0),
      "per-bin positives must sum to the AUC's n_pos")
    bins.foreach { b =>
      val (bin, n, nPos) = (b.getLong(0), b.getLong(1), b.getLong(2))
      assert(bin >= 0 && bin <= 15 && n > 0 && nPos <= n)
      assert(b.getDouble(4) === nPos.toDouble / n)
      assert(b.getDouble(3) >= 0.0 && b.getDouble(3) <= 1.0)
    }
    // mean predicted probability increases with the bin (linear link is
    // monotone in margin, bins are ordered margin slices)
    val preds = bins.sortBy(_.getLong(0)).map(_.getDouble(3))
    assert(preds.zip(preds.tail).forall { case (a, b) => a < b })
  }

  // ---- q112 recall -------------------------------------------------------

  test("q112 recall@5 is consistent with its own inputs") {
    val rows = eval("q112_ann_recall").collect()
    assert(rows.length === 20) // q34 emits 20 query points
    rows.foreach { r =>
      val (nTrue, nHit, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nTrue === 5L)
      assert(nHit >= 0L && nHit <= nTrue)
      assert(recall === nHit.toDouble / nTrue)
    }
    // the LSH index is not useless on this data: some hits exist overall
    assert(rows.map(_.getLong(2)).sum > 0)
  }
}
