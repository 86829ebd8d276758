package graft.queries

import graft.SparkSpec
import graft.core.linalg.PowerIteration
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private lazy val (model, trace) = Pca.fit(spark, sfDir, k = 4)

  test("components are orthonormal and eigenvalues decreasing") {
    val c = model.components.map(_.toArray)
    for (i <- c.indices; j <- i until c.length) {
      val dot = c(i).zip(c(j)).map { case (a, b) => a * b }.sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-9, s"‖c$i‖")
      else assert(math.abs(dot) < 1e-6, s"c$i . c$j")
    }
    val ev = model.eigenvalues
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b && b > 0 })
    val explained = model.explained(trace)
    assert(explained > 0 && explained <= 1 + 1e-12)
  }

  test("quantized Gram eigensolve matches the float recompute") {
    // independent reference: exact double Gram from collected vectors
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = 64
    val m = Array.ofDim[Double](d, d)
    for (v <- vecs; i <- 0 until d; j <- 0 until d) m(i)(j) += v(i) * v(j)
    val refPairs = PowerIteration.topK(m, 2)
    // eigenvalues agree to the quantization bound (2^-12 per component)
    model.eigenvalues.take(2).zip(refPairs.map(_._1)).foreach {
      case (got, want) =>
        assert(math.abs(got - want) / want < 1e-3, s"$got vs $want")
    }
    // leading subspace agrees: |cos| of component angles ≈ 1
    model.components.take(2).zip(refPairs.map(_._2)).foreach {
      case (got, want) =>
        val cos = got.zip(want).map { case (a, b) => a * b }.sum
        assert(math.abs(math.abs(cos) - 1.0) < 1e-4, s"|cos|=$cos")
    }
  }

  test("k past the effective rank returns fewer components, never NaN") {
    // exact rank-1 matrix: v.vT with v = (1, 2, 2)
    val v = Array(1.0, 2.0, 2.0)
    val m = Array.tabulate(3, 3)((i, j) => v(i) * v(j))
    val pairs = PowerIteration.topK(m, 3)
    assert(pairs.length == 1, s"rank-1 matrix must yield 1 pair, got ${pairs.length}")
    assert(math.abs(pairs.head._1 - 9.0) < 1e-9) // lambda = |v|^2
    assert(pairs.forall { case (l, c) => !l.isNaN && c.forall(!_.isNaN) })

    // near-rank-2: a tiny third eigenvalue below the exhaustion floor is
    // not extracted as garbage either
    val m2 = Array.tabulate(3, 3)((i, j) =>
      v(i) * v(j) + (if (i == j && i < 2) 1e-15 else 0.0))
    val p2 = PowerIteration.topK(m2, 3)
    assert(p2.forall { case (l, c) => !l.isNaN && c.forall(!_.isNaN) })
  }

  test("projection is a narrow map and preserves captured variance") {
    val projected = Pca.project(
      graft.Tables.embeddings(spark, sfDir), model)
    val plan = projected.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    // Σ‖pc‖² over rows = Σ captured eigenvalue mass (Parseval on the
    // projected subspace) — checked against the model's eigenvalues
    val sumSq = projected
      .select(explode(col("pc")).as("x")).agg(sum(col("x") * col("x")))
      .collect().head.getDouble(0)
    val want = model.eigenvalues.sum
    assert(math.abs(sumSq - want) / want < 1e-3, s"$sumSq vs $want")
  }
}
