package graft.core.linalg

/** Driver-side top-eigenpair solve for the d×d Gram matrix produced by the
  * `vec_gram` aggregate (graft.plans.VecGramAgg) — the cheap half of PCA:
  * the cluster pays O(N·d²) for the second-moment sums in one scan; the
  * eigensolve on the resulting d×d (64×64 here) matrix is microseconds on
  * the driver, exactly how distributed PCA splits work (Spark MLlib's own
  * RowMatrix.computePrincipalComponents does the same: distributed Gram,
  * local eigendecomposition).
  *
  * Power iteration with deterministic start (the all-ones direction) and a
  * fixed iteration budget — no randomness, so results are reproducible
  * run-to-run, matching the engine's repo-wide determinism contract.
  */
object PowerIteration {

  /** Unpack VecGramAgg's `[n, d, packed upper triangle...]` output into a
    * dense symmetric d×d matrix of doubles (un-quantized by 1/scale²). */
  def unpackGram(out: Array[Long], scale: Double): (Long, Array[Array[Double]]) = {
    val n = out(0)
    val d = out(1).toInt
    val m = Array.ofDim[Double](d, d)
    var idx = 2
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = out(idx) / (scale * scale)
        m(i)(j) = v
        m(j)(i) = v
        idx += 1
        j += 1
      }
      i += 1
    }
    (n, m)
  }

  /** Top eigenvalue and unit eigenvector of symmetric `m` (power
    * iteration, `iters` fixed steps from the normalized all-ones
    * vector). */
  def topEigen(m: Array[Array[Double]], iters: Int = 200): (Double, Array[Double]) = {
    val d = m.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "power iteration collapsed to the zero vector")
      v = w.map(_ / nrm)
      lambda = nrm
      it += 1
    }
    (lambda, v)
  }

  /** ‖m·v − λ·v‖₂ — convergence residual for tests. */
  def residual(m: Array[Array[Double]], lambda: Double, v: Array[Double]): Double = {
    val d = m.length
    math.sqrt((0 until d).map { i =>
      val mv = (0 until d).map(j => m(i)(j) * v(j)).sum
      val r = mv - lambda * v(i)
      r * r
    }.sum)
  }
}
