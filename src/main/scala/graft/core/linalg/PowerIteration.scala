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

  /** Top-k eigenpairs by power iteration with Hotelling deflation
    * (m ← m − λ·v·vᵀ after each extraction) — the standard small-matrix
    * completion of distributed PCA: the cluster's one-pass `vec_gram`
    * yields the d×d second-moment matrix, this yields its leading
    * invariant subspace. Deterministic (fixed start + iteration budget),
    * so the returned basis is reproducible bit-for-bit. Returns FEWER
    * than k pairs when k exceeds the matrix's effective rank (the
    * residual subspace is exhausted) rather than NaN components. */
  def topK(m: Array[Array[Double]], k: Int, iters: Int = 200)
      : Seq[(Double, Array[Double])] = {
    val d = m.length
    val work = m.map(_.clone())
    var prev = List.empty[Array[Double]]
    val out = Seq.newBuilder[(Double, Array[Double])]
    var exhausted = false
    var n = 0
    while (n < math.min(k, d) && !exhausted) {
      // fully-deflated work matrix (k past the effective rank with exact
      // arithmetic): topEigen's own collapse guard would throw — stop
      // first and return the components that exist
      val frob = math.sqrt(work.iterator.flatten.map(x => x * x).sum)
      if (frob <= 1e-12) exhausted = true
      else {
        val (_, v0) = topEigen(work, iters)
        // Gram-Schmidt against already-extracted components: deflation
        // alone leaves O(convergence-error) cross-talk when eigenvalues
        // are close; explicit re-orthogonalization pins c_i·c_j to
        // machine epsilon
        val v = v0.clone()
        prev.foreach { p =>
          val dot = (0 until d).map(i => v(i) * p(i)).sum
          (0 until d).foreach(i => v(i) -= dot * p(i))
        }
        val nrm = math.sqrt(v.map(x => x * x).sum)
        // k past the matrix's effective rank: the deflated iterate lies
        // (to machine precision) inside span(prev), so the post-GS
        // residual collapses — dividing by it would yield NaN components
        // silently (topEigen guards its own norm; this is the
        // orthogonalized one). Stop and return the components that exist.
        if (nrm <= 1e-12) exhausted = true
        else {
          (0 until d).foreach(i => v(i) /= nrm)
          // Rayleigh quotient on the ORIGINAL matrix for the eigenvalue
          val mv = (0 until d).map(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
          val lambda = (0 until d).map(i => v(i) * mv(i)).sum
          var i = 0
          while (i < d) {
            var j = 0
            while (j < d) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
            i += 1
          }
          prev = v :: prev
          out += ((lambda, v))
          n += 1
        }
      }
    }
    out.result()
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
