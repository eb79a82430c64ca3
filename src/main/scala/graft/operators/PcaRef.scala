package graft.operators

/** Sequential pure-Scala PCA reference — the independent twin that
  * generates oracle literals for the `pca_*` gates (the [[KMeansRef]]
  * discipline: same math, zero shared execution machinery with the
  * distributed [[Pca]] implementation; covariance accumulates in plain
  * driver loops, the eigensolver is a from-scratch cyclic Jacobi).
  *
  * Gate design note (why the gates are rotation-invariant): the
  * synthetic corpus is near-isotropic — covariance eigen-GAPS are
  * ~3.6e-5 at sf0.1 — so raw eigenVECTOR coordinates are conditioned
  * as tol/gap and can differ between two correct implementations by
  * more than the 6-dp hash resolution. EigenVALUES perturb only by
  * ‖ΔC‖ (Weyl), and the reconstruction/whitening certificates sit at
  * optima where subspace error enters at SECOND order — those are the
  * quantities the oracles pin. Vector-level parity is asserted with an
  * explicit tolerance in PcaSpec instead.
  */
object PcaRef {

  /** Sample mean and sample covariance (n−1 denominator) of the corpus,
    * accumulated sequentially in doubles.
    */
  def meanCov(vecs: Seq[Array[Float]]): (Long, Array[Double], Array[Array[Double]]) = {
    val d = vecs.head.length
    val n = vecs.length.toLong
    val s = new Array[Double](d)
    val p = Array.ofDim[Double](d, d)
    vecs.foreach { v =>
      var i = 0
      while (i < d) {
        val xi = v(i).toDouble
        s(i) += xi
        var j = i
        while (j < d) { p(i)(j) += xi * v(j).toDouble; j += 1 }
        i += 1
      }
    }
    val mean = s.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      (p(a)(b) - s(a) * s(b) / n) / (n - 1)
    }
    (n, mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: sweeps
    * over every (p,q) pair until the off-diagonal Frobenius norm drops
    * below 1e-14·‖A‖ (or 64 sweeps). Returns eigenvalues DESCENDING
    * with their eigenvectors as rows, each sign-canonicalized (the
    * entry of largest magnitude is positive; ties to the lowest
    * index). Deterministic: fixed sweep order, no data-dependent
    * pivoting.
    */
  def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val normA = math.sqrt(a.map(r => r.map(x => x * x).sum).sum)
    val tol = 1e-14 * math.max(normA, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (off > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // equal diagonals need the full 45° rotation (signum(0)=0
            // would silently skip the pair and never converge)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = {
        var acc = 0.0
        var i = 0
        while (i < d) {
          var j = i + 1
          while (j < d) { acc += 2.0 * a(i)(j) * a(i)(j); j += 1 }
          i += 1
        }
        math.sqrt(acc)
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(j => -a(j)(j))
    val eig = order.map(j => a(j)(j)).toArray
    val vecs = order.map(j => canonicalize(Array.tabulate(d)(i => v(i)(j)))).toArray
    (eig, vecs)
  }

  /** Sign canonicalization: flip the vector so its largest-magnitude
    * entry is positive (ties broken by the LOWEST index) — removes the
    * eigenvector sign ambiguity identically in both implementations.
    */
  def canonicalize(vec: Array[Double]): Array[Double] = {
    var best = 0
    var i = 1
    while (i < vec.length) {
      if (math.abs(vec(i)) > math.abs(vec(best))) best = i
      i += 1
    }
    if (vec(best) < 0) vec.map(-_) else vec
  }

  /** Full sequential training: (n, mean, eigenvalues desc, eigenvector rows). */
  def train(vecs: Seq[Array[Float]]): (Long, Array[Double], Array[Double], Array[Array[Double]]) = {
    val (n, mean, cov) = meanCov(vecs)
    val (eig, evs) = jacobiEigen(cov)
    (n, mean, eig, evs)
  }
}
