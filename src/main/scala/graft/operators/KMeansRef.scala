package graft.operators

/** Pure-Scala Lloyd's k-means reference for the `kmeans_centroids` /
  * `kmeans_inertia` gate oracles (the MinHashRef / BpeRef /
  * FineDedupRef pattern: an independent sequential implementation, no
  * Spark code, emitted as VALUES literals at oracle-generation time).
  *
  * Mirrors the contract of [[Similarity.kmeansTrace]] exactly:
  *   - init = the k vectors with the lowest vec_id, 6dp-quantized;
  *   - assignment = argmax_j (2·v·c_j − |c_j|²) (equivalently argmin
  *     squared L2), ties to the lowest j;
  *   - dot products accumulate ascending-index in double (the same
  *     left-fold association as the codegen FloatDotConstExpr), so
  *     per-iteration scores are bit-identical to the Spark side;
  *   - new centroid = per-dimension mean, 6dp-quantized; an empty
  *     cluster keeps its previous centroid. The per-iteration
  *     quantization (BOTH sides) re-zeroes distributed-vs-sequential
  *     float summation divergence each iteration instead of letting it
  *     compound across iterations with partition count;
  *   - inertia = Σ(|v|² − best score) of the centroids ENTERING the
  *     iteration, accumulated per bucket and combined in bucket index
  *     order (the same driver-side fold as the Spark trace), round6'd.
  */
object KMeansRef {

  private def dot(v: Array[Float], c: Array[Double]): Double = {
    var a = 0.0
    var i = 0
    while (i < v.length) { a += v(i) * c(i); i += 1 }
    a
  }

  /** |v|² with the FloatDotSelfExpr association: CAST(x)·CAST(x),
    * ascending, accumulated in double.
    */
  private def selfSq(v: Array[Float]): Double = {
    var a = 0.0
    var i = 0
    while (i < v.length) { a += v(i).toDouble * v(i).toDouble; i += 1 }
    a
  }

  /** (centroids, per-iteration inertias) after `iters` Lloyd steps.
    * Init = farthest-point from the lowest-vec_id vector (ties to the
    * lowest vec_id), mirroring [[Similarity.kmeansTrace]]: the
    * selection scores are per-row expressions on both sides — no
    * distributed sums — so seed choice is bit-exactly reproducible.
    */
  def trace(
      vecs: Seq[(Long, Array[Float])],
      k: Int,
      iters: Int): (Array[Array[Double]], Array[Double]) = {
    val sorted = vecs.sortBy(_._1)
    require(sorted.nonEmpty, "need at least 1 vector")
    val seeds = scala.collection.mutable.ArrayBuffer(
      sorted.head._2.map(f => Similarity.round6(f.toDouble)))
    while (seeds.length < k) {
      val norms = seeds.map(c => c.map(x => x * x).sum)
      // argmax of min-squared-distance == argmax of (|v|² − max_j score)
      var bestD2 = Double.NegativeInfinity
      var bestVec: Array[Float] = null
      sorted.foreach { case (_, v) =>
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < seeds.length) {
          val s = 2.0 * dot(v, seeds(j)) - norms(j)
          if (s > mx) mx = s
          j += 1
        }
        val d2 = selfSq(v) - mx
        if (d2 > bestD2) { bestD2 = d2; bestVec = v } // strict > == lowest-id tie-break
      }
      seeds += bestVec.map(f => Similarity.round6(f.toDouble))
    }
    var cents: Array[Array[Double]] = seeds.toArray
    require(cents.length == k, s"need at least $k vectors, got ${cents.length}")
    val dim = cents.head.length
    val inertias = new Array[Double](iters)
    for (it <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      val bucketCost = new Array[Double](k)
      val norms = cents.map(c => c.map(x => x * x).sum)
      vecs.foreach { case (_, v) =>
        val scores = Array.tabulate(k)(j => 2.0 * dot(v, cents(j)) - norms(j))
        val mx = scores.max
        val b = scores.indexWhere(_ >= mx)
        counts(b) += 1
        bucketCost(b) += selfSq(v) - mx
        var i = 0
        while (i < dim) { sums(b)(i) += v(i); i += 1 }
      }
      inertias(it) = Similarity.round6(bucketCost.foldLeft(0.0)(_ + _))
      cents = Array.tabulate(k) { j =>
        if (counts(j) == 0) cents(j)
        else sums(j).map(x => Similarity.round6(x / counts(j)))
      }
    }
    (cents, inertias)
  }

  def centroids(
      vecs: Seq[(Long, Array[Float])],
      k: Int,
      iters: Int): Array[Array[Double]] =
    trace(vecs, k, iters)._1

  /** Sequential twin of [[Similarity.kmeansSphericalTrace]]: unit
    * centroids, plain-dot argmax assignment, per-dimension mean of the
    * NORMALIZED vectors, normalize-round6 update via the SHARED
    * [[Similarity.normalizeRound6]]/[[Similarity.normalizedSeed]]
    * helpers; inertia = Σ(1 − v̂·c_assigned), per-bucket partials
    * combined in bucket index order. Zero-norm vectors are excluded
    * (no direction), matching the Spark side's filter.
    */
  def sphericalTrace(
      vecs: Seq[(Long, Array[Float])],
      k: Int,
      iters: Int): (Array[Array[Double]], Array[Double]) = {
    val unit = vecs.sortBy(_._1).filter { case (_, v) => selfSq(v) > 0 }
    require(unit.nonEmpty, "need at least 1 nonzero vector")
    val seeds = scala.collection.mutable.ArrayBuffer(
      Similarity.normalizedSeed(unit.head._2))
    while (seeds.length < k) {
      var bestAng = Double.PositiveInfinity
      var bestVec: Array[Float] = null
      unit.foreach { case (_, v) =>
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < seeds.length) {
          val s = dot(v, seeds(j))
          if (s > mx) mx = s
          j += 1
        }
        val ang = mx / math.sqrt(selfSq(v))
        if (ang < bestAng) { bestAng = ang; bestVec = v } // strict < == lowest-id tie-break
      }
      seeds += Similarity.normalizedSeed(bestVec)
    }
    var cents: Array[Array[Double]] = seeds.toArray
    val dim = cents.head.length
    val inertias = new Array[Double](iters)
    for (it <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      val bucketCost = new Array[Double](k)
      unit.foreach { case (_, v) =>
        val scores = Array.tabulate(k)(j => dot(v, cents(j)))
        val mx = scores.max
        val b = scores.indexWhere(_ >= mx)
        val nrm = math.sqrt(selfSq(v))
        counts(b) += 1
        bucketCost(b) += 1.0 - mx / nrm
        var i = 0
        while (i < dim) { sums(b)(i) += v(i) / nrm; i += 1 }
      }
      inertias(it) = Similarity.round6(bucketCost.foldLeft(0.0)(_ + _))
      cents = Array.tabulate(k) { j =>
        if (counts(j) == 0) cents(j)
        else Similarity.normalizeRound6(sums(j).map(_ / counts(j)))
      }
    }
    (cents, inertias)
  }
}
