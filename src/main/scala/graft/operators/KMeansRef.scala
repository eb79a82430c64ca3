package graft.operators

/** Pure-Scala Lloyd's k-means reference for the `kmeans_centroids`
  * gate oracle (the MinHashRef / BpeRef / FineDedupRef pattern: an
  * independent sequential implementation, no Spark code, emitted as
  * VALUES literals at oracle-generation time).
  *
  * Mirrors the contract of [[Similarity.kmeansCentroids]] exactly:
  *   - init = the k vectors with the lowest vec_id;
  *   - assignment = argmax_j (2·v·c_j − |c_j|²) (equivalently argmin
  *     squared L2), ties to the lowest j;
  *   - dot products accumulate ascending-index in double (the same
  *     left-fold association as the codegen FloatDotConstExpr), so
  *     iteration-1 scores are bit-identical to the Spark side;
  *   - new centroid = per-dimension mean; an empty cluster keeps its
  *     previous centroid.
  */
object KMeansRef {

  private def dot(v: Array[Float], c: Array[Double]): Double = {
    var a = 0.0
    var i = 0
    while (i < v.length) { a += v(i) * c(i); i += 1 }
    a
  }

  def centroids(
      vecs: Seq[(Long, Array[Float])],
      k: Int,
      iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] =
      vecs.sortBy(_._1).take(k).map(_._2.map(_.toDouble)).toArray
    require(cents.length == k, s"need at least $k vectors, got ${cents.length}")
    val dim = cents.head.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      val norms = cents.map(c => c.map(x => x * x).sum)
      vecs.foreach { case (_, v) =>
        val scores = Array.tabulate(k)(j => 2.0 * dot(v, cents(j)) - norms(j))
        val mx = scores.max
        val b = scores.indexWhere(_ >= mx)
        counts(b) += 1
        var i = 0
        while (i < dim) { sums(b)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { j =>
        if (counts(j) == 0) cents(j)
        else sums(j).map(_ / counts(j))
      }
    }
    cents
  }
}
