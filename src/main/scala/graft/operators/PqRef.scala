package graft.operators

/** Pure-Scala sequential twin of [[Pq.trainCodebooks]] for the
  * `pq_codebooks` VALUES oracle — no Spark types anywhere, same
  * determinism contract as [[KMeansRef]]: 6dp quantization after
  * seeding and after every update re-zeroes summation-order divergence
  * between the distributed hash aggregation and this sequential fold;
  * assignment scores use the identical left-fold dot order and
  * strict-`>` lowest-index tie-break.
  */
object PqRef {

  private def subDot(v: Array[Float], s: Int, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < Pq.SubDim) {
      acc += v(s * Pq.SubDim + i).toDouble * c(i)
      i += 1
    }
    acc
  }

  /** Mirrors [[Pq.trainCodebooks]]: id-strided seeds (first vector with
    * vec_id ≥ j·(maxId+1)/k), then `iters` Lloyd rounds per subspace
    * with empty clusters keeping their previous centroid.
    */
  def trainCodebooks(
      vecs: Seq[(Long, Array[Float])],
      k: Int = Pq.CodebookK,
      iters: Int = Pq.Iters): Pq.Codebooks = {
    require(vecs.nonEmpty, "need at least 1 vector")
    val sorted = vecs.sortBy(_._1)
    val maxId = sorted.last._1
    val seedRows = (0 until k).map { j =>
      val threshold = (j.toLong * (maxId + 1)) / k
      sorted.find(_._1 >= threshold)
        .getOrElse(sys.error(s"no vector with vec_id >= $threshold"))._2
    }
    var books: Pq.Codebooks = Array.tabulate(Pq.SubSpaces) { s =>
      seedRows.map { v =>
        Array.tabulate(Pq.SubDim)(i => Similarity.round6(v(s * Pq.SubDim + i).toDouble))
      }.toArray
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(Pq.SubSpaces, k)(new Array[Double](Pq.SubDim))
      val counts = Array.fill(Pq.SubSpaces)(new Array[Long](k))
      val norms = books.map(_.map(Pq.normSq))
      vecs.foreach { case (_, v) =>
        var s = 0
        while (s < Pq.SubSpaces) {
          var mx = Double.NegativeInfinity
          var best = 0
          var j = 0
          while (j < k) {
            val sc = 2.0 * subDot(v, s, books(s)(j)) - norms(s)(j)
            if (sc > mx) { mx = sc; best = j } // strict > == lowest-index ties
            j += 1
          }
          counts(s)(best) += 1
          var i = 0
          while (i < Pq.SubDim) {
            sums(s)(best)(i) += v(s * Pq.SubDim + i).toDouble
            i += 1
          }
          s += 1
        }
      }
      books = Array.tabulate(Pq.SubSpaces) { s =>
        Array.tabulate(k) { j =>
          if (counts(s)(j) == 0) books(s)(j)
          else Array.tabulate(Pq.SubDim)(i =>
            Similarity.round6(sums(s)(j)(i) / counts(s)(j)))
        }
      }
    }
    books
  }
}
