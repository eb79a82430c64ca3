package graft.operators

/** Pure-Scala sequential reference for the `classifier_train` /
  * `classifier_train_hashed` gate oracles (the KMeansRef pattern):
  * recomputes the quality LABEL and BOTH feature spaces from raw text
  * with plain string ops, then runs the same clamp/literal-order/
  * GD-update/log-loss as [[TextClassifier]] — no Spark code anywhere
  * in the oracle path. Weights are round6-quantized after every GD
  * step, mirroring the distributed side, so summation-order divergence
  * cannot compound across iterations.
  *
  * Tokenization parity: Spark's `split(text, '\\s+')` is Java regex
  * split keeping trailing empties, ours drops them — but both sides
  * filter empties, so the token multisets agree exactly. Length
  * parity: Spark `length()` counts CODE POINTS, so the ref counts via
  * `codePointCount` (plain `String.length` is UTF-16 units and would
  * diverge on any non-BMP character). The counted chars (' ', 'e',
  * 'a') are BMP, and no UTF-16 code unit equal to a BMP char can be
  * part of a surrogate pair, so `count(_ == ch)` needs no such
  * correction.
  */
object TextClassifierRef {

  import TextClassifier.{Dim, HashedDim}

  private val Stop = TextAnalysis.StopWords.toSet

  private def tokens(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** Quality label shared by both feature spaces; None = unlabeled
    * (empty doc or no tokens), dropped on both sides.
    */
  private def label(text: String, toks: Array[String]): Option[Double] = {
    if (text.isEmpty || toks.isEmpty) return None
    val nt = toks.length
    val nstop = toks.count(Stop.contains)
    // same expression tree as labeledFeatures: (min/100.0)*(1 − nstop/nt)
    val quality = math.min(nt, 100).toDouble / 100.0 * (1.0 - nstop.toDouble / nt.toDouble)
    Some(if (quality >= 0.5) 1.0 else 0.0)
  }

  private def charRow(text: String): Option[(Double, Array[Double])] = {
    val toks = tokens(text)
    label(text, toks).map { y =>
      val len = text.codePointCount(0, text.length).toDouble
      (y, Array(
        1.0,
        math.min(len, 1000.0) / 1000.0,
        text.count(_ == ' ') / len,
        text.count(_ == 'e') / len,
        text.count(_ == 'a') / len))
    }
  }

  /** md5-first-hex-digit bucket of a token — the serving scorer's
    * feature hash, computed with the JDK digest (UTF-8 bytes, same as
    * Spark's md5 over a UTF8String).
    */
  private def hashBucket(tok: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (d(0) >> 4) & 0xf
  }

  private def hashedRow(text: String): Option[(Double, Array[Double])] = {
    val toks = tokens(text)
    label(text, toks).map { y =>
      val nt = toks.length
      val cnt = new Array[Long](16)
      toks.foreach(t => cnt(hashBucket(t)) += 1)
      (y, Array(1.0, math.min(nt, 100).toDouble / 100.0) ++
        cnt.map(_.toDouble / nt.toDouble))
    }
  }

  private def sigmoid(w: Array[Double], x: Array[Double]): Double = {
    // same left-to-right literal order as TextClassifier.pCol's fold
    var z = w(0) * x(0)
    var i = 1
    while (i < w.length) { z += w(i) * x(i); i += 1 }
    val zc = math.min(math.max(z, -30.0), 30.0)
    1.0 / (1.0 + math.exp(-zc))
  }

  private def trainRows(
      rows: Seq[(Double, Array[Double])],
      dim: Int,
      iters: Int,
      lr: Double): (Array[Double], Double) = {
    val n = rows.size.toDouble
    var w = new Array[Double](dim)
    for (_ <- 0 until iters) {
      val g = new Array[Double](dim)
      rows.foreach { case (y, x) =>
        val d = sigmoid(w, x) - y
        var i = 0
        while (i < dim) { g(i) += d * x(i); i += 1 }
      }
      w = Array.tabulate(dim)(i => Similarity.round6(w(i) - lr / n * g(i)))
    }
    val loss = rows.map { case (y, x) =>
      val p = sigmoid(w, x)
      -(y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
    }.sum / n
    (w, loss)
  }

  /** (weights, meanLogLoss) after `iters` full-batch GD steps from w=0
    * over the char-ratio features.
    */
  def train(texts: Seq[String], iters: Int, lr: Double): (Array[Double], Double) =
    trainRows(texts.flatMap(charRow), Dim, iters, lr)

  /** (weights, meanLogLoss) over the hashed-token features. */
  def trainHashed(texts: Seq[String], iters: Int, lr: Double): (Array[Double], Double) =
    trainRows(texts.flatMap(hashedRow), HashedDim, iters, lr)
}
