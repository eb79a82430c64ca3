package graft.operators

/** Pure-Scala sequential reference for the `classifier_train` gate
  * oracle (the KMeansRef pattern): recomputes the quality LABEL and
  * the character-ratio FEATURES from raw text with plain string ops,
  * then runs the same clamp/literal-order/GD-update/log-loss as
  * [[TextClassifier]] — no Spark code anywhere in the oracle path.
  *
  * Tokenization parity: Spark's `split(text, '\\s+')` is Java regex
  * split keeping trailing empties, ours drops them — but both sides
  * filter empties, so the token multisets agree exactly.
  */
object TextClassifierRef {

  import TextClassifier.Dim

  private val Stop = TextAnalysis.StopWords.toSet

  private def row(text: String): Option[(Double, Array[Double])] = {
    val len = text.length.toDouble
    if (len == 0) return None
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val nt = toks.length
    if (nt == 0) return None
    val nstop = toks.count(Stop.contains)
    // same expression tree as labeledFeatures: (min/100.0)*(1 − nstop/nt)
    val quality = math.min(nt, 100).toDouble / 100.0 * (1.0 - nstop.toDouble / nt.toDouble)
    val y = if (quality >= 0.5) 1.0 else 0.0
    val x = Array(
      1.0,
      math.min(len, 1000.0) / 1000.0,
      text.count(_ == ' ') / len,
      text.count(_ == 'e') / len,
      text.count(_ == 'a') / len)
    Some((y, x))
  }

  private def sigmoid(w: Array[Double], x: Array[Double]): Double = {
    // same left-to-right literal order as TextClassifier.pCol's fold
    var z = w(0) * x(0)
    var i = 1
    while (i < Dim) { z += w(i) * x(i); i += 1 }
    val zc = math.min(math.max(z, -30.0), 30.0)
    1.0 / (1.0 + math.exp(-zc))
  }

  /** (weights, meanLogLoss) after `iters` full-batch GD steps from w=0. */
  def train(texts: Seq[String], iters: Int, lr: Double): (Array[Double], Double) = {
    val rows = texts.flatMap(row)
    val n = rows.size.toDouble
    var w = new Array[Double](Dim)
    for (_ <- 0 until iters) {
      val g = new Array[Double](Dim)
      rows.foreach { case (y, x) =>
        val d = sigmoid(w, x) - y
        var i = 0
        while (i < Dim) { g(i) += d * x(i); i += 1 }
      }
      w = Array.tabulate(Dim)(i => w(i) - lr / n * g(i))
    }
    val loss = rows.map { case (y, x) =>
      val p = sigmoid(w, x)
      -(y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
    }.sum / n
    (w, loss)
  }
}
