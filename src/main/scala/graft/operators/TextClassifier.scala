package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based corpus filtering: distributed training of a logistic-
  * regression classifier over surface text features — the CCNet /
  * fastText-style "train a quality filter, score every document" stage
  * of an LLM data pipeline, here with the TRAINING loop itself
  * expressed as Spark aggregations (no MLlib, no UDFs).
  *
  * The task is DISTILLATION: the label is the expensive tokenizing
  * quality labeler ([[TextAnalysis.qualityScore]] ≥ 0.5 — array-expr
  * tokenize + stopword membership per doc), the features are five
  * cheap character ratios. The trained linear scorer approximates the
  * labeler at a fraction of its cost — at 100 TB you run the tokenizer
  * on the training sample only and the 5-multiply scorer on everything
  * else, which is exactly how production quality filters are built.
  *
  * Scale shape (the kmeansCentroids contract): the data never leaves
  * the executors. Each full-batch gradient-descent iteration is ONE
  * scan of the cached feature frame — a narrow codegen projection
  * (sigmoid of a 5-term dot product with the current weights folded in
  * as literals) followed by one partial+final hash aggregation of the
  * 5 gradient components + log-loss. Only (dim+2) doubles reach the
  * driver per iteration, independent of corpus size; at 100 TB the
  * per-iteration cost is one scan, no shuffle wider than the 7-double
  * aggregate.
  *
  * Determinism/oracle design: features are integer character counts
  * (`translate`-diff) over ratios — exactly reproducible by the pure-
  * Scala [[TextClassifierRef]]; the dot product and sigmoid evaluate
  * in the same literal order in both dialects, so the only divergence
  * is float summation order across partitions, rounded past at 6 dp
  * (the kmeans_centroids argument).
  */
object TextClassifier {

  /** Feature names, in weight-vector order. x0 is the bias. `len_k`
    * (chars/1000, capped at 1) is the load-bearing feature for the
    * corpus at hand — the quality label's coverage term is token
    * count, which length proxies; the char ratios carry the stopword
    * term's (weak) surface signal.
    */
  val FeatureNames: Seq[String] =
    Seq("bias", "len_k", "space_ratio", "e_ratio", "a_ratio")

  val Dim: Int = FeatureNames.length

  /** Count occurrences of `ch` via translate-diff — a codegen builtin
    * chain with an exact pure-Scala twin (`text.count(_ == ch)`).
    */
  private def charCount(text: Column, ch: String): Column =
    length(text) - length(translate(text, ch, ""))

  /** (doc_id, y, x0..x4): label = UNROUNDED quality ≥ 0.5 (integer-
    * derived doubles — bit-identical in the pure-Scala ref, so the
    * threshold has no engine-dependent knife edge), features = bias +
    * per-char ratios. Docs with no tokens (NULL quality) and empty
    * docs are dropped rather than poisoning the gradient.
    */
  def labeledFeatures(docs: DataFrame): DataFrame = {
    val stopArr = TextAnalysis.StopWords.map(w => s"'$w'").mkString("array(", ", ", ")")
    val len = length(col("text")).cast("double")
    docs
      .filter(length(col("text")) > 0)
      .withColumn("toks", expr(Dedup.TokensExpr))
      .withColumn("nt", size(col("toks")))
      .filter(col("nt") > 0)
      .withColumn("nstop", size(expr(s"filter(toks, x -> array_contains($stopArr, x))")))
      .select(
        col("doc_id"),
        (least(col("nt"), lit(100)).cast("double") / lit(100.0) *
          (lit(1.0) - col("nstop").cast("double") / col("nt").cast("double")) >= 0.5)
          .cast("double").as("y"),
        lit(1.0).as("x0"),
        (least(len, lit(1000.0)) / lit(1000.0)).as("x1"),
        (charCount(col("text"), " ").cast("double") / len).as("x2"),
        (charCount(col("text"), "e").cast("double") / len).as("x3"),
        (charCount(col("text"), "a").cast("double") / len).as("x4"))
  }

  /** σ(clamp(w·x)) with the weights folded in as literals. The clamp
    * (±30) keeps log(p) finite in the loss on both engines; at |z|=30
    * the sigmoid is within 1e-13 of its limit so the clamp never
    * changes a rounded result, only prevents -inf.
    */
  private def pCol(w: Array[Double]): Column = {
    val z = (1 until Dim).foldLeft(lit(w(0)) * col("x0"): Column) { (acc, i) =>
      acc + lit(w(i)) * col(s"x$i")
    }
    val zc = least(greatest(z, lit(-30.0)), lit(30.0))
    lit(1.0) / (lit(1.0) + exp(-zc))
  }

  /** `iters` full-batch GD steps from w=0 at fixed `lr`; returns the
    * final weights. The feature frame should be cached by the caller
    * when `iters > 1` (SparkEntry does).
    */
  def trainLogReg(feats: DataFrame, iters: Int, lr: Double): Array[Double] = {
    var w = new Array[Double](Dim)
    for (_ <- 0 until iters) {
      val p = pCol(w)
      val gradAggs = (0 until Dim).map(i => sum((p - col("y")) * col(s"x$i")).as(s"g$i"))
      val row = feats.agg(gradAggs.head, gradAggs.tail :+ count(lit(1)).as("n"): _*).head()
      val n = row.getLong(Dim).toDouble
      w = Array.tabulate(Dim)(i => w(i) - lr / n * row.getDouble(i))
    }
    w
  }

  /** Mean log-loss of `w` over the feature frame — the smooth training
    * metric (no decision threshold, so no knife-edge rows).
    */
  def logLoss(feats: DataFrame, w: Array[Double]): Double = {
    val p = pCol(w)
    val ll = -(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))
    val row = feats.agg(sum(ll).as("s"), count(lit(1)).as("n")).head()
    row.getDouble(0) / row.getLong(1)
  }

  /** Score the corpus with a trained (6dp-rounded) weight vector — the
    * 100 TB path: training runs on a sample, THIS narrow codegen
    * projection runs on everything. The emitted score is the LINEAR
    * z = w·x (monotone in the probability; keep ⟺ z ≥ 0 ⟺ σ(z) ≥ ½):
    * multiply/add only, so the DuckDB twin is bit-identical — `exp` in
    * a cross-engine oracle would hang correctness on libm rounding.
    * Weights arrive ROUNDED so both engines score with exactly the
    * same literals.
    */
  def scoreTable(docs: DataFrame, w: Array[Double]): DataFrame =
    scoreUnordered(docs, w).orderBy(col("doc_id"))

  /** [[scoreTable]] without the presentation sort — a pure stateless
    * projection, legal on a STREAMING frame (append mode, no state
    * store): the "deploy the trained filter at ingest" path.
    */
  def scoreUnordered(docs: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == Dim, s"need $Dim weights, got ${w.length}")
    val feats = labeledFeatures(docs)
    val z = (1 until Dim).foldLeft(lit(w(0)) * col("x0"): Column) { (acc, i) =>
      acc + lit(w(i)) * col(s"x$i")
    }
    feats.select(col("doc_id"), round(z, 6).as("z"), (z >= 0.0).as("keep"))
  }

  /** Train on `docs` (the "sample" at test scale), round the weights,
    * score the same corpus — the composed gate surface for
    * `classifier_score`.
    */
  def trainAndScore(docs: DataFrame, iters: Int, lr: Double): DataFrame = {
    val feats = labeledFeatures(docs).cache()
    val w = try trainLogReg(feats, iters, lr) finally feats.unpersist()
    scoreTable(docs, w.map(Similarity.round6))
  }

  /** Gate surface: (term, value·6dp) — the Dim trained weights plus the
    * final mean log-loss, long format like kmeans_centroids.
    */
  def trainTable(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      iters: Int,
      lr: Double): DataFrame = {
    import spark.implicits._
    val feats = labeledFeatures(docs).cache()
    try {
      val w = trainLogReg(feats, iters, lr)
      val loss = logLoss(feats, w)
      (FeatureNames.zip(w.map(Similarity.round6)) :+ ("log_loss" -> Similarity.round6(loss)))
        .toDF("term", "value")
        .orderBy(col("term"))
    } finally feats.unpersist()
  }
}
