package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LanguageModel, Profiling, Sampling, TextAnalysis}

/** Semantic checks for the LM-statistics, Gopher-rule, split, and
  * anomaly operators on crafted inputs with hand-computed expectations
  * — the oracle gate proves engine parity; these prove the math.
  */
class CorpusModelSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", s"src${id % 3}") }
      .toDF("doc_id", "text", "lang", "source")
  }

  // ---- unigram log-probability ---------------------------------------

  test("unigramLogprob matches the closed form on a 2-doc corpus") {
    // counts: a=2, b=2, c=1; N=5
    val r = LanguageModel.unigramLogprob(docs(1L -> "a a b", 2L -> "b c"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("n_tokens") === 3)
    // doc 1: all tokens have c=2 -> avg = ln(5/2)
    assert(r(1L).getAs[Double]("avg_neg_logprob") ===
      BigDecimal(math.log(2.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 2: (ln(5/2) + ln(5/1)) / 2
    assert(r(2L).getAs[Double]("avg_neg_logprob") ===
      BigDecimal((math.log(2.5) + math.log(5.0)) / 2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("unigramLogprob ranks rare-token docs above common-token docs") {
    val r = LanguageModel.unigramLogprob(docs(
      1L -> "x x x x x x x x",
      2L -> "x x x x hapax1 hapax2 hapax3 hapax4"))
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("avg_neg_logprob")).toMap
    assert(r(2L) > r(1L)) // the hapax-heavy doc scores as less probable
  }

  // ---- bigram PMI -----------------------------------------------------

  test("bigramPmi computes the Church-Hanks statistic on a tiny corpus") {
    // "a b a b": pairs (a,b)x2, (b,a)x1; unigrams a=2, b=2, Ntok=4, Nbg=3
    val rows = LanguageModel.bigramPmi(docs(1L -> "a b a b")).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("w1") === "a" && rows(0).getAs[String]("w2") === "b")
    assert(rows(0).getAs[Long]("n_pair") === 2)
    val expected = math.log((2.0 / 3.0) / ((2.0 / 4.0) * (2.0 / 4.0)))
    assert(math.abs(rows(0).getAs[Double]("pmi") - expected) < 1e-6)
    assert(rows(1).getAs[Long]("n_pair") === 1) // (b, a)
  }

  // ---- interpolated-bigram LM scoring ---------------------------------

  test("bigramInterpLogprob matches the closed form on a 1-doc corpus") {
    // "a b a b": unigrams a=2 b=2 N=4; pairs (a,b)=2 (b,a)=1; λ=0.75
    //   p(b|a) = .75·(2/2) + .25·(2/4) = 0.875   (two occurrences)
    //   p(a|b) = .75·(1/2) + .25·(2/4) = 0.5     (one occurrence)
    val r = LanguageModel.bigramInterpLogprob(docs(1L -> "a b a b")).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_bigrams") === 3)
    val expected = (-2 * math.log(0.875) - math.log(0.5)) / 3
    assert(math.abs(r(0).getAs[Double]("avg_neg_logprob_bi") - expected) < 1e-6)
  }

  test("bigramInterpLogprob scores word ORDER: shuffled bag ranks worse") {
    // identical token bags (a×3, b×3 each) — only adjacency differs:
    // the alternating doc rides the corpus's dominant (a,b) transition,
    // the clumped doc sits on rare (a,a)/(b,b) transitions
    val r = LanguageModel.bigramInterpLogprob(docs(
      1L -> "a b a b a b",
      2L -> "a a a b b b"))
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("avg_neg_logprob_bi")).toMap
    assert(r(2L) > r(1L))
  }

  test("bigramInterpLogprob: docs with < 2 tokens are absent") {
    val r = LanguageModel.bigramInterpLogprob(docs(1L -> "solo", 2L -> "x y"))
      .collect().map(_.getLong(0))
    assert(r.toSeq === Seq(2L))
  }

  // ---- Kneser-Ney bigram LM scoring -----------------------------------

  test("bigramKnLogprob matches the closed form; continuation counts drive the back-off") {
    // docs 1: "z m z m", 2: "a v b v"
    // pairs: (z,m)=2 (m,z)=1 (a,v)=1 (v,b)=1 (b,v)=1 → 5 types
    // hist c1x/n1p: z 2/1, m 1/1, a 1/1, v 1/1, b 1/1
    // cont n1p_rev: m 1, z 1, v 2 (follows a AND b), b 1
    //   p(m|z) = (2−.75)/2 + .75·(1/2)·(1/5) = 0.7
    //   p(z|m) = (1−.75)/1 + .75·1·(1/5)     = 0.4
    //   p(v|a) = .25 + .75·(2/5)             = 0.55   ← v's 2 contexts
    //   p(b|v) = .25 + .75·(1/5)             = 0.4
    //   p(v|b) = 0.55
    // (a,v) and (b,v) share c_xy=1 and c1x=1 with (v,b) — p differs
    // SOLELY because v continues 2 distinct histories: the statistic
    // Jelinek-Mercer's frequency back-off cannot see.
    val r = LanguageModel.bigramKnLogprob(docs(1L -> "z m z m", 2L -> "a v b v"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("n_bigrams") === 3)
    val s1 = -(2 * math.log(0.7) + math.log(0.4)) / 3
    val s2 = -(2 * math.log(0.55) + math.log(0.4)) / 3
    assert(math.abs(r(1L).getAs[Double]("avg_neg_logprob_kn") - s1) < 1e-6)
    assert(math.abs(r(2L).getAs[Double]("avg_neg_logprob_kn") - s2) < 1e-6)
  }

  test("bigramKnLogprob scores word ORDER: shuffled bag ranks worse") {
    val r = LanguageModel.bigramKnLogprob(docs(
      1L -> "a b a b a b",
      2L -> "a a a b b b"))
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("avg_neg_logprob_kn")).toMap
    assert(r(2L) > r(1L))
  }

  test("bigramKnLogprob: docs with < 2 tokens are absent") {
    val r = LanguageModel.bigramKnLogprob(docs(1L -> "solo", 2L -> "x y"))
      .collect().map(_.getLong(0))
    assert(r.toSeq === Seq(2L))
  }

  test("bigramPmi keeps only the top-k by pair count") {
    val many = docs(1L -> "p q p q p q p q", 2L -> "r s", 3L -> "t u")
    val rows = LanguageModel.bigramPmi(many, k = 2).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("n_pair") >= rows(1).getAs[Long]("n_pair"))
  }

  // ---- Gopher rules ---------------------------------------------------

  test("gopherRules evaluates each named rule independently") {
    val stops = "the a and row value" // 5 distinct stop words
    val good = (1 to 4).map(_ => stops).mkString(" ") // 20 words, all alpha
    val short = "tiny doc" // fails r_words
    val symbols = (1 to 20).map(_ => "### ...").mkString(" ") // symbol-heavy, non-alpha
    val r = TextAnalysis.gopherRules(docs(1L -> good, 2L -> short, 3L -> symbols))
      .collect().map(x => x.getLong(0) -> x).toMap

    assert(r(1L).getAs[Int]("r_words") === 1 && r(1L).getAs[Int]("r_stop") === 1)
    assert(r(1L).getAs[Int]("r_alpha") === 1 && r(1L).getAs[Int]("pass") === 1)

    assert(r(2L).getAs[Int]("r_words") === 0) // 2 < 20 words
    assert(r(2L).getAs[Int]("pass") === 0)

    assert(r(3L).getAs[Int]("r_sym") === 0) // 40 symbols / 40 words > 0.1
    assert(r(3L).getAs[Int]("r_alpha") === 0) // zero alphabetic words
    assert(r(3L).getAs[Int]("pass") === 0)
  }

  test("gopherRules mean word length window") {
    val longWords = (1 to 25).map(_ => "incomprehensibility").mkString(" ") // mean 19
    val r = TextAnalysis.gopherRules(docs(1L -> longWords)).collect().head
    assert(r.getAs[Double]("mean_w_len") === 19.0)
    assert(r.getAs[Int]("r_len") === 0)
  }

  // ---- train/val/test split ------------------------------------------

  test("trainSplit is deterministic, total-preserving, and hash-stable under growth") {
    val base = docs((0L until 200L).map(i => i -> s"doc number $i"): _*)
    val r1 = Sampling.trainSplit(base).collect()
    val r2 = Sampling.trainSplit(base).collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
    assert(r1.map(_.getAs[Long]("n_docs")).sum === 200L)
    assert(r1.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    // growing the corpus never moves an existing doc across splits:
    // per-source train counts can only grow
    val grown = docs((0L until 400L).map(i => i -> s"doc number $i"): _*)
    val g = Sampling.trainSplit(grown).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("n_docs")).toMap
    r1.foreach { x =>
      val k = (x.getString(0), x.getString(1))
      assert(g.getOrElse(k, 0L) >= x.getAs[Long]("n_docs"))
    }
  }

  // ---- value anomalies ------------------------------------------------

  private def events(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.map { case (id, et, v) =>
      (id, Timestamp.valueOf("2024-01-01 00:00:00"), id % 7, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("valueAnomalies flags only the outlier, per metric") {
    // metric m: 20 values at ~10 plus one at 1000 -> only that one has |z| > 2.5
    val normal = (1L to 20L).map(i => (i, "m", 10.0 + (i % 5) * 0.1))
    val r = Profiling.valueAnomalies(events(normal :+ ((99L, "m", 1000.0)): _*)).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("event_id") === 99L)
    assert(r.head.getAs[Double]("z") > 2.5)
  }

  test("valueQuartiles buckets by interpolated thresholds, never a window") {
    // 8 values 1..8: p25 = 2.75, p50 = 4.5, p75 = 6.25 -> buckets 2/2/2/2
    val r = Profiling.valueQuartiles(events((1L to 8L).map(i => (i, "m", i.toDouble)): _*))
    assert(!r.queryExecution.executedPlan.toString.contains("Window"))
    val rows = r.collect()
    assert(rows.map(_.getAs[Long]("cnt")).toSeq === Seq(2L, 2L, 2L, 2L))
    assert(rows.map(_.getAs[Int]("bucket")).toSeq === Seq(1, 2, 3, 4))
    assert(rows.head.getAs[Double]("lo") === 1.0 && rows.last.getAs[Double]("hi") === 8.0)
  }

  test("valueAnomalies: single-member and zero-variance metrics yield no rows") {
    val r = Profiling.valueAnomalies(events(
      (1L, "solo", 42.0),
      (2L, "flat", 7.0), (3L, "flat", 7.0), (4L, "flat", 7.0))).collect()
    assert(r.isEmpty)
  }

  // ---- source JS divergence -------------------------------------------

  test("sourceJsDivergence: redundant source ~0, disjoint-vocab source -> ln 2 share") {
    import spark.implicits._
    // src A and B have IDENTICAL token multisets; src C is disjoint vocab
    val d = Seq(
      (1L, "w w z", "en", "A"), (2L, "w w z", "en", "B"),
      (3L, "q q r", "en", "C"))
      .toDF("doc_id", "text", "lang", "source")
    val r = LanguageModel.sourceJsDivergence(d).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("js_divergence")).toMap
    // A == B: each is half the corpus mass of its tokens; C is the only
    // holder of q/r. JS(C, corpus) must far exceed JS(A, corpus), and
    // both stay within [0, ln 2]
    assert(r("A") === r("B"))
    assert(r("C") > r("A") * 2)
    r.values.foreach(v => assert(v >= 0.0 && v <= math.log(2.0) + 1e-9))
  }

  test("sourceJsDivergence: single-source corpus diverges zero from itself") {
    import spark.implicits._
    val d = Seq((1L, "only one source here", "en", "S"))
      .toDF("doc_id", "text", "lang", "source")
    val r = LanguageModel.sourceJsDivergence(d).collect()
    assert(r.length === 1 && r.head.getAs[Double]("js_divergence") === 0.0)
  }

  // ---- corpus entropy -------------------------------------------------

  test("corpusEntropy: hand-computed on a deterministic-transition corpus") {
    // "a b a b": H1 = ln 4 - (2ln2 + 2ln2)/4 = ln 2; every bigram
    // transition is deterministic (a->b, b->a) -> conditional entropy 0
    val r = LanguageModel.corpusEntropy(docs(1L -> "a b a b")).collect().head
    assert(r.getAs[Long]("n_tokens") === 4 && r.getAs[Long]("vocab_size") === 2)
    assert(r.getAs[Double]("unigram_entropy") ===
      BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Long]("n_bigrams") === 3)
    assert(r.getAs[Double]("cond_bigram_entropy") === 0.0)
  }

  test("corpusEntropy: uniform independent tokens reach the ln(vocab) ceiling") {
    val r = LanguageModel.corpusEntropy(docs(1L -> "a b c d")).collect().head
    assert(r.getAs[Double]("unigram_entropy") ===
      BigDecimal(math.log(4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---- streaming anomaly twin ----------------------------------------

  test("streaming anomalies (stream-static join) == batch value_anomalies") {
    val batch = Profiling.valueAnomalies(
      graft.sources.Tables.load(spark, Sf0001, "events")).collect()
    val stream = graft.streaming.StreamingViews
      .runAnomaliesAvailableNow(spark, Sf0001).collect()
    assert(stream.map(_.toString).toSeq === batch.map(_.toString).toSeq)
    assert(batch.nonEmpty)
  }

  // ---- cross-source duplicate leakage --------------------------------

  test("crossSourceDups buckets pairs by unordered source pair") {
    import spark.implicits._
    val d = Seq((1L, "x", "en", "A"), (2L, "x", "en", "B"), (3L, "x", "en", "A"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
      .toDF("a_id", "b_id", "jac")
    val r = graft.operators.Dedup.crossSourceDups(pairs, d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("n_pairs")).toMap
    assert(r === Map(("A", "A") -> 1L, ("A", "B") -> 2L))
  }

  // ---- novelty --------------------------------------------------------

  test("docNovelty: df==1 shingle fraction with hand-computed expectations") {
    // doc1 "a b c d": shingles {abc, bcd}; doc2 "a b c e": {abc, bce}
    // abc has df 2 -> doc1 novelty 1/2 (bcd unique), doc2 1/2 (bce)
    val sh = graft.operators.Dedup.shingleSets(
      docs(1L -> "a b c d", 2L -> "a b c e", 3L -> "a b"), 3)
    val r = graft.operators.Dedup.docNovelty(sh).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet === Set(1L, 2L)) // doc 3 too short for 3-shingles
    assert(r(1L).getAs[Long]("n_shingles") === 2 && r(1L).getAs[Long]("n_unique") === 1)
    assert(r(1L).getAs[Double]("novelty") === 0.5)
    assert(r(2L).getAs[Double]("novelty") === 0.5)
  }

  // ---- length histogram ----------------------------------------------

  test("lengthHistogram bins by 64-token width with exact token sums") {
    val short = (1 to 3).map(_ => "w").mkString(" ") // 3 tokens -> bin 0
    val long = (1 to 70).map(_ => "w").mkString(" ") // 70 tokens -> bin 1
    val r = TextAnalysis.lengthHistogram(docs(1L -> short, 2L -> short, 3L -> long))
      .collect().map(x => x.getAs[Long]("bin") -> x).toMap
    assert(r(0L).getAs[Long]("n_docs") === 2 && r(0L).getAs[Long]("sum_tokens") === 6)
    assert(r(1L).getAs[Long]("n_docs") === 1 && r(1L).getAs[Long]("min_tokens") === 70)
  }

  // ---- rate anomalies -------------------------------------------------

  test("rateAnomalies flags only the spiking minute") {
    import spark.implicits._
    // 20 calm minutes at 5 events + one minute at 50 -> only it spikes
    val rows = (0 until 20).flatMap { m =>
      (0 until 5).map(i => (m * 5L + i, new Timestamp(1700000000000L + m * 60000L), 1L, "m", 1.0, "{}"))
    } ++ (0 until 50).map(i => (900L + i, new Timestamp(1700000000000L + 20 * 60000L), 1L, "m", 1.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Profiling.rateAnomalies(ev).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_events") === 50)
    assert(r.head.getAs[Double]("z") > 3.0)
  }

  // ---- capstone curation report ---------------------------------------

  test("source_curation_report: totals preserved, rates bounded (sf0.001)") {
    val total = graft.sources.Tables.load(spark, Sf0001, "documents").count()
    val r = SparkEntry.queries("source_curation_report")(spark, Sf0001).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum === total) // left joins drop no docs
    r.foreach { x =>
      val pr = x.getAs[Double]("pass_rate")
      assert(pr >= 0.0 && pr <= 1.0)
      val nv = x.getAs[Double]("avg_novelty")
      assert(nv >= 0.0 && nv <= 1.0)
      assert(x.getAs[Double]("avg_lm_score") > 0.0)
    }
  }

  // ---- token-budget corpus selection ----------------------------------

  test("budgetSelect stops inside the boundary score group, tie-broken by doc_id") {
    // 6 docs, 4 tokens each: qualities .04/.04/.03/.03/.02/.02.
    // Total = 24 tokens → budget = floor(0.25·24) = 6: the first
    // q=.04 doc fits (cum 4), the SECOND (same score, larger doc_id)
    // would land at cum 8 > 6 — the cut falls INSIDE the top score
    // group and must respect the doc_id tie-break.
    val d = docs(
      1L -> "w1 w2 w3 w4",          // q = .04
      2L -> "x1 x2 x3 x4",          // q = .04
      3L -> "y1 y2 y3 the",         // q = .03
      4L -> "z1 z2 z3 the",         // q = .03
      5L -> "u1 u2 the the",        // q = .02
      6L -> "v1 v2 the the")        // q = .02
    val r = Sampling.budgetSelect(d).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("doc_id") === 1L)
    assert(r(0).getAs[Long]("cum_tokens") === 4L)
  }

  test("budgetSelect equals the naive global-prefix reference on a mixed corpus") {
    // 60 docs with colliding scores and varying sizes; the reference
    // selection is computed independently on the driver from the same
    // scored rows (global (quality DESC, doc_id) prefix under the
    // budget) — the decomposed plan must match it row-for-row.
    val d = docs((1L to 60L).map { i =>
      val keep = (i % 7 + 1).toInt
      val stop = (i % 3).toInt
      val toksStr =
        ((1 to keep).map(j => s"t${i}_$j") ++ Seq.fill(stop)("the")).mkString(" ")
      i -> toksStr
    }: _*)
    val scored = graft.operators.TextAnalysis.qualityScoreUnordered(d)
      .filter(org.apache.spark.sql.functions.col("n_tokens") > 0)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"), r.getAs[Double]("quality")))
    val budget = math.floor(0.25 * scored.map(_._2.toLong).sum).toLong
    val expected = scored
      .sortBy { case (id, _, q) => (-q, id) }
      .scanLeft((0L, 0, 0.0, 0L)) { case ((_, _, _, cum), (id, nt, q)) =>
        (id, nt, q, cum + nt)
      }
      .drop(1)
      .takeWhile(_._4 <= budget)
    val got = Sampling.budgetSelect(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Double]("quality"), r.getAs[Long]("cum_tokens")))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty) // the fixture funds a non-trivial prefix

    // width-invariance: the scan width is a pure skew dial — the
    // balanced corpus-scale width (and a degenerate width of 1) must
    // select the identical rows in the identical order (ADVICE r13:
    // production callers pass balancedScanWidth(n) through scanWidth)
    val balanced = Sampling.budgetSelect(
      d, scanWidth = Sampling.balancedScanWidth(60L)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Double]("quality"), r.getAs[Long]("cum_tokens")))
    assert(balanced.toSeq === expected.toSeq, "balanced width changed the selection")
    val w1 = Sampling.budgetSelect(d, scanWidth = 1L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Double]("quality"), r.getAs[Long]("cum_tokens")))
    assert(w1.toSeq === expected.toSeq, "width=1 changed the selection")
  }

  test("budgetSelect: top doc over budget -> empty; zero-token docs excluded") {
    val big = (1 to 100).map(j => s"big$j").mkString(" ") // q = 1.0, nt = 100
    val r = Sampling.budgetSelect(docs(
      1L -> big,                    // cum 100 > budget floor(.25·104)=26
      2L -> "the the the x2a",      // q = .01
      3L -> ""))                    // unrankable — must not crash the plan
    assert(r.collect().isEmpty)
  }

  test("perplexityBuckets equals the naive global-rank reference, terciles balanced") {
    // 31 docs with colliding LM scores (sizes repeat mod 5) — the
    // grid-decomposed rank must reproduce the naive one-window tercile
    // assignment exactly, including ties broken by doc_id.
    val d = docs((1L to 31L).map { i =>
      val n = (i % 5 + 2).toInt
      i -> (1 to n).map(j => s"w${(i % 3) + j}").mkString(" ")
    }: _*)
    val scored = LanguageModel.bigramInterpLogprob(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("avg_neg_logprob_bi")))
    val n = scored.length
    val expected = scored
      .sortBy { case (id, _, s) => (s, id) }
      .zipWithIndex
      .map { case ((_, nb, s), idx) => (idx.toLong * 3 / n, nb, s) }
      .groupBy(_._1)
      .map { case (b, rows) =>
        (b.toInt, rows.length.toLong, rows.map(_._2).sum, rows.map(_._3).min, rows.map(_._3).max)
      }
      .toSeq.sortBy(_._1)
    val got = LanguageModel.perplexityBuckets(
      d,
      LanguageModel.vocabFrom(LanguageModel.docTokens(d)),
      LanguageModel.bigramCounts(d)).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("min_score"), r.getAs[Double]("max_score")))
    assert(got.toSeq === expected)
    assert(got.map(_._1).toSeq === Seq(0, 1, 2))
    // equal-size terciles up to the integer remainder
    assert(got.map(_._2).max - got.map(_._2).min <= 1)
    // buckets are score-ordered: head's max <= middle's min, etc.
    assert(got(0)._5 <= got(1)._4 && got(1)._5 <= got(2)._4)
  }

  test("selectionCurve: grid-sized rows, monotonic cums, final frac is exactly 1") {
    val d = docs(
      1L -> "w1 b c d",             // q = .04
      2L -> "e f g h",              // q = .04 — collides with doc 1
      3L -> "i j the",              // q ~ .02
      4L -> "the the")              // q = 0
    val r = Sampling.selectionCurve(d).collect()
    assert(r.length === 3) // one row per DISTINCT score, not per doc
    val cumD = r.map(_.getAs[Long]("cum_docs"))
    val cumT = r.map(_.getAs[Long]("cum_tokens"))
    assert(cumD.toSeq === cumD.sorted.toSeq && cumT.toSeq === cumT.sorted.toSeq)
    assert(r.head.getAs[Long]("n_docs") === 2L) // the colliding pair shares a row
    assert(r.head.getAs[Long]("cum_tokens") === 8L)
    assert(r.last.getAs[Long]("cum_docs") === 4L)
    assert(r.last.getAs[Long]("cum_tokens") === 13L)
    assert(r.last.getAs[Double]("token_frac") === 1.0)
  }

  test("mixtureTemperature: exact shares, weights sum to 1, temperature boosts the tail") {
    import SparkTestBase.spark.implicits._
    // sources sized 1:4 in tokens — α=.5 gives weights 1:2
    val d = Seq(
      (1L, "a b c d", "en", "small"),
      (2L, "a b c d e f g h", "en", "big"),
      (3L, "i j k l m n o p", "en", "big"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Sampling.mixtureTemperature(d).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("small").getAs[Long]("n_tokens") === 4L)
    assert(r("big").getAs[Long]("n_tokens") === 16L)
    assert(r("small").getAs[Double]("natural_share") === 0.2)
    assert(r("big").getAs[Double]("natural_share") === 0.8)
    // sqrt(4):sqrt(16) = 2:4 -> weights 1/3 : 2/3
    assert(r("small").getAs[Double]("temp_weight") === 0.333333)
    assert(r("big").getAs[Double]("temp_weight") === 0.666667)
    assert(r("small").getAs[Double]("boost") > 1.0)   // tail up-weighted
    assert(r("big").getAs[Double]("boost") < 1.0)     // head down-weighted
    assert(math.abs(r.values.map(_.getAs[Double]("temp_weight")).sum - 1.0) < 1e-5)
  }

  test("two-level within-score scan: one dominant score spanning sub-groups stays exact") {
    // 400 docs share ONE quality score (ids 1..400 span sub-groups
    // 0..6 at ScoreScanWidth=64) plus a 10-doc high-score head — the
    // skew shape the two-level scan exists for. The budget funds the
    // head plus ~81 dominant-score docs, so the cut lands in sub-group
    // 1 and budgetSelect must reproduce the naive global-prefix
    // reference exactly across a sub-group boundary.
    val d = docs(
      ((1L to 400L).map(i => i -> "d1 d2 d3 d4") ++            // q=.04, 4 tokens
        (401L to 410L).map(i => i -> (1 to 10).map(j => s"h${i}_$j").mkString(" "))): _*)
    val scored = graft.operators.TextAnalysis.qualityScoreUnordered(d)
      .filter(org.apache.spark.sql.functions.col("n_tokens") > 0)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"), r.getAs[Double]("quality")))
    val budget = math.floor(0.25 * scored.map(_._2.toLong).sum).toLong
    val expected = scored
      .sortBy { case (id, _, q) => (-q, id) }
      .scanLeft((0L, 0L)) { case ((_, cum), (id, nt, _)) => (id, cum + nt) }
      .drop(1)
      .takeWhile(_._2 <= budget)
    val got = Sampling.budgetSelect(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens")))
    assert(got.toSeq === expected.toSeq)
    // the cut lands inside the dominant score group, past sub-group 0
    assert(got.length > 74 && got.length < 410)
  }

  test("budgetSelectBySource: each source fills its own budget, equality vs naive reference") {
    // 3 sources (docs() assigns src{id % 3}) with very different sizes
    // and colliding scores — each source's selection must be exactly
    // its own naive (quality DESC, doc_id) prefix under 25% of ITS
    // token mass, and a giant source must not crowd out a small one.
    val d = docs((1L to 90L).map { i =>
      val n = (i % 3) match {
        case 0 => 40 // src0: the giant source
        case 1 => 8
        case _ => 4
      }
      val stop = (i % 4).toInt
      i -> ((1 to (n - stop)).map(j => s"t${i}_$j") ++ Seq.fill(stop)("the")).mkString(" ")
    }: _*)
    val scored = graft.operators.TextAnalysis.qualityScoreBySource(d)
      .filter(org.apache.spark.sql.functions.col("n_tokens") > 0)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("n_tokens"), r.getAs[Double]("quality")))
    val expected = scored.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val budget = math.floor(0.25 * rows.map(_._3.toLong).sum).toLong
      rows.sortBy { case (id, _, _, q) => (-q, id) }
        .scanLeft((0L, src, 0, 0.0, 0L)) { case ((_, _, _, _, cum), (id, s, nt, q)) =>
          (id, s, nt, q, cum + nt)
        }
        .drop(1)
        .takeWhile(_._5 <= budget)
    }.sortBy { case (id, src, _, q, _) => (src, -q, id) }
    val got = Sampling.budgetSelectBySource(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("n_tokens"), r.getAs[Double]("quality"), r.getAs[Long]("cum_tokens")))
    assert(got.toSeq === expected)
    // every source is represented — the giant source didn't crowd the
    // small ones out of the mix
    assert(got.map(_._2).distinct.sorted.toSeq === Seq("src0", "src1", "src2"))
  }

  test("dsirLogRatio matches the add-1 closed form; target docs score positive") {
    // docs() assigns source = src{id % 3}: doc 3 is the src0 target.
    // vocab: t=2, q=3, r=3 -> V=3, N_raw=8; target slice (doc 3):
    // t=2, q=1 -> N_tgt=3.
    val d = docs(3L -> "t t q", 1L -> "r r q", 2L -> "r q")
    val toks = LanguageModel.docTokens(d)
    val r = LanguageModel.dsirLogRatio(toks, LanguageModel.vocabFrom(toks))
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("avg_log_ratio")).toMap
    def p(c: Long, n: Long) = (c + 1).toDouble / (n + 3).toDouble
    val expected3 =
      (2 * (math.log(p(2, 3)) - math.log(p(2, 8))) +
        (math.log(p(1, 3)) - math.log(p(3, 8)))) / 3
    assert(r(3L) ===
      BigDecimal(expected3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(3L) > 0)            // target doc pulls toward the target LM
    assert(r(1L) < 0 && r(2L) < 0) // off-target docs pull away
  }

  test("dsirSelect returns the k best in (weight DESC, doc_id) order") {
    val d = docs(3L -> "t t q", 1L -> "r r q", 2L -> "r q")
    val toks = LanguageModel.docTokens(d)
    val all = LanguageModel.dsirSelect(toks, LanguageModel.vocabFrom(toks), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(all.length === 2)
    assert(all.head === 3L) // the target doc ranks first
  }

  test("dsirLogRatioFrom: out-of-vocab tokens under a FROZEN model still score (add-1 smoothing)") {
    // model frozen on the t/q/r corpus (V=3, N_raw=8, N_tgt=3), then a
    // micro-batch arrives whose doc 4 contains tokens the model never
    // saw. Through r13 the inner vocab join dropped them from n_tokens
    // and a fully-unseen doc emitted NO row at all (ADVICE r13).
    val trainDocs = docs(3L -> "t t q", 1L -> "r r q", 2L -> "r q")
    val trainToks = LanguageModel.docTokens(trainDocs)
    val vocab = LanguageModel.vocabFrom(trainToks)
    val tgt = LanguageModel.dsirTargetCounts(trainToks)
    // doc 4: one in-vocab token, two unseen; doc 5: ENTIRELY unseen
    val batch = LanguageModel.docTokens(docs(4L -> "t zz yy", 5L -> "ww ww"))
    val r = LanguageModel.dsirLogRatioFrom(batch, vocab, tgt)
      .collect().map(x => (x.getLong(0), x.getAs[Long]("n_tokens"),
        x.getAs[Double]("avg_log_ratio"))).sortBy(_._1)
    assert(r.map(_._1).toSeq === Seq(4L, 5L), "a fully-OOV doc must emit a score row")
    assert(r(0)._2 === 3L, "OOV tokens must count toward n_tokens")
    assert(r(1)._2 === 2L)
    // closed form: OOV term = log((0+1)/(3+3)) - log((0+1)/(8+3))
    def p(c: Long, n: Long) = (c + 1).toDouble / (n + 3).toDouble
    val oov = math.log(p(0, 3)) - math.log(p(0, 8))
    val exp5 = BigDecimal(oov).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1)._3 === exp5, "fully-OOV doc's score must be the pure smoothing ratio")
    val exp4 = BigDecimal(
      ((math.log(p(2, 3)) - math.log(p(2, 8))) + 2 * oov) / 3
    ).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0)._3 === exp4)
  }

  test("dsirLogRatio: empty target slice smooths to a defined score, no crash") {
    // ids 1 and 2 only -> sources src1/src2, the src0 slice is empty
    val d = docs(1L -> "x y", 2L -> "y z")
    val toks = LanguageModel.docTokens(d)
    val r = LanguageModel.dsirLogRatio(toks, LanguageModel.vocabFrom(toks)).collect()
    assert(r.length === 2)
    assert(r.forall(!_.isNullAt(2)))
  }

  // ---- robustness -----------------------------------------------------

  test("all corpus-model operators handle an empty input without error") {
    import SparkTestBase.spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val emptyEvents = Seq.empty[(Long, Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(LanguageModel.unigramLogprob(emptyDocs).collect().isEmpty)
    assert(LanguageModel.bigramPmi(emptyDocs).collect().isEmpty)
    assert(TextAnalysis.gopherRules(emptyDocs).collect().isEmpty)
    assert(Sampling.trainSplit(emptyDocs).collect().isEmpty)
    assert(Profiling.valueAnomalies(emptyEvents).collect().isEmpty)
    assert(Profiling.valueQuartiles(emptyEvents).collect().isEmpty)
    assert(LanguageModel.sourceJsDivergence(emptyDocs).collect().isEmpty)
    assert(LanguageModel.corpusEntropy(emptyDocs).collect().length === 1) // one all-NULL row
    assert(LanguageModel.bigramInterpLogprob(emptyDocs).collect().isEmpty)
    assert(LanguageModel.bigramKnLogprob(emptyDocs).collect().isEmpty)
    assert(Sampling.budgetSelect(emptyDocs).collect().isEmpty)
    assert(Sampling.selectionCurve(emptyDocs).collect().isEmpty)
    locally {
      val toks = LanguageModel.docTokens(emptyDocs)
      assert(LanguageModel.dsirLogRatio(toks, LanguageModel.vocabFrom(toks))
        .collect().isEmpty)
    }
    assert(Sampling.mixtureTemperature(emptyDocs).collect().isEmpty)
    assert(LanguageModel.perplexityBuckets(
      emptyDocs,
      LanguageModel.vocabFrom(LanguageModel.docTokens(emptyDocs)),
      LanguageModel.bigramCounts(emptyDocs)).collect().isEmpty)
    assert(Profiling.rateAnomalies(emptyEvents).collect().isEmpty)
    assert(TextAnalysis.lengthHistogram(emptyDocs).collect().isEmpty)
    // open sketches: defined zero points, never a crash
    val hll = graft.operators.Cardinality
      .hllCertify(emptyEvents, org.apache.spark.sql.functions.col("user_id"))
      .collect().head
    assert(hll.getAs[Long]("nonzero") === 0L)
    assert(hll.getAs[Long]("exact") === 0L)
    // empty registers: denom = m * 2^53, est = the alpha*m zero point
    assert(hll.getAs[Long]("denom") === 256L * 9007199254740992L)
    assert(graft.operators.QuantileSketch.quantileCertify(emptyEvents)
      .collect().length === 5) // one all-NULL estimate row per q
  }
}
