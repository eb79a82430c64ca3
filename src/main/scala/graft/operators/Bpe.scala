package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE merge induction (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", arXiv:1508.07909) —
  * learning the tokenizer vocabulary FROM the corpus, the step upstream
  * of every token-counting / packing operator in this library.
  *
  * The classic formulation operates on the WORD-FREQUENCY table, and so
  * does this one — which is exactly what makes it scale: after one
  * corpus-sized whitespace tokenize + hash aggregation, the working set
  * is vocab-sized (distinct words × symbol arrays), orders of magnitude
  * below corpus chars. Each merge round is then:
  *
  *   1. adjacent-pair counts: one narrow per-word `transform` + explode
  *      + hash aggregation with map-side combine (pair space is tiny);
  *   2. argmax pair (count DESC, then lexicographic) — a `limit(1)`
  *      collect; only ONE row ever reaches the driver per round;
  *   3. greedy left-to-right merge of the winning pair inside every
  *      word's symbol array — a pure higher-order `aggregate` fold with
  *      the pair as plan-time literals: NARROW, no shuffle, codegen'd.
  *
  * Each round's vocab frame is persisted and the previous unpersisted,
  * so lineage stays one round deep. The oracle is an INDEPENDENT
  * pure-Scala reference ([[BpeRef]], same greedy semantics written from
  * the paper, no Spark code) emitted as VALUES literals by
  * `SparkEntry.oracleSqlFor` — the same technique as the xxhash64 LSH
  * oracle. Tie-breaks are (count DESC, left ASC, right ASC); for BMP
  * text the engines' orders coincide (UTF-8 byte order == UTF-16 code
  * unit order == code point order), so the learned table is
  * deterministic.
  *
  * Corpus contract: BMP text only. Supplementary-plane characters
  * (emoji etc.) split differently in the two string models — Spark's
  * UTF8String works in code points while the JVM reference splits per
  * UTF-16 code unit (lone surrogates), and the two collations also
  * disagree above U+FFFF — so such input must be filtered or
  * NFC-sanitized upstream (the corpus here is BMP; a production corpus
  * gets the usual pre-tokenizer byte-level fallback, which sidesteps
  * the issue entirely by operating on bytes).
  */
object Bpe {

  val Rounds = 8

  private val OutSchema = StructType(Seq(
    StructField("round", LongType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("pair_freq", LongType, nullable = false)))

  /** Escape a symbol for embedding in a single-quoted SQL literal
    * inside `expr(...)` (backslashes first, then quotes).
    */
  private def lit1(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** `(syms, freq)` — the distinct-word symbol table, each word split
    * into single-character symbols.
    */
  private[graft] def vocab(docs: DataFrame): DataFrame =
    docs
      .select(explode(expr(Dedup.TokensExpr)).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(w, ''), x -> x != '')").as("syms"), col("freq"))

  /** Adjacent-pair frequencies over the current symbol table. */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(
        explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> named_struct('l', syms[i-1], 'r', syms[i]))"))
          .as("p"),
        col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right merge of (l, r) — the fold keeps one pending
    * symbol of state; a merged symbol never re-merges within the round.
    */
  private[graft] def mergeExpr(l: String, r: String): String = {
    val (ll, rr, lr) = (lit1(l), lit1(r), lit1(l + r))
    s"""aggregate(
       |  syms,
       |  named_struct('res', CAST(array() AS array<string>), 'prev', CAST(NULL AS string)),
       |  (st, x) -> CASE
       |    WHEN st.prev = $ll AND x = $rr
       |      THEN named_struct('res', concat(st.res, array($lr)), 'prev', CAST(NULL AS string))
       |    WHEN st.prev IS NOT NULL
       |      THEN named_struct('res', concat(st.res, array(st.prev)), 'prev', x)
       |    ELSE named_struct('res', st.res, 'prev', x) END,
       |  st -> CASE WHEN st.prev IS NOT NULL
       |             THEN concat(st.res, array(st.prev)) ELSE st.res END)""".stripMargin
  }

  /** Tokenize the corpus with the learned merge table — the APPLY side
    * of the tokenizer: fold every learned merge, in learning order,
    * over each distinct word's symbol array, then roll the per-word
    * token counts back onto the corpus. Returns one row per
    * (lang, source): `(lang, source, n_docs, n_words, n_tokens)` — the
    * shape a data-mixture planner budgets with ("how many training
    * tokens does each slice contribute under THIS tokenizer?").
    *
    * Scale shape: the fold runs on the DISTINCT-WORD table (vocab-sized
    * after one corpus hash-agg — the same reason learning scales), as a
    * chain of `rounds` narrow higher-order `aggregate` folds with the
    * pair literals baked into the plan; the corpus-sized side only
    * explodes words and equi-joins the (word → n_tok) table back.
    * That table is vocab-sized, so the join is broadcast at harness
    * scale; at a 100 TB vocabulary (hundreds of millions of distinct
    * words) the same plan degrades gracefully to a shuffle hash join on
    * `w` — the ROWS never carry symbol arrays, just one int per word.
    * Docs with zero tokens contribute to no group (nothing to count).
    */
  def encodeStats(docs: DataFrame, rounds: Int = Rounds): DataFrame =
    encodeStatsWith(
      docs,
      learnMerges(docs, rounds).collect().map(r => (r.getString(1), r.getString(2))).toSeq)

  /** [[encodeStats]] against an already-learned merge list (so a cached
    * `bpe_merges` result is applied without re-running the rounds).
    */
  def encodeStatsWith(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words0 = docs
      .select(explode(expr(Dedup.TokensExpr)).as("w"))
      .distinct()
      .withColumn("syms", expr("filter(split(w, ''), x -> x != '')"))
    val folded = merges.foldLeft(words0) { case (df, (l, r)) =>
      df.withColumn("syms", expr(mergeExpr(l, r)))
    }
    val wordTokens = folded.select(col("w"), size(col("syms")).cast("long").as("n_tok"))
    // no broadcast() hint: the hint would FORCE a broadcast even at a
    // billion-word vocabulary. AQE sees the runtime size and broadcasts
    // the vocab-sized table at harness scale anyway (plan-checked), and
    // falls back to a shuffle hash join when it genuinely is huge.
    docs
      .select(col("lang"), col("source"), col("doc_id"), explode(expr(Dedup.TokensExpr)).as("w"))
      .join(wordTokens, "w")
      .groupBy(col("lang"), col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("lang"), col("source"))
  }

  /** Vocab-size ceiling for the driver-side induction path. The merge
    * rounds are inherently sequential, and each distributed round pays
    * a fixed plan+codegen+job cost (~4 s cold — 31 s of the sf0.1 bench
    * setup for 8 rounds) regardless of data size. Below this many
    * distinct words the aggregated (syms, freq) table is collected and
    * the SAME greedy induction runs in memory — the [[Dedup]] clusters
    * adaptive-path precedent: the aggregation output is vocab-sized,
    * orders of magnitude below the corpus, and 200k symbol arrays are
    * a few MB on the driver. Above the ceiling the distributed rounds
    * run unchanged (the 100 TB/billion-word-vocab path). Both paths are
    * spec-asserted equal, and the driver gate checks either against the
    * independent [[BpeRef]].
    */
  val DriverVocabLimit = 200000L

  /** Learn `rounds` merges; returns `(round, lhs, rhs, pair_freq)`. */
  def learnMerges(
      docs: DataFrame,
      rounds: Int = Rounds,
      driverVocabLimit: Long = DriverVocabLimit): DataFrame = {
    val spark = docs.sparkSession
    val words = vocab(docs).persist()
    val n = words.count()
    val merges: Seq[Row] =
      if (n <= driverVocabLimit) {
        val tbl = words.collect()
          .map(r => (r.getSeq[String](0).toVector, r.getLong(1))).toSeq
        words.unpersist()
        localMerges(tbl, rounds).map { case (rd, l, rr, c) => Row(rd, l, rr, c) }
      } else distributedMerges(words, rounds)
    spark
      .createDataFrame(spark.sparkContext.parallelize(merges, 1), OutSchema)
      .orderBy(col("round"))
  }

  /** The distributed merge rounds (consumes and unpersists `words`). */
  private def distributedMerges(words0: DataFrame, rounds: Int): Seq[Row] = {
    var words = words0
    val merges = Seq.newBuilder[Row]
    var done = false
    var round = 1
    while (round <= rounds && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Row(round.toLong, l, r, cnt)
        val next = words
          .withColumn("syms", expr(mergeExpr(l, r)))
          .persist()
        next.count()
        words.unpersist()
        words = next
        round += 1
      }
    }
    words.unpersist()
    merges.result()
  }

  /** Driver-side induction over the collected word table — the same
    * (count DESC, l ASC, r ASC) argmax and the same greedy no-remerge
    * fold as [[mergeExpr]]. Deliberately NOT a call into [[BpeRef]]:
    * the reference stays an independent implementation the gate can
    * check both engine paths against.
    */
  private def localMerges(
      tbl: Seq[(Vector[String], Long)],
      rounds: Int): Seq[(Long, String, String, Long)] = {
    var words = tbl.groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words if syms.length >= 2; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((round.toLong, l, r, cnt))
        words = words.toSeq.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
        round += 1
      }
    }
    out.result()
  }
}

/** Independent in-memory BPE reference for the oracle — written from the
  * published algorithm, shares no code with [[Bpe]]. Runs at correctness
  * scale (sf0.01 corpus in driver memory), like [[MinHashRef]].
  */
object BpeRef {

  private def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var prev: String = null
    for (x <- syms) {
      if (prev != null && prev == l && x == r) { out += (l + r); prev = null }
      else { if (prev != null) out += prev; prev = x }
    }
    if (prev != null) out += prev
    out.result()
  }

  def merges(texts: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity)
      .map { case (w, occ) => w.map(_.toString).toVector -> occ.size.toLong }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val counts = words.toSeq
        .flatMap { case (syms, f) =>
          if (syms.length < 2) Seq.empty
          else syms.sliding(2).map(p => (p(0), p(1)) -> f).toSeq
        }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((round.toLong, l, r, cnt))
        words = words.toSeq
          .map { case (syms, f) => applyMerge(syms, l, r) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
        round += 1
      }
    }
    out.result()
  }

  /** Reference twin of [[Bpe.encodeStats]]: learn with [[merges]], fold
    * each merge over every distinct word, aggregate token counts per
    * (lang, source). `docs` rows are (doc_id, text, lang, source).
    */
  def encodeStats(
      docs: Seq[(Long, String, String, String)],
      rounds: Int): Seq[(String, String, Long, Long, Long)] =
    encodeStatsWith(docs, merges(docs.map(_._2), rounds).map { case (_, l, r, _) => (l, r) })

  /** [[encodeStats]] against an already-learned merge list — so a
    * caller that also needs the merge table (Verify computes both the
    * bpe_merges and bpe_encode oracles) runs the greedy induction once.
    */
  def encodeStatsWith(
      docs: Seq[(Long, String, String, String)],
      ms: Seq[(String, String)]): Seq[(String, String, Long, Long, Long)] = {
    val tokCount: Map[String, Long] = docs
      .flatMap(_._2.split("\\s+").filter(_.nonEmpty))
      .distinct
      .map { w =>
        var syms = w.map(_.toString).toVector
        for ((l, r) <- ms) syms = applyMerge(syms, l, r)
        w -> syms.length.toLong
      }
      .toMap
    docs
      .flatMap { case (id, text, lang, source) =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        if (ws.isEmpty) Nil
        else Seq((lang, source, id, ws.length.toLong, ws.map(tokCount).sum))
      }
      .groupBy(t => (t._1, t._2))
      .toSeq
      .map { case ((lang, source), rows) =>
        (lang, source, rows.map(_._3).distinct.size.toLong,
          rows.map(_._4).sum, rows.map(_._5).sum)
      }
      .sortBy(t => (t._1, t._2))
  }
}
