package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual-hash image deduplication: the average-hash (aHash) family
  * over REAL decoded pixels, connecting the multimodal codec tier to
  * the dedup tier the way a training-data pipeline does it (near-dup
  * image removal before captioning/training).
  *
  * aHash (public recipe, e.g. the pHash project's simpler sibling):
  * downsample to an 8×8 grid, grayscale, set bit j when pixel j is at
  * or above the image mean — a 64-bit signature whose Hamming distance
  * approximates visual similarity. Exactness discipline:
  *
  *   - gray is the CHANNEL SUM r+g+b (no /3, no luma weights) and the
  *     threshold comparison is `64·g_j >= Σ g` — integer-exact, so both
  *     engines derive bit-identical signatures with zero float ops;
  *   - the 8×8 grid samples pixel (⌊x·w/8⌋, ⌊y·h/8⌋) — floor
  *     nearest-neighbor, the one downsampling rule that is pure integer
  *     arithmetic in SQL and Scala alike;
  *   - the signature is carried as two non-negative 32-bit halves
  *     (`ahash_hi`, `ahash_lo`) because bit 63 of a single BIGINT is a
  *     sign/overflow hazard in both engines' `1 << 63`.
  *
  * Spark decodes the ACTUAL PNG bytes (inflate + unfilter via
  * [[Multimodal.decodePngPixels]], the certified codec); the DuckDB
  * oracle recomputes the signature from the closed-form pixel formula —
  * two independent derivations of the same 64 bits, so the hash gate
  * certifies codec + downsample + threshold end to end.
  *
  * Scale shape (the lesson measured on this fixture: 500 images → 84
  * distinct hashes, 5 000 → 128): perceptual hashes cluster HARD, so
  * the near-dup join must never touch images. [[dedupSurvivors]] is one
  * linear groupBy (exact-duplicate clusters, hd = 0); [[nearDupHashPairs]]
  * runs the banded slice join over DISTINCT SIGNATURES only — candidate
  * count is bounded by signature diversity (content variety), not
  * corpus size, and the measured growth is sublinear (1 565 → 3 712
  * candidates for 10× images). Emitting pairs per IMAGE would be
  * quadratic in cluster size — the exact trap the text-dedup canaries
  * quarantine.
  */
object ImageHash {

  /** Slice geometry: 4 × 16-bit bands. Pigeonhole: two signatures at
    * Hamming distance ≤ 3 agree on at least one band, so any budget
    * ≤ `Slices − 1` has zero false negatives.
    */
  val Slices = 4

  /** aHash of one decoded image as (hi, lo) 32-bit halves. */
  private[graft] def aHash64(w: Int, h: Int, img: Array[Int]): (Long, Long) = {
    val g = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 64) {
      val sx = (j % 8) * w / 8
      val sy = (j / 8) * h / 8
      val base = (sy * w + sx) * 3
      val s = (img(base) + img(base + 1) + img(base + 2)).toLong
      g(j) = s
      total += s
      j += 1
    }
    var lo = 0L
    var hi = 0L
    j = 0
    while (j < 64) {
      if (64L * g(j) >= total) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    (hi, lo)
  }

  /** Per-image signature table from PNG assets: (id, width, height,
    * ahash_hi, ahash_lo). One narrow typed map per row (the codec
    * can't be an expression — [[Multimodal]] object doc), no shuffle;
    * at 100 TB this is the signature-extraction scan a pipeline runs
    * once and stores next to the assets (the `ann_ivf_stored` pattern).
    */
  def aHashes(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val (w, h, img) = Multimodal.decodePngPixels(p)
        val (hi, lo) = aHash64(w, h, img)
        (id, w, h, hi, lo)
      }
      .toDF("id", "width", "height", "ahash_hi", "ahash_lo")
  }

  /** Exact perceptual dedup (hd = 0): one representative per distinct
    * signature plus the cluster size — a single linear groupBy, the
    * only scale-safe way to express the (many) identical-signature
    * pairs. Sorted by signature for the gate.
    */
  def dedupSurvivors(hashes: DataFrame): DataFrame =
    hashes
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(count(lit(1)).as("n_images"), min(col("id")).as("rep_doc"))
      .orderBy(col("ahash_hi"), col("ahash_lo"))

  /** NEAR-duplicate signature pairs (1 ≤ hd ≤ `budget`) via the banded
    * slice join over DISTINCT signatures: each signature explodes into
    * [[Slices]] 16-bit bands, candidates share (band index, band
    * value) — an equi-join — and the exact `bit_count` Hamming verify
    * keeps survivors. `budget` must stay ≤ `Slices − 1` (pigeonhole
    * completeness); identical signatures (hd = 0) are excluded here
    * because [[dedupSurvivors]] already owns them linearly.
    */
  def nearDupHashPairs(hashes: DataFrame, budget: Int = 2): DataFrame = {
    require(budget >= 1 && budget < Slices, s"budget must be in [1, ${Slices - 1}]")
    // eager localCheckpoint: the distinct-signature frame is tiny
    // (content-bounded, ~100 rows here) but its SUBTREE is the full
    // decode scan — the two slice-join legs below must read the
    // materialized rows, not re-decode the corpus twice
    val dh = hashes
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    def slices(side: String) =
      dh.select(
          col("ahash_hi").as(s"${side}_hi"),
          col("ahash_lo").as(s"${side}_lo"),
          col("rep").as(s"${side}_rep"),
          col("n").as(s"${side}_n"),
          posexplode(array(
            col("ahash_lo").bitwiseAND(lit(65535L)),
            shiftright(col("ahash_lo"), 16).bitwiseAND(lit(65535L)),
            col("ahash_hi").bitwiseAND(lit(65535L)),
            shiftright(col("ahash_hi"), 16).bitwiseAND(lit(65535L))))
            .as(Seq(s"${side}_k", s"${side}_sv")))
    val a = slices("a")
    val b = slices("b")
    val cand = a
      .join(
        b,
        col("a_k") === col("b_k") && col("a_sv") === col("b_sv") &&
          (col("a_hi") < col("b_hi") ||
            (col("a_hi") === col("b_hi") && col("a_lo") < col("b_lo"))))
      .select("a_hi", "a_lo", "a_rep", "a_n", "b_hi", "b_lo", "b_rep", "b_n")
      .distinct() // a pair sharing several bands is one candidate
    cand
      .withColumn(
        "hd",
        expr("bit_count(a_lo ^ b_lo) + bit_count(a_hi ^ b_hi)").cast("long"))
      .filter(col("hd").between(1, budget))
      .select(
        col("a_rep").as("rep_a"),
        col("b_rep").as("rep_b"),
        col("a_n").as("n_a"),
        col("b_n").as("n_b"),
        col("hd"))
      .orderBy(col("rep_a"), col("rep_b"))
  }

  // ---- DuckDB replays (closed-form pixels, the Multimodal pattern) --

  /** Shared CTE chain ending in `hashes(doc_id, hi, lo)` — the
    * signature recomputed from the closed-form channel values
    * ((id·c₁ + x·c₂ + y·c₃) mod 256, the [[Multimodal]] fixture), never
    * from bytes: the oracle side of the codec certificate.
    */
  private val HashesCte: String =
    """WITH d AS (SELECT doc_id, doc_id % 5 + 1 AS w, doc_id % 4 + 1 AS h
      |           FROM documents WHERE doc_id >= 0),
      |grid AS (SELECT doc_id, w, h, unnest(generate_series(0, 63)) AS j FROM d),
      |samp AS (
      |  SELECT doc_id, w, h, j,
      |    ((doc_id * 7  + ((j % 8) * w // 8) * 3  + ((j // 8) * h // 8) * 19) % 256) +
      |    ((doc_id * 17 + ((j % 8) * w // 8) * 5  + ((j // 8) * h // 8) * 11) % 256) +
      |    ((doc_id * 31 + ((j % 8) * w // 8) * 7  + ((j // 8) * h // 8) * 13) % 256) AS g
      |  FROM grid),
      |tot AS (SELECT doc_id, sum(g) AS total FROM samp GROUP BY doc_id),
      |bits AS (SELECT s.doc_id, s.w, s.h, s.j,
      |                CASE WHEN 64 * s.g >= t.total THEN 1 ELSE 0 END AS b
      |         FROM samp s JOIN tot t USING (doc_id)),
      |hashes AS (SELECT doc_id, max(w) AS w, max(h) AS h,
      |  CAST(sum(CASE WHEN j >= 32 THEN b * (1::BIGINT << (j - 32)) ELSE 0 END) AS BIGINT) AS hi,
      |  CAST(sum(CASE WHEN j < 32  THEN b * (1::BIGINT << j)        ELSE 0 END) AS BIGINT) AS lo
      |  FROM bits GROUP BY doc_id)""".stripMargin

  val AHashesSql: String =
    s"""$HashesCte
       |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |       hi AS ahash_hi, lo AS ahash_lo
       |FROM hashes ORDER BY id""".stripMargin

  val DedupSurvivorsSql: String =
    s"""$HashesCte
       |SELECT hi AS ahash_hi, lo AS ahash_lo,
       |       count(*) AS n_images, min(doc_id) AS rep_doc
       |FROM hashes GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Brute force over distinct signatures — the oracle may pay the
    * quadratic the engine's banded join avoids, because distinct
    * signatures are content-bounded (≈100 here).
    */
  def nearDupPairsSql(budget: Int = 2): String =
    s"""$HashesCte,
       |dh AS (SELECT hi, lo, min(doc_id) AS rep, count(*) AS n
       |       FROM hashes GROUP BY 1, 2)
       |SELECT a.rep AS rep_a, b.rep AS rep_b, a.n AS n_a, b.n AS n_b,
       |       CAST(bit_count(xor(a.lo, b.lo)::BIGINT::BIT)
       |          + bit_count(xor(a.hi, b.hi)::BIGINT::BIT) AS BIGINT) AS hd
       |FROM dh a JOIN dh b ON (a.hi, a.lo) < (b.hi, b.lo)
       |WHERE bit_count(xor(a.lo, b.lo)::BIGINT::BIT)
       |    + bit_count(xor(a.hi, b.hi)::BIGINT::BIT) BETWEEN 1 AND $budget
       |ORDER BY rep_a, rep_b""".stripMargin
}
