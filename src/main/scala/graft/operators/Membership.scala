package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter: the open MEMBERSHIP sketch, completing
  * the mergeable-sketch family (Count-Min = frequency, HLL =
  * cardinality, QuantileSketch = order statistics, this = set
  * membership — the primitive behind decontamination pre-filters and
  * "seen before?" dedup gates at 100 TB, where the exact key set
  * doesn't fit anywhere).
  *
  * Why another Bloom when `decontaminate_bloom` already runs one:
  * that entry uses Spark's ENGINE-INTERNAL bloom_filter_agg as a
  * result-invisible runtime pre-filter (its bits can't be replayed,
  * persisted as an open format, or merged with bits produced by
  * another engine). This is the OPEN twin — md5-derived bit positions
  * any engine recomputes — so the whole pipeline (hash → k positions →
  * bit union → probe verdicts → false-positive census) rides the hash
  * gate with zero probabilistic tolerance, exactly the [[Cardinality]]
  * discipline for HLL.
  *
  * Geometry: m = 65 536 bits, k = 4. Position i of a key is the i-th
  * disjoint 4-hex-char slice of md5(key) — an exact 16-bit integer, so
  * there is NO modulo bias and both engines parse it with the same
  * `('0x' || substr)::BIGINT` / `conv(substring)` idiom. The sketch is
  * stored as the SET-BIT LIST (distinct `idx` rows, ≤ m): merge is
  * plain distinct-union — idempotent AND commutative, so replayed or
  * fragmented partials can never flip a bit off (the strongest merge
  * discipline in the family; same argument as HLL's per-idx max).
  *
  * 100 TB shape: the build folds to ≤ m distinct positions per task
  * (map-side combined), one ≤ m-row shuffle; the probe joins eval×k
  * position rows against the ≤ m-row bit table (AQE broadcasts it);
  * the exact membership panel is the CERTIFICATE's measurement cost,
  * not the production query — in production only the sketch ships.
  */
object Membership {

  /** Bits (2^16): a position is one exact 4-hex-char md5 slice. */
  val BloomM = 65536

  /** Hash functions = disjoint md5 slices used. */
  val BloomK = 4

  /** The k 16-bit positions of `key`, as columns. */
  private def positions(key: Column): Seq[Column] = {
    val md = md5(key.cast("string"))
    (0 until BloomK).map(i =>
      conv(substring(md, 1 + 4 * i, 4), 16, 10).cast("long"))
  }

  /** Set-bit partials of `key` over `df`: distinct positions (≤ m
    * rows, map-side combined). This IS the sketch; merge = distinct
    * union of any number of partial logs.
    */
  def bloomBitPartials(df: DataFrame, key: Column): DataFrame =
    df.select(explode(array(positions(key): _*)).as("idx")).distinct()

  /** Probe `key` of `evalDf` against a set-bit frame: one row per
    * distinct eval key with `flagged` = all k positions set (the Bloom
    * "maybe present" verdict). Extra columns of `evalDf` are carried
    * through by max (eval keys are distinct after the groupBy).
    */
  def bloomProbe(
      evalDf: DataFrame,
      key: Column,
      bits: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val keyed = evalDf
      .select((key.as("k") +: carry.map(col)): _*)
      .distinct()
    keyed
      .select(
        (col("k") +: carry.map(col)) :+
          explode(array(positions(col("k")): _*)).as("idx"): _*)
      .join(bits.select(col("idx"), lit(1).as("hit")), Seq("idx"), "left")
      .groupBy(col("k"))
      .agg(
        (count(col("hit")) === BloomK).as("flagged"),
        carry.map(c => max(col(c)).as(c)): _*)
  }

  /** One-row certificate over a train corpus and a half-present /
    * half-absent eval set: the no-false-negative THEOREM as a gated
    * column (`no_false_neg` — a Bloom filter can never miss a present
    * key) and the false-positive census vs the occupancy expectation
    * n_absent · (bits_set/m)^k with 3× + 4 slack (small-sample grace;
    * the multiply chain is IEEE-identical in both engines — no pow()).
    */
  def bloomCertify(train: DataFrame, key: Column, evalDf: DataFrame): DataFrame =
    certifyFromBits(bloomBitPartials(train, key), evalDf)

  /** The shared certificate body over an already-built set-bit frame. */
  private def certifyFromBits(bits: DataFrame, evalDf: DataFrame): DataFrame = {
    val bitCount = bits.agg(count(lit(1)).as("bits_set"))
    val verdicts = bloomProbe(evalDf, col("k"), bits, carry = Seq("present"))
    val panel = verdicts.agg(
      count(lit(1)).as("n_eval"),
      count(when(col("present"), 1)).as("n_present"),
      count(when(col("flagged"), 1)).as("n_flagged"),
      count(when(col("present") && !col("flagged"), 1)).as("false_neg"),
      count(when(col("flagged") && !col("present"), 1)).as("false_pos"))
    // fold the two one-row aggregates without a join (pad-union-max,
    // the hllSummarize discipline)
    val panelCols = Seq("n_eval", "n_present", "n_flagged", "false_neg", "false_pos")
    val bPad = panelCols.foldLeft(bitCount)((d, c) => d.withColumn(c, lit(null).cast("long")))
    val pPad = panel.select(
      lit(null).cast("long").as("bits_set") +: panelCols.map(col): _*)
    val aggs = ("bits_set" +: panelCols).map(c => max(col(c)).as(c))
    val folded = bPad.unionByName(pPad).agg(aggs.head, aggs.tail: _*)
    val occ = col("bits_set").cast("double") / lit(BloomM.toDouble)
    val expFp = (col("n_eval") - col("n_present")).cast("double") * occ * occ * occ * occ
    folded.select(
      lit(BloomM).as("m"),
      lit(BloomK).as("k"),
      col("bits_set"),
      col("n_eval"),
      col("n_present"),
      col("n_flagged"),
      col("false_neg"),
      col("false_pos"),
      (col("false_neg") === 0L).as("no_false_neg"),
      (col("false_pos").cast("double") <= lit(3.0) * expFp + lit(4.0)).as("fp_ok"))
  }

  /** The gate fixture's eval set: texts of doc_id % 3 = 0 (present by
    * construction) plus texts of doc_id % 3 = 1 with a '~absent'
    * suffix (absent by construction — corpus texts carry no '~').
    */
  def evalFixture(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("text").as("k"), lit(true).as("present"))
      .distinct()
      .unionByName(
        docs.filter(col("doc_id") % 3 === 1)
          .select(concat(col("text"), lit("~absent")).as("k"), lit(false).as("present"))
          .distinct())

  /** Serve the certificate from an APPEND-ONLY set-bit log (the
    * streaming deployment): merge = distinct, then the same panel.
    */
  def bloomCertifyFromLog(log: DataFrame, evalDf: DataFrame): DataFrame =
    certifyFromBits(log.select(col("idx")).distinct(), evalDf)

  /** DuckDB replay: the whole pipeline — positions, bit union, probe,
    * census, both certificate booleans — recomputed from raw rows.
    */
  val BloomCertifySql: String = {
    def pos(expr: String) = (0 until BloomK)
      .map(i => s"CAST(('0x' || substr(md5($expr), ${1 + 4 * i}, 4)) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""WITH train AS (SELECT DISTINCT text AS k FROM documents),
       |tp AS (SELECT unnest(${pos("k")}) AS idx FROM train),
       |bits AS (SELECT DISTINCT idx FROM tp),
       |ev AS (
       |  SELECT DISTINCT text AS k, TRUE AS present
       |  FROM documents WHERE doc_id % 3 = 0
       |  UNION
       |  SELECT DISTINCT text || '~absent' AS k, FALSE AS present
       |  FROM documents WHERE doc_id % 3 = 1),
       |ep AS (SELECT k, present, unnest(${pos("k")}) AS idx FROM ev),
       |pr AS (SELECT k, max(present) AS present, count(b.idx) = $BloomK AS flagged
       |       FROM ep LEFT JOIN bits b USING (idx) GROUP BY k),
       |panel AS (SELECT count(*) AS n_eval,
       |                 count(*) FILTER (present) AS n_present,
       |                 count(*) FILTER (flagged) AS n_flagged,
       |                 count(*) FILTER (present AND NOT flagged) AS false_neg,
       |                 count(*) FILTER (flagged AND NOT present) AS false_pos
       |          FROM pr),
       |bc AS (SELECT count(*) AS bits_set FROM bits)
       |SELECT $BloomM AS m, $BloomK AS k, bits_set,
       |       n_eval, n_present, n_flagged, false_neg, false_pos,
       |       false_neg = 0 AS no_false_neg,
       |       CAST(false_pos AS DOUBLE) <= 3.0 * (CAST(n_eval - n_present AS DOUBLE)
       |         * (CAST(bits_set AS DOUBLE) / $BloomM.0)
       |         * (CAST(bits_set AS DOUBLE) / $BloomM.0)
       |         * (CAST(bits_set AS DOUBLE) / $BloomM.0)
       |         * (CAST(bits_set AS DOUBLE) / $BloomM.0)) + 4.0 AS fp_ok
       |FROM bc, panel""".stripMargin
  }
}
