package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrubbing pass every training-data
  * pipeline runs before tokenization (emails, phone numbers, IPs →
  * typed placeholder tokens). Pure per-row codegen'd regex work
  * (`regexp_extract_all` / `regexp_replace` builtins): embarrassingly
  * parallel, no shuffle at all until the deterministic output ORDER BY,
  * so the plan is a single scan-project stage at any corpus size.
  *
  * The synthetic corpus carries no organic PII, so the gated entry
  * PLANTS it deterministically from `doc_id` (emails on every 3rd doc,
  * phones on every 5th, IPs on every 7th — including overlaps) and then
  * runs the real detector/redactor over the augmented text. The oracle
  * replays plant + detect + redact end-to-end from the raw table, so
  * the match counts AND the md5 of every redacted document are
  * hash-gated. The regexes stay inside the RE2 ∩ java.util.regex
  * common dialect (no backrefs, no lookaround) so both engines compile
  * identical semantics.
  */
object Privacy {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val IpRe = "\\b10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Deterministic PII plant (see object doc): `text2` = text plus the
    * doc_id-derived fragments.
    */
  def withPlantedPii(docs: DataFrame): DataFrame =
    docs.withColumn(
      "text2",
      concat(
        col("text"),
        when(pmod(col("doc_id"), lit(3L)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5L)) === 0,
          concat(lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          concat(lit(" host 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"),
            lit("."), pmod(col("doc_id"), lit(100L)).cast("string")))
          .otherwise(lit(""))))

  /** Per-doc PII hit counts + md5 of the fully redacted text. Redaction
    * replaces every match with a typed placeholder; emails first (the
    * widest pattern), then phones, then IPs — the patterns are mutually
    * non-overlapping on their own output so the order is cosmetic, but
    * it is pinned for bit-exact replay.
    */
  def piiRedact(docs: DataFrame): DataFrame =
    withPlantedPii(docs)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text2"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text2"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("text2"), lit(IpRe), lit(0)))
          .cast("long").as("n_ips"),
        md5(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("text2"), lit(EmailRe), lit("<EMAIL>")),
              lit(PhoneRe), lit("<PHONE>")),
            lit(IpRe), lit("<IP>"))).as("redacted_md5"))
      .orderBy(col("doc_id"))

  def piiRedactSql(): String = {
    // RE2 string literals: DuckDB standard strings pass backslashes
    // through untouched, so \b / \. appear singly here (EmailRe's Scala
    // escaping already yields single backslashes at runtime).
    val email = EmailRe
    s"""WITH a AS (
       |  SELECT doc_id,
       |         text
       |         || CASE WHEN doc_id % 3 = 0
       |              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |              ELSE '' END
       |         || CASE WHEN doc_id % 5 = 0
       |              THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |              ELSE '' END
       |         || CASE WHEN doc_id % 7 = 0
       |              THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
       |                   || '.' || CAST(doc_id % 100 AS VARCHAR)
       |              ELSE '' END AS text2
       |  FROM documents)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(text2, '$email')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(text2, '\\b555-[0-9]{4}\\b')) AS BIGINT) AS n_phones,
       |       CAST(len(regexp_extract_all(text2, '\\b10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT) AS n_ips,
       |       md5(regexp_replace(regexp_replace(regexp_replace(text2,
       |             '$email', '<EMAIL>', 'g'),
       |             '\\b555-[0-9]{4}\\b', '<PHONE>', 'g'),
       |             '\\b10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')) AS redacted_md5
       |FROM a ORDER BY doc_id""".stripMargin
  }

  // ---- k-anonymity generalization ladder ---------------------------------

  /** Group-size floor for the k-anonymity audit (Sweeney 2002: a
    * release is k-anonymous when every quasi-identifier combination
    * covers at least k records).
    */
  val KAnonK = 5

  /** Ladder levels, finest first: the audit generalizes the timestamp
    * quasi-identifier until every (event_type, truncated ts) group
    * reaches [[KAnonK]]. Week is excluded (engine week-start semantics
    * differ); day/month/year truncate identically in Spark and DuckDB.
    */
  val KAnonLevels: Seq[String] = Seq("day", "month", "year")

  /** k-anonymity audit over the events table with quasi-identifiers
    * (event_type, ts truncated at each ladder level): one row per
    * level with group counts, risky-group counts (size < k), the rows
    * those groups expose, and whether the level meets k. The release
    * decision is the FINEST level with meets_k — generalize until
    * anonymous, the standard ladder.
    *
    * Scale: ONE events scan builds the day-level aggregate; month and
    * year REGROUP those day counts (counts are additive under
    * coarsening), so corpus cost is a single shuffle at day
    * granularity no matter how many ladder levels are audited.
    */
  def kAnonymityLadder(events: DataFrame, k: Int = KAnonK): DataFrame = {
    // localCheckpoint materializes the day-level aggregate (bounded:
    // |event types| × |days| rows) so the month/year regroups and the
    // three summaries run off it — without it each union branch
    // re-plans the aggregate subtree and re-SCANS events (measured:
    // 3 parquet scans for a "one-scan" ladder)
    val day = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("t"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    def summarize(level: String, ord: Int, groups: DataFrame): DataFrame =
      groups.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("cnt") < k, 1L).otherwise(0L)).as("n_risky_groups"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(0L)).as("n_risky_rows"))
        .select(
          lit(ord).cast("int").as("level_ord"),
          lit(level).as("level"),
          col("n_groups"),
          col("n_risky_groups"),
          col("n_risky_rows"),
          (col("n_risky_rows") === 0L).as("meets_k"))
    val month = day
      .groupBy(col("event_type"), date_trunc("month", col("t")).as("t"))
      .agg(sum(col("cnt")).as("cnt"))
    val year = day
      .groupBy(col("event_type"), date_trunc("year", col("t")).as("t"))
      .agg(sum(col("cnt")).as("cnt"))
    summarize("day", 0, day)
      .unionAll(summarize("month", 1, month))
      .unionAll(summarize("year", 2, year))
      .orderBy(col("level_ord"))
  }

  /** DuckDB twin of [[kAnonymityLadder]]: recomputes every ladder level
    * from the raw events table.
    */
  def kAnonymityLadderSql(k: Int = KAnonK): String = {
    def level(name: String, ord: Int): String =
      s"""SELECT CAST($ord AS INTEGER) AS level_ord, '$name' AS level,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(coalesce(sum(CASE WHEN cnt < $k THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_risky_groups,
         |  CAST(coalesce(sum(CASE WHEN cnt < $k THEN cnt ELSE 0 END), 0) AS BIGINT) AS n_risky_rows,
         |  coalesce(sum(CASE WHEN cnt < $k THEN cnt ELSE 0 END), 0) = 0 AS meets_k
         |FROM (SELECT event_type, date_trunc('$name', ts) AS t, count(*) AS cnt
         |      FROM events GROUP BY 1, 2)""".stripMargin
    KAnonLevels.zipWithIndex
      .map { case (n, o) => level(n, o) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY level_ord")
  }

  // ---- differentially-private count release -------------------------------

  /** Privacy budget of the released histogram (Laplace mechanism,
    * sensitivity 1 per count — disjoint groups, one row changes one
    * count by one).
    */
  val DpEpsilon = 1.0

  /** Laplace noise via the inverse CDF over a DETERMINISTIC md5-seeded
    * uniform — the replayable-release variant: the seed is pinned so
    * the pipeline (and the oracle) can reproduce the exact release
    * bytes; a production deployment swaps the seed derivation for a
    * secret release-time key, leaving every other line unchanged. The
    * 52-bit uniform is centered ((bits+0.5)/2⁵², so u ∈ (0,1) strictly
    * and the inverse CDF can never hit log 0).
    */
  def laplaceNoise(key: String, eps: Double, sensitivity: Double = 1.0): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"dp:$key".getBytes("UTF-8"))
    val bits = BigInt(1, d.take(7)).toLong & ((1L << 52) - 1)
    val u = (bits.toDouble + 0.5) / (1L << 52).toDouble
    val c = u - 0.5
    val b = sensitivity / eps
    -b * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
  }

  /** DP release of the per-event-type histogram: exact counts are the
    * distributed work (one hash aggregate); the Laplace noise attaches
    * as per-key literals (the release has as many rows as the bounded
    * key domain — noise is inherently a driver-side, release-time
    * step), then integer rounding and a ≥0 clamp (post-processing,
    * free under DP). Output never carries the true count.
    */
  def dpEventCounts(events: DataFrame, eps: Double = DpEpsilon): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keys = events.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val noise = keys.map(k => (k, laplaceNoise(k, eps))).toDF("event_type", "nz")
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(noise), Seq("event_type"))
      .select(
        col("event_type"),
        greatest(lit(0.0), round(col("cnt") + col("nz"), 0)).cast("long")
          .as("released_count"),
        lit(eps).as("epsilon"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin: counts recomputed from raw events, the SAME noise
    * literals (the deterministic function of the pinned seed).
    */
  def dpEventCountsSql(keys: Seq[String], eps: Double = DpEpsilon): String = {
    // keys are data-driven: escape embedded quotes so a key containing
    // ' cannot break (or inject into) the generated oracle (ADVICE r11)
    val rows = keys.sorted
      .map(k => s"('${k.replace("'", "''")}', ${laplaceNoise(k, eps)})")
      .mkString(", ")
    s"""WITH noise(event_type, nz) AS (SELECT * FROM (VALUES $rows)),
       |c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1)
       |SELECT c.event_type,
       |  CAST(GREATEST(0.0, round(cnt + nz, 0)) AS BIGINT) AS released_count,
       |  CAST($eps AS DOUBLE) AS epsilon
       |FROM c JOIN noise USING (event_type)
       |ORDER BY event_type""".stripMargin
  }
}
