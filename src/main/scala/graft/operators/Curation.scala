package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data curation operators over the `documents` table:
  * fixed-window chunking, PII redaction, and inverted-index
  * construction.
  *
  * All three are built from codegen'd builtins (sequence/explode/
  * substring/regexp functions/collect_set) — no UDFs. Chunking and redaction
  * are NARROW (per-row flatMap/map, zero shuffle before the final
  * presentation sort); the inverted index is two hash aggregations
  * with map-side combine. Each operator ships a DuckDB twin built
  * from the same constants so the driver hash-checks exact output.
  */
object Curation {

  // ---- document chunking --------------------------------------------

  /** Chunk window/stride in characters. Stride < window ⇒ overlapping
    * chunks (the standard training-data shape: overlap preserves
    * context across chunk boundaries).
    */
  val ChunkWindow = 120
  val ChunkStride = 90

  /** Split each document into fixed-width character windows with
    * overlap: chunk i covers [1 + i·stride, 1 + i·stride + window).
    * The last chunk may be short; a doc shorter than one window yields
    * exactly one chunk. Emits a digest of each chunk rather than the
    * text itself so downstream compares stay cheap.
    *
    * Scale: per-doc fan-out is bounded by len/stride; the whole operator
    * is one generate+project before the presentation sort — at 100 TB
    * this is a streaming narrow map, no shuffle, no state.
    *
    * n_chunks = 1 + max(0, ceil((len − window)/stride)) — computed with
    * integer arithmetic; the truncate-vs-floor division difference
    * between Spark (`div`) and DuckDB (`//`) is neutralized by the
    * greatest(0, …) clamp (both give ≤ 0 exactly when len ≤ window).
    */
  def chunkDocs(
      docs: DataFrame,
      window: Int = ChunkWindow,
      stride: Int = ChunkStride): DataFrame = {
    require(window > 0 && stride > 0, s"window=$window stride=$stride must be positive")
    docs
      .withColumn("len", length(col("text")))
      .withColumn(
        "n_extra",
        expr(s"greatest(0L, (len - $window + $stride - 1) div $stride)"))
      .select(
        col("doc_id"),
        col("text"),
        explode(expr("sequence(0L, n_extra)")).as("chunk_idx"))
      .withColumn("chunk", expr(s"substring(text, cast(1 + chunk_idx * $stride AS INT), $window)"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        length(col("chunk")).as("n_chunk_chars"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def chunkDocsSql(window: Int = ChunkWindow, stride: Int = ChunkStride): String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |         greatest(0, (length(text) - $window + $stride - 1) // $stride) AS n_extra
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, text, unnest(generate_series(0, n_extra)) AS chunk_idx FROM d)
       |SELECT doc_id, chunk_idx,
       |       length(substr(text, CAST(1 + chunk_idx * $stride AS INT), $window)) AS n_chunk_chars,
       |       md5(substr(text, CAST(1 + chunk_idx * $stride AS INT), $window)) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- PII redaction --------------------------------------------------

  /** Regexes valid in BOTH dialects (Java regex in Spark, RE2 in
    * DuckDB): no backrefs, no lookaround, char classes + quantifiers
    * only.
    */
  val EmailRe = "[a-z0-9._]+@[a-z0-9.-]+[a-z]"
  val UrlRe = "https?://[a-z0-9./-]+"

  /** Append deterministic synthetic PII to each document: doc_id % 3
    * email mentions and doc_id % 2 URLs (so zero-PII docs are part of
    * the fixture). The synthetic corpus contains no organic PII; this
    * is the same synthesize-then-process pattern as
    * `json_reading_parse` — the REDACTION operator is exercised on real
    * string content, both engines augment identically.
    */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.withColumn(
      "text",
      concat(
        col("text"),
        expr("repeat(concat(' user', CAST(doc_id AS STRING), '@mail.example'), CAST(doc_id % 3 AS INT))"),
        expr("repeat(concat(' https://h', CAST(doc_id % 7 AS STRING), '.example/p', CAST(doc_id AS STRING)), CAST(doc_id % 2 AS INT))")))

  // NOTE: `||` must never start a line here — this fragment is embedded
  // into PiiAuditSql whose own stripMargin would eat the first pipe of a
  // line-leading `||`, silently corrupting the concat into a bit-or.
  private val SyntheticPiiSql =
    """SELECT doc_id,
      |       text ||
      |       repeat(' user' || CAST(doc_id AS VARCHAR) || '@mail.example', CAST(doc_id % 3 AS INT)) ||
      |       repeat(' https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p' || CAST(doc_id AS VARCHAR), CAST(doc_id % 2 AS INT))
      |       AS text
      |FROM documents""".stripMargin

  /** Per-document redaction audit: count emails/URLs, replace them with
    * fixed tags, digest the redacted text, and report how many
    * characters redaction removed. Emails are replaced FIRST so the URL
    * pass never sees an address (the patterns here cannot overlap, but
    * the order is part of the contract).
    *
    * Scale: narrow map — regex per row, no shuffle.
    */
  def redactionAudit(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_emails", expr(s"size(regexp_extract_all(text, '$EmailRe', 0))"))
      .withColumn("n_urls", expr(s"size(regexp_extract_all(text, '$UrlRe', 0))"))
      .withColumn(
        "redacted",
        expr(s"regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>'), '$UrlRe', '<URL>')"))
      .select(
        col("doc_id"),
        col("n_emails"),
        col("n_urls"),
        (length(col("text")) - length(col("redacted"))).as("chars_removed"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("doc_id"))

  /** Full pipeline for the driver entry: synthesize → audit. */
  def piiAudit(docs: DataFrame): DataFrame =
    redactionAudit(withSyntheticPii(docs))

  val PiiAuditSql: String =
    s"""WITH aug AS ($SyntheticPiiSql),
       |r AS (
       |  SELECT doc_id, text,
       |         len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
       |         len(regexp_extract_all(text, '$UrlRe')) AS n_urls,
       |         regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'), '$UrlRe', '<URL>', 'g') AS redacted
       |  FROM aug)
       |SELECT doc_id, n_emails, n_urls,
       |       length(text) - length(redacted) AS chars_removed,
       |       md5(redacted) AS redacted_md5
       |FROM r ORDER BY doc_id""".stripMargin

  // ---- inverted index -------------------------------------------------

  /** Token → posting list over the corpus: document frequency, total
    * occurrences, and an md5 digest of the sorted posting list (the
    * digest keeps comparison cost independent of posting length; the
    * list itself would be the stored artifact).
    *
    * Plan shape: explode → partial/final agg on (token, doc_id) →
    * partial/final agg on token. Both shuffles carry (token, doc_id,
    * count) — never text. At 100 TB the second aggregation's key is the
    * vocabulary; posting lists for stop-word-frequency tokens are the
    * skew risk, which the digest representation caps at one row per
    * token (store real postings bucketed by doc-id range instead).
    */
  def invertedIndex(docs: DataFrame): DataFrame =
    graft.sources.Tables.fanOut(docs)
      .select(col("doc_id"), explode(expr(Dedup.TokensExpr)).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("occ")).as("n_occ"),
        md5(array_join(
          transform(sort_array(collect_set(col("doc_id"))), _.cast("string")),
          ",")).as("postings_md5"))
      .orderBy(col("token"))

  val InvertedIndexSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
      |  FROM documents),
      |g AS (SELECT token, doc_id, count(*) AS occ FROM u GROUP BY 1, 2)
      |SELECT token, count(*) AS df, CAST(sum(occ) AS BIGINT) AS n_occ,
      |       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS postings_md5
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
}
