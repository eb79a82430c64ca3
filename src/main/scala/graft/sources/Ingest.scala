package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Robust line-oriented ingestion: parse a JSONL feed where some lines
  * are broken, ROUTE the broken lines to a quarantine bucket instead of
  * failing the job or silently dropping them, and certify conservation
  * (ok + quarantined == input). This is the production posture for any
  * crawl/vendor feed — a single malformed line must cost one quarantine
  * row, never a task retry storm or a silent hole in the corpus.
  *
  * The gate entry synthesizes the feed deterministically from the
  * documents table (ASCII-only fields concatenated by hand in BOTH
  * engines, so JSON string-escaping conventions never enter the hash)
  * and corrupts every 13th line with an unbalanced brace. Parsing is
  * Spark-native `from_json` in PERMISSIVE mode — a malformed line
  * yields a null struct, which IS the routing signal; no UDFs, no
  * exceptions on the hot path.
  *
  * Scale: stateless scan-project (+ one small aggregate for the
  * summary); quarantine in production is a partitioned append sink fed
  * by the same predicate.
  */
object Ingest {

  /** Every 13th doc (doc_id % 13 == 3) ships a broken line. */
  val CorruptMod = 13L
  val CorruptRes = 3L

  private val LineSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  /** The synthetic feed: hand-concatenated JSON (ASCII-safe fields
    * only) with the deterministic corruption applied.
    */
  def syntheticFeed(docs: DataFrame): DataFrame = {
    val line = concat(
      lit("{\"doc_id\": "), col("doc_id"),
      lit(", \"lang\": \""), col("lang"),
      lit("\", \"n_chars\": "), col("n_chars"), lit("}"))
    docs.select(
      col("doc_id").as("feed_id"),
      when(col("doc_id") % CorruptMod === CorruptRes, concat(lit("{"), line))
        .otherwise(line)
        .as("line"))
  }

  /** Parse + route: every input line lands in exactly one of `ok`
    * (parsed fields) or `quarantine` (raw line preserved for replay).
    * Returned frame carries `status`, the parsed columns (null when
    * quarantined) and the raw line (null when ok — production would
    * keep it in the quarantine sink only).
    */
  def parseAndRoute(feed: DataFrame): DataFrame = {
    val parsed = feed.withColumn(
      "rec",
      from_json(col("line"), LineSchema, Map("mode" -> "PERMISSIVE")))
    // from_json yields a null struct (or null required fields) on
    // malformed input — a line is ok iff every schema field landed
    val ok = col("rec").isNotNull &&
      col("rec.doc_id").isNotNull && col("rec.lang").isNotNull &&
      col("rec.n_chars").isNotNull
    parsed.select(
      col("feed_id"),
      when(ok, lit("ok")).otherwise(lit("quarantine")).as("status"),
      when(ok, col("rec.doc_id")).as("doc_id"),
      when(ok, col("rec.lang")).as("lang"),
      when(ok, col("rec.n_chars")).as("n_chars"),
      when(!ok, col("line")).as("raw_line"))
  }

  /** Gate surface: per-lang parsed aggregates plus ONE quarantine row
    * (count + md5 of the concatenated bad lines in feed order — the
    * quarantined bytes themselves are hash-pinned), and conservation
    * certified in every row (`n_total` repeats the input count).
    */
  def quarantineSummary(docs: DataFrame): DataFrame = {
    val routed = parseAndRoute(syntheticFeed(docs))
    val okRows = routed
      .filter(col("status") === "ok")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
      .select(
        lit("ok").as("status"), col("lang").as("key"),
        col("cnt"), col("sum_chars"), lit(null).cast("string").as("bad_md5"))
    val quarantined = routed
      .filter(col("status") === "quarantine")
      .agg(
        count(lit(1)).as("cnt"),
        // feed-order concatenation made deterministic IN the aggregate
        // (collect_list order is not guaranteed): sort by feed_id inside.
        // NULL (not md5('')) when nothing was quarantined: concat_ws over
        // an empty collect_list yields '' while the DuckDB twin's
        // string_agg over zero rows yields NULL — the nullness would
        // mismatch on any corpus with no corrupt lines (ADVICE r11).
        when(count(lit(1)) > 0, md5(expr(
          "concat_ws('\n', transform(" +
            "sort_array(collect_list(struct(feed_id, raw_line))), x -> x.raw_line))")))
          .otherwise(lit(null).cast("string"))
          .as("bad_md5"))
      .select(
        lit("quarantine").as("status"), lit("__bad__").as("key"),
        col("cnt"), lit(null).cast("long").as("sum_chars"), col("bad_md5"))
    // n_total on the Spark side is Σ cnt over the ROUTED rows (a
    // whole-frame window over ≤|langs|+1 rows — a literal-key join
    // would constant-fold into the banned nested-loop product); the
    // DuckDB twin computes n_total from the raw INPUT count, so the
    // cross-engine hash can only match when routing lost nothing —
    // the conservation certificate is the comparison itself.
    okRows
      .unionAll(quarantined)
      .withColumn(
        "n_total",
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .orderBy(col("status"), col("key"))
  }

  /** DuckDB twin: the same hand-built lines, corruption, JSON-validity
    * routing (`try_cast(... AS JSON)`), aggregates, and quarantine md5.
    */
  def quarantineSummarySql: String =
    s"""WITH feed AS (
       |  SELECT doc_id AS feed_id,
       |    CASE WHEN doc_id % $CorruptMod = $CorruptRes THEN '{' ELSE '' END ||
       |      '{"doc_id": ' || doc_id || ', "lang": "' || lang ||
       |      '", "n_chars": ' || n_chars || '}' AS line
       |  FROM documents),
       |routed AS (
       |  -- CASE guards json_extract from malformed input (AND does not
       |  -- short-circuit, and json_extract THROWS on invalid JSON)
       |  SELECT feed_id, line,
       |    CASE WHEN try_cast(line AS JSON) IS NULL THEN FALSE
       |         ELSE json_extract(line, '$$.doc_id') IS NOT NULL
       |          AND json_extract_string(line, '$$.lang') IS NOT NULL
       |          AND json_extract(line, '$$.n_chars') IS NOT NULL
       |    END AS ok
       |  FROM feed),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM routed),
       |okrows AS (
       |  SELECT 'ok' AS status,
       |    json_extract_string(line, '$$.lang') AS key,
       |    CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(CAST(json_extract(line, '$$.n_chars') AS BIGINT)) AS BIGINT) AS sum_chars,
       |    CAST(NULL AS VARCHAR) AS bad_md5
       |  FROM routed WHERE ok GROUP BY 2),
       |bad AS (
       |  SELECT 'quarantine' AS status, '__bad__' AS key,
       |    CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(NULL AS BIGINT) AS sum_chars,
       |    md5(string_agg(line, chr(10) ORDER BY feed_id)) AS bad_md5
       |  FROM routed WHERE NOT ok)
       |SELECT status, key, cnt, sum_chars, bad_md5, n_total
       |FROM (SELECT * FROM okrows UNION ALL SELECT * FROM bad), tot
       |ORDER BY status, key""".stripMargin
}
