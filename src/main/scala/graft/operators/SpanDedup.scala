package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection — the span-level dedup of Lee
  * et al., "Deduplicating Training Data Makes Language Models Better"
  * (arXiv:2107.06499): report every maximal character span of length
  * >= `GramLen` that also occurs verbatim in ANOTHER document. Doc-level
  * dedup (exact / MinHash / SimHash in [[Dedup]]) misses boilerplate,
  * license headers and quoted passages embedded inside otherwise-unique
  * documents; span dedup is what finds those.
  *
  * The paper's tool is a single-node suffix array — memory O(corpus),
  * unusable at 100 TB. The distributed equivalent here is position-level
  * gram matching plus gaps-and-islands merging:
  *
  *   1. explode every L-char window into `(doc_id, pos, md5(gram))` —
  *      NARROW (sequence+explode+substring, whole-stage codegen; the
  *      shuffle that follows carries a 32-char digest + two longs per
  *      position, never document text);
  *   2. keep grams seen in more than one document — ONE hash
  *      aggregation (`count(DISTINCT doc_id) > 1` with map-side
  *      partial), then an equi-join back to positions (dedup-join
  *      shape: candidates come only from the gram equi-join, no
  *      all-pairs anywhere);
  *   3. merge each doc's surviving positions into maximal runs —
  *      stride-1 islands via `pos - row_number()` over a window
  *      PARTITIONED BY doc_id (per-doc state only; nothing global).
  *
  * A span of length S duplicated across docs yields S-L+1 consecutive
  * surviving positions, which collapse to one `[span_start,
  * span_start+span_len)` row. At 100 TB the gram explode is the
  * dominant term (≈ corpus chars rows); hot grams (a boilerplate line
  * shared by millions of docs) skew the groupBy key — the same
  * stop-shingle / salting remedies documented for
  * [[Dedup.ngramJaccardPairsFrom]] apply, and the count-distinct
  * aggregation caps per-gram state at the distinct-doc count.
  */
object SpanDedup {

  /** Minimum duplicated-run length, in characters. The paper uses 50
    * BPE tokens; 40 chars is the same order of magnitude on this
    * corpus's short synthetic sentences.
    */
  val GramLen = 40

  /** `(doc_id, span_start, span_len)` of every maximal cross-document
    * duplicated span, 1-based character positions.
    */
  def duplicatedSpans(docs: DataFrame, gramLen: Int = GramLen): DataFrame = {
    val grams = docs
      .filter(length(col("text")) >= gramLen)
      .select(
        col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - gramLen + 1)).as("pos"),
        col("text"))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("pos"),
        md5(expr(s"substring(text, pos, $gramLen)")).as("g"))
    val crossDoc = grams
      .groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("g"))
    val hits = grams.join(crossDoc, "g").select(col("doc_id"), col("pos"))
    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("isl", col("pos") - row_number().over(perDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(gramLen.toLong)).as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_len"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** DuckDB twin: same gram length, same island arithmetic. */
  def duplicatedSpansSql(gramLen: Int = GramLen): String =
    s"""WITH grams AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |         md5(substr(text, pos, $gramLen)) AS g
       |  FROM (SELECT doc_id, text,
       |               unnest(generate_series(1, length(text) - ${gramLen - 1})) AS pos
       |        FROM documents WHERE length(text) >= $gramLen)),
       |dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1),
       |hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
       |        FROM hits)
       |SELECT doc_id, MIN(pos) AS span_start,
       |       MAX(pos) - MIN(pos) + $gramLen AS span_len
       |FROM isl GROUP BY doc_id, isl ORDER BY doc_id, span_start""".stripMargin
}
