package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling and normalization for training-data pipelines.
  *
  * Sampling is DETERMINISTIC, content-keyed, and stratification-safe:
  * a doc is kept iff a fixed prefix of md5(text) falls under the rate
  * threshold. No RNG state, no seed plumbing — reruns, retries and
  * backfills select the same docs, on any cluster size, with no
  * coordination (the property `sample(df union df2) == sample(df) union
  * sample(df2)` is what makes this safe at 100 TB where sampling runs
  * incrementally). Lowercase-hex comparison is lexicographic ==
  * numeric, so the predicate is a plain pushable string comparison in
  * both Spark and DuckDB.
  */
object Sampling {

  /** Threshold prefix for a per-mille rate: docs with
    * `substr(md5(text),1,3) < threshold` are kept. 3 hex digits = 4096
    * buckets, so the rate granularity is 1/4096.
    */
  private def hexThreshold(permille: Int): String = {
    require(permille >= 0 && permille <= 1000, s"rate $permille‰ out of range")
    f"${(permille * 4096) / 1000}%03x"
  }

  /** Deterministic content-hash sample at `permille`/1000 rate. */
  def sampleByContent(docs: DataFrame, permille: Int): DataFrame =
    docs.filter(substring(md5(col("text")), 1, 3) < hexThreshold(permille))

  /** Per-language sample audit: total vs sampled doc counts — the
    * stratification check (each stratum is sampled at ~the global rate
    * because the hash is independent of the label).
    */
  def stratifiedSampleAudit(docs: DataFrame, permille: Int): DataFrame =
    docs
      .withColumn(
        "sampled",
        (substring(md5(col("text")), 1, 3) < hexThreshold(permille)).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("sampled")).cast("long").as("n_sampled"))
      .orderBy(col("lang"))

  def stratifiedSampleAuditSql(permille: Int): String =
    s"""SELECT lang, count(*) AS n_docs,
       | CAST(sum(CASE WHEN substr(md5(text), 1, 3) < '${hexThreshold(permille)}'
       |               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Normalization-keyed near-exact dedup: lowercase, collapse all
    * whitespace runs, trim — docs differing only in case/spacing share a
    * fingerprint. Per-language distinct-fingerprint counts quantify the
    * duplication the normalization reveals beyond byte-exact dedup.
    */
  def normalizedFingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn(
        "nfp",
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("nfp")).as("n_distinct_norm"))
      .orderBy(col("lang"))

  /** DuckDB twin: regexp_replace needs the explicit 'g' flag there
    * (Spark replaces all matches by default).
    */
  val NormalizedFingerprintSql: String =
    """SELECT lang, count(*) AS n_docs,
      | count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_distinct_norm
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
}
