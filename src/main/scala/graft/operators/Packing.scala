package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents (in doc_id order) to fixed
  * token-budget packs — the batching step a pre-training pipeline runs
  * after curation (contiguous fill; real packers may also split
  * documents, which is a per-pack narrow map on top of this
  * assignment).
  *
  * The core is a DISTRIBUTED PREFIX SUM of token counts, built as the
  * classic two-level scan with no global window and no UDFs:
  *
  *   1. group = doc_id div [[GroupWidth]] — a deterministic coarse key,
  *      so the per-group running sum is a `Window.partitionBy(group)`
  *      (parallel across groups, each group's state bounded by
  *      GroupWidth rows);
  *   2. per-group totals cumsum into group OFFSETS — a frame of
  *      n/GroupWidth rows (for 100 B docs and width 1e6: 100k rows),
  *      small enough that its own ordered window is a bounded
  *      single-partition pass, exactly like the top-k rank over k
  *      survivors;
  *   3. offsets broadcast-join back on `group`: cum_before =
  *      group_offset + within_group_cumsum − n_toks.
  *
  * The result is independent of physical partitioning (the oracle is a
  * plain window cumsum), but no stage ever materializes a global
  * ordering — the scan shape survives 100 TB.
  */
object Packing {

  /** Tokens per pack for the driver entry. */
  val PackBudget = 2048L

  /** Docs per prefix-sum group (tuned small here so sf0.01's 500 docs
    * actually exercise the multi-group path; at corpus scale ~1e6).
    */
  val GroupWidth = 64L

  /** `(doc_id, n_toks, cum_before, pack_id)` in doc_id order:
    * `cum_before` = total tokens of all lower-doc_id docs, `pack_id` =
    * cum_before div budget (contiguous fill — a pack may overflow by at
    * most one document, the standard greedy bound).
    */
  def packAssignments(docs: DataFrame, budget: Long = PackBudget): DataFrame = {
    val counted = graft.sources.Tables.fanOut(docs)
      .select(
        col("doc_id"),
        size(expr(Dedup.TokensExpr)).cast("long").as("n_toks"),
        expr(s"doc_id div $GroupWidth").as("grp"))
    val withinGroup = counted.withColumn(
      "cum_in_grp",
      sum(col("n_toks")).over(Window.partitionBy(col("grp")).orderBy(col("doc_id"))))
    val offsets = counted
      .groupBy(col("grp"))
      .agg(sum(col("n_toks")).as("grp_total"))
      .withColumn(
        "grp_offset",
        coalesce(
          sum(col("grp_total")).over(Window.orderBy(col("grp"))) - col("grp_total"),
          lit(0L)))
      .select(col("grp"), col("grp_offset"))
    withinGroup
      .join(broadcast(offsets), "grp")
      .withColumn("cum_before", col("grp_offset") + col("cum_in_grp") - col("n_toks"))
      .select(
        col("doc_id"),
        col("n_toks"),
        col("cum_before"),
        expr(s"cum_before div $budget").as("pack_id"))
      .orderBy(col("doc_id"))
  }

  def packAssignmentsSql(budget: Long = PackBudget): String =
    s"""WITH c AS (
       |  SELECT doc_id,
       |         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
       |         CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |           AS cum_before
       |  FROM c)
       |SELECT doc_id, n_toks, cum_before, cum_before // $budget AS pack_id
       |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Chunked packing ("concatenate-and-cut"): the GPT-style twin of
  // packAssignments. Where pack_assign keeps documents whole (a pack may
  // underfill), this variant concatenates each shard's token stream and
  // cuts it into EXACTLY ctx-token training sequences — documents
  // straddle boundaries, nothing is padded or dropped. The output is the
  // packed-sequence manifest (per bin: contributing docs + token count)
  // a tokenizer shard-writer consumes.
  //
  // Plan shape: prefix-sum window per (source, shard) in doc_id order,
  // then each doc explodes to the bin range [start/ctx, (end-1)/ctx] it
  // overlaps — a bounded explode (at most nt/ctx + 1 bins per doc) — and
  // one hash aggregate per bin. `shard` (= doc_id % shards) is the scale
  // dial: each shard packs independently, so no sort ever sees more than
  // one shard's stream; at 100 TB raise `shards` until a shard fits a
  // range-partitioned sort comfortably. Chunking wastes nothing however
  // the corpus is sharded — only bin numbering is per-shard.
  // ---------------------------------------------------------------------

  /** Tokens per packed training sequence (context length) for the
    * chunked packer. The synthetic docs run 20-80 tokens, so 256 packs
    * a handful of docs per sequence — the same doc:bin ratio a
    * 2k-context packer sees on real ~600-token web documents.
    */
  val DefaultCtx = 256L

  /** Independent chunked-packer shards per source (scale note above). */
  val DefaultShards = 4L

  /** Packed-sequence manifest: one row per (source, shard, bin) with the
    * number of contributing docs and the bin's token count (= ctx
    * everywhere except each shard's final partial bin).
    */
  def packBins(
      docs: DataFrame,
      ctx: Long = DefaultCtx,
      shards: Long = DefaultShards): DataFrame = {
    val perDoc = graft.sources.Tables.fanOut(docs)
      .withColumn("toks", expr(Dedup.TokensExpr))
      .select(
        col("doc_id"),
        col("source"),
        pmod(col("doc_id"), lit(shards)).as("shard"),
        size(col("toks")).cast("long").as("nt"))
      .filter(col("nt") > 0)
    val cum = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("source", "shard")
    val positioned = perDoc
      .withColumn("endpos", sum(col("nt")).over(cum))
      .withColumn("total", max(sum(col("nt")).over(cum)).over(whole))
    positioned
      .select(
        col("source"), col("shard"), col("total"),
        explode(sequence(
          expr(s"(endpos - nt) div $ctx"),
          expr(s"(endpos - 1) div $ctx"))).as("bin"))
      .groupBy(col("source"), col("shard"), col("bin"), col("total"))
      .agg(count(lit(1)).as("n_docs"))
      .select(
        col("source"), col("shard"), col("bin"), col("n_docs"),
        least(lit(ctx), col("total") - col("bin") * ctx).as("n_tokens"))
      .orderBy(col("source"), col("shard"), col("bin"))
  }

  def packBinsSql(ctx: Long = DefaultCtx, shards: Long = DefaultShards): String =
    s"""WITH t AS (
       |  SELECT doc_id, source, doc_id % $shards AS shard,
       |         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, source, shard, nt,
       |         CAST(sum(nt) OVER (PARTITION BY source, shard ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS endpos
       |  FROM t WHERE nt > 0),
       |w AS (
       |  SELECT source, shard, endpos, nt,
       |         max(endpos) OVER (PARTITION BY source, shard) AS total
       |  FROM p),
       |e AS (
       |  SELECT source, shard, total,
       |         unnest(range((endpos - nt) // $ctx, (endpos - 1) // $ctx + 1)) AS bin
       |  FROM w)
       |SELECT source, shard, bin, count(*) AS n_docs,
       |       least($ctx, total - bin * $ctx) AS n_tokens
       |FROM e GROUP BY source, shard, bin, total
       |ORDER BY source, shard, bin""".stripMargin
}
