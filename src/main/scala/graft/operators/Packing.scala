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
}
