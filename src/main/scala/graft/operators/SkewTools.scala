package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (SURVEY's 100 TB checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE handles skewed JOINS automatically; skewed AGGREGATIONS over
  * algebraic functions are handled here by two-phase salting: phase 1
  * aggregates (key, salt) — spreading one hot key over `salts` reducer
  * partitions — phase 2 merges the per-salt partials. Correct exactly
  * for the mergeable-summary algebra (count/sum, and avg derived at the
  * end — never averaged across phases).
  */
object SkewTools {

  /** Salted count/sum/avg aggregation, equivalent to
    * `df.groupBy(keys).agg(count, sum(valueCol))` but with the hot-key
    * shuffle spread over `salts` partitions.
    */
  def saltedSummary(df: DataFrame, keys: Seq[String], valueCol: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive (got $salts)")
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_val"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_val")).as("sum_val"))
      .withColumn("avg_val", col("sum_val") / col("cnt"))
  }

  /** Salted fact×dim equi-join, equivalent to `facts.join(dim, key)`
    * but with one hot key's shuffle partition spread over `salts`
    * reducers: facts get a deterministic salt in [0, salts), the dim
    * side is replicated `salts`× (a small explode — the dim is the
    * small side by assumption), and the join key becomes (key, salt).
    *
    * This is the MANUAL fallback for the cases AQE's skew-join can't
    * rescue (e.g. a skewed shuffle feeding a downstream co-partitioned
    * op that must not be re-split, or an engine with AQE disabled); in
    * the common case, leave AQE on and let
    * `spark.sql.adaptive.skewJoin` split the oversized partition at
    * runtime — ScaleOpsSpec asserts BOTH: the AQE plan marks the join
    * `skew=true` and splits it, and this salted twin reproduces the
    * plain join's rows exactly.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive (got $salts)")
    val saltedFacts = facts
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val saltedDim = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedFacts.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
