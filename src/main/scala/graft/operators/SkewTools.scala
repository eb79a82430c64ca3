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
}
