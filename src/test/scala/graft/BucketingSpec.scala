package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Bucketed co-located joins: the write-once-shuffle-never pattern the
  * 100 TB layout depends on. The spec is PLAN-level — it asserts the
  * exchanges are actually absent, not just that results match.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestBase._

  test("same-key same-count bucketed tables join with zero exchanges") {
    val tmp = Files.createTempDirectory("graft_buckets").toString
    val events = Tables.load(spark, Sf0001, "events")
    val byUser = events.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val vals = events.groupBy("user_id").agg(sum("value").as("sum_val"))
    Tables.writeBucketed(byUser, "b_counts", s"$tmp/b_counts", "user_id", 8)
    Tables.writeBucketed(vals, "b_vals", s"$tmp/b_vals", "user_id", 8)
    // at sf0.001 both sides are broadcast-sized and Spark rightly picks
    // a BroadcastHashJoin; force the sort-merge path the layout exists
    // for (at 100 TB neither side broadcasts)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_counts").join(spark.table("b_vals"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and the result is right: every user appears exactly once
      assert(joined.count() === byUser.count())
      // the same aggregation key also rides the bucketing: no exchange
      // before a groupBy on the bucket column
      val agg = spark.table("b_counts").groupBy("user_id").agg(sum("n_events"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation still shuffles:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_counts")
      spark.sql("DROP TABLE IF EXISTS b_vals")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val tmp = Files.createTempDirectory("graft_buckets2").toString
    val events = Tables.load(spark, Sf0001, "events")
    val a = events.groupBy("user_id").agg(count(lit(1)).as("n"))
    Tables.writeBucketed(a, "b_a", s"$tmp/b_a", "user_id", 8)
    Tables.writeBucketed(a, "b_b", s"$tmp/b_b", "user_id", 4)
    try {
      val joined = spark.table("b_a").join(spark.table("b_b"), "user_id")
      assert(joined.count() === a.count()) // correctness regardless of layout
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_a")
      spark.sql("DROP TABLE IF EXISTS b_b")
    }
  }
}
