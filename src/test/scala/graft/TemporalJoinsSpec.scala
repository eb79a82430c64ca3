package graft

import graft.operators.TemporalJoins
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of (union+window) and binned range join: semantics against
  * hand-computed cases and against the naive formulation.
  */
class TemporalJoinsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("asofJoin: latest right at-or-before per key; equal ts matches; no-prior is null") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("user_id", "ts_s", "event_id")
    val right = Seq((1L, 10L, 1.5), (1L, 15L, 2.5), (2L, 9L, 3.5))
      .toDF("user_id", "ts_s", "v")
    val got = TemporalJoins.asofJoin(left, right, "user_id", "ts_s", "v")
      .select("event_id", "asof_ts_s", "asof_val")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1)
    assert(got === Seq(
      (100L, Some(10L), Some(1.5)), // equal ts counts (ASOF >= semantics)
      (101L, Some(15L), Some(2.5)), // latest of the two priors
      (102L, None, None))) // right row is LATER than the left row
  }

  test("asofJoin plan has no join operator at all (union + window, one shuffle)") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("user_id", "ts_s", "event_id")
    val right = Seq((1L, 5L, 1.0)).toDF("user_id", "ts_s", "v")
    val plan = TemporalJoins.asofJoin(left, right, "user_id", "ts_s", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not need a join:\n$plan")
  }

  test("binned rangeCount == naive non-equi count (sf0.001 orders × lineitem)") {
    val orders = Tables.load(spark, Sf0001, "orders")
    val intervals = orders.select(
      col("o_orderkey").as("interval_id"),
      col("o_orderdate").cast("timestamp").cast("long").as("start_s"),
      (col("o_orderdate").cast("timestamp").cast("long") + 3 * 86400).as("end_s"))
    val items = Tables.load(spark, Sf0001, "lineitem")
      .select(col("l_shipdate").cast("timestamp").cast("long").as("ts_s"))
    val binned = TemporalJoins.rangeCount(items, "ts_s", intervals, 86400)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // naive check computed driver-side (fine for a spec, fatal as a plan)
    val iv = intervals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ts = items.collect().map(_.getLong(0))
    val naive = iv.map { case (id, s, e) => (id, ts.count(t => t >= s && t <= e).toLong) }
      .filter(_._2 > 0).sorted
    assert(binned.sameElements(naive))
    assert(binned.nonEmpty)
  }

  test("bin size does not change rangeCount results") {
    val orders = Tables.load(spark, Sf0001, "orders").limit(50)
    val intervals = orders.select(
      col("o_orderkey").as("interval_id"),
      col("o_orderdate").cast("timestamp").cast("long").as("start_s"),
      (col("o_orderdate").cast("timestamp").cast("long") + 3 * 86400).as("end_s"))
    val items = Tables.load(spark, Sf0001, "lineitem")
      .select(col("l_shipdate").cast("timestamp").cast("long").as("ts_s"))
    def run(bin: Long) = TemporalJoins.rangeCount(items, "ts_s", intervals, bin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(86400) === run(3600 * 6))
    assert(run(86400) === run(7 * 86400))
  }
}
