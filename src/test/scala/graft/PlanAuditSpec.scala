package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-level regression guard over EVERY driver-contract query:
  * analysis must succeed and no plan may contain a cartesian product or
  * nested-loop join — the at-scale kill criteria (VERDICT round 1). Runs
  * plan-only (no execution), so it stays fast as the query set grows.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestBase._

  test("all queries plan without cartesian/nested-loop joins (sf0.001)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, Sf0001).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"ANALYSIS-ERROR ${e.getClass.getSimpleName}: ${e.getMessage}" }
      if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin") ||
        plan.startsWith("ANALYSIS-ERROR"))
        Some(name -> plan.linesIterator.take(2).mkString(" | ").take(200))
      else None
    }
    assert(offenders.isEmpty, offenders.map { case (n, p) => s"\n$n: $p" }.mkString)
  }

  test("oracleSql keys are a subset of queries keys (driver contract invariant)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }
}
