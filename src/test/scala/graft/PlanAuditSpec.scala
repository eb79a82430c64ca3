package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-level regression guard over EVERY driver-contract query:
  * analysis must succeed and no plan may contain a cartesian product or
  * nested-loop join — the at-scale kill criteria (VERDICT round 1). Runs
  * plan-only (no execution), so it stays fast as the query set grows.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Entries whose builder EXECUTES distributed rounds and returns only
    * a driver-local result frame — auditing that final frame would check
    * nothing (and running 8 learning rounds breaks the plan-only
    * contract). Their distributed building blocks are audited explicitly
    * below instead.
    */
  private val DriverLoopEntries = Set("bpe_merges")

  private def offendingPlan(plan: String): Boolean =
    plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin") ||
      plan.startsWith("ANALYSIS-ERROR")

  test("all queries plan without cartesian/nested-loop joins (sf0.001)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => DriverLoopEntries(name) }
      .flatMap { case (name, fn) =>
        val plan =
          try fn(spark, Sf0001).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"ANALYSIS-ERROR ${e.getClass.getSimpleName}: ${e.getMessage}" }
        if (offendingPlan(plan))
          Some(name -> plan.linesIterator.take(2).mkString(" | ").take(200))
        else None
      }
    assert(offenders.isEmpty, offenders.map { case (n, p) => s"\n$n: $p" }.mkString)
  }

  test("BPE per-round building blocks plan without cartesian/nested-loop joins") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
    val vocabPlan = graft.operators.Bpe.vocab(docs)
    val pairsPlan = graft.operators.Bpe.pairCounts(vocabPlan)
      .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
    val mergedPlan = vocabPlan
      .withColumn("syms", expr(graft.operators.Bpe.mergeExpr("a", "b")))
    Seq("vocab" -> vocabPlan, "pair-argmax" -> pairsPlan, "merge-round" -> mergedPlan)
      .foreach { case (n, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!offendingPlan(plan), s"$n: ${plan.linesIterator.take(2).mkString(" | ")}")
      }
  }

  test("oracleSql keys are a subset of queries keys (driver contract invariant)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("multimodal chain entries keep their materialization barriers (object boundaries)") {
    // without the identity-typed-map barrier CollapseProject merges the
    // synthesize/resize/stats projections and every downstream payload
    // reference re-evaluates the whole upstream container expression
    // per row (37 s vs ~1 s at sf0.1 — PERF.md round 6). The barrier
    // shows up as MapElements/DeserializeToObject in the physical plan;
    // this locks it against an optimizer-cleanup regression.
    for (entry <- Seq("multimodal_resize_stats", "wav_resample_stats")) {
      val plan = SparkEntry.queries(entry)(spark, Sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("MapElements") || plan.contains("DeserializeToObject"),
        s"$entry lost its materialization barrier:\n${plan.linesIterator.take(5).mkString("\n")}")
    }
  }
}
