package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank: iteration parity vs a plain-Scala reference under the same
  * exact integer fixed-point contract, edge derivation, mass
  * conservation, and the 20-iteration flat-lineage discipline.
  */
class GraphSpec extends AnyFunSuite {
  import SparkTestBase._
  private lazy val spark = SparkTestBase.spark

  /** Sequential reference in the SAME integer fixed-point algebra —
    * exact Long arithmetic, so the Spark comparison is `===`, not a
    * float tolerance.
    */
  private def refPageRank(
      edges: Seq[(Long, Long)],
      iterations: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = out.size
    val teleport = (Graph.TeleportNum * Graph.Scale / 100L) / n
    val inbound = edges.groupBy(_._2)
    var r: Map[Long, Long] = out.keys.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iterations) {
      r = inbound.map { case (v, es) =>
        val s = es.map { case (u, _) => r(u) / out(u) }.sum
        v -> (teleport + (Graph.DampingNum * s) / 100L)
      }
    }
    r
  }

  test("pageRank == plain-Scala reference on a crafted graph (exact integer fixed-point)") {
    import spark.implicits._
    // a small directed graph where every node has an out-edge
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L),
      (4L, 1L), (1L, 4L), (5L, 1L), (1L, 5L))
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRank(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPageRank(edges, Graph.Iterations)
    assert(got === want) // EXACT: integer sums are order-independent
    // damped mass conservation: Σpr = Scale up to the deterministic
    // floor-division leak (≤ |edges|+|nodes| units per iteration)
    val leakBound = Graph.Iterations.toLong * (edges.size + got.size + 2) * 100
    assert(math.abs(got.values.sum - Graph.Scale) < leakBound,
      s"mass ${got.values.sum} vs ${Graph.Scale}")
  }

  test("pageRank 20 iterations: lineage stays cut (flat plan), bounded wall time") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L),
      (4L, 1L), (1L, 4L), (5L, 1L), (1L, 5L))
    val df = edges.toDF("src", "dst")
    val t0 = System.nanoTime()
    val r20 = Graph.pageRank(df, 20)
    val planStr = r20.queryExecution.optimizedPlan.toString
    // localCheckpoint per iterate: the returned frame is a checkpointed
    // LEAF — the 20-deep join chain is gone from the plan, so Catalyst
    // never re-optimizes (or re-shuffles) prior rounds
    assert(!planStr.toLowerCase.contains("join"), planStr)
    assert(planStr.linesIterator.size <= 5, planStr)
    val rows = r20.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60, s"20 iterations took $secs s — lineage not flat?")
    assert(rows.nonEmpty && rows.map(_.getLong(1)).min > 0)
    // exactness holds at depth 20 too (the integer contract does not
    // drift with iteration count)
    val want = refPageRank(edges, 20)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap === want)
  }

  test("copurchaseEdges: symmetric, distinct, no self-loops") {
    import spark.implicits._
    val li = Seq(
      (1L, 10L), (1L, 11L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 13L),
      (3L, 14L))
      .toDF("l_orderkey", "l_partkey")
    val got = Graph
      .copurchaseEdges(li)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = Set(
      (10L, 11L), (11L, 10L), (10L, 12L), (12L, 10L), (11L, 12L), (12L, 11L),
      (10L, 13L), (13L, 10L))
    assert(got === want)
    got.foreach { case (s, d) => assert(s != d); assert(got.contains((d, s))) }
  }

  test("pageRankTopK on real lineitem: k rows, ranks descending, all positive") {
    val li = graft.sources.Tables.load(spark, Sf0001, "lineitem")
    val rows = Graph.pageRankTopK(spark, li, 20).collect()
    assert(rows.length === 20)
    val prs = rows.map(_.getDouble(1))
    assert(prs.sorted.reverse.toSeq === prs.toSeq)
    assert(prs.forall(_ > 0))
  }
}
