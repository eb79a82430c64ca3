package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank: iteration parity vs a plain-Scala reference under the same
  * rounding contract, edge derivation, and mass conservation.
  */
class GraphSpec extends AnyFunSuite {
  import SparkTestBase._
  private lazy val spark = SparkTestBase.spark

  private def refPageRank(
      edges: Seq[(Long, Long)],
      iterations: Int): Map[Long, Double] = {
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    val n = out.size
    val inbound = edges.groupBy(_._2)
    var r: Map[Long, Double] = out.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      r = inbound.map { case (v, es) =>
        val contrib = es.map { case (u, _) => r(u) / out(u) }.sum
        v -> BigDecimal(Graph.OneMinusDamping / n + Graph.Damping * contrib)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
    }
    r
  }

  test("pageRank == plain-Scala reference on a crafted graph (rounding contract included)") {
    import spark.implicits._
    // a small directed graph where every node has an out-edge
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L),
      (4L, 1L), (1L, 4L), (5L, 1L), (1L, 5L))
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRank(df).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edges, Graph.Iterations)
    assert(got.keySet === want.keySet)
    got.foreach { case (node, pr) =>
      assert(math.abs(pr - want(node)) < 1e-11, s"node $node: $pr vs ${want(node)}")
    }
    // damped mass conservation: sum(pr) ~ 1 on a dangling-free graph
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
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
