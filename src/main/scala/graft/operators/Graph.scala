package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics: PageRank over a co-occurrence graph, the
  * standard importance prior for corpus curation (web-crawl pretraining
  * sets weight documents by link centrality before sampling — the
  * quality dial that complements the per-document classifiers in
  * [[TextClassifier]]).
  *
  * The reference engine has no graph surface; this is north-star
  * territory. Graph = part co-purchase (two parts linked when they
  * appear in the same order), symmetric by construction so every node
  * has both in- and out-edges — no dangling-mass term needed, which
  * keeps the per-iteration algebra to exactly one join + one
  * aggregation.
  *
  * Determinism contract (the gate's hash compare): every iterate is
  * rounded to 12 dp in BOTH engines, so iteration t+1 consumes
  * bit-identical inputs regardless of each engine's summation order;
  * the damping constants are written as the same double literals on
  * both sides (never derived as `1 - d`, whose FP value differs from
  * the literal `0.15`).
  *
  * Scale story: one iteration = edges ⋈ ranks (equi-join on `src`,
  * co-partitionable — at 100 TB the edge list is written bucketed by
  * `src` once and every iteration reuses that partitioning, so the
  * only moving shuffle is the groupBy(dst) of partial contributions,
  * which map-side combines) followed by one HashAggregate. Driver
  * state is two scalars (node count, iteration index) — ranks never
  * leave the cluster.
  */
object Graph {

  /** Damping written as the literal both engines parse identically. */
  val Damping = 0.85
  val OneMinusDamping = 0.15
  val Iterations = 4

  /** Distinct directed co-purchase edges (both directions present). The
    * per-order pair blowup is bounded by order size (max ~7 lines in
    * this schema; a 100 TB cart table would cap lines per order before
    * pairing, the same guard the n-gram dedup applies to hot grams).
    */
  def copurchaseEdges(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("src"))
      .as("a")
      .join(
        lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("dst")).as("b"),
        Seq("ok"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()

  /** Fixed-iteration damped PageRank over an edge frame. Returns
    * (node, pr) with the final iterate still at 12 dp.
    */
  def pageRank(edges: DataFrame, iterations: Int = Iterations): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // node count: the one driver-side scalar (every node has an
    // out-edge by symmetric construction)
    val n = deg.count()
    var ranks = deg.select(col("src").as("node"), (lit(1.0) / n).as("pr"))
    for (_ <- 1 to iterations) {
      ranks = edges
        .join(deg, "src")
        .join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(
          round(
            lit(OneMinusDamping) / n + lit(Damping) * sum(col("pr") / col("d")),
            12).as("pr"))
        .select(col("dst").as("node"), col("pr"))
    }
    ranks
  }

  /** Top-k parts by co-purchase PageRank, ranked on the rounded
    * iterate (identical in both engines by the determinism contract).
    */
  def pageRankTopK(spark: SparkSession, lineitem: DataFrame, k: Int): DataFrame = {
    val edges = copurchaseEdges(lineitem).cache()
    try {
      pageRank(edges)
        .select(col("node"), round(col("pr"), 9).as("pr"))
        .orderBy(col("pr").desc, col("node"))
        .limit(k)
    } finally edges.unpersist(false)
  }

  /** The DuckDB replay: the same edge derivation and the same rounded
    * iteration chain as SQL CTEs, generated for [[Iterations]] rounds.
    */
  def pageRankTopKSql(k: Int, iterations: Int = Iterations): String = {
    val iters = (1 to iterations)
      .map { t =>
        s"""r$t AS (
           |  SELECT e.dst AS node,
           |         round(CAST($OneMinusDamping AS DOUBLE) / (SELECT n FROM nn)
           |               + CAST($Damping AS DOUBLE) * sum(r${t - 1}.pr / deg.d), 12) AS pr
           |  FROM e JOIN r${t - 1} ON e.src = r${t - 1}.node
           |         JOIN deg ON e.src = deg.src
           |  GROUP BY 1)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM deg),
       |$iters
       |SELECT node, round(pr, 9) AS pr FROM r$iterations
       |ORDER BY 2 DESC, 1 LIMIT $k""".stripMargin
  }
}
