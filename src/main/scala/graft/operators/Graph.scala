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
  * Determinism contract (the gate's hash compare): the iterate runs in
  * EXACT integer fixed-point — ranks are BIGINT multiples of 1e-12
  * ([[Scale]]), per-edge contributions are integer division `pr div d`,
  * damping is `(85·s) div 100`, and the teleport term is the integer
  * `(15·Scale div 100) div n`. Integer sums are associative, so the
  * result is bit-identical regardless of either engine's summation
  * order at ANY iteration count — strictly stronger than the previous
  * contract (round-to-12dp per iterate), whose doubles could in
  * principle straddle a rounding half-boundary across engines (ADVICE
  * r11). Floor division leaks ≤(d−1) e−12 of mass per node per
  * iteration — deterministic, and 9 orders below the 1e-3 rank gaps the
  * top-k cut sees. The one float op is the final display conversion
  * `round(pr/1e12, 9)`: a single IEEE division of identical integers by
  * the exactly-representable 1e12, identical in both engines.
  *
  * Scale story: one iteration = edges ⋈ ranks (equi-join on `src`,
  * co-partitionable — at 100 TB the edge list is written bucketed by
  * `src` once and every iteration reuses that partitioning, so the
  * only moving shuffle is the groupBy(dst) of partial contributions,
  * which map-side combines) followed by one HashAggregate. Driver
  * state is two scalars (node count, iteration index); each iterate is
  * `localCheckpoint`ed (the kmeans-loop discipline) so the lineage —
  * and with it Catalyst's per-iteration replanning cost — stays FLAT:
  * without the cut, iteration t re-optimizes a t-deep join chain and
  * re-shuffles every prior round's ranks (measured 9.5 s at sf0.1 for
  * 4 iterations in r11; the checkpointed loop holds per-iteration plan
  * time constant through 20+ iterations, see GraphSpec).
  */
object Graph {

  /** Fixed-point scale: ranks are BIGINT multiples of 1e-12. */
  val Scale = 1000000000000L

  /** Damping written as the integer pair both engines apply as
    * `(85·s) div 100` — never a float multiply.
    */
  val DampingNum = 85L
  val TeleportNum = 15L
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
    * (node, pr) with pr still in BIGINT fixed-point ([[Scale]]).
    */
  def pageRank(edges: DataFrame, iterations: Int = Iterations): DataFrame = {
    // degree table materialized ONCE (|nodes| rows of two longs) — the
    // iteration must never recompute the degree aggregation
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = true)
    // node count: the one driver-side scalar (every node has an
    // out-edge by symmetric construction)
    val n = deg.count()
    // integer teleport term, floored once driver-side — the SQL twin
    // computes the same `(15·Scale div 100) div n`
    val teleport = (TeleportNum * Scale / 100L) / n
    // the loop-invariant (src, dst, d) frame: joined ONCE, shuffled to
    // the join key ONCE, checkpointed — LogicalRDD keeps the hash
    // partitioning, so every iteration's edges⋈ranks join re-shuffles
    // only the |nodes|-row rank frame, never the edge list (this is the
    // bucketed-edge-table plan the scaladoc promises, realized in the
    // harness; r11 recomputed deg + this join every round and paid
    // ~2 s/iteration at sf0.1 for it)
    val withDeg = edges.join(deg, "src")
      .repartition(col("src"))
      .localCheckpoint(eager = true)
    var ranks = deg.select(col("src").as("node"), lit(Scale / n).as("pr"))
    for (_ <- 1 to iterations) {
      ranks = withDeg
        .join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("pr div d")).as("s"))
        .select(
          col("dst").as("node"),
          (lit(teleport) + expr(s"($DampingNum * s) div 100")).as("pr"))
        // lineage cut: keeps the next iteration's plan ONE join deep
        // instead of t joins deep (the kmeans-loop discipline) — the
        // checkpointed block is |nodes| rows of (long, long)
        .localCheckpoint(eager = true)
    }
    ranks
  }

  /** Top-k parts by co-purchase PageRank, ranked on the exact integer
    * iterate (identical in both engines by the determinism contract);
    * pr displayed as a double via the single shared conversion.
    */
  def pageRankTopK(spark: SparkSession, lineitem: DataFrame, k: Int): DataFrame = {
    val edges = copurchaseEdges(lineitem).cache()
    try pageRankTopKEdges(edges, k)
    finally edges.unpersist(false)
  }

  /** [[pageRankTopK]] over a pre-materialized edge frame — the
    * production call shape (the edge table is built once and served to
    * every ranking run, like the IVF/PQ stores; at 100 TB it would be
    * bucketed by `src` on disk). Safe to pass lazily-derived frames
    * too: [[pageRank]] checkpoints everything it keeps.
    */
  def pageRankTopKEdges(edges: DataFrame, k: Int): DataFrame =
    pageRank(edges)
      .orderBy(col("pr").desc, col("node"))
      .limit(k)
      .select(col("node"), round(col("pr").cast("double") / lit(1.0e12), 9).as("pr"))

  /** The DuckDB replay: the same edge derivation and the same exact
    * integer fixed-point iteration chain as SQL CTEs, generated for
    * [[Iterations]] rounds. (`//` is DuckDB integer division = Spark's
    * `div`; DuckDB's HUGEINT sum is exact, and the final CAST returns
    * it to the shared fixed-point before the one display division.)
    */
  def pageRankTopKSql(k: Int, iterations: Int = Iterations): String = {
    val iters = (1 to iterations)
      .map { t =>
        s"""r$t AS (
           |  SELECT e.dst AS node,
           |         CAST((SELECT ($TeleportNum * $Scale // 100) // n FROM nn)
           |              + ($DampingNum * sum(r${t - 1}.pr // deg.d)) // 100 AS BIGINT) AS pr
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
       |r0 AS (SELECT src AS node, $Scale // (SELECT n FROM nn) AS pr FROM deg),
       |$iters,
       |topk AS (
       |  SELECT node, pr FROM r$iterations
       |  ORDER BY pr DESC, node LIMIT $k)
       |SELECT node, round(CAST(pr AS DOUBLE) / 1000000000000.0, 9) AS pr
       |FROM topk ORDER BY topk.pr DESC, node""".stripMargin
  // ^ qualified: bare `pr` would resolve to the 9dp-ROUNDED output
  // alias, so two near-tie integer ranks rounding to the same double
  // would re-sort by node while Spark keeps exact-integer order
  // (ADVICE r12) — `topk.pr` pins the sort to the shared BIGINT
  }
}
