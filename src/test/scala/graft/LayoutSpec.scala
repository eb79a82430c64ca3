package graft

import graft.operators.Layout
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustered layout: interleave correctness, result parity with
  * the unclustered plan, and the file-level-pruning contract (the scan
  * reads EXACTLY the rectangle's cell directories).
  */
class LayoutSpec extends AnyFunSuite {
  import SparkTestBase._
  private lazy val spark = SparkTestBase.spark

  test("mortonCell column == driver-side twin on the full 16x16 grid") {
    import spark.implicits._
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x, y)).toDF("x", "y")
    val got = grid
      .withColumn("z", Layout.mortonCell(col("x"), col("y")))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2)))
      .toMap
    for (x <- 0 until 16; y <- 0 until 16)
      assert(got((x, y)) === Layout.mortonCellOf(x, y), s"($x,$y)")
    // the interleave is a bijection on the grid
    assert(got.values.toSeq.sorted === (0 until 256))
  }

  test("rect query from the store == unclustered filter; scan pruned to the rectangle's directories") {
    val events = Tables.load(spark, Sf0001, "events")
    val path = java.nio.file.Files.createTempDirectory("graft_zorder_spec").toString
    Layout.zorderWrite(events, path)
    val (xLo, xHi, yLo, yHi) = (3, 9, 5, 12)
    val stored = Layout.zorderRectAgg(spark, path, xLo, xHi, yLo, yHi)
    val rows = stored.collect() // execute so scan metrics populate

    // parity with the plain (unclustered) plan over raw events
    val plain = Layout
      .bucketized(events)
      .filter(
        col("x_bucket").between(xLo, xHi) && col("y_bucket").between(yLo, yHi))
      .groupBy(col("z_cell"), col("x_bucket"), col("y_bucket"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 6).as("sum_value"))
      .orderBy(col("z_cell"))
      .collect()
    assert(rows.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)

    // every grid row landed in its arithmetic cell: the stored z_cell
    // (from the directory tree) must re-derive from x/y in every group
    rows.foreach { r =>
      assert(r.getInt(0) === Layout.mortonCellOf(r.getInt(1), r.getInt(2)))
    }

    // file-level pruning: numFiles == files under the rectangle's cells
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case o => o.children.flatMap(allScans)
      }
      here ++ p.subqueries.flatMap(allScans)
    }
    val scan = allScans(stored.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains(path)))
      .getOrElse(fail("store scan not found in executed plan"))
    def filesUnder(cells: Iterable[Int]): Int = cells.toSeq.map { c =>
      val dir = new java.io.File(s"$path/z_cell=$c")
      Option(dir.listFiles).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    }.sum
    val rectCells = Layout.cellsForRect(xLo, xHi, yLo, yHi)
    val total = filesUnder(0 until 256)
    val numFiles = scan.metrics("numFiles").value
    info(s"scan read $numFiles of $total files (${rectCells.size} of 256 cells)")
    assert(scan.partitionFilters.nonEmpty, "cell IN-list did not reach PartitionFilters")
    assert(numFiles === filesUnder(rectCells).toLong, "scan did not prune to the rectangle's directories")
    assert(numFiles < total.toLong, "nothing was pruned")
  }
}
