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

  test("zIntervalsForRect == plain enumeration at 8 bits/axis; interval count is perimeter-bounded") {
    // production bit width: 2^8 x 2^8 = 65536 cells — IN-list
    // enumeration of a large rectangle is exactly what the prefix
    // intervals exist to avoid
    val bits = 8
    val rects = Seq(
      (3, 200, 5, 180),   // large interior rectangle
      (0, 255, 17, 17),   // full-width stripe
      (250, 255, 250, 255), // aligned corner square
      (1, 2, 3, 250),     // tall thin sliver
      (7, 7, 9, 9),       // single cell
      (0, 255, 0, 255))   // whole space
    for ((xLo, xHi, yLo, yHi) <- rects) {
      val ivs = Layout.zIntervalsForRect(xLo, xHi, yLo, yHi, bits)
      // intervals are sorted, disjoint, non-adjacent (fully coalesced)
      ivs.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, s"rect ($xLo,$xHi,$yLo,$yHi): not coalesced")
        case _ =>
      }
      val fromIntervals = ivs.flatMap { case (lo, hi) => lo to hi }.toSet
      val enumerated = (for { x <- xLo to xHi; y <- yLo to yHi }
        yield Layout.mortonCellOf(x, y, bits).toLong).toSet
      assert(fromIntervals === enumerated, s"rect ($xLo,$xHi,$yLo,$yHi): cell sets differ")
      // O(perimeter): each boundary row/column contributes a bounded
      // number of quadtree squares per level
      val perimeter = 2L * ((xHi - xLo + 1) + (yHi - yLo + 1))
      assert(ivs.size <= 4 * perimeter,
        s"rect ($xLo,$xHi,$yLo,$yHi): ${ivs.size} intervals for perimeter $perimeter")
      info(s"rect ($xLo,$xHi)x($yLo,$yHi): ${enumerated.size} cells -> ${ivs.size} intervals")
    }
    // whole space must collapse to ONE interval
    assert(Layout.zIntervalsForRect(0, 255, 0, 255, bits) === Seq((0L, 65535L)))
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

  test("zorderUpsert == full rebuild; untouched cell directories byte-identical") {
    val events = Tables.load(spark, Sf0001, "events")
    // same user-sliced batch shape as the gate entry: inserts land in
    // x_buckets 0/1, corrections in x_bucket 5 (moved +100 days), so
    // most cells must be untouched — the byte-identity sweep is real
    val isNew = col("event_id") % 10 === 0 && col("user_id") % 16 < 2
    val isMod = col("event_id") % 10 =!= 0 && col("event_id") % 17 === 3 &&
      col("user_id") % 16 === 5
    val batch = events.filter(isNew).unionByName(
      events.filter(isMod)
        .withColumn("ts", col("ts") + expr("INTERVAL 100 DAYS"))
        .withColumn("value", col("value") + lit(1000.0)))

    // seed INCLUDES the original versions of the to-be-corrected rows —
    // the upsert must evict them from their old cells by event_id
    val incPath = java.nio.file.Files.createTempDirectory("graft_zorder_inc_spec").toString
    Layout.zorderWrite(events.filter(!isNew), incPath)
    // fingerprint every cell dir BEFORE the upsert (name, length, bytes-md5)
    def cellFingerprint(path: String, c: Int): Seq[(String, Long, String)] = {
      val dir = new java.io.File(s"$path/z_cell=$c")
      Option(dir.listFiles).toSeq.flatten.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
            .map("%02x".format(_)).mkString
          (f.getName, f.length(), md5)
        }
    }
    val before = (0 until 256).map(c => c -> cellFingerprint(incPath, c)).toMap
    val touched = Layout.zorderUpsert(spark, batch, incPath)
    assert(touched.nonEmpty)
    // locality: the sliced batch must leave most of the store alone
    assert(touched.size < 128, s"batch touched ${touched.size}/256 cells — no locality")
    // a corrected event shifted +100 days MOVES cells: its old home must
    // be in the touched set (eviction is exercised, not vacuous)
    val movedOld = Layout.bucketized(events.filter(isMod))
      .select(col("z_cell")).distinct().collect().map(_.getInt(0)).toSet
    assert(movedOld.subsetOf(touched.toSet), "old cells of moved rows not touched")
    // untouched cells: byte-identical files
    (0 until 256).filterNot(touched.contains).foreach { c =>
      assert(cellFingerprint(incPath, c) === before(c), s"untouched cell $c changed")
    }
    // equivalence with a full rebuild of the final logical table
    val fullPath = java.nio.file.Files.createTempDirectory("graft_zorder_full_spec").toString
    Layout.zorderWrite(events.filter(!isNew && !isMod).unionByName(batch), fullPath)
    def snap(path: String) = spark.read.parquet(path)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("x_bucket"), col("y_bucket"), col("z_cell").cast("int"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(snap(incPath).toSeq === snap(fullPath).toSeq)
  }
}
