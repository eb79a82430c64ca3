package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  *
  * The test tables are written with nanosecond parquet timestamps
  * (`INT64 TIMESTAMP(NANOS)`), which Spark 4 refuses by default
  * (PARQUET_TYPE_ILLEGAL). We read them with
  * `spark.sql.legacy.parquet.nanosAsLong` and convert the resulting
  * nanos-longs back to proper microsecond TimestampType columns with
  * integer arithmetic (`div`, not `/` — a double division would lose
  * precision above 2^53 ns).
  *
  * At 100 TB the same loader shape holds: one `spark.read.parquet` per
  * table root, column pruning + predicate pushdown handled by the
  * parquet scan, no driver-side work.
  */
object Tables {

  /** Timestamp-typed columns per table (everything else is scalar). */
  private val TsColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    TsColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else d
    }
  }

  /** Write `df` as a bucketed (and per-bucket sorted) parquet table at
    * an explicit path, registered as `table` in the session catalog.
    *
    * Bucketing is the 100 TB join strategy this library leans on: two
    * tables bucketed on the same key with the same bucket count join
    * with ZERO exchanges — the shuffle is paid once at write time and
    * amortized over every subsequent join/aggregation on that key
    * (asserted plan-level in BucketingSpec). `sortBy` additionally lets
    * the sort-merge join skip its per-partition sorts when each bucket
    * is a single file.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Spread a narrow compute-heavy stage across the cluster when the
    * scan gives too few input splits. The test corpus is ONE sub-MB
    * parquet file → one partition, so every per-row md5/shingle stage
    * before the first exchange ran on a single task (this was the
    * round-2 "md5-family bench blowup"). A real 100 TB corpus has
    * thousands of splits and takes the `df` branch — the shuffle is
    * never paid where scan parallelism already exists.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate scan splits from FILE METADATA only. `df.rdd` here would
    // force physical planning and, under AQE, eagerly execute any
    // upstream shuffle stages at plan-construction time — a latent
    // hazard if fanOut ever wraps a derived frame (ADVICE round 3).
    // inputFiles walks the logical plan without running a job.
    val files = df.inputFiles
    val estSplits =
      if (files.isEmpty) Int.MaxValue // not a file scan: leave partitioning alone
      else {
        // Replicate Spark's actual scan partitioning (ADVICE round 4 —
        // the old max(nFiles, bytes/maxPartitionBytes) overestimated and
        // could skip a needed repartition): maxSplitBytes =
        // min(filesMaxPartitionBytes, max(openCostInBytes,
        // totalWithOpenCost/parallelism)), files cut into splits of that
        // size, splits sorted by length descending and bin-packed with
        // per-split open cost, closing a bin before it would overflow —
        // the same algorithm as FilePartition.getFilePartitions, so the
        // estimate IS the real partition count (modulo racing writers).
        val conf = spark.sessionState.conf
        val openCost = math.max(conf.filesOpenCostInBytes, 0L)
        val hconf = spark.sparkContext.hadoopConfiguration
        val lens = files.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          try p.getFileSystem(hconf).getFileStatus(p).getLen
          catch { case _: java.io.IOException => 0L }
        }
        val totalWithOpen = lens.map(_ + openCost).sum
        val bytesPerCore = totalWithOpen / math.max(spark.sparkContext.defaultParallelism, 1)
        val maxSplit = math.max(
          1L,
          math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore)))
        val splits = lens.flatMap { len =>
          (0L until len by maxSplit).map(off => math.min(maxSplit, len - off))
        }.sortBy(-_)
        var bins = 0L
        var cur = -1L // force a first bin
        splits.foreach { s =>
          if (cur < 0 || cur + s > maxSplit) { bins += 1; cur = 0L }
          cur += s + openCost
        }
        math.max(bins, 1L)
      }
    if (estSplits >= math.max(target / 2, 2)) df
    else df.repartition(target)
  }
}
