package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  *
  * The testdata's timestamp encoding has changed across driver
  * regenerations, so the loader normalizes EVERY encoding seen so far
  * to session-timezone `TimestampType` (sessions run UTC):
  *
  *   - `INT64 TIMESTAMP(NANOS)`: Spark 4 refuses it by default
  *     (PARQUET_TYPE_ILLEGAL); read with
  *     `spark.sql.legacy.parquet.nanosAsLong` and convert the resulting
  *     nanos-longs with integer arithmetic (`div`, not `/` — a double
  *     division would lose precision above 2^53 ns).
  *   - `timestamp[us]` WITHOUT the isAdjustedToUTC flag: Spark 4 infers
  *     `TIMESTAMP_NTZ`, on which `cast(ts as long)`, `withWatermark`,
  *     and `approxQuantile` all fail. Disable the inference
  *     (`spark.sql.parquet.inferTimestampNTZ.enabled=false` — the
  *     naive micros are then read as UTC instants, matching how the
  *     DuckDB oracle treats them) AND defensively cast any NTZ column
  *     that still slips through (e.g. a schema captured before the
  *     conf was set) — UTC session tz makes the cast a reinterpret.
  *   - proper `timestamp[us, UTC]` (our own rewrites): passes through.
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

  /** Session confs required to read every testdata timestamp encoding.
    * Runtime-settable, so this also covers driver-provided sessions
    * whose builders we don't control. Call before ANY testdata read —
    * batch or the batch schema-capture that feeds `readStream`.
    */
  def setReadConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // The defensive NTZ→LTZ cast in normalizeCol is a pure reinterpret
    // ONLY under a UTC session timezone; on an external session left at
    // a local zone the cast would shift instants by the zone offset.
    // Runtime-settable, so pin it here with the other read confs.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Normalize one possibly-odd timestamp column to `TimestampType`. */
  private def normalizeCol(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case LongType => expr(s"timestamp_micros($c div 1000)") // nanos-as-long
      case TimestampNTZType => col(c).cast(TimestampType) // UTC session tz: reinterpret
      case _ => col(c)
    }

  /** Normalize every known-timestamp column of `df` (plus ANY residual
    * NTZ column, whatever its name) to `TimestampType`. Works on batch
    * and streaming frames alike.
    */
  def normalizeTimestamps(df: DataFrame, name: String): DataFrame = {
    val known = TsColumns.getOrElse(name, Nil).filter(df.schema.fieldNames.contains)
    val ntz = df.schema.fields.collect { case f if f.dataType == TimestampNTZType => f.name }
    (known ++ ntz).distinct.foldLeft(df)((d, c) => d.withColumn(c, normalizeCol(d, c)))
  }

  /** Schema for `spark.readStream.schema(...)` over a testdata table:
    * the batch-inferred schema with the read confs applied and any NTZ
    * field mapped to `TimestampType` (the parquet reader accepts an
    * LTZ requested type for naive-micros files; only INFERENCE is
    * encoding-sensitive). Nanos-long columns stay `LongType` here —
    * [[normalizeTimestamps]] converts them after the stream is built.
    */
  def streamSchema(spark: SparkSession, path: String): StructType = {
    setReadConfs(spark)
    StructType(spark.read.parquet(path).schema.map { f =>
      if (f.dataType == TimestampNTZType) f.copy(dataType = TimestampType) else f
    })
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    setReadConfs(spark)
    normalizeTimestamps(spark.read.parquet(s"$sfDir/$name.parquet"), name)
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
