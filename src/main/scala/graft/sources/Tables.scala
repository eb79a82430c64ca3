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
}
