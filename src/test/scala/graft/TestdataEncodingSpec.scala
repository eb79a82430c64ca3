package graft

import graft.sources.Tables
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-encoding canary (VERDICT r7 item 4).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * shipped three different parquet timestamp encodings (nanos-as-INT64,
  * naive micros → TIMESTAMP_NTZ, proper UTC micros). Round 7 lost 12
  * gate entries, 8 specs, and the bench to one such change surfacing as
  * 12 scattered analysis errors. This spec is the single loud failure
  * point: if a future regeneration introduces an encoding
  * [[Tables.load]] does not normalize, THIS test names the table and
  * column instead.
  */
class TestdataEncodingSpec extends AnyFunSuite {
  import SparkTestBase._

  private val allTables = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val tsColumns = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  test("every table loads and no column is TIMESTAMP_NTZ or raw nanos-long ts") {
    for (t <- allTables) {
      val df = Tables.load(spark, Sf0001, t)
      val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
      assert(ntz.isEmpty, s"table $t: TIMESTAMP_NTZ leaked through Tables.load: ${ntz.mkString(",")}")
      for (c <- tsColumns.getOrElse(t, Nil)) {
        assert(df.schema.fieldNames.contains(c), s"table $t: expected column $c missing")
        assert(df.schema(c).dataType == TimestampType,
          s"table $t.$c: expected TimestampType, got ${df.schema(c).dataType} " +
            "(new testdata encoding? extend Tables.normalizeCol)")
      }
    }
  }

  test("events.ts survives the ops that rejected NTZ: cast-to-long, watermark, approxQuantile") {
    val ev = Tables.load(spark, Sf0001, "events")
    // cast(ts as long) — the analysis error that killed 8 batch entries
    assert(ev.selectExpr("cast(ts as long) AS s").head().getLong(0) > 0L)
    // approxQuantile on the epoch seconds (data_profile's path)
    val q = ev.selectExpr("cast(ts as long) AS s").stat.approxQuantile("s", Array(0.5), 0.01)
    assert(q.head > 0)
  }

  test("streamSchema maps every field to a streaming-legal type (no NTZ)") {
    for (t <- Seq("events", "documents")) {
      val sch = Tables.streamSchema(spark, s"$Sf0001/$t.parquet")
      val ntz = sch.fields.filter(_.dataType == TimestampNTZType).map(_.name)
      assert(ntz.isEmpty, s"streamSchema($t): NTZ field(s) ${ntz.mkString(",")}")
    }
  }

  test("loader still normalizes the OLD nanos-as-long encoding") {
    // Synthesize the legacy shape (a LongType ts column) and run it
    // through the same normalize path the loader uses.
    val legacy = spark.range(3).selectExpr("id AS other", "id * 1000000000 AS ts")
    assert(legacy.schema("ts").dataType == LongType)
    val fixed = Tables.normalizeTimestamps(legacy, "events")
    assert(fixed.schema("ts").dataType == TimestampType)
    assert(fixed.selectExpr("cast(ts as long) AS s").collect().map(_.getLong(0)).toSeq
      == Seq(0L, 1L, 2L))
  }
}
