package graft

import java.sql.Timestamp
import java.time.Instant

import graft.operators.ViewBuilder
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Golden fixtures (FIXTURES.md §A): a tiny hand-computed reading set
  * with exact expected view rows — minute/hour grouping, metric
  * separation, hour and calendar-month boundaries, out-of-order input —
  * plus scalacheck properties for the mergeable-summary algebra
  * (util/Aggregator.java:18-32) and the split-then-merge invariant.
  */
class GoldenFixtureSpec extends AnyFunSuite {
  import SparkTestBase._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  // deliberately out of chronological order (late arrivals must merge)
  private lazy val readings = {
    import spark.implicits._
    Seq(
      ("no2", ts("2024-01-31T11:00:05Z"), 4.0, "AA"),
      ("no2", ts("2024-01-31T10:59:30Z"), 1.0, "AA"),
      ("pm10", ts("2024-01-31T10:59:10Z"), 10.0, "AA"),
      ("no2", ts("2024-01-31T10:59:59Z"), 0.5, "BB"),
      ("no2", ts("2024-01-31T10:59:45Z"), 2.0, "AA"),
      ("no2", ts("2024-02-01T00:00:00Z"), 8.0, "AA"))
      .toDF("metric", "ts", "value", "geo")
  }

  private def rows(res: String): Set[(String, String, String, Long, Double, Double)] =
    ViewBuilder.build(readings, col("geo"), res)
      .collect()
      .map(r => (
        r.getString(0),
        r.getString(1),
        r.getTimestamp(2).toInstant.toString,
        r.getLong(3),
        r.getDouble(4),
        r.getDouble(5)))
      .toSet

  test("golden minute view (hand-computed)") {
    assert(rows("min") === Set(
      ("no2", "AA", "2024-01-31T10:59:00Z", 2L, 3.0, 1.5),
      ("no2", "AA", "2024-01-31T11:00:00Z", 1L, 4.0, 4.0),
      ("no2", "AA", "2024-02-01T00:00:00Z", 1L, 8.0, 8.0),
      ("no2", "BB", "2024-01-31T10:59:00Z", 1L, 0.5, 0.5),
      ("pm10", "AA", "2024-01-31T10:59:00Z", 1L, 10.0, 10.0)))
  }

  test("golden hour view (hour boundary splits 10:59 vs 11:00)") {
    assert(rows("hour") === Set(
      ("no2", "AA", "2024-01-31T10:00:00Z", 2L, 3.0, 1.5),
      ("no2", "AA", "2024-01-31T11:00:00Z", 1L, 4.0, 4.0),
      ("no2", "AA", "2024-02-01T00:00:00Z", 1L, 8.0, 8.0),
      ("no2", "BB", "2024-01-31T10:00:00Z", 1L, 0.5, 0.5),
      ("pm10", "AA", "2024-01-31T10:00:00Z", 1L, 10.0, 10.0)))
  }

  test("golden month view (calendar month boundary Jan 31 → Feb 1)") {
    assert(rows("month") === Set(
      ("no2", "AA", "2024-01-01T00:00:00Z", 3L, 7.0, 7.0 / 3.0),
      ("no2", "AA", "2024-02-01T00:00:00Z", 1L, 8.0, 8.0),
      ("no2", "BB", "2024-01-01T00:00:00Z", 1L, 0.5, 0.5),
      ("pm10", "AA", "2024-01-01T00:00:00Z", 1L, 10.0, 10.0)))
  }

  // ---- mergeable-summary algebra properties (scalacheck) -------------

  private case class Agg(cnt: Long, sum: Double) {
    def merge(o: Agg): Agg = Agg(cnt + o.cnt, sum + o.sum) // Aggregator.java:18-32
    def avg: Double = sum / cnt
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("merge algebra: commutative, associative, avg == Σsum/Σcnt never avg-of-avgs") {
    val genAgg = for {
      c <- Gen.choose(1L, 1000L)
      s <- Gen.choose(-1e6, 1e6)
    } yield Agg(c, s)
    check(Prop.forAll(genAgg, genAgg) { (a, b) => a.merge(b) == b.merge(a) })
    check(Prop.forAll(genAgg, genAgg, genAgg) { (a, b, c) =>
      val l = a.merge(b).merge(c); val r = a.merge(b.merge(c))
      l.cnt == r.cnt && math.abs(l.sum - r.sum) < 1e-6
    })
    check(Prop.forAll(genAgg, genAgg) { (a, b) =>
      val m = a.merge(b)
      // the correct weighted avg, visibly != naive (avg(a)+avg(b))/2 in general
      math.abs(m.avg - (a.sum + b.sum) / (a.cnt + b.cnt)) < 1e-9
    })
  }

  test("split-stream-then-merge == aggregate-whole (scalacheck over splits)") {
    val values = readings.collect()
    check(Prop.forAll(Gen.listOfN(values.length, Gen.oneOf(true, false))) { mask =>
      import scala.jdk.CollectionConverters._
      val schema = readings.schema
      val (l, r) = values.zip(mask).partition(_._2)
      val dfL = spark.createDataFrame(l.map(_._1).toList.asJava, schema)
      val dfR = spark.createDataFrame(r.map(_._1).toList.asJava, schema)
      val merged = ViewBuilder.rollupTemporal(
        ViewBuilder.build(dfL, col("geo"), "min")
          .unionAll(ViewBuilder.build(dfR, col("geo"), "min")), "min")
      val whole = ViewBuilder.build(readings, col("geo"), "min")
      val norm = (df: org.apache.spark.sql.DataFrame) =>
        df.collect().map(x => (x.getString(0), x.getString(1), x.getTimestamp(2), x.getLong(3),
          math.round(x.getDouble(4) * 1e9))).toSet
      norm(merged) == norm(whole)
    })
  }
}
