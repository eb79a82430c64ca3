package graft

import graft.operators.Privacy
import graft.sources.Ingest
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Routing semantics of the quarantine ingester and the DP release
  * mechanism, on crafted fixtures with driver-recomputed expectations.
  */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docsDf(rows: Seq[(Long, String, Long)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, l, n) => Row(i, l, n) }, 3),
      schema)
  }

  private val docs = (0L until 40L).map(i => (i, if (i % 2 == 0) "en" else "de", 100 + i))

  test("every feed line lands in exactly one route; corrupt set is exactly doc_id % 13 == 3") {
    val routed = Ingest.parseAndRoute(Ingest.syntheticFeed(docsDf(docs))).collect()
    assert(routed.length == docs.length)
    val bad = routed.filter(_.getAs[String]("status") == "quarantine")
    assert(bad.map(_.getAs[Long]("feed_id")).sorted.toSeq ==
      docs.map(_._1).filter(_ % Ingest.CorruptMod == Ingest.CorruptRes))
    bad.foreach { r =>
      assert(r.getAs[String]("raw_line").startsWith("{{"), "quarantine preserves the bytes")
      assert(r.isNullAt(r.fieldIndex("doc_id")) && r.isNullAt(r.fieldIndex("lang")))
    }
    routed.filter(_.getAs[String]("status") == "ok").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("raw_line")))
      val id = r.getAs[Long]("doc_id")
      assert(id == r.getAs[Long]("feed_id"))
      assert(r.getAs[String]("lang") == (if (id % 2 == 0) "en" else "de"))
      assert(r.getAs[Long]("n_chars") == 100 + id)
    }
  }

  test("summary conserves rows: sum(ok cnt) + quarantine cnt == n_total in every row") {
    val rows = Ingest.quarantineSummary(docsDf(docs)).collect()
    val total = rows.head.getAs[Long]("n_total")
    assert(rows.forall(_.getAs[Long]("n_total") == total))
    assert(total == docs.length)
    val okSum = rows.filter(_.getAs[String]("status") == "ok").map(_.getAs[Long]("cnt")).sum
    val bad = rows.filter(_.getAs[String]("status") == "quarantine")
    assert(bad.length == 1)
    assert(okSum + bad.head.getAs[Long]("cnt") == total)
    assert(bad.head.getAs[String]("bad_md5") != null)
  }

  test("laplace noise: deterministic, epsilon-inverse scale, zero-mean-ish over many keys") {
    val n1 = Privacy.laplaceNoise("click", 1.0)
    assert(n1 == Privacy.laplaceNoise("click", 1.0), "same key+eps must replay")
    assert(math.abs(Privacy.laplaceNoise("click", 2.0) - n1 / 2) < 1e-12,
      "b = sensitivity/eps scales the same quantile")
    val sample = (0 until 2000).map(i => Privacy.laplaceNoise(s"k$i", 1.0))
    val mean = sample.sum / sample.size
    assert(math.abs(mean) < 0.1, s"mean=$mean")
    // mean |Laplace(b=1)| == 1
    val meanAbs = sample.map(math.abs).sum / sample.size
    assert(meanAbs > 0.8 && meanAbs < 1.2, s"meanAbs=$meanAbs")
  }

  test("dp release == max(0, round(true + noise)) recomputed driver-side; truth never exposed") {
    val schema = StructType(Seq(
      StructField("event_type", StringType, nullable = false)))
    val evs = Seq.fill(37)("click") ++ Seq.fill(2)("rare") ++ Seq.fill(11)("view")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(evs.map(Row(_)), 2), schema)
    val out = Privacy.dpEventCounts(df).collect()
    val expect = evs.groupBy(identity).map { case (k, g) =>
      k -> math.max(0L, math.rint(g.size + Privacy.laplaceNoise(k, Privacy.DpEpsilon)).toLong)
    }
    out.foreach { r =>
      val k = r.getAs[String]("event_type")
      assert(r.getAs[Long]("released_count") == expect(k), s"key $k")
      assert(r.getAs[Double]("epsilon") == Privacy.DpEpsilon)
      assert(r.schema.fieldNames.toSet == Set("event_type", "released_count", "epsilon"),
        "true count must not be in the release")
    }
  }
}
