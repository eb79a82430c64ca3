package graft

import java.nio.file.Files

import graft.operators.{Similarity, SkewTools, ViewBuilder}
import graft.sources.{SensorGrid, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path operators: view fan-out + coarse-from-fine rollups,
  * salted aggregation, partitioned IVF index.
  */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val readings = SensorGrid.readings(spark, Sf0001).cache()

  private def viewRows(df: DataFrame) =
    df.select(
      col("metric"),
      col("geo"),
      col("ts").cast("long"),
      col("cnt"),
      round(col("sum_val"), 6))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("buildAll fans out precision × resolution like the reference's store loop") {
    val views = ViewBuilder.buildAll(readings, "gh12", Seq(4, 6), Seq("min", "hour", "day", "month"))
    assert(views.size === 8)
    assert(viewRows(views((6, "day")))
      .sameElements(viewRows(ViewBuilder.build(readings, substring(col("gh12"), 1, 6), "day"))))
  }

  test("spatial rollup (gh6 → gh4) == direct gh4 build from raw readings") {
    val fine = ViewBuilder.build(readings, substring(col("gh12"), 1, 6), "hour")
    val rolled = ViewBuilder.rollupSpatial(fine, 4)
    val direct = ViewBuilder.build(readings, substring(col("gh12"), 1, 4), "hour")
    assert(viewRows(rolled).sameElements(viewRows(direct)))
  }

  test("temporal rollup (day → month) == direct month build from raw readings") {
    val fine = ViewBuilder.build(readings, substring(col("gh12"), 1, 6), "day")
    val rolled = ViewBuilder.rollupTemporal(fine, "month")
    val direct = ViewBuilder.build(readings, substring(col("gh12"), 1, 6), "month")
    assert(viewRows(rolled).sameElements(viewRows(direct)))
  }

  test("salted aggregation == plain groupBy (count/sum/avg algebra survives salting)") {
    val events = Tables.load(spark, Sf0001, "events")
    val plain = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"))
      .withColumn("avg_val", col("sum_val") / col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .sortBy(_._1)
    val salted = SkewTools.saltedSummary(events, Seq("event_type"), "value", salts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
      .sortBy(_._1)
    assert(salted.sameElements(plain))
  }

  test("skewed join: AQE splits the hot partition (skew=true in the final plan); salted twin == plain join") {
    import SparkTestBase.spark.implicits._
    // one hot key: 90% of the fact rows share k=0, the rest spread thin
    val facts = spark.range(0, 60000)
      .select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 100).as("k"),
        (col("id") % 1000).cast("double").as("v"))
    val dim = (0L until 100L).map(k => (k, s"name_$k")).toDF("k", "k_name")
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force a shuffle join (no broadcast) and thresholds small enough
      // that the hot partition qualifies as skewed at test scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val joined = facts.join(dim, "k")
      val plainRows = joined.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
      // the ADAPTIVE final plan must have split the hot partition: the
      // sort-merge join is marked skew=true after execution
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"no skew-join split in plan:\n$finalPlan")
      // and the manual salted twin reproduces the same rows exactly
      val salted = SkewTools.saltedJoin(facts, dim, "k", salts = 8).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
      assert(salted.length === plainRows.length)
      assert(salted.sameElements(plainRows))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("IVF index: partitioned write, pruned probe, same results as in-memory IVF") {
    val emb = Tables.load(spark, Sf0001, "embeddings")
    val dir = Files.createTempDirectory("graft-ivf").toFile.getAbsolutePath
    Similarity.writeIvfIndex(emb, s"$dir/index")
    val fromIndex = Similarity.searchIvfIndex(spark, s"$dir/index", 5)
    val inMemory = Similarity.ivfTopK(emb, 5)
    assert(fromIndex.collect().map(_.toSeq.toList).toList ===
      inMemory.collect().map(_.toSeq.toList).toList)
    // the probe plan must prune partitions on bucket, not scan+filter
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n${plan.take(2000)}")
    // nprobe=8 == brute force (all partitions probed)
    val all = Similarity.searchIvfIndex(spark, s"$dir/index", 5, nprobe = Similarity.Centroids.length)
    val brute = Similarity.topK(emb, 5)
    assert(all.collect().map(_.toSeq.toList).toList ===
      brute.collect().map(_.toSeq.toList).toList)
  }
}
