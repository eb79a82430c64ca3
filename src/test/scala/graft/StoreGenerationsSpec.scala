package graft

import graft.operators.{Similarity, StoreGenerations}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Time-travel reads of the bucket-partitioned serving stores
  * (VERDICT r13 #9): every maintenance call archives its touched
  * buckets' pre-state as a numbered generation, and `storeAsOf(g)`
  * must reconstruct the store EXACTLY as it stood after generation g —
  * across upserts (moved + new ids), deletes, and vacuum.
  */
class StoreGenerationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def baseStore: DataFrame =
    spark.range(200).select(
      col("id").as("vec_id"),
      (col("id") * 2).cast("double").as("val"),
      pmod(col("id"), lit(8L)).cast("int").as("bucket"))

  private def contents(df: DataFrame): Seq[(Long, Double, Int)] =
    df.select(col("vec_id"), col("val"), col("bucket").cast("int"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .sortBy(identity).toSeq

  test("storeAsOf reconstructs every generation across upsert, move, and delete") {
    val path = java.nio.file.Files.createTempDirectory("graft_gens").toString + "/store"
    Similarity.ivfStoreWrite(baseStore, path)
    StoreGenerations.enable(spark, path)
    assert(StoreGenerations.currentGen(spark, path) === 0)
    val s0 = contents(spark.read.parquet(path))

    // gen 0 -> 1: an upsert with MOVED ids (10-14 change bucket) and
    // NEW ids (200-209) — exercises the staged-swap archive hook
    import spark.implicits._
    val up = spark.range(10, 15).select(
      col("id").as("vec_id"), lit(-1.0).as("val"),
      pmod(col("id") + 3, lit(8L)).cast("int").as("bucket"))
      .unionByName(spark.range(200, 210).select(
        col("id").as("vec_id"), lit(-2.0).as("val"),
        pmod(col("id"), lit(8L)).cast("int").as("bucket")))
    Similarity.storeUpsert(spark, up, path, payloadCols = Seq("val"))
    assert(StoreGenerations.currentGen(spark, path) === 1)
    val s1 = contents(spark.read.parquet(path))

    // gen 1 -> 2: a pure-INSERT batch — exercises the append-path hook
    val ins = spark.range(300, 310).select(
      col("id").as("vec_id"), lit(-3.0).as("val"),
      pmod(col("id"), lit(8L)).cast("int").as("bucket"))
    Similarity.storeUpsert(spark, ins, path, payloadCols = Seq("val"))
    assert(StoreGenerations.currentGen(spark, path) === 2)
    val s2 = contents(spark.read.parquet(path))

    // gen 2 -> 3: a delete
    Similarity.storeDelete(spark, Seq(3L, 12L, 305L).toDF("vec_id"), path)
    assert(StoreGenerations.currentGen(spark, path) === 3)
    val s3 = contents(spark.read.parquet(path))

    // every generation reconstructs exactly
    assert(contents(StoreGenerations.storeAsOf(spark, path, 0)) === s0, "gen 0 drifted")
    assert(contents(StoreGenerations.storeAsOf(spark, path, 1)) === s1, "gen 1 drifted")
    assert(contents(StoreGenerations.storeAsOf(spark, path, 2)) === s2, "gen 2 drifted")
    assert(contents(StoreGenerations.storeAsOf(spark, path, 3)) === s3, "gen 3 != live")
    // sanity on the fixture itself: the states genuinely differ
    assert(s0 !== s1); assert(s1 !== s2); assert(s2 !== s3)
    // snapshot semantics, spot-checked: id 12 moved at gen 1 (bucket
    // 12%8=4 -> 15%8=7), ids 300+ absent before gen 2, id 3 gone at 3
    assert(s0.find(_._1 == 12L).map(_._3) === Some(4))
    assert(s1.find(_._1 == 12L).map(_._3) === Some(7))
    assert(!s1.exists(_._1 >= 300L) && s2.exists(_._1 == 305L))
    assert(s2.exists(_._1 == 3L) && !s3.exists(_._1 == 3L))

    // vacuum keeps the newest archives: gen 0 becomes unreadable
    // (refused, never silently served), gens >= 1 still exact
    val dropped = StoreGenerations.vacuum(spark, path, keepLast = 2)
    assert(dropped === Seq(0))
    assert(contents(StoreGenerations.storeAsOf(spark, path, 1)) === s1)
    assert(contents(StoreGenerations.storeAsOf(spark, path, 2)) === s2)
    intercept[IllegalArgumentException] {
      StoreGenerations.storeAsOf(spark, path, 0)
    }
  }

  test("stats sidecar: per-generation snapshot resolves exactly; a crash-lost sidecar is refused") {
    val path = java.nio.file.Files.createTempDirectory("graft_gens_sc").toString + "/store"
    Similarity.ivfStoreWrite(baseStore, path)
    StoreGenerations.enable(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a store-adjacent sidecar file (the BM25 stats shape: one value
    // per generation) maintained the way the maintenance bodies do —
    // swap commits gen K, THEN the pre-write copy, THEN the overwrite
    val sidecar = java.nio.file.Files.createTempDirectory("graft_gens_sc_side").toString + "/v"
    def writeSidecar(v: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(sidecar)
      if (fs.exists(p)) fs.delete(p, true)
      fs.mkdirs(p)
      val o = fs.create(new org.apache.hadoop.fs.Path(p, "value"), true)
      o.write(v.getBytes("UTF-8")); o.close()
    }
    def readSidecar(p: String): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(p, "value"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    writeSidecar("v0")
    def maintain(ids: Range, v: String): Unit = {
      Similarity.storeUpsert(
        spark,
        spark.range(ids.head, ids.last + 1).select(
          col("id").as("vec_id"), lit(-1.0).as("val"),
          pmod(col("id"), lit(8L)).cast("int").as("bucket")),
        path, payloadCols = Seq("val"))
      StoreGenerations.archiveSidecar(spark, path, sidecar, "stats")
      writeSidecar(v)
    }
    maintain(1000 until 1010, "v1") // gen 0 archived with sidecar v0
    maintain(1010 until 1020, "v2") // gen 1 archived with sidecar v1
    assert(readSidecar(StoreGenerations.sidecarAsOf(spark, path, sidecar, "stats", 0)) === "v0")
    assert(readSidecar(StoreGenerations.sidecarAsOf(spark, path, sidecar, "stats", 1)) === "v1")
    // gen == current resolves to the LIVE sidecar
    assert(readSidecar(StoreGenerations.sidecarAsOf(spark, path, sidecar, "stats", 2)) === "v2")
    // crash-lost sidecar: remove gen 0's copy — asOf(0) must REFUSE,
    // never silently serve v1 or the live value
    fs.delete(
      new org.apache.hadoop.fs.Path(StoreGenerations.gensPath(path), "g=0/_stats"), true)
    intercept[IllegalArgumentException] {
      StoreGenerations.sidecarAsOf(spark, path, sidecar, "stats", 0)
    }
    // gen 1 is untouched and still resolves
    assert(readSidecar(StoreGenerations.sidecarAsOf(spark, path, sidecar, "stats", 1)) === "v1")
  }

  test("unversioned store: maintenance archives nothing, asOf(0) is the live store") {
    val path = java.nio.file.Files.createTempDirectory("graft_gens_off").toString + "/store"
    Similarity.ivfStoreWrite(baseStore, path)
    import spark.implicits._
    Similarity.storeDelete(spark, Seq(5L).toDF("vec_id"), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(
      !fs.exists(new org.apache.hadoop.fs.Path(StoreGenerations.gensPath(path), "g=0")),
      "unversioned maintenance must not archive")
    assert(StoreGenerations.currentGen(spark, path) === 0)
    assert(
      contents(StoreGenerations.storeAsOf(spark, path, 0)) ===
        contents(spark.read.parquet(path)))
  }
}
