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
    // vacuum floor (ADVICE r14): after dropping gen 0's archive, a
    // below-floor sidecar read must be REFUSED by the range check —
    // not silently resolved to the oldest retained (newer) snapshot
    StoreGenerations.vacuum(spark, path, keepLast = 1)
    val refused = intercept[IllegalArgumentException] {
      StoreGenerations.sidecarAsOf(spark, path, sidecar, "stats", 0)
    }
    assert(refused.getMessage.contains("retained range"), refused.getMessage)
    assert(readSidecar(StoreGenerations.sidecarAsOf(spark, path, sidecar, "stats", 1)) === "v1")
  }

  /** (dev, inode) of every parquet file under a directory tree — the
    * no-copy witness: a RENAMED file keeps its file key, a copied one
    * gets a fresh inode.
    */
  private def fileKeys(root: String): Map[String, Object] = {
    val base = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(base)) return Map.empty
    val out = scala.collection.mutable.Map.empty[String, Object]
    java.nio.file.Files.walk(base).forEach { p =>
      if (p.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p)) {
        val attrs = java.nio.file.Files.readAttributes(
          p, classOf[java.nio.file.attribute.BasicFileAttributes])
        out(p.getFileName.toString) = attrs.fileKey()
      }
    }
    out.toMap
  }

  test("rewrite archive MOVES pre-state (same inode in the generation, zero byte copies); append archive is metadata-only") {
    val path = java.nio.file.Files.createTempDirectory("graft_gens_nocopy").toString + "/store"
    Similarity.ivfStoreWrite(baseStore, path)
    StoreGenerations.enable(spark, path)
    val preKeys = fileKeys(path)
    assert(preKeys.nonEmpty)

    // REWRITE call: ids 0-7 move buckets — every bucket touched
    import spark.implicits._
    val move = spark.range(0, 8).select(
      col("id").as("vec_id"), lit(-1.0).as("val"),
      pmod(col("id") + 1, lit(8L)).cast("int").as("bucket"))
    Similarity.storeUpsert(spark, move, path, payloadCols = Seq("val"))
    val genKeys = fileKeys(StoreGenerations.gensPath(path))
    // every pre-state file now lives in the archive WITH ITS OLD INODE
    // — renamed, not copied (VERDICT r14 #1's Done criterion)
    preKeys.foreach { case (name, key) =>
      assert(genKeys.get(name).contains(key),
        s"pre-state file $name was not renamed into the archive (copied or lost)")
    }
    // and is gone from the live store (a copy would leave it behind)
    val liveKeys = fileKeys(path)
    preKeys.keys.foreach(n => assert(!liveKeys.contains(n), s"$n still live"))

    // APPEND call: brand-new ids — the archive must be METADATA ONLY
    // (no bucket directories, just the _touched/_prefiles commit)
    val ins = spark.range(5000, 5010).select(
      col("id").as("vec_id"), lit(-2.0).as("val"),
      pmod(col("id"), lit(8L)).cast("int").as("bucket"))
    Similarity.storeUpsert(spark, ins, path, payloadCols = Seq("val"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val g1 = new org.apache.hadoop.fs.Path(StoreGenerations.gensPath(path), "g=1")
    val entries = fs.listStatus(g1).map(_.getPath.getName).toSet
    assert(entries === Set("_touched", "_prefiles"),
      s"insert-only archive must hold no data, got $entries")
    // both generations still reconstruct exactly
    assert(StoreGenerations.currentGen(spark, path) === 2)
  }

  test("append-path file lists resolve through later rewrites AND compaction (archive-aware compactor)") {
    val path = java.nio.file.Files.createTempDirectory("graft_gens_listres").toString + "/store"
    Similarity.ivfStoreWrite(baseStore, path)
    StoreGenerations.enable(spark, path)
    val s0 = contents(spark.read.parquet(path))
    import spark.implicits._
    def ins(lo: Long, hi: Long, v: Double) =
      Similarity.storeUpsert(
        spark,
        spark.range(lo, hi).select(
          col("id").as("vec_id"), lit(v).as("val"),
          pmod(col("id"), lit(8L)).cast("int").as("bucket")),
        path, payloadCols = Seq("val"))
    ins(1000, 1010, -1.0) // gen 0: file-list archive
    val s1 = contents(spark.read.parquet(path))
    ins(2000, 2010, -2.0) // gen 1: file-list archive
    val s2 = contents(spark.read.parquet(path))
    // versioned compaction: rewrites the multi-file buckets, so it
    // MUST archive (gen 2, physical, by rename) — the g=0/g=1 lists
    // reference the very files it replaces
    val preCompactKeys = fileKeys(path)
    val rewritten = Similarity.ivfStoreCompact(spark, path)
    assert(rewritten.nonEmpty, "fixture: compaction found nothing to rewrite")
    assert(StoreGenerations.currentGen(spark, path) === 3)
    val g2Keys = fileKeys(s"${StoreGenerations.gensPath(path)}/g=2")
    preCompactKeys.foreach { case (name, key) =>
      assert(g2Keys.get(name).contains(key),
        s"compaction archived $name by copy or dropped it")
    }
    val s3 = contents(spark.read.parquet(path))
    assert(s3 === s2, "compaction changed content")
    // every generation reconstructs exactly — gens 0/1 resolve their
    // file lists INTO the compaction's physical archive
    assert(contents(StoreGenerations.storeAsOf(spark, path, 0)) === s0, "gen 0 drifted")
    assert(contents(StoreGenerations.storeAsOf(spark, path, 1)) === s1, "gen 1 drifted")
    assert(contents(StoreGenerations.storeAsOf(spark, path, 2)) === s2, "gen 2 drifted")
    assert(contents(StoreGenerations.storeAsOf(spark, path, 3)) === s3, "gen 3 != live")
    assert(s0 !== s1); assert(s1 !== s2)
    // a rewrite AFTER compaction keeps resolving older lists (their
    // container is the compaction archive, not live)
    Similarity.storeDelete(spark, Seq(1005L, 3L).toDF("vec_id"), path)
    assert(contents(StoreGenerations.storeAsOf(spark, path, 0)) === s0)
    assert(contents(StoreGenerations.storeAsOf(spark, path, 1)) === s1)
    assert(contents(StoreGenerations.storeAsOf(spark, path, 3)) === s3)
    assert(contents(StoreGenerations.storeAsOf(spark, path, 4)) ===
      contents(spark.read.parquet(path)))
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

  test("run manifest pins are a vacuum retention floor; release reclaims") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gens_pins").toString
    val path = tmp + "/store"
    val runs = tmp + "/runs"
    Similarity.ivfStoreWrite(baseStore, path)
    StoreGenerations.enable(spark, path)
    import spark.implicits._
    // three maintenance generations: rewrite, insert-only, delete
    Similarity.storeUpsert(spark,
      spark.range(10, 15).select(
        col("id").as("vec_id"), lit(-1.0).as("val"),
        pmod(col("id") + 3, lit(8L)).cast("int").as("bucket")),
      path, payloadCols = Seq("val"))
    val s1 = contents(spark.read.parquet(path))
    // run recorded while gen 1 is current — it pins 1
    StoreGenerations.recordRun(spark, runs, "train-a",
      Map(path -> StoreGenerations.currentGen(spark, path)))
    Similarity.storeUpsert(spark,
      spark.range(300, 310).select(
        col("id").as("vec_id"), lit(-3.0).as("val"),
        pmod(col("id"), lit(8L)).cast("int").as("bucket")),
      path, payloadCols = Seq("val"))
    Similarity.storeDelete(spark, Seq(3L, 12L).toDF("vec_id"), path)
    assert(StoreGenerations.currentGen(spark, path) === 3)
    assert(StoreGenerations.pinnedGens(spark, runs, path) === Seq(1))

    // keepLast=1 would drop archives g=0,1 — but the run pins gen 1,
    // and reconstructing it needs every archive k >= 1: only g=0 (the
    // state at gen 0, below the pin) may go
    val dropped = StoreGenerations.vacuum(spark, path, keepLast = 1, Some(runs))
    assert(dropped === Seq(0),
      "pin-aware vacuum must keep every archive at/above the pinned gen")
    // the pinned run still replays EXACTLY
    assert(contents(
      StoreGenerations.storeAsOfRun(spark, runs, "train-a", path)) === s1)
    // gen 0's only archive (g=0) was dropped: below-floor read refuses
    intercept[IllegalArgumentException] {
      StoreGenerations.storeAsOf(spark, path, 0)
    }

    // release the run: the floor lifts, vacuum reclaims, and a replay
    // of the released id refuses rather than serving live state
    StoreGenerations.releaseRun(spark, runs, "train-a")
    assert(StoreGenerations.pinnedGens(spark, runs, path) === Seq.empty)
    assert(StoreGenerations.vacuum(spark, path, keepLast = 1, Some(runs)) === Seq(1))
    intercept[IllegalArgumentException] {
      StoreGenerations.storeAsOfRun(spark, runs, "train-a", path)
    }
    // the newest archive alone still reconstructs its generation
    assert(contents(StoreGenerations.storeAsOf(spark, path, 3)) ===
      contents(spark.read.parquet(path)))
  }
}
