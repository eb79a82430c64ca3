package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SNAPSHOT / TIME-TRAVEL reads of the bucket-partitioned serving
  * stores (float IVF index, PQ code store, Z-order layout) — the
  * reproducibility primitive a training-data platform needs to answer
  * "which index state served run X?" (VERDICT r13 #9): every
  * maintenance call (upsert / delete) becomes a numbered GENERATION,
  * and [[storeAsOf]] reconstructs the store exactly as it stood after
  * any prior generation.
  *
  * Design — archive-on-write, reusing the staged-swap discipline:
  *
  *   - Generation 0 is the store state at [[enable]] time (for a
  *     store versioned from birth: the initial
  *     [[Similarity.ivfStoreWrite]] / [[Layout.zorderWrite]] content);
  *     generation K is the state after the K-th maintenance call
  *     since.
  *   - When versioning is enabled ([[enable]] plants a marker the
  *     maintenance bodies check with one FS call), each maintenance
  *     call ARCHIVES the pre-state of exactly the buckets it touches
  *     into `<store>.gens/g=K/bucket=N/` before rewriting them —
  *     cost ∝ touched-bucket bytes, the same order as the swap that
  *     follows, never corpus bytes. Untouched buckets are never
  *     copied: their current files ARE their state at every older
  *     generation.
  *   - `storeAsOf(path, G)` resolves per bucket: the archive of the
  *     SMALLEST generation K > G that touched the bucket holds its
  *     state at G (the pre-state of the first later rewrite); a bucket
  *     untouched after G reads from the live store. A bucket that
  *     first APPEARED after G resolves to an archived-but-empty
  *     pre-state and contributes no rows — exactly its content at G.
  *
  * Crash consistency: the per-generation `_touched` meta file is the
  * COMMIT record, written only after every touched bucket's files are
  * copied ([[storeAsOf]] and the next-generation counter both ignore
  * gen directories without it, and a half-archived directory from a
  * crashed call is swept and re-archived by the replay). A crash
  * after the archive commit but before the store swap leaves a
  * duplicate generation whose successor archives the same pre-state —
  * as-of reads stay correct (two adjacent generations with identical
  * content), and the store/manifest sides of that window are the
  * [[StoreManifest.beginMaintenance]] pending-marker transaction's
  * existing business.
  *
  * Retention is the operator's dial: [[vacuum]] drops the oldest
  * archives (as-of reads older than the retained horizon then fail
  * fast with the listing error rather than silently serving newer
  * state — the lakehouse VACUUM contract on plain parquet).
  */
object StoreGenerations {

  def gensPath(storePath: String): String =
    s"${storePath.stripSuffix("/")}.gens"

  private def enabledMarker(storePath: String) =
    new org.apache.hadoop.fs.Path(gensPath(storePath), "ENABLED")

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Turn versioning ON for a store (idempotent). Maintenance calls
    * from now on archive the pre-state of the buckets they touch; the
    * store's CURRENT content is generation [[currentGen]] (0 for a
    * freshly written store).
    */
  def enable(spark: SparkSession, storePath: String): Unit = {
    val fs = fsOf(spark, storePath)
    fs.mkdirs(new org.apache.hadoop.fs.Path(gensPath(storePath)))
    if (!fs.exists(enabledMarker(storePath)))
      fs.create(enabledMarker(storePath), true).close()
  }

  private[operators] def enabled(spark: SparkSession, storePath: String): Boolean =
    fsOf(spark, storePath).exists(enabledMarker(storePath))

  /** Committed (meta-file-bearing) generation ids, ascending. */
  private def committedGens(spark: SparkSession, storePath: String): Seq[Int] = {
    val fs = fsOf(spark, storePath)
    val root = new org.apache.hadoop.fs.Path(gensPath(storePath))
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("g="))
      .map(_.getPath)
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_touched")))
      .map(_.getName.stripPrefix("g=").toInt)
      .sorted
  }

  /** The generation id of the store's CURRENT content: number of
    * committed maintenance archives (each archive K holds the
    * PRE-state of call K, so the live store sits one past the last).
    */
  def currentGen(spark: SparkSession, storePath: String): Int =
    committedGens(spark, storePath).lastOption.map(_ + 1).getOrElse(0)

  /** Archive the PRE-state of `touched` buckets as the next
    * generation — called by the maintenance bodies BEFORE their swap /
    * append when versioning is [[enabled]]. Pure filesystem copies
    * (no Spark job): cost ∝ touched-bucket bytes. The `_touched` meta
    * (one bucket id per line) commits the archive; a leftover
    * uncommitted directory from a crashed call is swept first.
    */
  private[operators] def archiveTouched(
      spark: SparkSession,
      storePath: String,
      touched: Seq[Int],
      partCol: String): Unit = {
    if (!enabled(spark, storePath) || touched.isEmpty) return
    val fs = fsOf(spark, storePath)
    val conf = spark.sparkContext.hadoopConfiguration
    val gen = currentGen(spark, storePath)
    val genDir = new org.apache.hadoop.fs.Path(gensPath(storePath), s"g=$gen")
    if (fs.exists(genDir)) fs.delete(genDir, true) // crashed, uncommitted
    fs.mkdirs(genDir)
    touched.foreach { b =>
      val src = new org.apache.hadoop.fs.Path(storePath, s"$partCol=$b")
      val dst = new org.apache.hadoop.fs.Path(genDir, s"$partCol=$b")
      if (fs.exists(src))
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
      // absent src = the bucket is BORN by this call: its pre-state is
      // empty, recorded by membership in _touched with no files
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(genDir, "_touched"), true)
    out.write(touched.sorted.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  /** Last committed archive id, if any. */
  def lastCommittedGen(spark: SparkSession, storePath: String): Option[Int] =
    committedGens(spark, storePath).lastOption

  /** Attach a SIDECAR snapshot to the generation the current
    * maintenance call just committed — for per-store auxiliary state
    * that must time-travel WITH the buckets (the BM25 one-row corpus
    * stats: scoring a gen-G snapshot with live stats would silently
    * mix generations). Call AFTER the swap (the archive is committed)
    * and BEFORE overwriting the live sidecar: the copy captures the
    * PRE-state, i.e. the value at the archived generation. Underscore
    * prefix keeps it invisible to the archive's parquet discovery.
    * No-op when versioning is off or no generation exists.
    */
  def archiveSidecar(
      spark: SparkSession,
      storePath: String,
      srcPath: String,
      name: String): Unit = {
    if (!enabled(spark, storePath)) return
    lastCommittedGen(spark, storePath).foreach { k =>
      val fs = fsOf(spark, storePath)
      val src = new org.apache.hadoop.fs.Path(srcPath)
      if (fs.exists(src))
        org.apache.hadoop.fs.FileUtil.copy(
          fs, src, fs,
          new org.apache.hadoop.fs.Path(gensPath(storePath), s"g=$k/_$name"),
          false, spark.sparkContext.hadoopConfiguration)
    }
  }

  /** The sidecar as of generation `gen`: the copy attached to the
    * first committed generation ≥ `gen` (its pre-state IS the value at
    * `gen` — no maintenance ran in between, generations are per-call),
    * or the live `srcPath` when `gen` is current. Throws if the
    * resolved generation lacks the sidecar (a crash between the swap
    * and the sidecar copy loses that generation's snapshot — refuse,
    * never silently serve a newer value; the live path is always
    * heal-consistent).
    */
  def sidecarAsOf(
      spark: SparkSession,
      storePath: String,
      srcPath: String,
      name: String,
      gen: Int): String = {
    val gens = committedGens(spark, storePath)
    val cur = gens.lastOption.map(_ + 1).getOrElse(0)
    require(gen >= 0 && gen <= cur, s"gen $gen outside [0, $cur]")
    if (gen == cur) return srcPath
    val k = gens.filter(_ >= gen).head
    val p = new org.apache.hadoop.fs.Path(gensPath(storePath), s"g=$k/_$name")
    require(
      fsOf(spark, storePath).exists(p),
      s"generation $k has no '$name' sidecar (crashed window) — snapshot unavailable")
    p.toString
  }

  /** The store exactly as it stood after generation `gen`: per bucket,
    * the archive of the first later generation that touched it, else
    * the live store. One unionByName of ≤ (gens-after + 1) pruned
    * parquet reads — each archive scan carries a partition filter on
    * its assigned buckets, the live scan excludes every
    * touched-after-gen bucket; schema identical to the live store.
    */
  def storeAsOf(
      spark: SparkSession,
      storePath: String,
      gen: Int,
      partCol: String = "bucket"): DataFrame = {
    val fs = fsOf(spark, storePath)
    val gens = committedGens(spark, storePath)
    val cur = gens.lastOption.map(_ + 1).getOrElse(0)
    // oldest RECONSTRUCTIBLE generation: vacuum drops archives from the
    // front, and a bucket whose only archive was dropped would silently
    // resolve to newer state — refuse instead (the VACUUM contract)
    val floor = gens.headOption.getOrElse(cur)
    require(
      gen >= floor && gen <= cur,
      s"gen $gen outside the retained range [$floor, $cur]")
    if (gen == cur) return spark.read.parquet(storePath)
    val later = gens.filter(_ >= gen)
    // first later toucher per bucket
    val assign = scala.collection.mutable.Map.empty[Int, Int]
    later.foreach { k =>
      val meta = new org.apache.hadoop.fs.Path(gensPath(storePath), s"g=$k/_touched")
      val in = fs.open(meta)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      text.split("\n").filter(_.nonEmpty).map(_.toInt)
        .foreach(b => if (!assign.contains(b)) assign(b) = k)
    }
    val touchedAfter = assign.keys.toSeq
    val live = spark.read.parquet(storePath)
      .filter(!col(partCol).isin(touchedAfter.map(Int.box): _*))
    assign.groupBy(_._2).toSeq.sortBy(_._1).foldLeft(live) {
      case (acc, (k, buckets)) =>
        val genRoot = s"${gensPath(storePath)}/g=$k"
        // an archive whose assigned buckets were all EMPTY pre-states
        // has no parquet files for them — nothing to union
        val dirs = buckets.keys.toSeq.sorted
          .map(b => new org.apache.hadoop.fs.Path(genRoot, s"$partCol=$b"))
          .filter(p => fs.exists(p) && fs.listStatus(p).nonEmpty)
        if (dirs.isEmpty) acc
        else
          acc.unionByName(
            spark.read
              .option("basePath", genRoot)
              .parquet(dirs.map(_.toString): _*)
              .select(acc.columns.map(col): _*))
    }
  }

  /** Drop the oldest archives, keeping the most recent `keepLast`
    * generations readable (plus the live state, always). Frees
    * touched-bucket bytes ∝ what the dropped maintenance calls
    * rewrote.
    */
  def vacuum(spark: SparkSession, storePath: String, keepLast: Int): Seq[Int] = {
    val fs = fsOf(spark, storePath)
    val gens = committedGens(spark, storePath)
    val drop = gens.dropRight(keepLast)
    drop.foreach { k =>
      fs.delete(new org.apache.hadoop.fs.Path(gensPath(storePath), s"g=$k"), true)
    }
    drop
  }
}
