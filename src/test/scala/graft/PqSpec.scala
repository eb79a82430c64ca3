package graft

import graft.operators.{Pq, PqRef, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: trainer parity vs the sequential ref, code
  * packing invariants, ADC ranking sanity, re-rank containment, and the
  * composed IVF-PQ path's cost shape.
  */
class PqSpec extends AnyFunSuite {
  import SparkTestBase._
  private lazy val spark = SparkTestBase.spark

  private lazy val emb = Tables.load(spark, Sf0001, "embeddings").cache()
  private lazy val vecs = emb
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    .toSeq
  private lazy val books = Pq.trainCodebooks(emb)
  private lazy val encoded = Pq.encode(emb, books).cache()

  test("trainCodebooks == PqRef sequential twin at 6dp (gate parity)") {
    val ref = PqRef.trainCodebooks(vecs)
    for (s <- 0 until Pq.SubSpaces; j <- 0 until Pq.CodebookK)
      assert(books(s)(j).toSeq === ref(s)(j).toSeq, s"subspace $s centroid $j diverged")
  }

  test("encode: one row per vector, codes in [0, 2^32), nibbles are valid centroid ids") {
    val rows = encoded.collect()
    assert(rows.length === emb.count())
    rows.foreach { r =>
      val code = r.getLong(1)
      assert(code >= 0L && code < (1L << (4 * Pq.SubSpaces)), s"code $code out of range")
      (0 until Pq.SubSpaces).foreach { s =>
        val nib = (code >> (4 * s)) & 15
        assert(nib < Pq.CodebookK)
      }
    }
    // codes actually discriminate: a degenerate trainer would collapse
    // most vectors onto one code
    assert(rows.map(_.getLong(1)).distinct.length > rows.length / 2)
  }

  test("encode nibbles == driver-side argmin over the same codebooks") {
    val byId = encoded.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.take(50).foreach { case (id, v) =>
      (0 until Pq.SubSpaces).foreach { s =>
        val scores = books(s).map { c =>
          var d = 0.0
          var i = 0
          while (i < Pq.SubDim) { d += v(s * Pq.SubDim + i).toDouble * c(i); i += 1 }
          2.0 * d - Pq.normSq(c)
        }
        val mx = scores.max
        val expected = scores.indexWhere(_ >= mx)
        val got = (byId(id) >> (4 * s)) & 15
        assert(got === expected.toLong, s"vec $id subspace $s")
      }
    }
  }

  test("ADC distance == decoded-centroid distance (table lookup is exact by construction)") {
    val q = Similarity.QueryVec
    val table = Pq.distTable(books, q)
    val adc = Pq.adcTopK(encoded, books, 5).collect()
    val byId = encoded.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    adc.foreach { r =>
      val code = byId(r.getLong(0))
      val manual = (0 until Pq.SubSpaces).foldLeft(0.0) { (a, s) =>
        a + table(s)(((code >> (4 * s)) & 15).toInt)
      }
      assert(r.getDouble(1) === Similarity.round6(manual))
    }
  }

  test("rerank: results are a subset of the ADC shortlist, exactly ordered by true distance") {
    val k = 10
    val q = Similarity.QueryVec
    val short = encoded
      .withColumn("adc", expr(Pq.adcDistExpr(Pq.distTable(books, q), "code", spark = true)))
      .orderBy(col("adc"), col("vec_id"))
      .limit(k * Pq.RerankShortlistMult)
      .collect().map(_.getLong(0)).toSet
    val rer = Pq.rerankTopKFor(encoded, emb, books, k, q).collect()
    assert(rer.length === k)
    assert(rer.forall(r => short.contains(r.getLong(0))), "re-rank must draw from the shortlist")
    val dists = rer.map(_.getDouble(1))
    assert(dists.sameElements(dists.sorted), "true distances must be non-decreasing")
    // re-rank recall is at least ADC recall on this fixture
    val r = Pq.adcRecall(encoded, books, emb, 20).collect().head
    assert(r.getAs[Long]("recall_rerank_permille") >= r.getAs[Long]("recall_adc_permille"))
    assert(r.getAs[Boolean]("certified"))
  }

  test("ivfPqTopK: every result lives in a probed cell; equals corpus rerank when all cells probed") {
    val cents = Similarity.kmeansSphericalTrace(emb, 8, 3)._1
    val bucketed = Similarity.ivfTrainedAssignments(emb, cents)
    val probed = Similarity.probedBucketsFor(cents, 4).toSet
    val inCell = bucketed.filter(col("bucket").isin(probed.toSeq.map(Int.box): _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = Pq.ivfPqTopK(bucketed, encoded, emb, books, cents, 10, 4).collect()
    assert(got.nonEmpty && got.forall(r => inCell.contains(r.getLong(0))))
    // probing EVERY cell degenerates to the corpus-wide rerank path
    val all = Pq.ivfPqTopK(bucketed, encoded, emb, books, cents, 10, cents.length)
      .collect().map(_.toSeq).toSeq
    val corpus = Pq.rerankTopKFor(encoded, emb, books, 10, Similarity.QueryVec)
      .collect().map(_.toSeq).toSeq
    assert(all === corpus)
  }

  test("pqDriftAudit: identical books on both sides -> equal recalls, retrain never fires") {
    val r = Pq.pqDriftAudit(encoded, books, encoded, books, emb, 10).collect().head
    assert(r.getAs[Long]("recall_stale_permille") === r.getAs[Long]("recall_fresh_permille"))
    assert(!r.getAs[Boolean]("retrain"))
  }

  test("sampled trainer: books come from the vec_id%4 quarter, full-corpus certificate still holds") {
    val sampled = Pq.trainCodebooksSampled(emb)
    val refQuarter = PqRef.trainCodebooks(vecs.filter(_._1 % Pq.TrainSampleMod == 0))
    for (s <- 0 until Pq.SubSpaces; j <- 0 until Pq.CodebookK)
      assert(sampled(s)(j).toSeq === refQuarter(s)(j).toSeq, s"subspace $s centroid $j")
    val enc = Pq.encode(emb, sampled)
    val r = Pq.adcRecall(enc, sampled, emb, 20).collect().head
    assert(r.getAs[Boolean]("certified"),
      s"sampled books miss the recall floors: ${r.toSeq}")
  }

  test("stored IVF-PQ: upserted code store == in-memory compose, files read == probed dirs, no staging leak") {
    val cents = Similarity.kmeansSphericalTrace(emb, 8, 3)._1
    val codes = Pq.encodeWithBuckets(emb, books, cents)
    // encodeWithBuckets carries exactly the encode()'s codes plus the
    // assignment's buckets — the one-scan projection changes nothing
    val byId = codes.collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    val encById = encoded.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val asgById = Similarity.ivfTrainedAssignments(emb, cents)
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId.keySet === encById.keySet)
    byId.foreach { case (id, (c, b)) =>
      assert(c === encById(id) && b === asgById(id), s"vec $id")
    }
    // base 4/5 + upserted fifth must serve what a full write serves
    val path = java.nio.file.Files.createTempDirectory("pq_store_spec").toString
    Pq.pqStoreWrite(codes.filter(pmod(col("vec_id"), lit(5)) =!= 0), path)
    Pq.pqStoreUpsert(spark, codes.filter(pmod(col("vec_id"), lit(5)) === 0), path)
    val stored = Pq.ivfPqStoredTopK(spark, books, cents, emb, 10, 3, path)
    val rows = stored.collect() // execute so scan metrics populate
    val bucketed = Similarity.ivfTrainedAssignments(emb, cents)
    assert(rows.map(_.toSeq).toSeq ===
      Pq.ivfPqTopK(bucketed, encoded, emb, books, cents, 10, 3).collect().map(_.toSeq).toSeq)
    // file-level pruning: the code-store scan reads EXACTLY the files
    // under the 3 probed bucket directories. The store scan feeds the
    // ADC shortlist on the BROADCAST side of the re-rank join, so under
    // AQE it lives inside a materialized query stage (a leaf to
    // TreeNode.collect) — descend through adaptive plans and stages
    // explicitly, then pick the scan rooted at the store path
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case o => o.children.flatMap(allScans)
      }
      here ++ p.subqueries.flatMap(allScans)
    }
    val scan = allScans(stored.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains(path)))
      .getOrElse(fail("code-store scan not found in executed plan"))
    val probes = Similarity.probedBucketsFor(cents, 3).toSet
    def filesUnder(buckets: Iterable[Int]): Int = buckets.toSeq.map { b =>
      val dir = new java.io.File(s"$path/bucket=$b")
      Option(dir.listFiles).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    }.sum
    val numFiles = scan.metrics("numFiles").value
    info(s"code-store scan read $numFiles of ${filesUnder(0 until 8)} files")
    assert(scan.partitionFilters.nonEmpty, "bucket IN-list did not reach PartitionFilters")
    assert(numFiles === filesUnder(probes).toLong, "scan did not prune to the probed directories")
    assert(numFiles < filesUnder(0 until 8).toLong, "nothing was pruned")
    // the upsert's sibling staging dir was deleted (ADVICE r10: the old
    // driver-temp staging leaked one copy of the touched buckets per
    // upsert and broke multi-node deployments)
    val storeRoot = new java.io.File(path)
    val leftovers = Option(storeRoot.getParentFile.listFiles).toSeq.flatten
      .filter(_.getName.startsWith(storeRoot.getName + ".staging-"))
    assert(leftovers.isEmpty, s"staging dirs leaked: ${leftovers.mkString(", ")}")
  }

  test("two-store IVF-PQ: codes AND re-rank floats from probed partitions only, result == in-memory compose") {
    val cents = Similarity.kmeansSphericalTrace(emb, 8, 3)._1
    val bucketed = Similarity.ivfTrainedAssignments(emb, cents)
    val floatPath = java.nio.file.Files.createTempDirectory("pq_two_store_f").toString
    val codePath = java.nio.file.Files.createTempDirectory("pq_two_store_c").toString
    Similarity.ivfStoreWrite(bucketed, floatPath)
    Pq.pqStoreWrite(Pq.encodeWithBuckets(emb, books, cents), codePath)
    val stored = Pq.ivfPqStoredTopKFromStores(spark, books, cents, 10, 3, codePath, floatPath)
    val rows = stored.collect()
    assert(rows.map(_.toSeq).toSeq ===
      Pq.ivfPqTopK(bucketed, encoded, emb, books, cents, 10, 3).collect().map(_.toSeq).toSeq)
    // BOTH scans prune to the probed bucket directories of their store
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case o => o.children.flatMap(allScans)
      }
      here ++ p.subqueries.flatMap(allScans)
    }
    val probes = Similarity.probedBucketsFor(cents, 3).toSet
    def filesUnder(root: String, buckets: Iterable[Int]): Int = buckets.toSeq.map { b =>
      Option(new java.io.File(s"$root/bucket=$b").listFiles).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    }.sum
    val scans = allScans(stored.queryExecution.executedPlan)
    Seq(codePath, floatPath).foreach { root =>
      val scan = scans.find(_.relation.location.rootPaths.exists(_.toString.contains(root)))
        .getOrElse(fail(s"no scan rooted at $root in the executed plan"))
      assert(scan.partitionFilters.nonEmpty, s"$root: no PartitionFilters")
      assert(scan.metrics("numFiles").value === filesUnder(root, probes).toLong,
        s"$root: scan did not prune to the probed directories")
      assert(scan.metrics("numFiles").value < filesUnder(root, 0 until 8).toLong,
        s"$root: nothing pruned")
    }
  }
}
