package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical recall of the sign-LSH near-dup pipeline on PLANTED
  * near-duplicates (the test Similarity.scala's band-width analysis
  * promises: cos ≥ 0.9 pairs should survive the 8-bit × 8-band candidate
  * stage with probability ≈ 0.93, so measured recall on a planted set
  * must stay well above the weak-similarity regime).
  *
  * The analytical number is an EXPECTATION over random hyperplanes; the
  * planes here are fixed (seed 7), so we assert a conservative floor
  * (≥ 0.85) rather than the mean. A 4-bit→8-bit band regression (or any
  * future band-shape change that tanks mid-similarity recall) trips this
  * before it ships.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Dim = Similarity.Dim

  /** Deterministic base vector (unit-ish scale, varied direction). */
  private def baseVec(rnd: scala.util.Random): Array[Float] =
    Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat)

  /** Perturb v so that cos(v, v') lands near `target` (mix with an
    * orthogonalized random direction).
    */
  private def perturb(v: Array[Float], target: Double, rnd: scala.util.Random): Array[Float] = {
    val r = Array.fill(Dim)(rnd.nextDouble() * 2 - 1)
    val vd = v.map(_.toDouble)
    val nv = math.sqrt(vd.map(x => x * x).sum)
    val proj = vd.indices.foldLeft(0.0)((a, i) => a + vd(i) * r(i)) / (nv * nv)
    val orth = r.indices.map(i => r(i) - proj * vd(i)).toArray
    val no = math.sqrt(orth.map(x => x * x).sum)
    val s = math.sin(math.acos(target))
    vd.indices.map(i => (target * vd(i) / nv + s * orth(i) / no).toFloat).toArray
  }

  private def cosExact(a: Array[Float], b: Array[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.indices.foldLeft(0.0)((acc, i) => acc + ad(i) * bd(i))
    dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  private def toDf(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v.toSeq) }, 4),
      schema)
  }

  test("sign-LSH finds >=85% of planted cos>=0.9 near-dup pairs") {
    val rnd = new scala.util.Random(42)
    val nPlanted = 120
    val nNoise = 300
    // planted pairs: base i (id 2i) + perturbed copy (id 2i+1), target cos 0.92
    val planted = (0 until nPlanted).flatMap { i =>
      val v = baseVec(rnd)
      Seq((2L * i, v), (2L * i + 1, perturb(v, 0.92, rnd)))
    }
    val noise = (0 until nNoise).map(i => (100000L + i, baseVec(rnd)))
    val all = planted ++ noise

    // ground truth: planted pairs whose EXACT cosine is >= 0.9 (the
    // perturbation targets 0.92 but float rounding scatters slightly)
    val byId = all.toMap
    val truth = (0 until nPlanted)
      .map(i => (2L * i, 2L * i + 1))
      .filter { case (a, b) => cosExact(byId(a), byId(b)) >= 0.9 }
      .toSet
    assert(truth.size > 80, s"fixture degenerate: only ${truth.size} true pairs")

    val found = Similarity.lshNearDupPairs(toDf(all), 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    // precision is structurally 1.0 (exact verify after candidates);
    // anything reported must be a genuinely-similar pair
    val plantedFound = truth.intersect(found)
    val recall = plantedFound.size.toDouble / truth.size
    info(f"planted-pair recall = $recall%.3f (${plantedFound.size}/${truth.size})")
    assert(recall >= 0.85, f"sign-LSH recall regressed: $recall%.3f < 0.85")

    // every reported pair must actually verify at the exact threshold
    found.foreach { case (a, b) =>
      val c = cosExact(byId(a), byId(b))
      assert(c >= 0.9 - 1e-6, s"pair ($a,$b) reported with exact cos $c < 0.9")
    }
  }

  test("wider bands: prefix-stable planes, candidates shrink, planted recall survives") {
    // plane stream is prefix-stable: widening the geometry reuses the
    // production planes instead of reshuffling them
    val p96 = Similarity.planes(96)
    assert(Similarity.Planes.indices.forall(i => p96(i).sameElements(Similarity.Planes(i))))

    val rnd = new scala.util.Random(43)
    val planted = (0 until 60).flatMap { i =>
      val v = baseVec(rnd)
      Seq((2L * i, v), (2L * i + 1, perturb(v, 0.95, rnd)))
    }
    val noise = (0 until 400).map(i => (100000L + i, baseVec(rnd)))
    val d = toDf(planted ++ noise)
    val byId = (planted ++ noise).toMap
    val truth = (0 until 60).map(i => (2L * i, 2L * i + 1))
      .filter { case (a, b) => cosExact(byId(a), byId(b)) >= 0.9 }.toSet

    val cands8 = Similarity.bandCandidates(Similarity.lshBanded(d)).count()
    val sig12 = Similarity.lshBanded(d, rowsPerBand = 12)
    val cands12Df = Similarity.bandCandidates(sig12)
    val cands12 = cands12Df.count()
    // 4 more bits per band ⇒ random collisions drop ~16x; high-sim
    // pairs lose only (per-bit agreement)^4
    assert(cands12 < cands8, s"wider bands must prune candidates ($cands12 >= $cands8)")
    val found12 = Similarity.lshNearDupPairsFromCands(cands12Df, d, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall12 = truth.count(found12.contains).toDouble / truth.size
    info(f"12-bit recall = $recall12%.3f, candidates $cands8 -> $cands12")
    assert(recall12 >= 0.7, f"12-bit recall too low: $recall12%.3f")
  }

  test("maxBucket cap drops degenerate buckets, keeps planted pairs intact") {
    val rnd = new scala.util.Random(44)
    val planted = (0 until 40).flatMap { i =>
      val v = baseVec(rnd)
      Seq((2L * i, v), (2L * i + 1, perturb(v, 0.95, rnd)))
    }
    // a degenerate clump: many copies of ONE vector — its buckets blow
    // past any sane occupancy and contribute occupancy² candidates
    val clumpBase = baseVec(rnd)
    val clump = (0 until 120).map(i => (200000L + i, clumpBase.clone()))
    val d = toDf(planted ++ clump)
    val sig = Similarity.lshBanded(d)
    val uncapped = Similarity.bandCandidates(sig).count()
    val capped = Similarity.bandCandidates(sig, maxBucket = 60L)
    val cappedN = capped.count()
    assert(cappedN < uncapped,
      s"cap must remove the clump's candidate mass ($cappedN >= $uncapped)")
    // every planted pair collides in SOME small bucket and survives
    val byId = (planted ++ clump).toMap
    val truth = (0 until 40).map(i => (2L * i, 2L * i + 1))
      .filter { case (a, b) => cosExact(byId(a), byId(b)) >= 0.9 }.toSet
    val found = Similarity.lshNearDupPairsFromCands(capped, d, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    info(f"capped recall = $recall%.3f, candidates $uncapped -> $cappedN")
    assert(recall >= 0.85, f"cap destroyed planted recall: $recall%.3f")
  }

  test("weak pairs (cos ~= 0.4) are mostly filtered by the bands") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).flatMap { i =>
      val v = baseVec(rnd)
      Seq((2L * i, v), (2L * i + 1, perturb(v, 0.4, rnd)))
    }
    // threshold 0.3 would ACCEPT a cos-0.4 pair if it ever became a
    // candidate — so surviving pairs measure the candidate stage, not
    // the verify stage. Expected band-hit rate at cos 0.4:
    // p = 1-acos(0.4)/pi ~= 0.63, band p^8 ~= 0.025, 8 bands -> ~18%.
    val found = Similarity.lshNearDupPairs(toDf(rows), 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .count { case (a, b) => b == a + 1 && a % 2 == 0 }
    info(s"weak pairs surviving candidates: $found/100")
    assert(found < 50, s"bands pass too many weak pairs ($found/100) — band width regressed?")
  }

  test("kmeans: Lloyd cost is non-increasing and final assignment is argmin-optimal") {
    val emb = graft.sources.Tables.load(spark, SparkTestBase.Sf0001, "embeddings")
    val init = Similarity.kmeansCentroids(emb, k = 4, iters = 0)
    val c1 = Similarity.kmeansCentroids(emb, k = 4, iters = 1)
    val c3 = Similarity.kmeansCentroids(emb, k = 4, iters = 3)
    val cost0 = Similarity.kmeansCost(emb, init)
    val cost1 = Similarity.kmeansCost(emb, c1)
    val cost3 = Similarity.kmeansCost(emb, c3)
    info(f"kmeans cost: init $cost0%.1f -> 1 iter $cost1%.1f -> 3 iters $cost3%.1f")
    assert(cost1 <= cost0 + 1e-6)
    assert(cost3 <= cost1 + 1e-6)

    // the distributed assignment equals a driver-side brute-force argmin
    val assigned = Similarity.assignNearest(emb, c3)
      .collect().map(r => r.getLong(0) -> (r.getSeq[Float](1).toArray, r.getInt(2))).toMap
    assigned.foreach { case (id, (v, bucket)) =>
      val dists = c3.map { c =>
        var d = 0.0
        var i = 0
        while (i < c.length) { val t = v(i) - c(i); d += t * t; i += 1 }
        d
      }
      val best = dists.indexOf(dists.min)
      assert(
        math.abs(dists(bucket) - dists(best)) < 1e-9,
        s"vec $id assigned bucket $bucket (d=${dists(bucket)}) but argmin is $best (d=${dists.min})")
    }
  }

  test("spherical kmeans: gate parity vs ref, unit centroids, monotone angular inertia") {
    val emb = graft.sources.Tables.load(spark, SparkTestBase.Sf0001, "embeddings")
    val (cents, inertias) = Similarity.kmeansSphericalTrace(emb, 8, 3)
    val vecs = emb.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val (refCents, refInertias) = graft.operators.KMeansRef.sphericalTrace(vecs, 8, 3)
    assert(cents.map(_.toSeq).toSeq === refCents.map(_.toSeq).toSeq)
    assert(inertias.toSeq === refInertias.toSeq)
    // unit centroids (6dp quantization perturbs the norm by ≤ ~1e-5·√64)
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"non-unit trained centroid, |c| = $n")
    }
    // spherical Lloyd: angular inertia never increases across iterations
    inertias.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + Similarity.InertiaTolerance, s"inertia increased: $a -> $b")
    }
  }

  test("trained-IVF panel audit: certified, and trained recall beats fixed on this corpus") {
    val emb = graft.sources.Tables.load(spark, SparkTestBase.Sf001, "embeddings").cache()
    val (cents, _) = Similarity.kmeansSphericalTrace(emb, 8, 3)
    val fixedA = Similarity.ivfAssignments(emb).cache()
    val trainedA = Similarity.ivfTrainedAssignments(emb, cents).cache()
    val row = Similarity
      .annRecallTrainedFrom(fixedA, trainedA, cents, emb, 20, 4)
      .collect()(0)
    val (fixedR, trainedR) = (row.getLong(5), row.getLong(6))
    info(s"panel recall: fixed $fixedR‰, trained $trainedR‰")
    assert(row.getBoolean(7), s"trained index not certified (fixed $fixedR, trained $trainedR)")
    assert(trainedR >= fixedR)
    emb.unpersist(); fixedA.unpersist(); trainedA.unpersist()
  }

  test("stored IVF: probe answered from files, byte-equal to in-memory, partitions PRUNED") {
    val emb = graft.sources.Tables.load(spark, SparkTestBase.Sf0001, "embeddings")
    val (cents, _) = Similarity.kmeansSphericalTrace(emb, 8, 3)
    val assigned = Similarity.ivfTrainedAssignments(emb, cents)
    val path = java.nio.file.Files.createTempDirectory("ivf_store_spec").toString
    Similarity.ivfStoreWrite(assigned, path)
    val stored = Similarity.ivfStoredTopK(spark, cents, 20, 4, path)
    val rows = stored.collect() // execute so scan metrics populate
    // storage must be result-invisible: parquet round-trip + pruning
    // change nothing vs the in-memory trained probe
    assert(rows.toSeq === Similarity.ivfTopKTrainedFrom(assigned, cents, 20, 4).collect().toSeq)
    // file-level pruning: the executed scan reads EXACTLY the files
    // under the 4 probed bucket directories, not the other 4
    val scan = stored.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val probes = Similarity.probedBucketsFor(cents, 4).toSet
    def filesUnder(buckets: Iterable[Int]): Int = buckets.toSeq.map { b =>
      val d = new java.io.File(s"$path/bucket=$b")
      Option(d.listFiles).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    }.sum
    val filesInProbed = filesUnder(probes)
    val filesTotal = filesUnder(0 until 8)
    val numFiles = scan.metrics("numFiles").value
    info(s"scan read $numFiles of $filesTotal files ($filesInProbed in probed dirs)")
    assert(scan.partitionFilters.nonEmpty, "bucket IN-list did not reach PartitionFilters")
    assert(numFiles === filesInProbed.toLong, "scan did not prune to the probed bucket directories")
    assert(numFiles < filesTotal.toLong, "nothing was pruned — all bucket directories were read")
  }

  test("kmeans gate parity: distributed centroids == pure-Scala KMeansRef at 6dp") {
    val emb = graft.sources.Tables.load(spark, SparkTestBase.Sf0001, "embeddings")
    val sparkSide = Similarity.kmeansCentroidsTable(spark, emb, 4, 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    val vecs = emb.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val refSide = graft.operators.KMeansRef.centroids(vecs, 4, 3).zipWithIndex.flatMap {
      case (c, j) => c.zipWithIndex.map { case (v, i) => (j, i, Similarity.round6(v)) }
    }.toSeq
    assert(sparkSide === refSide)
  }

  test("multi-probe IVF: probe order starts at QueryBucket; recall grows to exact at nprobe=C") {
    assert(Similarity.probedBuckets(1) === Seq(Similarity.QueryBucket))
    assert(Similarity.probedBuckets(8).sorted === (0 until 8))
    val emb = graft.sources.Tables.load(spark, SparkTestBase.Sf001, "embeddings").cache()
    val assigned = Similarity.ivfAssignments(emb).cache()
    val recalls = Seq(1, 4, 8).map { np =>
      Similarity.annRecallFrom(assigned, emb, 20, np).collect()(0).getLong(4)
    }
    // more probes never lose neighbors; probing ALL buckets IS the exact scan
    assert(recalls == recalls.sorted, s"recall not monotone in nprobe: $recalls")
    assert(recalls.last === 1000L)
    // the served configuration (nprobe=4) clears the certification floor
    val served = Similarity.annRecallFrom(assigned, emb, 20, 4).collect()(0)
    assert(served.getBoolean(5), s"nprobe=4 recall ${served.getLong(4)} under floor")
    emb.unpersist(); assigned.unpersist()
  }

  test("annRecall on a corpus smaller than k: denominator is |exact|, recall 1000 at nprobe=C") {
    val rnd = new scala.util.Random(5)
    val tiny = toDf((0L until 9L).map(i => i -> baseVec(rnd)))
    val r = Similarity.annRecall(tiny, 20, 8).collect()(0)
    assert(r.getLong(1) === 9L) // n_exact = corpus size, not k
    assert(r.getLong(4) === 1000L, s"recall ${r.getLong(4)} — denominator must be |exact|, not k")
    assert(r.getBoolean(5))
  }

  test("knnJoin: ranks dense from 1, sims non-increasing, self excluded, planted pair mutual rank-1") {
    val rnd = new scala.util.Random(11)
    val base = baseVec(rnd)
    val near = perturb(base, 0.97, rnd)
    val d = toDf(Seq(0L -> base, 1L -> near) ++ (2L until 40L).map(i => i -> baseVec(rnd)))
    val out = Similarity.knnJoinFrom(Similarity.lshBanded(d), d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.groupBy(_._1).foreach { case (v, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length), s"ranks not dense for $v")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq, s"sims not sorted for $v")
      assert(!rows.exists(_._3 == v), s"self-neighbor for $v")
    }
    // the cos~0.97 planted pair must be band candidates and each other's top neighbor
    assert(out.find(r => r._1 == 0L && r._2 == 1L).map(_._3) === Some(1L))
    assert(out.find(r => r._1 == 1L && r._2 == 1L).map(_._3) === Some(0L))
  }

  test("knnJoin at the 12-bit production geometry: pairs are band candidates, sims exact, planted pair kept") {
    val rnd = new scala.util.Random(11)
    val base = baseVec(rnd)
    val near = perturb(base, 0.97, rnd)
    val d = toDf(Seq(0L -> base, 1L -> near) ++ (2L until 40L).map(i => i -> baseVec(rnd)))
    val sig12 = Similarity.lshBanded(d, rowsPerBand = 12)
    val cands = Similarity.bandCandidates(sig12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Similarity.knnJoinFromCands(Similarity.bandCandidates(sig12), d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // every emitted neighbor is a (symmetrized) 12-bit band candidate
    out.foreach { case (a, b, _) =>
      assert(cands.contains((math.min(a, b), math.max(a, b))), s"($a,$b) not a 12-bit candidate")
    }
    // sims are the exact cosine recomputed off-Spark (approximation
    // lives ONLY in candidate generation, never in the ranking math)
    val vecs = d.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    out.foreach { case (a, b, sim) =>
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.indices.foldLeft(0.0)((s, i) => s + va(i).toDouble * vb(i).toDouble)
      val exact = dot / (math.sqrt(va.foldLeft(0.0)((s, x) => s + x.toDouble * x)) *
        math.sqrt(vb.foldLeft(0.0)((s, x) => s + x.toDouble * x)))
      assert(math.abs(sim - exact) < 1e-5, s"sim for ($a,$b): $sim vs exact $exact")
    }
    // the cos~0.97 planted pair survives the wider geometry (the
    // 12-bit planted-recall floor measured in embedding_neardup_lsh12)
    assert(out.exists(r => r._1 == 0L && r._2 == 1L), "planted pair lost at 12 bits")
  }

  test("semanticDecontaminate at 12 bits: subset of exact cross-set pairs, planted leak kept") {
    val rnd = new scala.util.Random(21)
    val evalVec = baseVec(rnd)
    val leaked = perturb(evalVec, 0.96, rnd)
    val rows =
      Seq((0L, evalVec, 0), (1L, perturb(evalVec, 0.97, rnd), 0), (10L, leaked, 3)) ++
        (11L until 40L).map(i => (i, baseVec(rnd), (i % 9 + 1).toInt))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v, l) => org.apache.spark.sql.Row(id, v.toSeq, l) }, 4),
      schema)
    val flagged = Similarity
      .semanticDecontaminateFromSig(Similarity.lshBanded(d, rowsPerBand = 12), d, 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exact brute-force cross-set pairs ≥ threshold, off-Spark
    val vecs = rows.map(t => t._1 -> t._2).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
      dot / (math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x)) *
        math.sqrt(b.foldLeft(0.0)((s, x) => s + x.toDouble * x)))
    }
    val exact = (for {
      (t, _, lt) <- rows if lt != 0
      (e, _, le) <- rows if le == 0
      if cos(vecs(t), vecs(e)) >= 0.9
    } yield (t, e)).toSet
    assert(flagged.toSet.subsetOf(exact), s"false positive: ${flagged.toSet -- exact}")
    assert(flagged.contains((10L, 0L)), s"planted leak missed at 12 bits: ${flagged.toSeq}")
  }

  test("semanticDecontaminate: planted train copy of an eval vector is flagged; eval-eval pairs never are") {
    val rnd = new scala.util.Random(21)
    val evalVec = baseVec(rnd)
    val leaked = perturb(evalVec, 0.96, rnd) // train-side near-copy
    val rows =
      Seq((0L, evalVec, 0), (1L, perturb(evalVec, 0.97, rnd), 0), (10L, leaked, 3)) ++
        (11L until 40L).map(i => (i, baseVec(rnd), (i % 9 + 1).toInt))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v, l) => org.apache.spark.sql.Row(id, v.toSeq, l) }, 4),
      schema)
    val flagged = Similarity.semanticDecontaminate(d, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the planted leak is caught against BOTH eval copies; the highly
    // similar eval-eval pair (0,1) must NOT appear (same split)
    assert(flagged.contains((10L, 0L)), s"planted leak missed: ${flagged.toSeq}")
    assert(flagged.forall { case (t, _) => t >= 10L }, s"eval-side id on train side: ${flagged.toSeq}")
  }

  test("quantizeAudit: codes in [0,255], constant dim codes to 0, known 2-vector fixture") {
    // dim0 spans [0,1]; dim1 constant -> 0; dim2 spans [-2,2]; the
    // all-zero/all-one tail dims span [0,1]. vec2 sits mid-range on
    // dim2 (x=0 -> floor(2*256/4) = 128).
    val d = toDf(Seq(
      0L -> (Array(0f, 5f, -2f) ++ Array.fill(Dim - 3)(0f)),
      1L -> (Array(1f, 5f, 2f) ++ Array.fill(Dim - 3)(1f)),
      2L -> (Array(0f, 5f, 0f) ++ Array.fill(Dim - 3)(0f))))
    val rows = Similarity.quantizeAudit(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // vec0 is the minimum of every non-constant dim -> every code 0
    assert(rows(0L) === ((Dim.toLong, 0L, 0L, 0L)))
    // vec1 is the max of every non-constant dim -> 255 on all but dim1
    assert(rows(1L) === ((Dim.toLong, 255L * (Dim - 1), 0L, 255L)))
    // vec2: only dim2 is nonzero-coded, at exactly mid-range
    assert(rows(2L) === ((Dim.toLong, 128L, 0L, 128L)))
  }

  test("embeddingDimStats: hand-computed per-dim moments") {
    // dim0: values 0 and 2 -> mean 1, std sqrt(2), lo 0, hi 2
    val d = toDf(Seq(
      0L -> (Array(0f) ++ Array.fill(Dim - 1)(1f)),
      1L -> (Array(2f) ++ Array.fill(Dim - 1)(1f))))
    val r = Similarity.embeddingDimStats(d).collect()
    assert(r.length === Dim)
    val d0 = r.head
    assert(d0.getAs[Int]("dim") === 0 && d0.getAs[Long]("n") === 2)
    assert(d0.getAs[Double]("mean") === 1.0)
    assert(d0.getAs[Double]("std") ===
      BigDecimal(math.sqrt(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(d0.getAs[Double]("lo") === 0.0 && d0.getAs[Double]("hi") === 2.0)
    // constant dims: std 0
    assert(r(1).getAs[Double]("std") === 0.0)
  }

  test("labelCentroidCos: tight labels score ~1, antipodal members score 0") {
    import org.apache.spark.sql.functions.{col, lit}
    // label 0: two identical vectors -> centroid == them -> avg_cos = 1
    // label 1: v and -v -> centroid = 0-vector -> cosines NULL -> avg NULL
    val v = Array.tabulate(Dim)(i => (0.1f * ((i % 7) + 1)))
    val neg = v.map(x => -x)
    val d = toDf(Seq(0L -> v, 1L -> v, 2L -> v, 3L -> neg))
      .withColumn("label", (col("vec_id") < 2L).cast("int"))
      .select(col("vec_id"), col("embedding"), (lit(1) - col("label")).as("label"))
    val r = Similarity.labelCentroidCos(d).collect()
      .map(x => x.getInt(0) -> x).toMap
    assert(r(0).getAs[Long]("n_vecs") === 2)
    assert(math.abs(r(0).getAs[Double]("avg_cos") - 1.0) < 1e-9)
    assert(r(1).getAs[Long]("n_vecs") === 2)
    assert(r(1).isNullAt(r(1).fieldIndex("avg_cos"))) // zero centroid -> NULL
  }

  test("autoRowsPerBand: ceil-log2 rule with the 8-bit floor, one bit per doubling") {
    assert(Similarity.autoRowsPerBand(0L) === 8)
    assert(Similarity.autoRowsPerBand(1L) === 8)
    assert(Similarity.autoRowsPerBand(256L) === 8)
    assert(Similarity.autoRowsPerBand(257L) === 9)
    assert(Similarity.autoRowsPerBand(500L) === 9) // the sf0.01 gate corpus
    assert(Similarity.autoRowsPerBand(512L) === 9)
    assert(Similarity.autoRowsPerBand(513L) === 10)
    assert(Similarity.autoRowsPerBand(1L << 30) === 30)
    assert(Similarity.autoRowsPerBand(2L << 30) === 31) // 2x data -> +1 bit
    // candidate budget stays ~bands*n: n^2/2^bits in [n/2, n]
    Seq(300L, 5000L, 1000000L).foreach { n =>
      val b = Similarity.autoRowsPerBand(n)
      val perBand = n.toDouble * n / math.pow(2, b)
      assert(perBand <= n && (b > 8 || n <= 256 || perBand >= n / 2.0),
        s"n=$n bits=$b expected-candidates-per-band=$perBand")
    }
  }

  /** Recursive (fileName → bytes) snapshot of a store directory tree,
    * keyed by path relative to the root — the "untouched partitions are
    * byte-identical" assertion needs content, not just names.
    */
  private def snapshotStore(root: String): Map[String, Seq[Byte]] = {
    val base = java.nio.file.Paths.get(root)
    scala.util.Using.resource(java.nio.file.Files.walk(base)) { w =>
      import scala.jdk.CollectionConverters._
      w.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .filterNot(_.getFileName.toString.startsWith(".")) // CRC sidecars churn
        .map(p => base.relativize(p).toString ->
          java.nio.file.Files.readAllBytes(p).toSeq)
        .toMap
    }
  }

  test("ivfStoreUpsert: untouched partitions byte-identical, moved id leaves no stale row, store == full rebuild") {
    val rnd = new scala.util.Random(7)
    val baseRows = (0 until 160).map(i => (i.toLong, baseVec(rnd)))
    val newRows = (160 until 200).map(i => (i.toLong, baseVec(rnd)))
    // re-embed id 0 with its negation: guaranteed to MOVE cells (argmax
    // dot flips sign order), exercising the stale-row cleanup
    val moved = (0L, baseRows.head._2.map(x => -x))
    val cents = Similarity.Centroids
    val path = java.nio.file.Files.createTempDirectory("spec_ivf_incr").toString
    Similarity.ivfStoreWrite(Similarity.ivfAssignmentsWith(toDf(baseRows), cents), path)
    val before = snapshotStore(path)
    val oldBucket = Similarity.ivfAssignmentsWith(toDf(Seq(baseRows.head)), cents)
      .collect().head.getAs[Int]("bucket")
    val newBucket = Similarity.ivfAssignmentsWith(toDf(Seq(moved)), cents)
      .collect().head.getAs[Int]("bucket")
    assert(oldBucket !== newBucket, "fixture must exercise a cell move")

    val batch = Similarity.ivfAssignmentsWith(toDf(newRows :+ moved), cents)
    val touched = Similarity.ivfStoreUpsert(spark, batch, path)
    assert(touched.contains(oldBucket),
      "the moved id's OLD home must be touched (stale-row cleanup)")
    assert(touched.contains(newBucket))
    val after = snapshotStore(path)

    // only touched bucket directories changed — byte-for-byte
    def bucketOf(rel: String): Option[Int] =
      "bucket=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
      .flatMap(bucketOf)
    assert(changed.subsetOf(touched.toSet),
      s"untouched buckets rewritten: ${changed.diff(touched.toSet)}")
    val untouchedFiles = before.keys.filter(k => bucketOf(k).exists(b => !touched.contains(b)))
    untouchedFiles.foreach(k => assert(after(k) == before(k), s"$k changed bytes"))

    // no stale row for the moved id, and the store equals a full rebuild
    val served = spark.read.parquet(path)
    assert(served.filter(org.apache.spark.sql.functions.col("vec_id") === 0L).count() === 1L)
    val fullPath = java.nio.file.Files.createTempDirectory("spec_ivf_full").toString
    val finalCorpus = (baseRows.tail :+ moved) ++ newRows
    Similarity.ivfStoreWrite(Similarity.ivfAssignmentsWith(toDf(finalCorpus), cents), fullPath)
    def dump(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getAs[Int]("bucket")))
      .sortBy(_._1)
    assert(dump(path).sameElements(dump(fullPath)))
  }

  test("storeDelete: erased ids gone, untouched buckets byte-identical, emptied bucket swept") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map(i => (i.toLong, baseVec(rnd)))
    val cents = Similarity.Centroids
    val path = java.nio.file.Files.createTempDirectory("spec_ivf_del").toString
    val assigned = Similarity.ivfAssignmentsWith(toDf(rows), cents)
    Similarity.ivfStoreWrite(assigned, path)
    val before = snapshotStore(path)

    // erase ONE bucket's entire population (the sweep case) plus two
    // ids from another bucket (the partial-rewrite case)
    val byBucket = assigned.select(col("vec_id"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("bucket")))
      .groupBy(_._2).map { case (b, xs) => b -> xs.map(_._1).sorted }
    val sweepBucket = byBucket.minBy { case (b, ids) => (ids.length, b) }._1
    val partialBucket = byBucket.keys.filter(_ != sweepBucket).min
    val delIds = byBucket(sweepBucket) ++ byBucket(partialBucket).take(2)
    assert(delIds.length < byBucket(partialBucket).length + byBucket(sweepBucket).length,
      "partial bucket must keep survivors")
    import spark.implicits._
    val touched = Similarity.storeDelete(spark, delIds.toSeq.toDF("vec_id"), path)
    assert(touched.sorted === Seq(sweepBucket, partialBucket).sorted)

    // emptied bucket's directory is swept — no ghost-serving dir
    assert(!new java.io.File(s"$path/bucket=$sweepBucket").exists,
      "emptied bucket directory must be deleted")
    // untouched buckets byte-identical
    val after = snapshotStore(path)
    def bucketOf(rel: String): Option[Int] =
      "bucket=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)
    before.keys.filter(k => bucketOf(k).exists(b => !touched.contains(b))).foreach { k =>
      assert(after.get(k).contains(before(k)), s"$k changed bytes")
    }
    // served content == full rebuild on the survivors
    val survivors = rows.filterNot { case (id, _) => delIds.contains(id) }
    val fullPath = java.nio.file.Files.createTempDirectory("spec_ivf_del_full").toString
    Similarity.ivfStoreWrite(Similarity.ivfAssignmentsWith(toDf(survivors), cents), fullPath)
    def dump(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getAs[Int]("bucket")))
      .sortBy(_._1)
    assert(dump(path).sameElements(dump(fullPath)))
    // deleting ids that are not in the store touches nothing
    assert(Similarity.storeDelete(spark, Seq(99999L).toDF("vec_id"), path).isEmpty)
  }

  test("ivfStoreCompact: repeated upserts bloat buckets, compaction collapses to 1 file, result-invisible") {
    val rnd = new scala.util.Random(13)
    val cents = Similarity.Centroids
    val path = java.nio.file.Files.createTempDirectory("spec_ivf_compact").toString
    val mk = (lo: Int, hi: Int) =>
      Similarity.ivfAssignmentsWith(toDf((lo until hi).map(i => (i.toLong, baseVec(rnd)))), cents)
    Similarity.ivfStoreWrite(mk(0, 100), path)
    // three daily batches: every touched bucket gains a file per upsert
    Similarity.ivfStoreUpsert(spark, mk(100, 140), path)
    Similarity.ivfStoreUpsert(spark, mk(140, 180), path)
    Similarity.ivfStoreUpsert(spark, mk(180, 220), path)
    def filesPerBucket: Map[String, Int] =
      new java.io.File(path).listFiles().filter(_.getName.startsWith("bucket=")).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    assert(filesPerBucket.values.max > 1, "fixture should be bloated before compaction")
    val before = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getAs[Int]("bucket"))).sortBy(_._1)
    val compacted = Similarity.ivfStoreCompact(spark, path)
    assert(compacted.nonEmpty)
    assert(filesPerBucket.values.max === 1, s"still bloated: $filesPerBucket")
    val after = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getAs[Int]("bucket"))).sortBy(_._1)
    assert(after.sameElements(before))
    // idempotent
    assert(Similarity.ivfStoreCompact(spark, path).isEmpty)
  }

  test("ivfDriftAudit: integer arithmetic consistent, retrain flag matches the documented margin") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(i => (i.toLong, baseVec(rnd)))
    val emb = toDf(rows)
    val stale = Similarity.kmeansSphericalTrace(
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 60), 8, 2)._1
    val fresh = Similarity.kmeansSphericalTrace(emb, 8, 2)._1
    val r = Similarity.ivfDriftAudit(
      Similarity.ivfTrainedAssignments(emb, stale),
      Similarity.ivfTrainedAssignments(emb, fresh),
      stale, fresh, emb, 10, 2).collect().head
    val nExact = r.getAs[Long]("n_exact")
    assert(nExact === Similarity.PanelQueries.toLong * 10)
    val rs = r.getAs[Long]("recall_stale_permille")
    val rf = r.getAs[Long]("recall_fresh_permille")
    assert(rs === r.getAs[Long]("n_overlap_stale") * 1000 / nExact)
    assert(rf === r.getAs[Long]("n_overlap_fresh") * 1000 / nExact)
    assert(rs >= 0 && rs <= 1000 && rf >= 0 && rf <= 1000)
    assert(r.getAs[Boolean]("retrain") ===
      (rs < rf - Similarity.DriftRetrainMarginPermille))
  }

  test("hardNegatives: every negative carries a different label than its anchor; ranks dense; sims non-increasing") {
    val emb = graft.sources.Tables.load(spark, SparkTestBase.Sf001, "embeddings")
    val labelById = emb.select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val rows = Similarity.hardNegatives(emb, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, _, n, _) =>
      assert(labelById(a) !== labelById(n), s"anchor $a and negative $n share a label")
      assert(n >= Similarity.DecontamEvalCap, s"negative $n mined from the pinned split")
    }
    rows.groupBy(_._1).foreach { case (a, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length), s"ranks not dense for anchor $a")
      val sims = sorted.map(_._4)
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y }, s"sims increase for anchor $a")
    }
  }
}
