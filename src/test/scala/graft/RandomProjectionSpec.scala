package graft

import graft.operators.{RandomProjection, Similarity}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Johnson–Lindenstrauss random-projection certification beyond the
  * DuckDB gate: the matrix itself (shape, scale, determinism), the
  * Spark projection against a pure-Scala twin, the JL distortion bound
  * on SYNTHETIC pairs (the gate's projDistortion panel is fixed ids —
  * this one re-derives the bound on fresh geometry), the serving-path
  * invariants (shortlist containment, exact ordering), and the two
  * limits that must be exact: mult covering the corpus ⇒ rerank ==
  * exact scan, and the auto-width rule's floor/ceil arithmetic.
  */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Dim = Similarity.Dim
  private val K = RandomProjection.OutDim

  private def toDf(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v.toSeq) }, 4),
      schema)
  }

  private def randVec(rnd: scala.util.Random): Array[Float] =
    Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat)

  private def cosExact(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("Planes: OutDim x Dim, every entry is ±1/√OutDim, deterministic across re-derivation") {
    val scale = 1.0 / math.sqrt(K.toDouble)
    assert(RandomProjection.Planes.length == K)
    RandomProjection.Planes.foreach { row =>
      assert(row.length == Dim)
      row.foreach(x => assert(math.abs(math.abs(x) - scale) < 1e-15))
    }
    // re-derive row 3 from the documented md5 rule — the matrix is a
    // pure function of (j, i), never of JVM state
    val j = 3
    val again = Array.tabulate(Dim) { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$j:$i".getBytes("UTF-8"))
      (if ((d(0) & 1) == 0) 1.0 else -1.0) * scale
    }
    assert(RandomProjection.Planes(j).sameElements(again))
    // not degenerate: signs actually vary within a row and across rows
    assert(RandomProjection.Planes(j).distinct.length == 2)
    assert(!RandomProjection.Planes(0).sameElements(RandomProjection.Planes(1)))
  }

  test("Spark projection == pure-Scala projectQuery on the same vector") {
    val rnd = new scala.util.Random(11)
    val v = randVec(rnd)
    val df = RandomProjection.project(toDf(Seq((0L, v))), 10L)
    val row = df.collect().head
    val expect = RandomProjection.projectQuery(v.map(_.toDouble))
    (0 until K).foreach { j =>
      val got = row.getAs[Double](f"y$j%02d")
      assert(math.abs(got - math.rint(expect(j) * 1e6) / 1e6) < 1e-9,
        s"dim $j: $got vs ${expect(j)}")
    }
  }

  test("JL distortion on fresh synthetic pairs: mean |cos_sketch - cos| within theory bounds") {
    val rnd = new scala.util.Random(23)
    val pairs = (0 until 200).map { _ => (randVec(rnd), randVec(rnd)) }
    val errs = pairs.map { case (a, b) =>
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val pa = RandomProjection.projectQuery(ad)
      val pb = RandomProjection.projectQuery(bd)
      math.abs(cosExact(pa, pb) - cosExact(ad, bd))
    }
    val mean = errs.sum / errs.length
    // theory: mean |err| ≈ √(2/(πk)) ≈ 0.2 at k=16; the gate bounds
    // (0.25 mean / 0.75 max) must hold on fresh geometry too
    assert(mean <= RandomProjection.MeanAbsErrBound, s"mean=$mean")
    assert(errs.max <= RandomProjection.MaxAbsErrBound, s"max=${errs.max}")
    // and the sketch is not vacuously accurate — a 16-d sketch of 64-d
    // geometry must show REAL distortion (a zero mean would mean the
    // test compares the sketch to itself)
    assert(mean >= 0.05, s"suspiciously small mean=$mean")
  }

  test("rerank serving path: results ⊆ sketch shortlist, ordered by exact cosine, ids distinct") {
    val rnd = new scala.util.Random(37)
    val corpus = (0L until 400L).map(id => (id, randVec(rnd)))
    val df = toDf(corpus)
    val k = 10
    val out = RandomProjection.projTopKRerankFor(df, k, Similarity.QueryVec, 4).collect()
    assert(out.length == k)
    val sims = out.map(_.getAs[Double]("sim"))
    assert(sims.sameElements(sims.sortBy(-_)), "sims must be non-increasing")
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == k)
    // shortlist containment: every served id is inside the sketch top k*mult
    val qp = RandomProjection.projectQuery(Similarity.QueryVec)
    val short = corpus.map { case (id, v) =>
      (id, cosExact(RandomProjection.projectQuery(v.map(_.toDouble)), qp))
    }.sortBy { case (id, s) => (-s, id) }.take(k * 4).map(_._1).toSet
    out.foreach(r => assert(short.contains(r.getAs[Long]("vec_id"))))
  }

  test("mult covering the corpus ⇒ rerank == exact brute-force top-k") {
    val rnd = new scala.util.Random(41)
    val corpus = (0L until 120L).map(id => (id, randVec(rnd)))
    val df = toDf(corpus)
    val k = 8
    val exact = Similarity.topKFor(df, k, Similarity.QueryVec)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    val rerank = RandomProjection
      .projTopKRerankFor(df, k, Similarity.QueryVec, corpus.size) // k*mult ≥ n
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    assert(rerank == exact)
  }

  test("projRecall self-consistency: mult ≥ corpus ⇒ rerank recall is exactly 1000‰") {
    val rnd = new scala.util.Random(53)
    val corpus = (0L until 150L).map(id => (id, randVec(rnd)))
    val df = toDf(corpus)
    val row = RandomProjection.projRecall(df, 5, corpus.size).collect().head
    assert(row.getAs[Long]("recall_rerank_permille") == 1000L)
    assert(row.getAs[Long]("n_exact") == 5L * Similarity.PanelQueries)
    val sk = row.getAs[Long]("recall_sketch_permille")
    assert(sk >= 0L && sk <= 1000L)
  }

  test("autoRerankMult: 16% ceil rule with the fixed-mult floor") {
    val f = RandomProjection.RerankShortlistMult.toLong
    // small corpora sit on the floor
    assert(RandomProjection.autoRerankMult(500L, 20) == f)
    assert(RandomProjection.autoRerankMult(0L, 20) == f)
    // 16% of n / k, ceil: n=5000,k=20 → 800/20 = 40
    assert(RandomProjection.autoRerankMult(5000L, 20) == 40)
    // ceil bites: n=5001 → ceil(800.16/20) = 41
    assert(RandomProjection.autoRerankMult(5001L, 20) == 41)
    // monotone in n
    val ms = Seq(1000L, 10000L, 100000L, 1000000L)
      .map(RandomProjection.autoRerankMult(_, 20))
    assert(ms == ms.sorted)
  }

  test("projDistortion gate shape: certified on the synthetic gate corpus, bounds carried in-row") {
    val rnd = new scala.util.Random(67)
    val corpus = (0L until 300L).map(id => (id, randVec(rnd)))
    val row = RandomProjection.projDistortion(toDf(corpus)).collect().head
    assert(row.getAs[Long]("n_pairs") == 64L)
    assert(row.getAs[Boolean]("certified"))
    assert(row.getAs[Double]("mean_abs_err") > 0.0)
  }
}
