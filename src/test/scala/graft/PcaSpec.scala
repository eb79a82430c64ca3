package graft

import graft.operators.{Pca, PcaRef, Similarity}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** PCA certification beyond the DuckDB gates: the two independent
  * eigensolvers against ANALYTIC spectra (the gates only compare them
  * to each other), the equal-diagonal rotation edge case, distributed
  * vs sequential moments, eigenVECTOR parity with an explicit tolerance
  * on an anisotropic corpus (the gate deliberately never pins vector
  * coordinates — see Pca scaladoc), and driver brute-force equality of
  * the reconstruction certificate.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Dim = Similarity.Dim

  private def toDf(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v.toSeq) }, 4),
      schema)
  }

  /** Anisotropic corpus: dimension i scaled by (1 + i/4) so eigen-gaps
    * are LARGE and eigenvectors are numerically stable — the fixture
    * where vector-level assertions are legitimate.
    */
  private def anisoCorpus(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { id =>
      (id, Array.tabulate(Dim)(i =>
        ((rnd.nextDouble() * 2 - 1) * (1.0 + (Dim - 1 - i) / 4.0)).toFloat))
    }
  }

  test("both eigensolvers recover an analytic spectrum (diagonal matrix, shuffled)") {
    val d = 8
    val diag = Array(9.0, 1.0, 4.0, 16.0, 0.25, 2.0, 7.0, 0.5)
    val m = Array.tabulate(d, d)((i, j) => if (i == j) diag(i) else 0.0)
    val want = diag.sorted.reverse
    val (e1, _) = Pca.eigenSym(m)
    val (e2, _) = PcaRef.jacobiEigen(m)
    want.indices.foreach { i =>
      assert(math.abs(e1(i) - want(i)) < 1e-12, s"prod solver comp $i")
      assert(math.abs(e2(i) - want(i)) < 1e-12, s"ref solver comp $i")
    }
  }

  test("equal-diagonal 2x2 [[2,1],[1,2]]: both solvers rotate the full 45° (eigenvalues 3, 1)") {
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (e1, v1) = Pca.eigenSym(m.map(_.clone()))
    val (e2, v2) = PcaRef.jacobiEigen(m.map(_.clone()))
    Seq((e1, v1), (e2, v2)).foreach { case (e, v) =>
      assert(math.abs(e(0) - 3.0) < 1e-12 && math.abs(e(1) - 1.0) < 1e-12)
      // eigenvector of 3 is (1,1)/√2, canonical sign positive
      assert(math.abs(v(0)(0) - math.sqrt(0.5)) < 1e-12)
      assert(math.abs(v(0)(1) - math.sqrt(0.5)) < 1e-12)
    }
  }

  test("solvers agree with each other at 1e-10 on a dense random symmetric matrix") {
    val rnd = new scala.util.Random(3)
    val d = 16
    val m = Array.tabulate(d, d)((_, _) => rnd.nextDouble() * 2 - 1)
    val sym = Array.tabulate(d, d)((i, j) => (m(i)(j) + m(j)(i)) / 2)
    val (e1, _) = Pca.eigenSym(sym.map(_.clone()))
    val (e2, _) = PcaRef.jacobiEigen(sym.map(_.clone()))
    // trace preserved
    assert(math.abs(e1.sum - (0 until d).map(i => sym(i)(i)).sum) < 1e-10)
    e1.indices.foreach(i => assert(math.abs(e1(i) - e2(i)) < 1e-10, s"comp $i"))
  }

  test("distributed moments == sequential ref moments at 1e-10") {
    val corpus = anisoCorpus(300, 17)
    val (n1, mean1, cov1) = Pca.momentsDistributed(toDf(corpus))
    val (n2, mean2, cov2) = PcaRef.meanCov(corpus.map(_._2))
    assert(n1 == n2)
    (0 until Dim).foreach { i =>
      assert(math.abs(mean1(i) - mean2(i)) < 1e-10)
      (0 until Dim).foreach(j => assert(math.abs(cov1(i)(j) - cov2(i)(j)) < 1e-10))
    }
  }

  test("eigenvector parity prod-vs-ref on an anisotropic corpus: |cos| > 0.9999 for the top 8") {
    val corpus = anisoCorpus(400, 29)
    val prod = Pca.train(toDf(corpus))
    val (_, _, refEig, refVecs) = PcaRef.train(corpus.map(_._2))
    (0 until 8).foreach { c =>
      assert(math.abs(prod.eig(c) - refEig(c)) < 1e-8, s"eigenvalue $c")
      val dot = (0 until Dim).foldLeft(0.0)((a, i) => a + prod.vecs(c)(i) * refVecs(c)(i))
      // canonical signs must AGREE (dot positive), not just |dot|
      assert(dot > 0.9999, s"component $c basis parity, dot=$dot")
    }
  }

  test("reconstruction certificate: certified, and equals driver brute-force residual") {
    val corpus = anisoCorpus(250, 43)
    val df = toDf(corpus)
    val model = Pca.train(df)
    val row = Pca.pcaReconstruction(df, model).collect().head
    assert(row.getAs[Boolean]("certified"))
    assert(row.getAs[Long]("n_vectors") == 250L)
    // brute force: project each vector on the top-8 basis, measure residual
    val d = Pca.ReconD
    val mr = corpus.map { case (_, vf) =>
      val x = vf.map(_.toDouble)
      val cx = x.indices.map(i => x(i) - model.mean(i)).toArray
      val zs = (0 until d).map(j =>
        cx.indices.foldLeft(0.0)((a, i) => a + cx(i) * model.vecs(j)(i)))
      cx.map(v => v * v).sum - zs.map(z => z * z).sum
    }.sum / corpus.size
    assert(math.abs(row.getAs[Double]("mean_residual_sq") - mr) < 1e-5)
  }

  test("whitening audit: all 36 rows round to exact identity entries") {
    val corpus = anisoCorpus(220, 61)
    val df = toDf(corpus)
    val model = Pca.train(df)
    val rows = Pca.pcaWhiten(df, model).collect()
    assert(rows.length == 36)
    rows.foreach { r =>
      val expect = if (r.getAs[Int]("i") == r.getAs[Int]("j")) 1.0 else 0.0
      assert(r.getAs[Double]("cov_w") == expect,
        s"(${r.getAs[Int]("i")},${r.getAs[Int]("j")}) -> ${r.getAs[Double]("cov_w")}")
    }
  }

  test("variance table: eigenvalues descending and non-negative, permilles monotone to 1000") {
    val corpus = anisoCorpus(200, 71)
    val model = Pca.train(toDf(corpus))
    val rows = Pca.pcaVariance(spark, model).collect()
    assert(rows.length == Dim)
    val eig = rows.map(_.getAs[Double]("eigenvalue"))
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b })
    assert(eig.last >= 0.0)
    val cum = rows.map(_.getAs[Long]("cum_permille"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last == 1000L)
  }
}
