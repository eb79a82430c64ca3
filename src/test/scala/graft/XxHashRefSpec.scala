package graft

import graft.functions.XxHash64Ref
import graft.operators.{Dedup, MinHashRef}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pure-Scala XXH64 oracle kernel must agree bit-for-bit with
  * Spark's `xxhash64` — otherwise the VALUES oracle for the production
  * dedup path certifies nothing.
  */
class XxHashRefSpec extends AnyFunSuite {
  import SparkTestBase._

  test("XxHash64Ref.sparkIntString == Spark xxhash64(int, string) across lengths 0..100 and unicode") {
    val rnd = new scala.util.Random(7)
    val strings =
      (0 to 100).map(n => rnd.alphanumeric.take(n).mkString) ++
        Seq("", " ", "a b c", "héllo wörld ünïcode", "日本語テキスト", "emoji 🙂 tail",
          "exactly32bytes_0123456789abcdef!", "33bytes_0123456789abcdefghijklmno")
    val cases = for (i <- Seq(0, 1, 7, 15); s <- strings) yield (i, s)
    import spark.implicits._
    val got = cases.toDF("i", "s")
      .select(col("i"), col("s"), xxhash64(col("i"), col("s")).as("h"))
      .collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
      .toMap
    cases.foreach { case (i, s) =>
      assert(
        got((i, s)) === XxHash64Ref.sparkIntString(i, s),
        s"mismatch for seed-int $i over ${s.take(40)} (len ${s.length})")
    }
  }

  test("XxHash64Ref.sparkIntLongs == Spark xxhash64(int, long*)") {
    val rnd = new scala.util.Random(11)
    val cases = (0 until 50).map { _ =>
      (rnd.nextInt(8), Seq.fill(4)(rnd.nextLong()))
    }
    import spark.implicits._
    val got = cases.map { case (b, ms) => (b, ms(0), ms(1), ms(2), ms(3)) }
      .toDF("b", "m0", "m1", "m2", "m3")
      .select(
        col("b"), col("m0"),
        xxhash64(col("b"), col("m0"), col("m1"), col("m2"), col("m3")).as("h"))
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .toMap
    cases.foreach { case (b, ms) =>
      assert(got((b, ms.head)) === XxHash64Ref.sparkIntLongs(b, ms))
    }
  }

  test("MinHashRef.lshPairs == Dedup.minhashLshPairs on the sf0.001 corpus") {
    val docsDf = Tables.load(spark, Sf0001, "documents")
    val expected = MinHashRef.lshPairs(
      docsDf.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq,
      3, 16, 4, 0.5)
    val got = Dedup.minhashLshPairs(docsDf, 3, 16, 4, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === expected)
    assert(expected.nonEmpty, "sf0.001 corpus should contain planted near-dups")
  }
}
