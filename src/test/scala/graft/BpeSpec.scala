package graft

import graft.operators.{Bpe, BpeRef}
import org.scalatest.funsuite.AnyFunSuite

/** The distributed BPE learner and the independent in-memory reference
  * must agree exactly — same merges, same order, same counts — since the
  * driver gate hash-compares the Spark output against BpeRef's VALUES.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand-checkable corpus: merge order and greedy within-round semantics") {
    // "low lower lowest low low": 'lo' appears in every word (freq 5),
    // wins round 1; the greedy fold must not let a merged symbol
    // re-merge within its round ("aaa" + (a,a) -> ["aa","a"])
    val d = docs(0L -> "low lower lowest low low", 1L -> "aaa aaa")
    val got = Bpe.learnMerges(d, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val want = BpeRef.merges(Seq("low lower lowest low low", "aaa aaa"), 3)
    assert(got.toSeq === want)
    // the forced-distributed path must agree with the adaptive driver
    // path (vocab here is far under the limit, so `got` took the
    // driver path)
    val dist = Bpe.learnMerges(d, rounds = 3, driverVocabLimit = 0L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(dist.toSeq === want)
    // round 1: (a,a) freq 4 — two non-overlapping merges per "aaa"
    // occurrence is wrong; greedy gives ONE "aa"+"a" per word, but the
    // PAIR COUNT before merging is what's recorded: "aaa" has 2 adjacent
    // (a,a) pairs x freq 2 = 4, vs (l,o) freq 5
    assert(got(0)._2 == "l" && got(0)._3 == "o" && got(0)._4 == 5L)
    assert(want.map(m => (m._2, m._3)).contains(("a", "a")))
  }

  test("distributed learner == reference on the sf0.01 corpus, all rounds") {
    val corpus = graft.sources.Tables.load(spark, Sf001, "documents")
    // force the distributed rounds (the adaptive path would take the
    // driver branch at this vocab size — the gate covers that one)
    val got = Bpe.learnMerges(corpus, driverVocabLimit = 0L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val texts = corpus.select("text").collect().map(_.getString(0)).toSeq
    val want = BpeRef.merges(texts, Bpe.Rounds)
    assert(got === want)
    assert(got.map(_._1) === (1L to got.length))
    // merge counts never increase across rounds on a fixed corpus? NOT
    // guaranteed in general (a merge can create a new frequent pair),
    // so assert only positivity and determinism here
    assert(got.forall(_._4 > 0L))
  }
}
