package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LLM-pipeline operators not fully covered by the DuckDB oracle:
  * the xxhash64 MinHash-LSH production path (vs the exact shingle-join
  * pairs), IVF/LSH similarity behavior, multimodal plumbing.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val docs = Tables.load(spark, Sf001, "documents").cache()
  private lazy val emb = Tables.load(spark, Sf001, "embeddings").cache()

  test("minhash-LSH pairs (xxhash64 prod path): subset of exact pairs, recall ≥ 0.6 at J≥0.8") {
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 3, 16, 4, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH verify step must make every reported pair a true pair")
    val strong = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (strong.nonEmpty) {
      val recall = strong.count(lsh.contains).toDouble / strong.size
      assert(recall >= 0.6, s"recall $recall over ${strong.size} strong pairs")
    }
  }

  test("prefix-filtered Jaccard pairs == unfiltered (PPJoin filter is exact)") {
    val basic = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val prefixed = Dedup.ngramJaccardPairsPrefix(docs, 3, 0.8)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(prefixed.sameElements(basic))
    // and at a looser threshold, where prefixes are longer
    val b2 = Dedup.ngramJaccardPairs(docs, 3, 0.3).count()
    val p2 = Dedup.ngramJaccardPairsPrefix(docs, 3, 0.3).count()
    assert(b2 === p2)
  }

  test("duplicate clustering: transitive chains collapse to the minimal id") {
    import spark.implicits._
    // chain 5-3, 3-9 and isolated pair 20-30: {3,5,9}→3, {20,30}→20
    val pairs = Seq((5L, 3L), (3L, 9L), (30L, 20L)).toDF("a_id", "b_id")
    val got = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("exact dedup is idempotent and keeps minimal ids") {
    val d1 = Dedup.exact(docs)
    assert(d1.count() === docs.select(md5(col("text"))).distinct().count())
    val kept = d1.collect().map(_.getLong(0)).toSet
    assert(docs.select(min(col("doc_id"))).head.getLong(0) === kept.min)
  }

  test("simhash: near-identical docs (J≥0.8) agree on most bits") {
    val sh = Dedup.simhash16(docs).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val strong = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    if (strong.nonEmpty) {
      val dists = strong.map { case (a, b) => Integer.bitCount(sh(a) ^ sh(b)) }
      assert(dists.sum.toDouble / dists.length <= 4.0,
        s"mean hamming ${dists.sum.toDouble / dists.length} over ${dists.length} near-dup pairs")
    }
  }

  test("similarity topK: k rows, sims in [-1,1], descending") {
    val rows = Similarity.topK(emb, 10).collect()
    assert(rows.length === 10)
    val sims = rows.map(_.getDouble(1))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("IVF: buckets partition the corpus; in-bucket search is a subset of brute-force ranking") {
    val buckets = Similarity.ivfBuckets(emb)
    assert(buckets.count() === emb.count())
    assert(buckets.select("bucket").distinct().count() > 1)
    val ivf = Similarity.ivfTopK(emb, 5).collect().map(_.getLong(0)).toSet
    val brute = Similarity.topK(emb, 50).collect().map(_.getLong(0)).toSet
    assert(ivf.forall(brute.contains), "IVF results must rank high globally")
  }

  test("token stats: n_tokens > 0 and avg token length sane") {
    val s = TextAnalysis.stats(docs)
    assert(s.filter(col("n_tokens") <= 0).count() === 0)
    assert(s.filter(col("avg_tok_len") <= 0 || col("avg_tok_len") > 30).count() === 0)
  }

  test("multimodal plumbing: schema, deterministic stub meta, bounded frame sample") {
    val a = Multimodal.assets(docs.limit(20))
    val m = Multimodal.decodeMeta(a)
    assert(m.schema("meta").dataType.typeName === "struct")
    val r = m.select(col("meta.n_bytes"), col("meta.fmt")).collect()
    assert(r.forall(_.getLong(0) > 0))
    assert(r.forall(_.getString(1) === "text/raw"))
    // deterministic: same input → same digest
    val d1 = m.select("digest").collect().map(_.getString(0))
    val d2 = Multimodal.decodeMeta(a).select("digest").collect().map(_.getString(0))
    assert(d1.sameElements(d2))
    val f = Multimodal.frameSample(a, stride = 16, maxFrames = 8)
    val sizes = f.select(size(col("frames"))).collect().map(_.getInt(0))
    assert(sizes.forall(s => s >= 1 && s <= 8))
    // resize composes: payload stays binary, shrinks by ~factor, decode still works
    val resized = Multimodal.decodeMeta(Multimodal.resize(a, 4))
    val pair = resized.select(col("meta.n_bytes")).collect().map(_.getLong(0))
      .zip(m.select(col("meta.n_bytes")).collect().map(_.getLong(0)))
    assert(pair.forall { case (r, o) => r <= o / 4 + 1 && r >= 1 })
  }
}
