package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** BM25 and reciprocal-rank fusion checked against independent in-test
  * arithmetic on hand-sized fixtures (the driver gate then replays both
  * against DuckDB at sf0.01): exact scores on a 3-doc corpus, fusion
  * recomputed from brute-force cosine ranks in plain Scala, and the
  * broadcast shape of the panel joins.
  */
class RetrievalSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // plain-Scala BM25 for the fixture: same formula, same constants;
  // termsOverride restricts the scored query terms WITHOUT touching the
  // corpus statistics (for the informative-half test)
  private def bm25Ref(
      corpus: Seq[(Long, String)],
      qid: Long,
      termsOverride: Option[Seq[String]] = None): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = corpus.size.toDouble
    val avgLen = toks.values.map(_.size).sum / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val qTerms = termsOverride.getOrElse(toks(qid).take(Retrieval.QueryTermCount).distinct)
    corpus.flatMap { case (id, _) =>
      val tf = toks(id).groupBy(identity).map { case (t, xs) => t -> xs.size }
      val score = qTerms.collect {
        case t if tf.contains(t) =>
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val norm = tf(t) * (Retrieval.Bm25K1 + 1.0) /
            (tf(t) + Retrieval.Bm25K1 *
              (1.0 - Retrieval.Bm25B + Retrieval.Bm25B * toks(id).size / avgLen))
          idf * norm
      }.sum
      if (score > 0) Some(id -> score) else None
    }.toMap
  }

  test("bm25TopK matches the in-test reference exactly on a 3-doc corpus") {
    val corpus = Seq(
      0L -> "apple banana apple",
      1L -> "banana cherry",
      2L -> "apple cherry cherry date")
    val got = Retrieval.bm25TopK(docs(corpus: _*)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // every query doc is in the panel (ids < PanelQueries); per query the
    // candidates are exactly the docs sharing >=1 query term, ranked by
    // the reference score
    for (q <- corpus.map(_._1)) {
      val want = bm25Ref(corpus, q).toSeq
        .sortBy { case (id, s) => (-s, id) }
        .map { case (id, s) => (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      val have = got.filter(_._1 == q).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(have === want, s"query $q")
    }
    // ranks are 1..n and scores non-increasing within each query
    got.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to rs.length))
      assert(sorted.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("hybridRrf fuses exactly the reciprocal ranks of both legs") {
    val corpus = Seq(
      0L -> "alpha beta gamma",
      1L -> "alpha delta",
      2L -> "beta beta epsilon",
      3L -> "gamma delta epsilon zeta")
    import spark.implicits._
    // deterministic 64-dim embeddings, ids matching the doc ids
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (((i * 31 + seed * 17) % 23) - 11).toFloat / 7f)
    val embRows = (0L to 3L).map(i => (i, vec(i.toInt), s"l${i % 2}"))
    val emb = embRows.toDF("vec_id", "embedding", "label")

    val fused = Retrieval.hybridRrf(docs(corpus: _*), emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // independent fusion: lexical ranks from the reference scorer,
    // semantic ranks from plain-Scala cosine, RRF recomputed directly
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i)).sum
      val na = math.sqrt(a.indices.map(i => a(i).toDouble * a(i)).sum)
      val nb = math.sqrt(b.indices.map(i => b(i).toDouble * b(i)).sum)
      dot / (na * nb)
    }
    for (q <- corpus.map(_._1)) {
      val lexRanks = bm25Ref(corpus, q).toSeq
        .sortBy { case (id, s) => (-s, id) }
        .take(Retrieval.RetrievalTopK).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
      val qv = embRows(q.toInt)._2
      val semRanks = embRows.map { case (id, v, _) => id -> cos(qv, v) }
        .sortBy { case (id, s) => (-s, id) }
        .take(Retrieval.RetrievalTopK).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
      val want = (lexRanks.keySet ++ semRanks.keySet).toSeq
        .map { id =>
          val r = lexRanks.get(id).map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0) +
            semRanks.get(id).map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0)
          id -> r
        }
        .sortBy { case (id, s) => (-s, id) }
        .take(Retrieval.RetrievalTopK)
        .map { case (id, s) => (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      val have = fused.filter(_._1 == q).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(have === want, s"query $q")
    }
    // a doc on BOTH legs' lists outranks single-leg docs at similar
    // positions: the fused top score is bounded by 2/(RrfK+1)
    // 5e-7 slack: the column is rounded to 6dp, the bound is exact
    assert(fused.map(_._4).max <= 2.0 / (Retrieval.RrfK + 1) + 5e-7)
  }

  test("IVF hybrid: semantic leg is brute force restricted to each query's probed cells") {
    import graft.operators.Similarity
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val e = graft.sources.Tables.load(spark, Sf0001, "embeddings")
    val fused = Retrieval.hybridRrfIvf(d, e).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // independent recompute in plain Scala: centroid dots, bucketCase
    // tie semantics (lowest index wins), per-query probed cells, cosine
    // ranks inside them, BM25 ranks from the reference scorer, fusion
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def dot(a: Array[Double], b: Array[Double]) = a.indices.map(i => a(i) * b(i)).sum
    def cosv(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = Similarity.Centroids
    def bucketOf(v: Array[Double]): Int = {
      val dots = cents.map(c => dot(v, c))
      dots.indices.find(j => dots.indices.forall(o => dots(j) >= dots(o))).get
    }
    val assignment = vecs.map { case (id, v) => id -> bucketOf(v) }.toMap
    val corpus = d.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    for (q <- 0L until Retrieval.PanelQueries.toLong) {
      val qv = vecs.find(_._1 == q).get._2
      val qDots = cents.map(c => dot(qv, c))
      val probed = qDots.indices.sortBy(j => (-qDots(j), j)).take(Retrieval.HybridNprobe).toSet
      val semRanks = vecs
        .filter { case (id, _) => probed(assignment(id)) }
        .map { case (id, v) => id -> cosv(qv, v) }
        .sortBy { case (id, s) => (-s, id) }
        .take(Retrieval.RetrievalTopK).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
      val lexRanks = bm25Ref(corpus, q).toSeq
        .sortBy { case (id, s) => (-s, id) }
        .take(Retrieval.RetrievalTopK).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
      val want = (lexRanks.keySet ++ semRanks.keySet).toSeq
        .map { id =>
          val r = lexRanks.get(id).map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0) +
            semRanks.get(id).map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0)
          id -> r
        }
        .sortBy { case (id, s) => (-s, id) }
        .take(Retrieval.RetrievalTopK)
        .map { case (id, s) => (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      val have = fused.filter(_._1 == q).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(have === want, s"query $q (probed cells ${probed.toSeq.sorted})")
    }
  }

  test("stored index is result-invisible and prunes to the panel terms' shards") {
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val path = java.nio.file.Files.createTempDirectory("bm25_index_spec").toString
    val statsPath = java.nio.file.Files.createTempDirectory("bm25_stats_spec").toString
    Retrieval.bm25IndexWrite(d, path, statsPath)
    val stored = Retrieval.bm25StoredTopK(spark, d, path, statsPath)
    val rows = stored.collect() // execute so scan metrics populate
    assert(rows.toSeq === Retrieval.bm25TopK(d).collect().toSeq)
    // the executed postings scan reads EXACTLY the files under the
    // panel terms' bucket directories
    // under AQE the postings scan lives inside a materialized query
    // stage (a leaf to TreeNode.collect) — descend explicitly
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
      .find(_.relation.location.rootPaths.exists(_.toString.contains("bm25_index_spec")))
      .getOrElse(fail("postings scan not found in executed plan"))
    val panelBuckets = d
      .filter(org.apache.spark.sql.functions.col("doc_id") < Retrieval.PanelQueries)
      .collect()
      .flatMap(_.getString(1).split("\\s+").filter(_.nonEmpty).take(Retrieval.QueryTermCount))
      .map(Retrieval.bucketOf).toSet
    def filesUnder(buckets: Iterable[Int]): Int = buckets.toSeq.map { b =>
      val dir = new java.io.File(s"$path/bucket=$b")
      Option(dir.listFiles).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    }.sum
    val filesInPanel = filesUnder(panelBuckets)
    val filesTotal = filesUnder(0 until Retrieval.PostingsBuckets)
    val numFiles = scan.metrics("numFiles").value
    info(s"scan read $numFiles of $filesTotal files ($filesInPanel in panel shards)")
    assert(scan.partitionFilters.nonEmpty, "bucket IN-list did not reach PartitionFilters")
    assert(numFiles === filesInPanel.toLong, "scan did not prune to the panel shards")
    assert(numFiles < filesTotal.toLong, "nothing was pruned — all shards were read")
  }

  test("incremental upsert == full rebuild over the modified corpus; untouched shards byte-identical") {
    import org.apache.spark.sql.functions.{col, upper, when}
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val modDocs = d.withColumn(
      "text", when(col("doc_id") === 0, upper(col("text"))).otherwise(col("text")))
    val path = java.nio.file.Files.createTempDirectory("bm25_inc_spec").toString
    val statsPath = java.nio.file.Files.createTempDirectory("bm25_inc_stats_spec").toString
    Retrieval.bm25IndexWrite(d.filter(col("doc_id") % 5 =!= 4), path, statsPath)

    def dirDigests(bucket: Int): Map[String, Long] = {
      val dir = new java.io.File(s"$path/bucket=$bucket")
      Option(dir.listFiles).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          f.getName -> java.util.Arrays.hashCode(bytes).toLong
        }.toMap
    }
    val before = (0 until Retrieval.PostingsBuckets).map(b => b -> dirDigests(b)).toMap

    val batch = modDocs.filter(col("doc_id") % 5 === 4 || col("doc_id") === 0)
    val touched = Retrieval.bm25IndexUpsert(spark, batch, path, statsPath)
    assert(touched.nonEmpty)
    // untouched bucket directories are byte-identical
    (0 until Retrieval.PostingsBuckets).filterNot(touched.contains).foreach { b =>
      assert(dirDigests(b) === before(b), s"untouched bucket $b changed")
    }
    // a re-texted doc's OLD postings are gone: doc 0's lowercase tokens
    // must not appear under doc_id 0 anywhere in the store
    val store = spark.read.parquet(path)
    val doc0Tokens = store.filter(col("doc_id") === 0)
      .select(col("token")).collect().map(_.getString(0))
    assert(doc0Tokens.nonEmpty && doc0Tokens.forall(t => t == t.toUpperCase),
      s"stale lowercase postings for doc 0: ${doc0Tokens.filterNot(t => t == t.toUpperCase).take(5).toSeq}")
    // merged store answers exactly like a fresh full-corpus rebuild
    // (and like the in-flight path over the modified corpus)
    val freshPath = java.nio.file.Files.createTempDirectory("bm25_inc_fresh").toString
    val freshStats = java.nio.file.Files.createTempDirectory("bm25_inc_fresh_stats").toString
    Retrieval.bm25IndexWrite(modDocs, freshPath, freshStats)
    val merged = Retrieval.bm25StoredTopK(spark, modDocs, path, statsPath).collect().toSeq
    assert(merged === Retrieval.bm25StoredTopK(spark, modDocs, freshPath, freshStats).collect().toSeq)
    assert(merged === Retrieval.bm25TopK(modDocs).collect().toSeq)
    // the stats delta is exact: incremental stats == rebuilt stats
    val incStats = spark.read.parquet(statsPath).collect()(0)
    val refStats = spark.read.parquet(freshStats).collect()(0)
    assert(incStats.getLong(0) === refStats.getLong(0))
    assert(incStats.getLong(1) === refStats.getLong(1))
    assert(incStats.getDouble(2) === refStats.getDouble(2))
  }

  test("bm25IndexDelete: deletion == rebuild on the filtered corpus; untouched shards byte-identical; stats shrink exactly") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val path = java.nio.file.Files.createTempDirectory("bm25_del_spec").toString
    val statsPath = java.nio.file.Files.createTempDirectory("bm25_del_stats_spec").toString
    Retrieval.bm25IndexWrite(d, path, statsPath)

    def dirDigests(bucket: Int): Map[String, Long] = {
      val dir = new java.io.File(s"$path/bucket=$bucket")
      Option(dir.listFiles).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          f.getName -> java.util.Arrays.hashCode(bytes).toLong
        }.toMap
    }
    val before = (0 until Retrieval.PostingsBuckets).map(b => b -> dirDigests(b)).toMap

    val erased = pmod(col("doc_id"), lit(9L)) === 4
    val touched =
      Retrieval.bm25IndexDelete(spark, d.filter(erased).select(col("doc_id")), path, statsPath)
    assert(touched.nonEmpty)
    (0 until Retrieval.PostingsBuckets).filterNot(touched.contains).foreach { b =>
      assert(dirDigests(b) === before(b), s"untouched bucket $b changed")
    }
    // no ghost postings: erased doc ids appear nowhere in the store
    val store = spark.read.parquet(path)
    assert(store.filter(pmod(col("doc_id"), lit(9L)) === 4).count() === 0L)
    // post-deletion store answers exactly like a rebuild on the
    // filtered corpus (and like the in-flight path over it)
    val keep = d.filter(!erased)
    val freshPath = java.nio.file.Files.createTempDirectory("bm25_del_fresh").toString
    val freshStats = java.nio.file.Files.createTempDirectory("bm25_del_fresh_stats").toString
    Retrieval.bm25IndexWrite(keep, freshPath, freshStats)
    val got = Retrieval.bm25StoredTopK(spark, keep, path, statsPath).collect().toSeq
    assert(got === Retrieval.bm25StoredTopK(spark, keep, freshPath, freshStats).collect().toSeq)
    assert(got === Retrieval.bm25TopK(keep).collect().toSeq)
    // the stats shrink is exact
    val delStats = spark.read.parquet(statsPath).collect()(0)
    val refStats = spark.read.parquet(freshStats).collect()(0)
    assert(delStats.getLong(0) === refStats.getLong(0))
    assert(delStats.getLong(1) === refStats.getLong(1))
    assert(delStats.getDouble(2) === refStats.getDouble(2))
  }

  test("crash window covers the stats file: heal rebuilds stats from the store (VERDICT r13 #2)") {
    import org.apache.spark.sql.functions.col
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val path = java.nio.file.Files.createTempDirectory("bm25_heal_spec").toString
    val statsPath = java.nio.file.Files.createTempDirectory("bm25_heal_stats_spec").toString
    Retrieval.bm25IndexWrite(d.filter(col("doc_id") % 5 =!= 4), path, statsPath)
    // versioned, so the healing upsert's generation handling is under
    // test too (ADVICE r14: the heal path must NOT archive the live
    // stats file — it is exactly the garbage the crashed run left)
    graft.operators.StoreGenerations.enable(spark, path)

    // reconstruct the on-disk state of a maintenance call that crashed
    // AFTER its stats write but BEFORE its store swap: stats rolled
    // forward to garbage, pending marker still planted
    import spark.implicits._
    Seq((999999L, 999999L, 1.0)).toDF("n_docs", "sum_len", "avg_len")
      .write.mode("overwrite").parquet(statsPath)
    assert(
      graft.operators.StoreManifest.beginMaintenance(spark, path) === false,
      "fixture marker plant")

    // the next completed maintenance call heals: stats are rebuilt from
    // the store's post-swap content, NOT delta-patched on the garbage
    Retrieval.bm25IndexUpsert(spark, d.filter(col("doc_id") % 5 === 4), path, statsPath)
    val marker = new org.apache.hadoop.fs.Path(
      graft.operators.StoreManifest.pendingPath(path))
    assert(
      !marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker),
      "marker not cleared after the healing upsert")
    val freshPath = java.nio.file.Files.createTempDirectory("bm25_heal_fresh").toString
    val freshStats = java.nio.file.Files.createTempDirectory("bm25_heal_fresh_stats").toString
    Retrieval.bm25IndexWrite(d, freshPath, freshStats)
    val healed = spark.read.parquet(statsPath).collect()(0)
    val ref = spark.read.parquet(freshStats).collect()(0)
    assert(healed.getLong(0) === ref.getLong(0), "healed n_docs wrong")
    assert(healed.getLong(1) === ref.getLong(1), "healed sum_len wrong")
    assert(healed.getDouble(2) === ref.getDouble(2), "healed avg_len wrong")
    assert(
      Retrieval.bm25StoredTopK(spark, d, path, statsPath).collect().toSeq ===
        Retrieval.bm25StoredTopK(spark, d, freshPath, freshStats).collect().toSeq)
    // the healing call committed generation 0 but must NOT have
    // attached a stats sidecar (the live stats were the crashed run's
    // garbage): the snapshot read REFUSES rather than silently scoring
    // with wrong n_docs/avg_len (ADVICE r14)
    assert(graft.operators.StoreGenerations.currentGen(spark, path) === 1)
    val refusal = intercept[IllegalArgumentException] {
      graft.operators.StoreGenerations.sidecarAsOf(spark, path, statsPath, "stats", 0)
    }
    assert(refusal.getMessage.contains("no 'stats' sidecar"), refusal.getMessage)
  }

  test("streaming maintenance: 4 micro-batches bootstrap+upsert == batch index") {
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val srcDir = java.nio.file.Files.createTempDirectory("bm25_stream_src").toString
    d.repartition(4) // 4 files -> 4 micro-batches at maxFilesPerTrigger=1
      .write.parquet(s"$srcDir/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("bm25_stream_store").toString
    graft.streaming.StreamingViews.runBm25StoreAvailableNow(
      spark, srcDir, s"$base/store", s"$base/stats", Some(1))
    // the stream-built store answers exactly like the in-flight batch
    // path over the full corpus (first batch bootstrapped, later three
    // exercised the incremental df + stats delta in-stream)
    val got = Retrieval.bm25StoredTopK(spark, d, s"$base/store", s"$base/stats").collect().toSeq
    assert(got === Retrieval.bm25TopK(d).collect().toSeq)
  }

  test("shard compaction bounds files per bucket and is result-invisible") {
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val srcDir = java.nio.file.Files.createTempDirectory("bm25_compact_src").toString
    d.repartition(4).write.parquet(s"$srcDir/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("bm25_compact_store").toString
    // force the multi-file-bucket hazard the compactor exists for. The
    // store writes now route one-task-per-bucket with an explicit
    // partition count (StoreManifest.routeToBuckets), so every write
    // job leaves exactly one file per touched bucket regardless of AQE
    // settings — the old coalescing-off trick can no longer fan a
    // bucket across tasks. Instead, split each writer's output into
    // many small files directly (maxRecordsPerFile), which is the
    // production hazard's actual on-disk shape: many small files
    // accumulated per bucket directory, identical row content.
    val mrKey = "spark.sql.files.maxRecordsPerFile"
    val prev = spark.conf.getOption(mrKey)
    spark.conf.set(mrKey, "50")
    try
      graft.streaming.StreamingViews.runBm25StoreAvailableNow(
        spark, srcDir, s"$base/store", s"$base/stats", Some(1))
    finally prev match {
      case Some(v) => spark.conf.set(mrKey, v)
      case None    => spark.conf.unset(mrKey)
    }
    def maxFiles: Int = (0 until Retrieval.PostingsBuckets).map { b =>
      Option(new java.io.File(s"$base/store/bucket=$b").listFiles).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    }.max
    val before = Retrieval.bm25StoredTopK(spark, d, s"$base/store", s"$base/stats").collect().toSeq
    assert(maxFiles > 1, "fixture did not produce multi-file buckets — compaction untested")
    val rewritten = Retrieval.bm25IndexCompact(spark, s"$base/store")
    assert(rewritten.nonEmpty && maxFiles === 1)
    val after = Retrieval.bm25StoredTopK(spark, d, s"$base/store", s"$base/stats").collect().toSeq
    assert(after === before, "compaction changed query results")
  }

  test("hybrid recall audit: probing every cell is exact (1000 permille)") {
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val e = graft.sources.Tables.load(spark, Sf0001, "embeddings")
    val full = Retrieval
      .hybridRecallAudit(d, e, nprobe = graft.operators.Similarity.Centroids.length)
      .collect()(0)
    assert(full.getLong(2) === 1000L, "sem overlap must be exact at nprobe=C")
    assert(full.getLong(3) === 1000L, "fused overlap must be exact at nprobe=C")
    // at the default probe budget the floors are measured, bounded, and
    // no better than exact
    val dflt = Retrieval.hybridRecallAudit(d, e).collect()(0)
    assert(dflt.getLong(2) <= 1000L && dflt.getLong(2) > 0L)
    assert(dflt.getLong(3) <= 1000L && dflt.getLong(3) > 0L)
  }

  test("informative BM25 scores exactly the rarest half of each query's terms") {
    // "the" is in every doc (df=4), "data" in three, "apple"/"zebra" in
    // one: query 0's informative half of {the, data, apple, zebra} is
    // {apple, zebra} — the two rarest
    val corpus = Seq(
      0L -> "the data apple zebra",
      1L -> "the data engine",
      2L -> "the data pipeline",
      3L -> "the cluster")
    val got = Retrieval.bm25TopKInformative(docs(corpus: _*)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // reference: BM25 restricted to the selected terms per query
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, x) => t -> x.size }
    for (q <- corpus.map(_._1)) {
      val terms = toks(q).take(Retrieval.QueryTermCount).distinct
      val kept = terms.sortBy(t => (dfm(t), t)).take((terms.size + 1) / 2).toSet
      // full corpus statistics, scored terms restricted to the kept set
      val scores = bm25Ref(corpus, q, Some(kept.toSeq))
      val want = scores.toSeq.sortBy { case (id, s) => (-s, id) }
        .map { case (id, s) => (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      val have = got.filter(_._1 == q).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(have === want, s"query $q kept=$kept")
    }
  }

  test("retrievalNdcg matches a plain-Scala recompute on labeled embeddings") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (((i * 29 + seed * 13) % 19) - 9).toFloat / 5f)
    val rows = (0L until 12L).map(i => (i, vec(i.toInt), s"l${i % 3}"))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = Retrieval.retrievalNdcg(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.indices.map(i => a(i).toDouble * b(i)).sum
      d / (math.sqrt(a.indices.map(i => a(i).toDouble * a(i)).sum) *
        math.sqrt(b.indices.map(i => b(i).toDouble * b(i)).sum))
    }
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    val nOf = rows.groupBy(_._3).view.mapValues(_.size).toMap
    for (q <- 0L until Retrieval.PanelQueries.toLong) {
      val qv = rows(q.toInt)._2
      val ranked = rows.map { case (id, v, _) => id -> cos(qv, v) }
        .sortBy { case (id, s) => (-s, id) }.take(Retrieval.RetrievalTopK)
      val dcg = ranked.zipWithIndex.map { case ((id, _), i) =>
        (if (labelOf(id) == labelOf(q)) 1.0 else 0.0) / (math.log(i + 2) / math.log(2))
      }.sum
      val m = math.min(Retrieval.RetrievalTopK, nOf(labelOf(q)))
      val idcg = (1 to m).map(i => 1.0 / (math.log(i + 1) / math.log(2))).sum
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val have = got.find(_._1 == q).get
      assert(have._2 === r6(dcg), s"dcg q=$q")
      assert(have._3 === r6(idcg), s"idcg q=$q")
      assert(have._4 === r6(dcg / idcg), s"ndcg q=$q")
    }
  }

  test("panel joins broadcast (no shuffle of the query side)") {
    val d = graft.sources.Tables.load(spark, Sf0001, "documents")
    val e = graft.sources.Tables.load(spark, Sf0001, "embeddings")
    val bm25Plan = Retrieval.bm25TopK(d).queryExecution.executedPlan.toString
    assert(bm25Plan.contains("BroadcastHashJoin"), "query panel should broadcast")
    val rrfPlan = Retrieval.hybridRrf(d, e).queryExecution.executedPlan.toString
    assert(rrfPlan.contains("BroadcastHashJoin"))
    assert(!rrfPlan.contains("BroadcastNestedLoopJoin") && !rrfPlan.contains("CartesianProduct"))
  }
}
