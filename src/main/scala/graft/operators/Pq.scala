package graft.operators

import graft.functions.{FloatDotConstExpr, FloatDotSelfExpr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Product quantization (PQ) — the memory-bound serving layout the ANN
  * family was still missing: split each 64-d vector into [[SubSpaces]]
  * contiguous 8-d subvectors, train an independent [[CodebookK]]-entry
  * codebook per subspace (tiny k-means), and store each vector as 8×4 =
  * 32 BITS (one packed BIGINT here) instead of 64 floats — a 64×
  * compression that turns a 100 TB float corpus into ~1.6 TB of codes
  * that fit the serving tier's memory. Search is ADC (asymmetric
  * distance computation): the query stays exact; its distance to every
  * codebook centroid is precomputed into an 8×16 table driver-side, and
  * each candidate's approximate distance is EIGHT table lookups on its
  * packed code — no float vector is ever touched at query time. This is
  * the standard IVF-PQ split (coarse cells route, PQ codes rank); the
  * coarse side already exists (`ivfStore*`), PQ is the in-cell rank.
  *
  * Scale shape: training = [[Iters]] passes, each ONE scan + one
  * (8·k)-group hash aggregation (the subvector means; map-side combine
  * shrinks the shuffle to 128 rows/task) — only 8×16×8 doubles reach
  * the driver. Encoding = a stateless codegen projection (128 8-term
  * dot kernels + 8 argmin CASEs per row). ADC = integer shifts + 8
  * literal-array lookups per row, fully codegen.
  *
  * Determinism contract (the kmeans/classifier pattern): seeds are
  * data-deterministic (id-strided — see [[trainCodebooks]]); centroids
  * are 6dp-quantized after seeding and after every update on BOTH
  * engines, so distributed-vs-sequential float summation divergence is
  * re-zeroed each iteration; every score/distance expression is emitted
  * with identical left-fold association in both dialects; codes and
  * table indices are integers, so ranking parity is exact.
  */
object Pq {

  val SubSpaces = 8
  val SubDim: Int = Similarity.Dim / SubSpaces
  val CodebookK = 16 // 4 bits/subspace -> 32-bit code per vector
  val Iters = 2

  /** books(s)(j) = centroid j of subspace s, SubDim doubles, 6dp. */
  type Codebooks = Array[Array[Array[Double]]]

  private def dotConstCol(c: Column, v: Array[Double]): Column =
    Shim.column(FloatDotConstExpr(Shim.expression(c), v.toSeq))

  private def dotSelfCol(c: Column): Column =
    Shim.column(FloatDotSelfExpr(Shim.expression(c)))

  /** |c|² with the shared left-fold order (also used by [[PqRef]]). */
  def normSq(c: Array[Double]): Double = c.foldLeft(0.0)((a, x) => a + x * x)

  private def subCol(s: Int): Column =
    expr(s"slice(embedding, ${s * SubDim + 1}, $SubDim)")

  /** Per-row assignment score for centroid `c` of a subspace (on the
    * SLICED column): argmin_j |v_s − c_j|² == argmax_j (2·v_s·c_j −
    * |c_j|²) since |v_s|² is constant per row — the
    * `withCentroidScores` identity on 8-d slices.
    */
  private def scoreCol(sub: Column, c: Array[Double]): Column =
    dotConstCol(sub, c) * lit(2.0) - lit(normSq(c))

  /** Train the [[SubSpaces]]×[[CodebookK]] codebooks. Seeds are
    * ID-STRIDED: seed j of every subspace comes from the first vector
    * with `vec_id >= j·(maxId+1)/k` — deterministic, one cheap probe
    * per seed (k = 16 TakeOrdered jobs on a cached frame, shared by all
    * 8 subspaces), and spread across the id space, which for ids
    * uncorrelated with geometry approximates the random sampling PQ
    * training normally uses (the lowest-k-ids init measurably collapsed
    * the full-width trainer — SURVEY §8.9). At 100 TB seeding and
    * training run on a sample; the per-iteration scan shape is what
    * matters and it is one pass + one 128-group agg.
    *
    * Empty clusters keep their previous centroid (the Lloyd convention
    * shared with [[Similarity.kmeansTrace]]).
    */
  def trainCodebooks(
      embeddings: DataFrame,
      k: Int = CodebookK,
      iters: Int = Iters): Codebooks = {
    val maxId = embeddings.agg(max(col("vec_id"))).head.getLong(0)
    val seedRows = (0 until k).map { j =>
      val threshold = (j.toLong * (maxId + 1)) / k
      val r = embeddings
        .filter(col("vec_id") >= threshold)
        .orderBy(col("vec_id"))
        .limit(1)
        .select(col("embedding"))
        .collect()
      require(r.nonEmpty, s"no vector with vec_id >= $threshold (need $k seeds)")
      r.head.getSeq[Float](0).toArray
    }
    var books: Codebooks = Array.tabulate(SubSpaces) { s =>
      seedRows.map { v =>
        Array.tabulate(SubDim)(i => Similarity.round6(v(s * SubDim + i).toDouble))
      }.toArray
    }
    for (_ <- 0 until iters) {
      // one pass: per-subspace sliced column + argmax CASE, exploded to
      // (s, bucket, sub) rows, ONE hash agg over 8·k groups
      val withSubs = (0 until SubSpaces).foldLeft(embeddings) { (df, s) =>
        val withScores = books(s).zipWithIndex.foldLeft(
          df.withColumn(s"sub$s", subCol(s))) { case (d, (c, j)) =>
          d.withColumn(s"p${s}_$j", scoreCol(col(s"sub$s"), c))
        }
        withScores
          .withColumn(s"b$s", expr(Similarity.bucketCaseNamed(s"p${s}_", books(s).length)))
          .drop((0 until books(s).length).map(j => s"p${s}_$j"): _*)
      }
      val exploded = withSubs
        .select(explode(array((0 until SubSpaces).map(s =>
          struct(lit(s).as("s"), col(s"b$s").as("bucket"), col(s"sub$s").as("sub"))): _*))
          .as("e"))
        .select(col("e.s"), col("e.bucket"), col("e.sub"))
      val aggs = (0 until SubDim).map(i =>
        avg(col("sub").getItem(i)).as(s"m$i"))
      val rows = exploded
        .groupBy(col("s"), col("bucket"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = books.map(_.map(_.clone()))
      rows.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          Array.tabulate(SubDim)(i => Similarity.round6(r.getDouble(i + 2)))
      }
      books = next
    }
    books
  }

  /** Deterministic training-sample stride: the sampled trainer learns
    * its codebooks from the `vec_id % TrainSampleMod == 0` quarter of
    * the corpus. The scaladoc above has always said "at 100 TB seeding
    * and training run on a sample" — this makes that path a first-class
    * operator instead of prose (VERDICT r10 #7), and the
    * `pq_codebooks_sampled` gate certifies the sampled books against
    * the SAME dual recall floors as the full trainer, scored on the
    * FULL corpus. The id-stride is the corpus-sampling convention every
    * other gate uses (ids are uncorrelated with geometry here; a real
    * pipeline would hash the key first — [[Sampling.contentSample]] is
    * that operator).
    */
  val TrainSampleMod = 4

  /** [[trainCodebooks]] on the deterministic 1/[[TrainSampleMod]]
    * sample — per-iteration cost drops by the sample factor while the
    * scan shape (one pass + one 128-group agg) is unchanged.
    */
  def trainCodebooksSampled(
      embeddings: DataFrame,
      mod: Int = TrainSampleMod,
      k: Int = CodebookK,
      iters: Int = Iters): Codebooks =
    trainCodebooks(
      embeddings.filter(pmod(col("vec_id"), lit(mod)) === 0), k, iters)

  /** Codebook table for the gate: (subspace, centroid, dim, value). */
  def codebookTable(spark: SparkSession, books: Codebooks): DataFrame = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.flatMap { case (c, j) =>
        c.zipWithIndex.map { case (v, i) => (s, j, i, v) }
      }
    }.toSeq.toDF("subspace", "centroid", "dim", "value")
      .orderBy(col("subspace"), col("centroid"), col("dim"))
  }

  /** Encode every vector to ONE packed BIGINT: code = Σ_s b_s·16^s
    * (subspace 0 in the low nibble). Stateless codegen projection —
    * the 100 TB path runs this once at ingest and stores only the
    * code column next to the coarse bucket.
    */
  def encode(embeddings: DataFrame, books: Codebooks): DataFrame =
    encodeUnordered(embeddings, books).orderBy(col("vec_id"))

  /** [[encode]] without the presentation sort — the projection as
    * deployed on a stream (append mode cannot sort; stateless, so
    * incremental execution is trivially correct — certified by the
    * streaming_pq_encode gate against the batch oracle).
    */
  def encodeUnordered(embeddings: DataFrame, books: Codebooks): DataFrame =
    withCode(embeddings, books).select(col("vec_id"), col("code"))

  private def withCode(embeddings: DataFrame, books: Codebooks): DataFrame = {
    val withBuckets = (0 until SubSpaces).foldLeft(embeddings) { (df, s) =>
      val withScores = books(s).zipWithIndex.foldLeft(
        df.withColumn(s"sub$s", subCol(s))) { case (d, (c, j)) =>
        d.withColumn(s"p${s}_$j", scoreCol(col(s"sub$s"), c))
      }
      withScores
        .withColumn(s"b$s", expr(Similarity.bucketCaseNamed(s"p${s}_", books(s).length)))
        .drop(s"sub$s")
        .drop((0 until books(s).length).map(j => s"p${s}_$j"): _*)
    }
    val packed = (0 until SubSpaces)
      .map(s => s"CAST(b$s AS BIGINT) * ${1L << (4 * s)}L")
      .mkString(" + ")
    withBuckets
      .withColumn("code", expr(packed))
      .drop((0 until SubSpaces).map(s => s"b$s"): _*)
  }

  /** ADC distance table for query `q`: t(s)(j) = |q_s − c_sj|², the
    * SubSpaces×k doubles both engines receive as literals. Fold order:
    * left over the 8 dims, (q_i − c_i)² accumulated — identical in
    * [[adcDistExpr]]'s literal and the ref.
    */
  def distTable(books: Codebooks, q: Array[Double]): Array[Array[Double]] =
    books.zipWithIndex.map { case (cents, s) =>
      cents.map { c =>
        (0 until SubDim).foldLeft(0.0) { (a, i) =>
          val d = q(s * SubDim + i) - c(i)
          a + d * d
        }
      }
    }

  /** The ADC distance as a dialect-shared expression STRING over a
    * `code` column: Σ_s table_s[(code >> 4s) & 15]. Literal doubles are
    * formatted once (Double.toString round-trips exactly in both
    * parsers), indices are integer bit ops — the sum is bit-identical
    * across engines.
    */
  def adcDistExpr(table: Array[Array[Double]], codeCol: String, spark: Boolean): String =
    (0 until SubSpaces).map { s =>
      // literals must be EXPLICIT doubles: a bare `0.123` parses as
      // DECIMAL in Spark SQL (and DuckDB), silently moving the whole
      // ADC sum into decimal arithmetic
      val lits =
        if (spark) table(s).map(v => s"${v}D").mkString(", ")
        else table(s).map(v => s"CAST($v AS DOUBLE)").mkString(", ")
      val idx =
        if (spark) s"(shiftright($codeCol, ${4 * s}) & 15)" // no `>>` in Spark SQL
        else s"(($codeCol >> ${4 * s}) & 15)"
      if (spark) s"element_at(array($lits), CAST($idx AS INT) + 1)"
      else s"(list_value($lits))[CAST($idx AS INT) + 1]"
    }.mkString("(", " + ", ")")

  /** Top-k by ADC distance against [[Similarity.QueryVec]]: ranking
    * touches ONLY the packed code column (8 shifts + 8 literal-array
    * lookups per row) — the serving-memory path. Ties on the unrounded
    * bit-identical double break to vec_id.
    */
  def adcTopK(encoded: DataFrame, books: Codebooks, k: Int): DataFrame =
    adcTopKFor(encoded, books, k, Similarity.QueryVec)

  def adcTopKFor(encoded: DataFrame, books: Codebooks, k: Int, q: Array[Double]): DataFrame =
    encoded
      .withColumn("dist", expr(adcDistExpr(distTable(books, q), "code", spark = true)))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("dist"), 6).as("dist"))

  /** Shortlist multiplier for the exact re-rank stage: ADC keeps the
    * top k·[[RerankShortlistMult]] codes, then ONLY those rows' float
    * vectors are read for exact distances — per query, 16·k vectors
    * touched regardless of corpus size.
    */
  val RerankShortlistMult = 16

  /** Recall floors, per-mille, on the [[Similarity.PanelQueries]]
    * panel. ADC-only recall with a FIXED 32-bit code declines as the
    * corpus grows (measured: 333‰ at sf0.01, 200‰ at sf0.1 — random
    * near-uniform embeddings are PQ's worst case, no cluster structure
    * for the codebooks to exploit), which is why ADC alone is a
    * SHORTLIST stage, not an answer: the floor only certifies the
    * machinery orders codes sensibly. The re-ranked path (ADC shortlist
    * → exact distances on 16·k survivors) is the serving answer and
    * holds a real floor (measured 991‰/833‰ at sf0.01/sf0.1). At 100 TB
    * the decline is bounded by composing with the IVF cells
    * ([[ivfPqTopK]]): ADC ranks within the probed cells only, so
    * per-query n stays ~nprobe·corpus/C however the corpus grows —
    * bits-per-code and cell count are the two dials, both trained.
    */
  val AdcRecallFloorPermille = 150L
  val RerankRecallFloorPermille = 700L

  private def exactScoreCol(q: Array[Double]): Column =
    dotConstCol(col("embedding"), q) * lit(2.0) - dotSelfCol(col("embedding"))

  /** Exact re-rank of the ADC shortlist: top-k by TRUE L2 distance
    * among the k·`mult` best codes. `|q|²` is added back so the output
    * is the genuine squared distance (the ranking itself uses the
    * cancelled form on both engines).
    */
  def rerankTopKFor(
      encoded: DataFrame,
      embeddings: DataFrame,
      books: Codebooks,
      k: Int,
      q: Array[Double],
      mult: Int = RerankShortlistMult): DataFrame = {
    val qn2 = q.foldLeft(0.0)((a, x) => a + x * x)
    val short = encoded
      .withColumn("adc", expr(adcDistExpr(distTable(books, q), "code", spark = true)))
      .orderBy(col("adc"), col("vec_id"))
      .limit(k * mult)
      .select(col("vec_id"))
    embeddings
      .join(broadcast(short), Seq("vec_id"))
      .withColumn("sc", exactScoreCol(q))
      .orderBy(col("sc").desc, col("vec_id"))
      .limit(k)
      .select(
        col("vec_id"),
        round(dotSelfCol(col("embedding")) - dotConstCol(col("embedding"), q) * lit(2.0) + lit(qn2), 6)
          .as("dist2"))
  }

  def rerankTopK(encoded: DataFrame, embeddings: DataFrame, books: Codebooks, k: Int): DataFrame =
    rerankTopKFor(encoded, embeddings, books, k, Similarity.QueryVec)

  /** The FULL composed serving stack — IVF-PQ with refinement, the
    * FAISS `IVFPQ + refine` shape: trained coarse cells ROUTE (probe
    * `nprobe` of C, partition pruning at the store), 32-bit PQ codes
    * RANK within the probed cells (memory-resident, 8 table lookups a
    * row), exact distances POLISH the shortlist (float vectors read for
    * 16·k rows only). Per-query cost: nprobe/C of the code column +
    * k·mult float rows — both independent of total corpus size.
    */
  def ivfPqTopK(
      bucketed: DataFrame,
      encoded: DataFrame,
      embeddings: DataFrame,
      books: Codebooks,
      cents: Array[Array[Double]],
      k: Int,
      nprobe: Int,
      mult: Int = RerankShortlistMult): DataFrame = {
    val probes = Similarity.probedBucketsFor(cents, nprobe)
    val inCell = bucketed
      .filter(col("bucket").isin(probes.map(Int.box): _*))
      .select(col("vec_id"))
    rerankTopKFromShort(
      encoded.join(inCell, Seq("vec_id")), embeddings, books, k, Similarity.QueryVec, mult)
  }

  private def rerankTopKFromShort(
      encodedSubset: DataFrame,
      embeddings: DataFrame,
      books: Codebooks,
      k: Int,
      q: Array[Double],
      mult: Int): DataFrame = {
    val qn2 = q.foldLeft(0.0)((a, x) => a + x * x)
    val short = encodedSubset
      .withColumn("adc", expr(adcDistExpr(distTable(books, q), "code", spark = true)))
      .orderBy(col("adc"), col("vec_id"))
      .limit(k * mult)
      .select(col("vec_id"))
    embeddings
      .join(broadcast(short), Seq("vec_id"))
      .withColumn("sc", exactScoreCol(q))
      .orderBy(col("sc").desc, col("vec_id"))
      .limit(k)
      .select(
        col("vec_id"),
        round(dotSelfCol(col("embedding")) - dotConstCol(col("embedding"), q) * lit(2.0) + lit(qn2), 6)
          .as("dist2"))
  }

  // ---- stored IVF-PQ: codes SERVED from the bucket-partitioned store --

  /** `(vec_id, code, bucket)` in ONE scan — the ingest projection of
    * the composed serving stack: the PQ encode (8 sub-argmins → one
    * packed BIGINT) and the coarse-cell assignment (C centroid dots →
    * argmax) run side by side as narrow codegen over the same embedding
    * read, so building the serving table never joins the code frame
    * against the assignment frame. This row — ~12 payload bytes per
    * vector — is everything the serving tier persists.
    */
  def encodeWithBuckets(
      embeddings: DataFrame,
      books: Codebooks,
      cents: Array[Array[Double]]): DataFrame = {
    val withSims = cents.zipWithIndex.foldLeft(withCode(embeddings, books)) {
      case (df, (c, j)) => df.withColumn(s"cs$j", dotConstCol(col("embedding"), c))
    }
    withSims
      .withColumn("bucket", expr(Similarity.bucketCaseNamed("cs", cents.length)))
      .select(col("vec_id"), col("code"), col("bucket"))
  }

  /** Persist the code table PARTITIONED BY BUCKET — the
    * [[Similarity.ivfStoreWrite]] layout with the 32-bit code as the
    * payload instead of the 256-byte float vector: each coarse cell is
    * its own partition directory, so a probe's `bucket IN (...)`
    * predicate prunes at FILE level, and the pruned bytes are 64×
    * smaller than the float store's. At 100 TB of raw vectors this
    * table is ~1.6 TB — the tier that actually fits serving hardware.
    */
  def pqStoreWrite(codes: DataFrame, path: String): Unit =
    // manifest build is lazy — the [[Similarity.ivfStoreWrite]]
    // round-14 discipline on the code tier: the first maintenance
    // call's heal path builds it from the store's own content
    codes.write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Incremental code-store maintenance — [[Similarity.storeUpsert]]
    * pointed at the code payload: a daily batch re-encodes only its own
    * vectors and rewrites only the touched buckets' partitions (batch
    * homes ∪ re-embedded ids' old homes), never the corpus. Compaction
    * is [[Similarity.ivfStoreCompact]] on the same path (the partition
    * scheme is identical). Returns the touched bucket ids.
    */
  def pqStoreUpsert(spark: SparkSession, codesBatch: DataFrame, path: String): Seq[Int] =
    Similarity.storeUpsert(spark, codesBatch, path, payloadCols = Seq("code"))

  /** The composed serving stack ANSWERED FROM THE STORE — what
    * [[ivfPqTopK]] routes in memory, this routes at the directory tree:
    * read the bucket-partitioned code table, prune to the `nprobe`
    * probed cells at FILE level (the `bucket IN (...)` literal lands in
    * the scan's PartitionFilters — PqSpec asserts files read == files
    * under the probed directories), rank the surviving codes by ADC (8
    * shifts + 8 literal lookups a row), then exact re-rank the k·mult
    * shortlist from the float table. Per query: nprobe/C of a 64×-
    * compressed store's bytes + k·mult float rows — both independent of
    * corpus size, and no vec_id equi-join anywhere (the routing IS the
    * directory pruning; VERDICT r10 #1's missing last mile).
    */
  def ivfPqStoredTopK(
      spark: SparkSession,
      books: Codebooks,
      cents: Array[Array[Double]],
      embeddings: DataFrame,
      k: Int,
      nprobe: Int,
      path: String,
      mult: Int = RerankShortlistMult): DataFrame = {
    val probes = Similarity.probedBucketsFor(cents, nprobe)
    val inCell = spark.read.parquet(path)
      .filter(col("bucket").isin(probes.map(Int.box): _*))
      .select(col("vec_id"), col("code"))
    rerankTopKFromShort(inCell, embeddings, books, k, Similarity.QueryVec, mult)
  }

  /** The serving stack with NO raw table anywhere in the query path —
    * both tiers answered from bucket-partitioned storage: codes from
    * the PQ store ([[pqStoreWrite]]), floats for the exact re-rank from
    * the float store ([[Similarity.ivfStoreWrite]]'s layout), BOTH
    * pruned by the same `bucket IN (...)` probe list at file level. The
    * re-rank in [[ivfPqStoredTopK]] still joins the shortlist against
    * the full embeddings table — a corpus-wide scan to fetch k·mult
    * rows, fine when the table is a warehouse frame but wrong as the
    * 100 TB query path. Here every byte the query touches lives under
    * the nprobe probed directories of the two stores: ~nprobe/C of the
    * 64×-compressed codes plus ~nprobe/C of the floats (and the float
    * side of the join is only opened for the broadcast shortlist's
    * rows). A shortlisted id is in a probed cell by construction, so
    * restricting the float read to the probed partitions loses nothing
    * — which the shared oracle (full-corpus replay from raw floats)
    * re-proves on every gate run.
    */
  def ivfPqStoredTopKFromStores(
      spark: SparkSession,
      books: Codebooks,
      cents: Array[Array[Double]],
      k: Int,
      nprobe: Int,
      codePath: String,
      floatPath: String,
      mult: Int = RerankShortlistMult): DataFrame = {
    val probes = Similarity.probedBucketsFor(cents, nprobe)
    def probed(path: String) = spark.read.parquet(path)
      .filter(col("bucket").isin(probes.map(Int.box): _*))
    val inCell = probed(codePath).select(col("vec_id"), col("code"))
    val floats = probed(floatPath).select(col("vec_id"), col("embedding"))
    rerankTopKFromShort(inCell, floats, books, k, Similarity.QueryVec, mult)
  }

  /** Dual panel recall certificate (the `ann_recall` pattern): for each
    * panel query, exact top-k by L2 (argmax 2·v·q − |v|² — |q|²
    * cancels) vs BOTH the ADC-only ranking and the re-ranked shortlist;
    * one all-integer row, certified = both floors hold.
    */
  def adcRecall(
      encoded: DataFrame,
      books: Codebooks,
      embeddings: DataFrame,
      k: Int): DataFrame = {
    def tagged(frames: Seq[DataFrame], flag: String): DataFrame =
      frames.zipWithIndex
        .map { case (df, t) => df.select(lit(t).as("qid"), col("vec_id"), lit(1L).as(flag)) }
        .reduce(_ unionAll _)
    val qs = (0 until Similarity.PanelQueries).map(Similarity.queryVec)
    // Plan shape: ONE base frame carries all 12 exact scores and 12 ADC
    // distances, materialized once (localCheckpoint -- the certificate's
    // scan-sharing barrier, the same AS MATERIALIZED its DuckDB twin
    // uses); the 36 rankings are then limit-sorts over the materialized
    // rows instead of 36 re-derivations of the join + 24 expression
    // columns (the unshared version measured 6.9 s at sf0.1 on pure
    // re-derivation). The re-rank branch needs no second embeddings
    // join: the exact score is already a base column -- identical
    // ordering semantics to rerankTopKFor, which the SQL twin mirrors.
    val base = qs.zipWithIndex.foldLeft(embeddings.join(encoded, Seq("vec_id"))) {
      case (df, (q, t)) =>
        df.withColumn(s"e$t", exactScoreCol(q))
          .withColumn(s"d$t", expr(adcDistExpr(distTable(books, q), "code", spark = true)))
    }.select(col("vec_id") +:
      qs.indices.flatMap(t => Seq(col(s"e$t"), col(s"d$t"))): _*)
      .localCheckpoint(true)
    val exact = tagged(qs.indices.map { t =>
      base.orderBy(col(s"e$t").desc, col("vec_id")).limit(k).select(col("vec_id"))
    }, "e")
    val adc = tagged(qs.indices.map { t =>
      base.orderBy(col(s"d$t"), col("vec_id")).limit(k).select(col("vec_id"))
    }, "a")
    val rer = tagged(qs.indices.map { t =>
      base
        .orderBy(col(s"d$t"), col("vec_id"))
        .limit(k * RerankShortlistMult)
        .orderBy(col(s"e$t").desc, col("vec_id"))
        .limit(k)
        .select(col("vec_id"))
    }, "r")
    exact
      .join(adc, Seq("qid", "vec_id"), "full_outer")
      .join(rer, Seq("qid", "vec_id"), "full_outer")
      .agg(
        coalesce(sum(coalesce(col("e"), lit(0L))), lit(0L)).as("n_exact"),
        coalesce(
          sum(when(col("e").isNotNull && col("a").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_overlap_adc"),
        coalesce(
          sum(when(col("e").isNotNull && col("r").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_overlap_rerank"))
      .withColumn("k", lit(k.toLong))
      .withColumn("n_queries", lit(Similarity.PanelQueries.toLong))
      .withColumn(
        "recall_adc_permille",
        expr("n_overlap_adc * 1000 DIV greatest(n_exact, 1L)"))
      .withColumn(
        "recall_rerank_permille",
        expr("n_overlap_rerank * 1000 DIV greatest(n_exact, 1L)"))
      .withColumn(
        "certified",
        col("recall_adc_permille") >= AdcRecallFloorPermille &&
          col("recall_rerank_permille") >= RerankRecallFloorPermille)
      .select(
        col("k"), col("n_queries"), col("n_exact"),
        col("n_overlap_adc"), col("n_overlap_rerank"),
        col("recall_adc_permille"), col("recall_rerank_permille"), col("certified"))
  }

  /** Sub-codebook STALENESS certificate (VERDICT r10 #4 — the coarse
    * quantizer has `ann_ivf_drift`; this is the same audit for the PQ
    * tier): panel recall@k of the SERVING path (ADC shortlist at the
    * same k·[[RerankShortlistMult]] budget → exact re-rank) with
    * codebooks trained on yesterday's corpus (the even-`vec_id` half)
    * and codes re-encoded over today's full corpus — exactly what an
    * incrementally-maintained code store serves between retrains —
    * versus a fresh retrain on today's corpus. One all-integer row;
    * `retrain` fires when stale trails fresh by more than
    * [[Similarity.DriftRetrainMarginPermille]] (the documented trigger,
    * shared with the coarse tier so the two audits fire on the same
    * scale). Same share-the-scan shape as [[adcRecall]]: ONE
    * materialized base carries all 12 exact scores + 12+12 ADC
    * distances; the 36 rankings are limit-sorts over it.
    */
  def pqDriftAudit(
      encodedStale: DataFrame,
      staleBooks: Codebooks,
      encodedFresh: DataFrame,
      freshBooks: Codebooks,
      embeddings: DataFrame,
      k: Int): DataFrame = {
    def tagged(frames: Seq[DataFrame], flag: String): DataFrame =
      frames.zipWithIndex
        .map { case (df, t) => df.select(lit(t).as("qid"), col("vec_id"), lit(1L).as(flag)) }
        .reduce(_ unionAll _)
    val qs = (0 until Similarity.PanelQueries).map(Similarity.queryVec)
    val joined = embeddings
      .join(encodedStale.withColumnRenamed("code", "code_s"), Seq("vec_id"))
      .join(encodedFresh.withColumnRenamed("code", "code_f"), Seq("vec_id"))
    val base = qs.zipWithIndex.foldLeft(joined) { case (df, (q, t)) =>
      df.withColumn(s"e$t", exactScoreCol(q))
        .withColumn(s"s$t", expr(adcDistExpr(distTable(staleBooks, q), "code_s", spark = true)))
        .withColumn(s"f$t", expr(adcDistExpr(distTable(freshBooks, q), "code_f", spark = true)))
    }.select(col("vec_id") +:
      qs.indices.flatMap(t => Seq(col(s"e$t"), col(s"s$t"), col(s"f$t"))): _*)
      .localCheckpoint(true)
    val short = k * RerankShortlistMult
    val exact = tagged(qs.indices.map { t =>
      base.orderBy(col(s"e$t").desc, col("vec_id")).limit(k).select(col("vec_id"))
    }, "e")
    def reranked(d: Int => String, flag: String): DataFrame = tagged(qs.indices.map { t =>
      base
        .orderBy(col(d(t)), col("vec_id"))
        .limit(short)
        .orderBy(col(s"e$t").desc, col("vec_id"))
        .limit(k)
        .select(col("vec_id"))
    }, flag)
    val stale = reranked(t => s"s$t", "s")
    val fresh = reranked(t => s"f$t", "f")
    exact
      .join(stale, Seq("qid", "vec_id"), "full_outer")
      .join(fresh, Seq("qid", "vec_id"), "full_outer")
      .agg(
        coalesce(sum(coalesce(col("e"), lit(0L))), lit(0L)).as("n_exact"),
        coalesce(
          sum(when(col("e").isNotNull && col("s").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_overlap_stale"),
        coalesce(
          sum(when(col("e").isNotNull && col("f").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_overlap_fresh"))
      .withColumn("k", lit(k.toLong))
      .withColumn("n_queries", lit(Similarity.PanelQueries.toLong))
      .withColumn(
        "recall_stale_permille",
        expr("n_overlap_stale * 1000 DIV greatest(n_exact, 1L)"))
      .withColumn(
        "recall_fresh_permille",
        expr("n_overlap_fresh * 1000 DIV greatest(n_exact, 1L)"))
      .withColumn(
        "retrain",
        col("recall_stale_permille") <
          col("recall_fresh_permille") - lit(Similarity.DriftRetrainMarginPermille))
      .select(
        col("k"), col("n_queries"), col("n_exact"),
        col("n_overlap_stale"), col("n_overlap_fresh"),
        col("recall_stale_permille"), col("recall_fresh_permille"), col("retrain"))
  }

  // ---- DuckDB oracle SQL ----------------------------------------------

  private def duckSubDot(s: Int, c: Array[Double]): String =
    (0 until SubDim)
      .map(i => s"CAST(embedding[${s * SubDim + i + 1}] AS DOUBLE)*(${c(i)})")
      .mkString("0 + ", " + ", "")

  /** Named per-subspace scores + argmin CASE — the shared candidate
    * `code` CTE of every PQ oracle. `sfx` disambiguates the CTE names
    * when one oracle replays TWO codebook sets (the drift audit).
    */
  private def duckCodeCte(books: Codebooks, sfx: String = ""): String = {
    val scores = (0 until SubSpaces).flatMap { s =>
      books(s).zipWithIndex.map { case (c, j) =>
        s"2*(${duckSubDot(s, c)}) - (${normSq(c)}) AS p${s}_$j"
      }
    }.mkString(",\n  ")
    val buckets = (0 until SubSpaces)
      .map(s => s"${Similarity.bucketCaseNamed(s"p${s}_", books(s).length)} AS b$s")
      .mkString(",\n  ")
    val packed = (0 until SubSpaces)
      .map(s => s"CAST(b$s AS BIGINT) * ${1L << (4 * s)}")
      .mkString(" + ")
    s"""s$sfx AS (SELECT vec_id, embedding,\n  $scores\nFROM embeddings),
       |b$sfx AS (SELECT vec_id, embedding,\n  $buckets\nFROM s$sfx),
       |sig$sfx AS (SELECT vec_id, embedding, $packed AS code FROM b$sfx)""".stripMargin
  }

  def encodeSql(books: Codebooks): String =
    s"""WITH ${duckCodeCte(books)}
       |SELECT vec_id, CAST(code AS BIGINT) AS code FROM sig ORDER BY vec_id""".stripMargin

  def adcTopKSql(books: Codebooks, k: Int): String = {
    val dist = adcDistExpr(distTable(books, Similarity.QueryVec), "code", spark = false)
    // ORDER BY/LIMIT run in the inner subquery over the RAW double (and
    // the outer sort reads the unrounded column, never the rounded
    // alias): an outer `ORDER BY dist` would bind to the 6dp SELECT
    // alias in DuckDB while the Spark twin ranks on the raw distance —
    // two codes <~5e-7 apart could rank differently at the k boundary
    // (ADVICE r10).
    s"""WITH ${duckCodeCte(books)}
       |SELECT vec_id, round(dist_raw, 6) AS dist FROM (
       |  SELECT vec_id, $dist AS dist_raw FROM sig
       |  ORDER BY dist_raw, vec_id LIMIT $k)
       |ORDER BY dist_raw, vec_id""".stripMargin
  }

  /** DuckDB twin of [[rerankTopK]]: same code CTE, same shortlist
    * boundary (ADC doubles are bit-identical), same exact re-rank.
    */
  def rerankTopKSql(books: Codebooks, k: Int, mult: Int = RerankShortlistMult): String = {
    val q = Similarity.QueryVec
    val qn2 = q.foldLeft(0.0)((a, x) => a + x * x)
    val adc = adcDistExpr(distTable(books, q), "code", spark = false)
    val sc = s"2*(${Similarity.DuckDialect.dotConst("embedding", q)}) - (${Similarity.DuckDialect.dotSelf("embedding")})"
    val d2 = s"(${Similarity.DuckDialect.dotSelf("embedding")}) - 2*(${Similarity.DuckDialect.dotConst("embedding", q)}) + ($qn2)"
    s"""WITH ${duckCodeCte(books)},
       |short AS (SELECT vec_id FROM (
       |  SELECT vec_id, $adc AS adc FROM sig)
       |  ORDER BY adc, vec_id LIMIT ${k * mult})
       |SELECT vec_id, round($d2, 6) AS dist2
       |FROM embeddings JOIN short USING (vec_id)
       |ORDER BY $sc DESC, vec_id LIMIT $k""".stripMargin
  }

  /** DuckDB twin of [[ivfPqTopK]]: trained coarse buckets recomputed
    * from raw floats (centroids as literals — each side's own certified
    * trainer), probe IN-list shared via [[Similarity.probedBucketsFor]],
    * then the same in-cell ADC shortlist + exact re-rank.
    */
  def ivfPqTopKSql(
      books: Codebooks,
      cents: Array[Array[Double]],
      k: Int,
      nprobe: Int,
      mult: Int = RerankShortlistMult): String = {
    val q = Similarity.QueryVec
    val qn2 = q.foldLeft(0.0)((a, x) => a + x * x)
    val probes = Similarity.probedBucketsFor(cents, nprobe).mkString(", ")
    val cellSims = cents.zipWithIndex
      .map { case (c, j) => s"${Similarity.DuckDialect.dotConst("embedding", c)} AS cs$j" }
      .mkString(",\n  ")
    val adc = adcDistExpr(distTable(books, q), "code", spark = false)
    val sc = s"2*(${Similarity.DuckDialect.dotConst("embedding", q)}) - (${Similarity.DuckDialect.dotSelf("embedding")})"
    val d2 = s"(${Similarity.DuckDialect.dotSelf("embedding")}) - 2*(${Similarity.DuckDialect.dotConst("embedding", q)}) + ($qn2)"
    s"""WITH ${duckCodeCte(books)},
       |cell AS (SELECT vec_id, ${Similarity.bucketCaseNamed("cs", cents.length)} AS bucket FROM (
       |  SELECT vec_id,\n  $cellSims\nFROM embeddings)),
       |short AS (SELECT vec_id FROM (
       |  SELECT s.vec_id, $adc AS adc
       |  FROM sig s JOIN cell c ON c.vec_id = s.vec_id
       |  WHERE c.bucket IN ($probes))
       |  ORDER BY adc, vec_id LIMIT ${k * mult})
       |SELECT vec_id, round($d2, 6) AS dist2
       |FROM embeddings JOIN short USING (vec_id)
       |ORDER BY $sc DESC, vec_id LIMIT $k""".stripMargin
  }

  /** DuckDB twin of the dual [[adcRecall]] certificate. */
  def adcRecallSql(books: Codebooks, k: Int): String = {
    val qs = (0 until Similarity.PanelQueries).map(Similarity.queryVec)
    val exactScores = qs.zipWithIndex.map { case (q, t) =>
      s"2*(${Similarity.DuckDialect.dotConst("embedding", q)}) - (${Similarity.DuckDialect.dotSelf("embedding")}) AS e$t"
    }.mkString(",\n  ")
    val adcDists = qs.zipWithIndex.map { case (q, t) =>
      s"${adcDistExpr(distTable(books, q), "code", spark = false)} AS d$t"
    }.mkString(",\n  ")
    def rankUnion(mk: Int => String): String =
      qs.indices
        .map(t => s"SELECT $t AS qid, vec_id FROM (\n${mk(t)})")
        .mkString("\n  UNION ALL\n  ")
    val short = k * RerankShortlistMult
    s"""WITH ${duckCodeCte(books)},
       |base AS MATERIALIZED (
       |  SELECT vec_id, code,\n  $exactScores,\n  $adcDists\n  FROM sig),
       |e AS (\n  ${rankUnion(t => s"SELECT vec_id FROM base ORDER BY e$t DESC, vec_id LIMIT $k")}\n),
       |a AS (\n  ${rankUnion(t => s"SELECT vec_id FROM base ORDER BY d$t, vec_id LIMIT $k")}\n),
       |r AS (\n  ${rankUnion(t =>
      s"""SELECT vec_id FROM (
         |    SELECT vec_id, e$t FROM base ORDER BY d$t, vec_id LIMIT $short)
         |  ORDER BY e$t DESC, vec_id LIMIT $k""".stripMargin)}\n),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM e),
       |na AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap_adc FROM e JOIN a USING (qid, vec_id)),
       |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap_rerank FROM e JOIN r USING (qid, vec_id))
       |SELECT CAST($k AS BIGINT) AS k,
       |  CAST(${Similarity.PanelQueries} AS BIGINT) AS n_queries,
       |  n_exact, n_overlap_adc, n_overlap_rerank,
       |  n_overlap_adc * 1000 // greatest(n_exact, 1) AS recall_adc_permille,
       |  n_overlap_rerank * 1000 // greatest(n_exact, 1) AS recall_rerank_permille,
       |  (n_overlap_adc * 1000 // greatest(n_exact, 1) >= $AdcRecallFloorPermille)
       |    AND (n_overlap_rerank * 1000 // greatest(n_exact, 1) >= $RerankRecallFloorPermille)
       |    AS certified
       |FROM ne, na, nr""".stripMargin
  }

  /** DuckDB twin of [[pqDriftAudit]]: BOTH codebook sets reach the SQL
    * as literals (each side's books come from its own gate-certified
    * trainer — the `ann_ivf_drift` convention), both code columns and
    * every ranking recomputed from raw floats over one MATERIALIZED
    * base.
    */
  def pqDriftAuditSql(staleBooks: Codebooks, freshBooks: Codebooks, k: Int): String = {
    val qs = (0 until Similarity.PanelQueries).map(Similarity.queryVec)
    val exactScores = qs.zipWithIndex.map { case (q, t) =>
      s"2*(${Similarity.DuckDialect.dotConst("ss.embedding", q)}) - (${Similarity.DuckDialect.dotSelf("ss.embedding")}) AS e$t"
    }.mkString(",\n  ")
    val staleDists = qs.zipWithIndex.map { case (q, t) =>
      s"${adcDistExpr(distTable(staleBooks, q), "ss.code", spark = false)} AS s$t"
    }.mkString(",\n  ")
    val freshDists = qs.zipWithIndex.map { case (q, t) =>
      s"${adcDistExpr(distTable(freshBooks, q), "sf.code", spark = false)} AS f$t"
    }.mkString(",\n  ")
    def rankUnion(mk: Int => String): String =
      qs.indices
        .map(t => s"SELECT $t AS qid, vec_id FROM (\n${mk(t)})")
        .mkString("\n  UNION ALL\n  ")
    def rerankSql(d: Int => String)(t: Int): String =
      s"""SELECT vec_id FROM (
         |    SELECT vec_id, e$t FROM base ORDER BY ${d(t)}, vec_id LIMIT ${k * RerankShortlistMult})
         |  ORDER BY e$t DESC, vec_id LIMIT $k""".stripMargin
    s"""WITH ${duckCodeCte(staleBooks, "_s")},
       |${duckCodeCte(freshBooks, "_f")},
       |base AS MATERIALIZED (
       |  SELECT ss.vec_id,\n  $exactScores,\n  $staleDists,\n  $freshDists
       |  FROM sig_s ss JOIN sig_f sf ON sf.vec_id = ss.vec_id),
       |e AS (\n  ${rankUnion(t => s"SELECT vec_id FROM base ORDER BY e$t DESC, vec_id LIMIT $k")}\n),
       |s AS (\n  ${rankUnion(rerankSql(t => s"s$t"))}\n),
       |f AS (\n  ${rankUnion(rerankSql(t => s"f$t"))}\n),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM e),
       |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap_stale FROM e JOIN s USING (qid, vec_id)),
       |nf AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap_fresh FROM e JOIN f USING (qid, vec_id))
       |SELECT CAST($k AS BIGINT) AS k,
       |  CAST(${Similarity.PanelQueries} AS BIGINT) AS n_queries,
       |  n_exact, n_overlap_stale, n_overlap_fresh,
       |  n_overlap_stale * 1000 // greatest(n_exact, 1) AS recall_stale_permille,
       |  n_overlap_fresh * 1000 // greatest(n_exact, 1) AS recall_fresh_permille,
       |  n_overlap_stale * 1000 // greatest(n_exact, 1)
       |    < n_overlap_fresh * 1000 // greatest(n_exact, 1) - ${Similarity.DriftRetrainMarginPermille} AS retrain
       |FROM ne, ns, nf""".stripMargin
  }
}
