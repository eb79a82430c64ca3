package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * Header DECODE is real for PNG, GIF and WAV: width/height/sample-rate/
  * channels are parsed from the payload bytes with builtin byte
  * arithmetic (`substring` on binary + `hex`/`conv` — big-endian reads
  * are one conv, little-endian reads reverse the per-byte hex pairs
  * first), per the public container specs (PNG IHDR, GIF logical screen
  * descriptor, RIFF/WAVE fmt chunk). No codec library, no UDF — the
  * whole decode stays a narrow codegen'd projection.
  *
  * PIXEL-level work is REAL for two container families, with zero codec
  * dependencies:
  *   - uncompressed 24-bit BMP — raw BGR bytes, so synthesis, channel
  *     stats and nearest-neighbor resize are narrow codegen'd byte
  *     arithmetic (see the BMP section);
  *   - non-interlaced 8-bit RGB PNG — IDAT is zlib-deflated filtered
  *     scanlines, which the JDK itself can round-trip
  *     (`java.util.zip.Deflater`/`Inflater` + `CRC32`); the codec lives
  *     in a typed map ([[pngPixelStats]]) because no Spark builtin can
  *     inflate — the one justified departure from expression-only
  *     scalar work in this codebase.
  * An unknown payload format now decodes to NULL dimensions (no
  * pseudo-value stub); the only remaining stubs are the labeled
  * `frameSample`/`resize` byte-subsampling fallbacks below, which no
  * `SparkEntry.queries` entry reaches.
  *
  * At 100 TB: payloads stay columnar in parquet (binary column, never
  * exploded), metadata extraction is a narrow map (no shuffle), and
  * any shuffle (e.g. groupBy format) carries only the small metadata
  * projection — `select` the payload away before wide operations.
  */
object Multimodal {

  /** Canonical multimodal schema. */
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("fmt", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType))), nullable = true)))

  /** Wrap the documents table as a multimodal asset table (text bytes
    * as the payload — the plumbing is payload-agnostic).
    */
  def assets(docs: DataFrame, modality: String = "text"): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      lit(modality).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Materialization barrier for operator CHAINS built from expression
    * synthesizers: an identity typed map forces rows through an object
    * boundary, so a downstream stage's many payload references read the
    * materialized BYTES instead of re-evaluating the whole upstream
    * container-building expression tree per reference (CollapseProject
    * merges adjacent projections and pushes them through repartitions —
    * measured 37 s vs ~2 s at sf0.1 for synthesize→resize→stats without
    * a barrier). The plan-level equivalent of a pipeline stage writing
    * its output to storage; no shuffle, no caching.
    */
  def materialize(df: DataFrame): DataFrame =
    df.map(r => r)(org.apache.spark.sql.Encoders.row(df.schema))

  // ---- shared typed-map harnesses for the byte-codec tiers ----------
  // (PNG below, GIF in GifPixels — one place owns the fanOut/id
  // contract and the per-mille stats row shape)

  /** Synthesize one container per non-negative doc_id via `make`. */
  private[operators] def synthesizedWith(
      docs: DataFrame,
      modality: String)(make: Long => Array[Byte]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Tables.fanOut(docs) // single-file scan → spread tasks
      .filter(col("doc_id") >= 0).select(col("doc_id")).as[Long]
      .map(id => (id, modality, make(id)))
      .toDF("id", "modality", "payload")
  }

  /** Per-image channel stats with the fixed per-mille row shape, from a
    * decoder returning (width, height, sumR, sumG, sumB).
    */
  private[operators] def pixelStatsWith(
      assets: DataFrame)(decode: Array[Byte] => (Int, Int, Long, Long, Long)): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val (w, h, sr, sg, sb) = decode(p)
        val n = w.toLong * h
        (id, w, h, sb * 1000 / n, sg * 1000 / n, sr * 1000 / n)
      }
      .toDF("id", "width", "height", "mean_b_permille", "mean_g_permille", "mean_r_permille")
      .orderBy(col("id"))
  }

  // ---- byte-arithmetic readers (1-based positions, like substring) ---

  /** Big-endian unsigned int read: hex of the byte slice is already
    * most-significant-first, one `conv` converts it.
    */
  private def be(payload: Column, pos: Int, len: Int): Column =
    conv(hex(substring(payload, pos, len)), 16, 10).cast("long")

  /** Little-endian unsigned int read: reverse the per-byte hex pairs,
    * then convert.
    */
  private def le(payload: Column, pos: Int, len: Int): Column =
    conv(
      concat((pos + len - 1 to pos by -1).map(p => hex(substring(payload, p, 1))): _*),
      16,
      10).cast("long")

  private def hexEq(payload: Column, pos: Int, hexLit: String): Column =
    hex(substring(payload, pos, hexLit.length / 2)) === lit(hexLit.toUpperCase)

  /** PNG signature 89 50 4E 47 0D 0A 1A 0A followed by the IHDR chunk. */
  private def isPng(p: Column): Column = hexEq(p, 1, "89504E470D0A1A0A")
  /** GIF87a / GIF89a. */
  private def isGif(p: Column): Column =
    hexEq(p, 1, "474946383761") || hexEq(p, 1, "474946383961")
  /** RIFF....WAVE with a leading fmt chunk. */
  private def isWav(p: Column): Column =
    hexEq(p, 1, "52494646") && hexEq(p, 9, "57415645") && hexEq(p, 13, "666D7420")

  /** Uncompressed 24-bit BMP: "BM", BITMAPINFOHEADER (biSize 40),
    * biBitCount 24, biCompression BI_RGB — the one mainstream image
    * container whose PIXELS are raw bytes, which is what lets the
    * pixel-level operators below be REAL without a codec library.
    */
  private def isBmp(p: Column): Column =
    hexEq(p, 1, "424D") && le(p, 15, 4) === 40 &&
      le(p, 29, 2) === 24 && le(p, 31, 4) === 0

  /** Metadata decode. PNG/GIF/BMP/WAV headers are parsed for real (see
    * object doc); any other payload has honestly-NULL dimensions — a
    * `<modality>/raw` payload simply has none.
    */
  def decodeMeta(assets: DataFrame): DataFrame = {
    val p = col("payload")
    assets
      .withColumn("n_bytes", length(p).cast("long"))
      .withColumn("digest", sha2(p, 256))
      .withColumn(
        "fmt",
        when(isPng(p), lit("image/png"))
          .when(isGif(p), lit("image/gif"))
          .when(isBmp(p), lit("image/bmp"))
          .when(isWav(p), lit("audio/wav"))
          .otherwise(concat(col("modality"), lit("/raw"))))
      .withColumn(
        "width",
        when(isPng(p), be(p, 17, 4)) // IHDR width, bytes 16..19 (0-based)
          .when(isGif(p), le(p, 7, 2)) // logical screen width
          .when(isBmp(p), le(p, 19, 4)) // biWidth (fixture contract: positive)
          .otherwise(lit(null)) // audio / raw: no dimensions
          .cast("int"))
      .withColumn(
        "height",
        when(isPng(p), be(p, 21, 4)) // IHDR height, bytes 20..23
          .when(isGif(p), le(p, 9, 2))
          .when(isBmp(p), le(p, 23, 4)) // biHeight > 0 = bottom-up rows
          .otherwise(lit(null))
          .cast("int"))
      .withColumn("sample_rate", when(isWav(p), le(p, 25, 4)).cast("int")) // fmt bytes 24..27
      .withColumn("channels", when(isWav(p), le(p, 23, 2)).cast("int")) // fmt bytes 22..23
      .withColumn(
        "meta",
        struct(
          col("n_bytes"), col("fmt"), col("width"), col("height"),
          col("sample_rate"), col("channels")))
      .select(col("id"), col("modality"), col("payload"), col("meta"), col("digest"))
  }

  // ---- synthetic binary fixtures (drive the REAL decode paths) -------

  private def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  private def le16(c: Column): Column = {
    val h = lpad(hex(c), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def le32(c: Column): Column = {
    val h = lpad(hex(c), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** Synthesize spec-correct PNG / WAV headers from the documents table
    * (even doc_id → PNG with dimensions derived from the id, odd →
    * WAV fmt chunk with rate/channels derived from the id). The payload
    * bytes are REAL container headers, so `decodeMeta` exercises its
    * byte-arithmetic parse, and an oracle can recompute the expected
    * fields from doc_id alone — certifying decode(encode(x)) == x.
    */
  def synthesizeAssets(docs: DataFrame): DataFrame = {
    val w = (col("doc_id") % 1904 + 16).cast("int")
    val h = ((col("doc_id") * 7) % 1064 + 16).cast("int")
    val rate = element_at(
      array(lit(8000), lit(16000), lit(22050), lit(44100)),
      (col("doc_id") % 4 + 1).cast("int"))
    val ch = (col("doc_id") % 2 + 1).cast("int")
    val png = concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D49484452")), // IHDR length=13 + type
      be32(w),
      be32(h),
      unhex(lit("0806000000")), // bit depth 8, RGBA, deflate, none, none
      unhex(lit("00000000"))) // (placeholder CRC — not validated)
    val wav = concat(
      unhex(lit("52494646")), // "RIFF"
      le32(lit(36)), // riff size (header-only fixture)
      unhex(lit("57415645")), // "WAVE"
      unhex(lit("666D7420")), // "fmt "
      le32(lit(16)), // fmt chunk size
      le16(lit(1)), // PCM
      le16(ch),
      le32(rate),
      le32(rate * ch * 2), // byte rate
      le16(ch * 2), // block align
      le16(lit(16))) // bits per sample
    docs.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("modality"),
      when(col("doc_id") % 2 === 0, png).otherwise(wav).as("payload"))
  }

  // ---- REAL pixel-level operators over uncompressed 24-bit BMP ------
  //
  // BMP stores raw BGR bytes (bottom-up rows, 4-byte row padding), so
  // synthesis, channel statistics and nearest-neighbor resize are all
  // expressible as narrow codegen'd byte arithmetic — actual pixel
  // compute, not a stub, with zero codec dependencies. Pixel (x, y) of
  // image `id` carries channel values
  //   B = (id·31 + x·7 + y·13) mod 256
  //   G = (id·17 + x·5 + y·11) mod 256
  //   R = (id·7 + x·3 + y·19) mod 256
  // — a closed form BOTH engines can derive independently: Spark parses
  // the actual payload bytes while the DuckDB oracle recomputes the
  // expected statistics from the formula, so a single wrong byte
  // anywhere in encode OR decode fails the hash gate.

  /** Pixel-channel hex (2 chars) for the synthesis expressions. */
  private def chanHex(idExpr: String, cb: (Int, Int, Int)): String =
    s"lpad(hex(($idExpr * ${cb._1} + x * ${cb._2} + y * ${cb._3}) % 256), 2, '0')"

  private val ChanB = (31, 7, 13)
  private val ChanG = (17, 5, 11)
  private val ChanR = (7, 3, 19)

  /** Synthesize a VALID uncompressed 24-bit BMP per document:
    * BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up padded BGR rows.
    * Dimensions are small and id-derived (w = id%4+1, h = id%3+1);
    * every byte of the pixel array follows the closed form above.
    * Narrow per-row expression work only.
    */
  def synthesizeBmpAssets(docs: DataFrame): DataFrame = {
    // non-negative ids only (contract shared with BmpPixelStatsSql): a
    // negative id would make w/h <= 0, where Spark's sequence(0, w-1)
    // DESCENDS while DuckDB's generate_series is empty — silent engine
    // divergence instead of an agreed-on empty result
    // fanOut: the per-pixel byte synthesis below is the expensive stage,
    // and the single-file test corpus would otherwise run it on ONE task
    val d = graft.sources.Tables.fanOut(docs)
      .filter(col("doc_id") >= 0)
      .withColumn("w", (col("doc_id") % 4 + 1).cast("long"))
      .withColumn("h", (col("doc_id") % 3 + 1).cast("long"))
      .withColumn("stride", expr("(w * 3 + 3) div 4 * 4"))
    // bottom-up storage: logical row y is written at storage slot h-1-y
    val rowsHex = expr(
      "array_join(transform(sequence(h - 1, 0, -1), y -> concat(" +
        "array_join(transform(sequence(0, w - 1), x -> concat(" +
        s"${chanHex("doc_id", ChanB)}, ${chanHex("doc_id", ChanG)}, ${chanHex("doc_id", ChanR)}" +
        ")), ''), repeat('00', cast(stride - w * 3 AS INT)))), '')")
    d.select(
      col("doc_id").as("id"),
      lit("image").as("modality"),
      concat(
        unhex(lit("424D")), // "BM"
        le32(lit(54) + col("stride") * col("h")), // file size
        le32(lit(0)), // reserved
        le32(lit(54)), // pixel data offset
        le32(lit(40)), // biSize
        le32(col("w")),
        le32(col("h")), // positive: bottom-up
        le16(lit(1)), // planes
        le16(lit(24)), // bits per pixel
        le32(lit(0)), // BI_RGB
        le32(col("stride") * col("h")), // image size
        le32(lit(2835)), le32(lit(2835)), // 72 DPI
        le32(lit(0)), le32(lit(0)), // palette
        unhex(rowsHex)).as("payload"))
  }

  /** REAL pixel statistics from the payload BYTES: per image, the mean
    * of each channel in per-mille (sum·1000 div pixelCount — integer
    * arithmetic, exact on both engines). Width/height/offset/stride are
    * read from the headers; the three channel sums are higher-order
    * `aggregate` folds over the pixel index — one narrow codegen'd
    * projection, no explode, no shuffle; output is one fixed-width row
    * per image regardless of dimensions.
    */
  def bmpPixelStats(assets: DataFrame): DataFrame = {
    val p = col("payload")
    def chanSum(c: Int) =
      expr(
        "aggregate(sequence(0, cast(w * h - 1 AS INT)), 0L, (acc, i) -> acc + " +
          "CAST(conv(hex(substring(payload, CAST(off + (i div cast(w AS INT)) * stride + " +
          s"(i % cast(w AS INT)) * 3 + $c + 1 AS INT), 1)), 16, 10) AS BIGINT))")
    assets
      .filter(isBmp(p))
      .withColumn("w", le(p, 19, 4))
      .withColumn("h", le(p, 23, 4))
      .withColumn("off", le(p, 11, 4))
      .withColumn("stride", expr("(w * 3 + 3) div 4 * 4"))
      .withColumn("sum_b", chanSum(0))
      .withColumn("sum_g", chanSum(1))
      .withColumn("sum_r", chanSum(2))
      .select(
        col("id"),
        col("w").cast("int").as("width"),
        col("h").cast("int").as("height"),
        expr("sum_b * 1000 div (w * h)").as("mean_b_permille"),
        expr("sum_g * 1000 div (w * h)").as("mean_g_permille"),
        expr("sum_r * 1000 div (w * h)").as("mean_r_permille"))
      .orderBy(col("id"))
  }

  /** Closed-form DuckDB twin of synthesize→stats: the oracle never
    * touches bytes — it recomputes the expected channel means straight
    * from the pixel formula, independently certifying the whole
    * byte-level encode/decode round trip.
    */
  val BmpPixelStatsSql: String = {
    def mean(cb: (Int, Int, Int)) =
      s"CAST(sum((doc_id * ${cb._1} + x * ${cb._2} + y * ${cb._3}) % 256) * 1000 // (w * h) AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id, CAST(doc_id % 4 + 1 AS BIGINT) AS w,
       |         CAST(doc_id % 3 + 1 AS BIGINT) AS h
       |  FROM documents WHERE doc_id >= 0),
       |xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM d),
       |ys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs)
       |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |       ${mean(ChanB)} AS mean_b_permille,
       |       ${mean(ChanG)} AS mean_g_permille,
       |       ${mean(ChanR)} AS mean_r_permille
       |FROM ys GROUP BY doc_id, w, h ORDER BY id""".stripMargin
  }

  /** REAL nearest-neighbor downsample: emits a VALID 24-bit BMP of
    * ceil(w/f) × ceil(h/f) whose pixel (x', y') is source pixel
    * (x'·f, y'·f) — three source bytes copied per output pixel, headers
    * rebuilt for the new dimensions. Still a narrow codegen'd
    * projection; composes with [[decodeMeta]]/[[bmpPixelStats]], which
    * is what makes the pixel pipeline an operator CHAIN rather than a
    * one-off.
    */
  def bmpResize(assets: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1 (got $factor)")
    val p = col("payload")
    // source byte position of output pixel (x', y') channel start:
    // logical source y = y'·f, bottom-up storage row = h − 1 − y
    val pixHex = expr(
      "array_join(transform(sequence(nh - 1, 0, -1), y -> concat(" +
        "array_join(transform(sequence(0, nw - 1), x -> " +
        s"hex(substring(payload, CAST(off + (h - 1 - y * $factor) * stride + x * $factor * 3 + 1 AS INT), 3))" +
        "), ''), repeat('00', cast(nstride - nw * 3 AS INT)))), '')")
    assets
      .filter(isBmp(p))
      .withColumn("w", le(p, 19, 4))
      .withColumn("h", le(p, 23, 4))
      .withColumn("off", le(p, 11, 4))
      .withColumn("stride", expr("(w * 3 + 3) div 4 * 4"))
      .withColumn("nw", expr(s"(w + ${factor - 1}) div $factor"))
      .withColumn("nh", expr(s"(h + ${factor - 1}) div $factor"))
      .withColumn("nstride", expr("(nw * 3 + 3) div 4 * 4"))
      .withColumn(
        "payload",
        concat(
          unhex(lit("424D")),
          le32(lit(54) + col("nstride") * col("nh")),
          le32(lit(0)),
          le32(lit(54)),
          le32(lit(40)),
          le32(col("nw")),
          le32(col("nh")),
          le16(lit(1)),
          le16(lit(24)),
          le32(lit(0)),
          le32(col("nstride") * col("nh")),
          le32(lit(2835)), le32(lit(2835)),
          le32(lit(0)), le32(lit(0)),
          unhex(pixHex)))
      .select(col("id"), col("modality"), col("payload"))
  }

  // ---- REAL sample-level audio compute over canonical PCM WAV -------
  //
  // PCM WAV stores raw little-endian int16 samples, so the audio
  // counterpart of the BMP pixel work is pure byte arithmetic too:
  // synthesis emits a VALID canonical-layout WAV (RIFF → fmt → data,
  // 16-bit) whose every sample follows the closed form
  //   u(id, i) = (id·37 + i·97) mod 65536,  s = u − (u ≥ 2¹⁵ ? 2¹⁶ : 0)
  // and the stats operator reads the samples BACK from the payload
  // bytes — header-parsed offsets, signed LE-16 reads, higher-order
  // folds; no explode, no shuffle, one fixed-width row per clip. The
  // DuckDB oracle recomputes the stats from the formula alone.

  /** Synthesized WAV shape (id-derived, both engines): frames, channels,
    * and rate all vary with the id.
    */
  private def wavFrames(idc: Column): Column = (idc % 50 + 10).cast("long")
  private def wavChannels(idc: Column): Column = (idc % 2 + 1).cast("long")

  /** One valid canonical PCM WAV per document: RIFF header, 16-byte fmt
    * chunk, data chunk of closed-form interleaved int16 LE samples.
    */
  def synthesizeWavAssets(docs: DataFrame): DataFrame = {
    val d = graft.sources.Tables.fanOut(docs) // single-file scan → spread tasks
      .filter(col("doc_id") >= 0) // the synthesizeBmpAssets id contract
      .withColumn("ch", wavChannels(col("doc_id")))
      .withColumn("nf", wavFrames(col("doc_id")))
      .withColumn("ns", col("nf") * col("ch"))
      .withColumn(
        "rate",
        element_at(
          array(lit(8000), lit(16000), lit(22050), lit(44100)),
          (col("doc_id") % 4 + 1).cast("int")))
    // unsigned 16-bit sample value, hex, little-endian byte order
    val samplesHex = expr(
      "array_join(transform(sequence(0, cast(ns - 1 AS INT)), i -> concat(" +
        "substring(lpad(hex(pmod(doc_id * 37 + i * 97, 65536)), 4, '0'), 3, 2), " +
        "substring(lpad(hex(pmod(doc_id * 37 + i * 97, 65536)), 4, '0'), 1, 2))), '')")
    d.select(
      col("doc_id").as("id"),
      lit("audio").as("modality"),
      concat(
        unhex(lit("52494646")), // "RIFF"
        le32(lit(36) + col("ns") * 2), // riff size = 36 + data bytes
        unhex(lit("57415645")), // "WAVE"
        unhex(lit("666D7420")), // "fmt "
        le32(lit(16)),
        le16(lit(1)), // PCM
        le16(col("ch")),
        le32(col("rate")),
        le32(col("rate") * col("ch") * 2), // byte rate
        le16(col("ch") * 2), // block align
        le16(lit(16)), // bits per sample
        unhex(lit("64617461")), // "data"
        le32(col("ns") * 2),
        unhex(samplesHex)).as("payload"))
  }

  /** REAL sample statistics from the payload BYTES: per clip, the
    * sample count, rate and channels from the headers plus Σ|s|,
    * max|s| and Σs² over the actual signed int16 samples — all-integer
    * output, exact on both engines. Contract: canonical-layout PCM WAV
    * (fmt at 13, data at 37, 16-bit), asserted by the filter; the
    * general chunk walk lives in the PNG-style typed-map tier if ever
    * needed.
    */
  def wavAudioStats(assets: DataFrame): DataFrame = {
    val p = col("payload")
    // signed sample i: u = LE16 at 45 + 2i (1-based), s = u - 2^16 if
    // u >= 2^15. The byte decode is materialized ONCE into a samples
    // array; the three statistics then fold over plain longs (the
    // first formulation re-ran the hex/conv chain inside every fold —
    // 12 decodes per sample, 4.6 s at sf0.1; this shape runs ~1 s)
    val uExpr =
      "(CAST(conv(concat(hex(substring(payload, CAST(45 + 2 * i + 1 AS INT), 1)), " +
        "hex(substring(payload, CAST(45 + 2 * i AS INT), 1))), 16, 10) AS BIGINT))"
    def fold(body: String) =
      expr(s"aggregate(samples, 0L, (acc, x) -> $body)")
    assets
      .filter(isWav(p) && hexEq(p, 37, "64617461") && le(p, 35, 2) === 16)
      .withColumn("ns", (le(p, 41, 4) / 2).cast("long"))
      // ns must be positive BEFORE sequence(0, ns-1): Spark's sequence
      // DESCENDS for an empty data chunk (sequence(0,-1) = [0,-1]) and
      // would read header bytes as "samples" — the synthesizeBmpAssets
      // negative-id hazard in sample form. Zero-sample clips are
      // excluded, matching the non-canonical-payload contract.
      .filter(col("ns") > 0)
      .withColumn(
        "samples",
        expr(
          s"transform(transform(sequence(0, cast(ns - 1 AS INT)), i -> $uExpr), " +
            "u -> u - (CASE WHEN u >= 32768 THEN 65536 ELSE 0 END))"))
      .withColumn("sum_abs", fold("acc + abs(x)"))
      .withColumn("peak", fold("greatest(acc, abs(x))"))
      .withColumn("sum_sq", fold("acc + x * x"))
      .select(
        col("id"),
        col("ns").as("n_samples"),
        le(p, 25, 4).cast("int").as("sample_rate"),
        le(p, 23, 2).cast("int").as("channels"),
        col("sum_abs"),
        col("peak"),
        col("sum_sq"))
      .orderBy(col("id"))
  }

  /** REAL audio frame decimation: keep every `factor`-th FRAME (all
    * channels of it), emitting a VALID canonical PCM WAV with the
    * headers rebuilt for the shorter data chunk — the audio analogue of
    * [[bmpResize]], still expression-only byte arithmetic. Composes
    * with [[wavAudioStats]]/[[decodeMeta]], which is what makes the
    * audio path an operator CHAIN rather than a one-off (gate entry
    * `wav_resample_stats` certifies the chain end to end).
    */
  def wavResample(assets: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1 (got $factor)")
    val p = col("payload")
    // source frame j*factor occupies ch*2 bytes at 45 + (j*factor)*ch*2
    val frameHex = expr(
      s"array_join(transform(sequence(0, cast(nf2 - 1 AS INT)), j -> " +
        s"hex(substring(payload, CAST(45 + j * $factor * ch * 2 AS INT), CAST(ch * 2 AS INT)))), '')")
    assets
      .filter(isWav(p) && hexEq(p, 37, "64617461") && le(p, 35, 2) === 16)
      .withColumn("ch", le(p, 23, 2))
      .withColumn("rate", le(p, 25, 4))
      .withColumn("dsize", le(p, 41, 4))
      .withColumn("nf", expr("dsize div 2 div ch"))
      .filter(col("nf") > 0) // same descending-sequence guard as wavAudioStats
      .withColumn("nf2", expr(s"(nf + ${factor - 1}) div $factor"))
      .withColumn(
        "payload",
        concat(
          unhex(lit("52494646")),
          le32(lit(36) + col("nf2") * col("ch") * 2),
          unhex(lit("57415645")),
          unhex(lit("666D7420")),
          le32(lit(16)),
          le16(lit(1)),
          le16(col("ch")),
          le32(col("rate")),
          le32(col("rate") * col("ch") * 2),
          le16(col("ch") * 2),
          le16(lit(16)),
          unhex(lit("64617461")),
          le32(col("nf2") * col("ch") * 2),
          unhex(frameHex)))
      .select(col("id"), col("modality"), col("payload"))
  }

  /** Closed-form DuckDB twin of synthesize→[[wavResample]]→stats: the
    * decimated clip's sample (j, c) is source sample (j·factor)·ch + c.
    */
  def wavResampleStatsSql(factor: Int): String = {
    val s = "(u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END)"
    s"""WITH d AS (
       |  SELECT doc_id, CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
       |         CAST(doc_id % 50 + 10 AS BIGINT) AS nf,
       |         CAST(([8000,16000,22050,44100])[CAST(doc_id % 4 + 1 AS INT)] AS INT) AS rate
       |  FROM documents WHERE doc_id >= 0),
       |f AS (SELECT doc_id, ch, rate, (nf + ${factor - 1}) // $factor AS nf2 FROM d),
       |js AS (SELECT doc_id, ch, rate, nf2,
       |              unnest(generate_series(0, nf2 - 1)) AS j FROM f),
       |cs AS (SELECT doc_id, ch, rate, nf2, j,
       |              unnest(generate_series(0, ch - 1)) AS c FROM js),
       |v AS (SELECT doc_id, ch, rate, nf2,
       |             (doc_id * 37 + (j * $factor * ch + c) * 97) % 65536 AS u
       |      FROM cs)
       |SELECT doc_id AS id, nf2 * ch AS n_samples, rate AS sample_rate,
       |       CAST(ch AS INT) AS channels,
       |       CAST(sum(abs($s)) AS BIGINT) AS sum_abs,
       |       CAST(max(abs($s)) AS BIGINT) AS peak,
       |       CAST(sum($s * $s) AS BIGINT) AS sum_sq
       |FROM v GROUP BY doc_id, nf2, ch, rate ORDER BY id""".stripMargin
  }

  /** Closed-form DuckDB twin of BMP synthesize→[[bmpResize]]→stats:
    * output pixel (x', y') is source pixel (x'·factor, y'·factor).
    */
  def bmpResizeStatsSql(factor: Int): String = {
    def mean(cb: (Int, Int, Int)) =
      s"CAST(sum((doc_id * ${cb._1} + x * $factor * ${cb._2} + y * $factor * ${cb._3}) % 256) * 1000 // (nw * nh) AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id,
       |         (CAST(doc_id % 4 + 1 AS BIGINT) + ${factor - 1}) // $factor AS nw,
       |         (CAST(doc_id % 3 + 1 AS BIGINT) + ${factor - 1}) // $factor AS nh
       |  FROM documents WHERE doc_id >= 0),
       |xs AS (SELECT doc_id, nw, nh, unnest(generate_series(0, nw - 1)) AS x FROM d),
       |ys AS (SELECT doc_id, nw, nh, x, unnest(generate_series(0, nh - 1)) AS y FROM xs)
       |SELECT doc_id AS id, CAST(nw AS INT) AS width, CAST(nh AS INT) AS height,
       |       ${mean(ChanB)} AS mean_b_permille,
       |       ${mean(ChanG)} AS mean_g_permille,
       |       ${mean(ChanR)} AS mean_r_permille
       |FROM ys GROUP BY doc_id, nw, nh ORDER BY id""".stripMargin
  }

  /** Closed-form DuckDB twin of WAV synthesize→stats: the oracle never
    * touches bytes, certifying the byte-level encode/decode round trip
    * (the [[BmpPixelStatsSql]] pattern for audio).
    */
  val WavAudioStatsSql: String = {
    val s = "(u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END)"
    s"""WITH d AS (
       |  SELECT doc_id, CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
       |         CAST(doc_id % 50 + 10 AS BIGINT) AS nf,
       |         CAST(([8000,16000,22050,44100])[CAST(doc_id % 4 + 1 AS INT)] AS INT) AS rate
       |  FROM documents WHERE doc_id >= 0),
       |ss AS (
       |  SELECT doc_id, ch, nf * ch AS ns, rate,
       |         unnest(generate_series(0, nf * ch - 1)) AS i
       |  FROM d),
       |v AS (SELECT doc_id, ch, ns, rate, (doc_id * 37 + i * 97) % 65536 AS u FROM ss)
       |SELECT doc_id AS id, ns AS n_samples, rate AS sample_rate,
       |       CAST(ch AS INT) AS channels,
       |       CAST(sum(abs($s)) AS BIGINT) AS sum_abs,
       |       CAST(max(abs($s)) AS BIGINT) AS peak,
       |       CAST(sum($s * $s) AS BIGINT) AS sum_sq
       |FROM v GROUP BY doc_id, ns, rate, ch ORDER BY id""".stripMargin
  }

  // ---- REAL pixel-level codec for non-interlaced 8-bit RGB PNG ------
  //
  // PNG pixel data is zlib-deflated scanlines, each prefixed by a
  // filter-type byte — everything needed to encode AND decode it ships
  // in the JDK (`java.util.zip.Deflater`/`Inflater`, `CRC32`). The
  // codec runs in a TYPED MAP, not an expression: no Spark builtin can
  // inflate, so this is the sanctioned (c)-before-(d) fallback — still
  // a narrow per-row map, no shuffle, payload never exploded, one
  // fixed-width output row per image. Pixel (x, y) of image `id`
  // carries the SAME closed-form channel values as the BMP family
  // above, so the DuckDB oracle recomputes the expected statistics from
  // the formula while Spark inflates and unfilters actual bytes — two
  // fully independent derivations of the same numbers.

  /** Synthesized PNG dimensions (id-derived; deliberately different
    * moduli from the BMP fixture so the two entries don't share shapes).
    */
  private def pngW(id: Long): Int = (id % 5 + 1).toInt
  private def pngH(id: Long): Int = (id % 4 + 1).toInt

  private def chanVal(id: Long, x: Int, y: Int, cb: (Int, Int, Int)): Int =
    ((id * cb._1 + x * cb._2 + y * cb._3) % 256).toInt

  /** length + type + data + CRC32(type ++ data), per the PNG spec. */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32
    crc.update(t)
    crc.update(data)
    java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
      .array()
  }

  /** One VALID non-interlaced 8-bit RGB PNG: signature, IHDR with real
    * CRC, one zlib IDAT of filter-0 scanlines carrying the closed-form
    * pixels, IEND. `javax.imageio` reads these back bit-exactly
    * (spec-asserted).
    */
  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val w = pngW(id)
    val h = pngH(id)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte) // bit depth
      .put(2.toByte) // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    val raw = new Array[Byte](h * (1 + w * 3))
    var i = 0
    var y = 0
    while (y < h) {
      raw(i) = 0 // filter type None
      i += 1
      var x = 0
      while (x < w) {
        raw(i) = chanVal(id, x, y, ChanR).toByte
        raw(i + 1) = chanVal(id, x, y, ChanG).toByte
        raw(i + 2) = chanVal(id, x, y, ChanB).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) out.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Synthesize one closed-form PNG per document (non-negative ids, the
    * [[synthesizeBmpAssets]] contract).
    */
  def synthesizePngAssets(docs: DataFrame): DataFrame =
    synthesizedWith(docs, "image")(pngBytes)

  /** Chunk-walk + inflate + unfilter one non-interlaced 8-bit RGB PNG:
    * returns (width, height, sumR, sumG, sumB). Handles ALL five
    * standard scanline filters (None/Sub/Up/Average/Paeth) and
    * multi-IDAT streams — certified in-spec against `javax.imageio` on
    * both our fixtures and ImageIO-written files; rejects other color
    * types/depths/interlacing loudly rather than guessing.
    */
  private[graft] def decodePngRgb(p: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val (w, h, img) = decodePngPixels(p)
    var sr = 0L
    var sg = 0L
    var sb = 0L
    var i = 0
    while (i < img.length) {
      sr += img(i)
      sg += img(i + 1)
      sb += img(i + 2)
      i += 3
    }
    (w, h, sr, sg, sb)
  }

  /** The pixel-matrix core of [[decodePngRgb]]: chunk-walk, inflate and
    * unfilter, returning (width, height, row-major RGB ints). Split out
    * so per-pixel consumers ([[ImageHash]]'s perceptual hash) reuse the
    * one certified codec instead of growing a second decode path.
    */
  private[graft] def decodePngPixels(p: Array[Byte]): (Int, Int, Array[Int]) = {
    require(
      p.length > 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte,
      "not a PNG payload")
    var off = 8
    var w = 0
    var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= p.length) {
      val len = java.nio.ByteBuffer.wrap(p, off, 4).getInt
      val typ = new String(p, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          val b = java.nio.ByteBuffer.wrap(p, off + 8, 13)
          w = b.getInt
          h = b.getInt
          val bitDepth = b.get()
          val colorType = b.get()
          b.get() // compression (always 0)
          b.get() // filter method (always 0)
          val interlace = b.get()
          require(
            bitDepth == 8 && colorType == 2 && interlace == 0,
            s"unsupported PNG: depth=$bitDepth colorType=$colorType interlace=$interlace " +
              "(this decoder covers non-interlaced 8-bit RGB)")
        case "IDAT" => idat.write(p, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks: skip
      }
      off += 12 + len
    }
    require(w > 0 && h > 0, "missing IHDR")
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      // needsDictionary would otherwise make inflate return 0 forever
      // (needsInput stays false) — an infinite loop, not a loud reject
      require(!inflater.needsDictionary(), "unsupported PNG: preset-dictionary zlib stream")
      require(n > 0 || !inflater.needsInput(), "truncated IDAT stream")
      got += n
    }
    require(got == raw.length, s"short pixel data: $got of ${raw.length} bytes")
    // a stream inflating BEYOND the expected pixel bytes is a corrupt or
    // wrong-IHDR file — reject rather than silently decode a prefix
    // (one extra inflate call also consumes the stream-end marker)
    val scratch = new Array[Byte](1)
    val surplus = if (inflater.finished()) 0 else inflater.inflate(scratch, 0, 1)
    inflater.end()
    require(surplus == 0, "IDAT inflates beyond the expected pixel data")
    // per-scanline unfilter (PNG spec §9): a=left, b=up, c=up-left,
    // reconstructed bytes feed the next pixel's predictors
    val img = new Array[Int](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xFF
      val rowOff = y * (1 + stride) + 1
      var i = 0
      while (i < stride) {
        val xr = raw(rowOff + i) & 0xFF
        val a = if (i >= 3) img(y * stride + i - 3) else 0
        val b = if (y > 0) img((y - 1) * stride + i) else 0
        val c = if (y > 0 && i >= 3) img((y - 1) * stride + i - 3) else 0
        val rec = ft match {
          case 0 => xr
          case 1 => xr + a
          case 2 => xr + b
          case 3 => xr + (a + b) / 2
          case 4 =>
            val pr = a + b - c
            val pa = math.abs(pr - a)
            val pb = math.abs(pr - b)
            val pc = math.abs(pr - c)
            xr + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case other => throw new IllegalArgumentException(s"bad PNG filter type $other")
        }
        img(y * stride + i) = rec & 0xFF
        i += 1
      }
      y += 1
    }
    (w, h, img)
  }

  /** REAL PNG pixel statistics — same output shape as
    * [[bmpPixelStats]]: per image, each channel's mean in per-mille
    * (integer floor, exact on both engines), dimensions read from IHDR,
    * pixels actually inflated and unfiltered from the payload bytes.
    */
  def pngPixelStats(assets: DataFrame): DataFrame =
    pixelStatsWith(assets)(decodePngRgb)

  /** Closed-form DuckDB twin of PNG synthesize→stats (the
    * [[BmpPixelStatsSql]] pattern with the PNG moduli): the oracle
    * never touches bytes, so Spark's deflate → inflate → unfilter round
    * trip is certified end to end by the hash gate.
    */
  val PngPixelStatsSql: String = {
    def mean(cb: (Int, Int, Int)) =
      s"CAST(sum((doc_id * ${cb._1} + x * ${cb._2} + y * ${cb._3}) % 256) * 1000 // (w * h) AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id, CAST(doc_id % 5 + 1 AS BIGINT) AS w,
       |         CAST(doc_id % 4 + 1 AS BIGINT) AS h
       |  FROM documents WHERE doc_id >= 0),
       |xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM d),
       |ys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs)
       |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |       ${mean(ChanB)} AS mean_b_permille,
       |       ${mean(ChanG)} AS mean_g_permille,
       |       ${mean(ChanR)} AS mean_r_permille
       |FROM ys GROUP BY doc_id, w, h ORDER BY id""".stripMargin
  }

  // ---- REAL lossy-codec tier: baseline JPEG via ImageIO ---------------
  //
  // JPEG is the dominant real-world image format and the one codec in
  // this surface that is LOSSY — decoded samples are NOT the encoded
  // closed-form values, so the PNG/GIF/BMP oracle trick (DuckDB
  // recomputes exact pixel statistics from the formula) cannot apply.
  // Instead this tier uses the sketch_certify pattern: Spark encodes
  // real JPEG bytes (JDK ImageIO writer, quality 1.0), DECODES them
  // back through the full baseline-JPEG pipeline (entropy decode,
  // dequantize, IDCT, level shift — ImageIO's reader, the justified
  // typed-map tier), and CERTIFIES the decoded channel mean against the
  // closed-form source mean within a measured bound; the oracle replays
  // the dimensions exactly and the literal certification. Fixtures are
  // GRAYSCALE (single-component JPEG): chroma subsampling on tiny RGB
  // fixtures costs up to ~24 levels of channel mean — not a decoder
  // bug, the 4:2:0 trade — while the luma path at quality 1.0 stays
  // within 0.12 levels (measured over 3000 ids; floor set 4× above).

  private def jpegW(id: Long): Int = (id % 9 + 4).toInt // distinct moduli from BMP/PNG/GIF
  private def jpegH(id: Long): Int = (id % 7 + 3).toInt

  /** Closed-form grayscale sample, same coefficient family as the RGB
    * fixtures.
    */
  private def grayVal(id: Long, x: Int, y: Int): Int =
    ((id * 7 + x * 3 + y * 19) % 256).toInt

  /** Measured worst-case decoded-vs-source mean gap is 120 (0.12 gray
    * levels, in mean×1000 units); the certification bound is 4× that.
    */
  val JpegMeanTolPermille = 500L

  /** Per-JVM ImageIO setup, triggered from the executor-side codec
    * functions (a driver-side static would not reach real executors):
    * the default `useCache=true` spills EVERY ImageInput/OutputStream
    * to a temp FILE, so each tiny in-memory JPEG paid two /tmp
    * round-trips — measured 4.9–7.0 s → 0.5–1.8 s for the sf0.1
    * certify pass with the memory cache. Byte output is identical
    * (the cache is pure plumbing, not codec state).
    */
  @transient private lazy val imageIoMemoryCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** One real baseline grayscale JPEG per id: JDK ImageIO writer at
    * explicit quality 1.0 (deterministic bytes for a given JDK).
    */
  private[graft] def jpegBytes(id: Long): Array[Byte] = {
    imageIoMemoryCache
    val w = jpegW(id)
    val h = jpegH(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, grayVal(id, x, y)); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  def synthesizeJpegAssets(docs: DataFrame): DataFrame =
    synthesizedWith(docs, "image")(jpegBytes)

  /** Decode one grayscale JPEG: (width, height, sampleSum). Rejects
    * payloads ImageIO cannot decode or that are not single-band.
    */
  private[graft] def decodeJpegGray(p: Array[Byte]): (Int, Int, Long) = {
    imageIoMemoryCache
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    require(img != null, "not a decodable image payload")
    val raster = img.getRaster
    require(raster.getNumBands == 1, s"expected grayscale, got ${raster.getNumBands} bands")
    val w = img.getWidth
    val h = img.getHeight
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, s)
  }

  /** Per-image JPEG round-trip certification: decode the REAL bytes,
    * compare the decoded mean (×1000, integer floor) against the
    * closed-form source mean, certify within [[JpegMeanTolPermille]].
    * Output `(id, width, height, certified)` — the dims come from the
    * DECODED image, so the oracle's closed-form dims + literal TRUE
    * hash-gate the whole encode→decode round trip.
    */
  def jpegPixelCertify(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val (w, h, s) = decodeJpegGray(p)
        val n = w.toLong * h
        var src = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { src += grayVal(id, x, y); x += 1 }
          y += 1
        }
        val ok = math.abs(s * 1000 / n - src * 1000 / n) <= JpegMeanTolPermille
        (id, w, h, ok)
      }
      .toDF("id", "width", "height", "certified")
      .orderBy(col("id"))
  }

  /** DuckDB twin: closed-form dimensions + the literal certification
    * (the sketch_certify shape — the oracle cannot replay a lossy
    * codec, so it pins what IS exact and the certification bit).
    */
  val JpegPixelCertifySql: String =
    """SELECT doc_id AS id, CAST(doc_id % 9 + 4 AS INT) AS width,
      |       CAST(doc_id % 7 + 3 AS INT) AS height, TRUE AS certified
      |FROM documents WHERE doc_id >= 0 ORDER BY id""".stripMargin

  // ---- video: RIFF/AVI container, REAL byte-level frame sampling ----

  /** RIFF....'AVI ' with the hdrl LIST leading. */
  private def isAvi(p: Column): Column =
    hexEq(p, 1, "52494646") && hexEq(p, 9, "41564920") && hexEq(p, 13, "4C495354")

  /** Synthesized AVI shape (id-derived, closed-form on both engines):
    * tiny uncompressed 8-bit-gray frames so the movi chunk's pixel
    * bytes are raw and the frame sampler below can be REAL without a
    * codec library (the BMP argument, one dimension up).
    */
  private def aviW(idc: Column): Column = (idc % 4 + 2).cast("long")
  private def aviH(idc: Column): Column = (idc % 3 + 2).cast("long")
  private def aviFrames(idc: Column): Column = (idc % 6 + 2).cast("long")

  /** One spec-correct minimal AVI per document: RIFF header, hdrl LIST
    * with the 56-byte avih main header (dwTotalFrames / dwWidth /
    * dwHeight carried for real), movi LIST of `00db` uncompressed
    * frame chunks whose pixel byte (f, i) is
    * `(id·31 + f·17 + i·7) mod 256`. Layout is fixed (hdrl at 13, movi
    * LIST at 89, first frame chunk at 101), so every field the decoder
    * reads sits at a closed-form offset — the canonical-layout contract
    * every other container here uses.
    */
  def synthesizeAviAssets(docs: DataFrame): DataFrame = {
    val d = graft.sources.Tables.fanOut(docs)
      .filter(col("doc_id") >= 0) // the synthesizeBmpAssets id contract
      .withColumn("w", aviW(col("doc_id")))
      .withColumn("h", aviH(col("doc_id")))
      .withColumn("nf", aviFrames(col("doc_id")))
      .withColumn("wh", col("w") * col("h"))
    // all frame chunks, concatenated: '00db' + le32(wh) + wh gray bytes
    val framesHex = expr(
      "array_join(transform(sequence(0, cast(nf - 1 AS INT)), f -> concat(" +
        "'30306462', " + // '00db'
        "concat(substring(lpad(hex(wh), 8, '0'), 7, 2), substring(lpad(hex(wh), 8, '0'), 5, 2), " +
        "substring(lpad(hex(wh), 8, '0'), 3, 2), substring(lpad(hex(wh), 8, '0'), 1, 2)), " +
        "array_join(transform(sequence(0, cast(wh - 1 AS INT)), " +
        "i -> lpad(hex(pmod(doc_id * 31 + f * 17 + i * 7, 256)), 2, '0')), ''))), '')")
    d.select(
      col("doc_id").as("id"),
      lit("video").as("modality"),
      concat(
        unhex(lit("52494646")), // "RIFF"
        le32(lit(92) + col("nf") * (col("wh") + 8)), // total - 8
        unhex(lit("41564920")), // "AVI "
        unhex(lit("4C495354")), // "LIST"
        le32(lit(68)),
        unhex(lit("6864726C")), // "hdrl"
        unhex(lit("61766968")), // "avih"
        le32(lit(56)),
        le32(lit(33333)), // dwMicroSecPerFrame (~30 fps)
        le32(lit(0)), // dwMaxBytesPerSec
        le32(lit(0)), // dwPaddingGranularity
        le32(lit(0)), // dwFlags
        le32(col("nf")), // dwTotalFrames
        le32(lit(0)), // dwInitialFrames
        le32(lit(1)), // dwStreams
        le32(col("wh")), // dwSuggestedBufferSize
        le32(col("w")), // dwWidth
        le32(col("h")), // dwHeight
        unhex(lit("00" * 16)), // reserved[4]
        unhex(lit("4C495354")), // "LIST"
        le32(lit(4) + col("nf") * (col("wh") + 8)),
        unhex(lit("6D6F7669")), // "movi"
        unhex(framesHex)).as("payload"))
  }

  /** REAL strided frame sampling from the payload BYTES — the
    * video-pipeline primitive (decode every `stride`-th frame, skip the
    * rest): dimensions and frame count parsed from the avih header,
    * sampled frames' pixel bytes read from their movi chunks, per-clip
    * luminance statistics folded over plain longs. All-integer output,
    * exact on both engines. Contract: canonical layout (first `00db`
    * chunk at 101), asserted by the filter.
    */
  def aviFrameStats(assets: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1 (got $stride)")
    val p = col("payload")
    // pixel i (0-based) of frame f lives at 109 + f*(wh+8) + i (1-based)
    val pxExpr =
      "CAST(conv(hex(substring(payload, CAST(109 + j * " + stride + " * (wh + 8) + i AS INT), 1)), 16, 10) AS BIGINT)"
    def fold(body: String) =
      expr(s"aggregate(lum, 0L, (acc, x) -> $body)")
    assets
      .filter(isAvi(p) && hexEq(p, 97, "6D6F7669") && hexEq(p, 101, "30306462"))
      .withColumn("w", le(p, 65, 4).cast("long"))
      .withColumn("h", le(p, 69, 4).cast("long"))
      .withColumn("wh", col("w") * col("h"))
      .withColumn("nf", le(p, 49, 4).cast("long"))
      .filter(col("nf") > 0 && col("wh") > 0) // descending-sequence guard
      .withColumn("nf2", expr(s"(nf + ${stride - 1}) div $stride"))
      .withColumn(
        "lum",
        expr(
          s"flatten(transform(sequence(0, cast(nf2 - 1 AS INT)), j -> " +
            s"transform(sequence(0, cast(wh - 1 AS INT)), i -> $pxExpr)))"))
      .withColumn("sum_lum", fold("acc + x"))
      .withColumn("peak_lum", fold("greatest(acc, x)"))
      .select(
        col("id"),
        col("w").cast("int").as("width"),
        col("h").cast("int").as("height"),
        col("nf").as("n_frames"),
        col("nf2").as("n_sampled"),
        col("sum_lum"),
        col("peak_lum"))
      .orderBy(col("id"))
  }

  /** Closed-form DuckDB twin of synthesize→[[aviFrameStats]]: sampled
    * frame j is source frame j·stride; pixel i of it is
    * `(id·31 + j·stride·17 + i·7) mod 256`.
    */
  def aviFrameStatsSql(stride: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id AS id, doc_id % 4 + 2 AS w, doc_id % 3 + 2 AS h,
       |         doc_id % 6 + 2 AS nf
       |  FROM documents WHERE doc_id >= 0),
       |e AS (SELECT id, w, h, nf, (nf + ${stride - 1}) // $stride AS nf2 FROM d),
       |j AS (SELECT id, w, h, nf, nf2, unnest(range(0, nf2)) AS jj FROM e),
       |px AS (SELECT id, w, h, nf, nf2, jj, unnest(range(0, w * h)) AS i FROM j),
       |v AS (
       |  SELECT id, w, h, nf, nf2,
       |         (id * 31 + jj * $stride * 17 + i * 7) % 256 AS g
       |  FROM px)
       |SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |       CAST(nf AS BIGINT) AS n_frames, CAST(nf2 AS BIGINT) AS n_sampled,
       |       CAST(sum(g) AS BIGINT) AS sum_lum, CAST(max(g) AS BIGINT) AS peak_lum
       |FROM v GROUP BY id, w, h, nf, nf2
       |ORDER BY id""".stripMargin

  /** STUB frame sampling: every `stride`-th byte of the payload as a
    * "frame" id list (a real implementation samples decoded frames).
    * Bounded output per row — safe to explode downstream.
    */
  def frameSample(assets: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    assets.withColumn(
      "frames",
      expr(
        s"transform(slice(sequence(1, greatest(int(length(payload)), 1), $stride), 1, $maxFrames), " +
          s"i -> ascii(substring(string(payload), i, 1)))"))

  /** STUB resize: byte-subsample the payload by `factor` (a real
    * implementation rescales decoded pixels). Output is again a binary
    * payload with the same schema, so resize composes with decode/
    * frame-sample — the operator CHAIN is what the plumbing proves.
    */
  def resize(assets: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1 (got $factor)")
    assets.withColumn(
      "payload",
      expr(
        s"encode(array_join(transform(sequence(1, greatest(int(length(payload)), 1), $factor), " +
          s"i -> substring(string(payload), i, 1)), ''), 'UTF-8')"))
  }
}
