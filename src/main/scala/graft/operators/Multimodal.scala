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
  * PIXEL-level work (full decode, resize, frame extraction) remains
  * STUBBED — this container has no image/audio libraries. The stubs are
  * confined to the non-matching-format branch of `decodeMeta` and to
  * `frameSample`/`resize` internals; swapping in a real decoder changes
  * no schema or call site.
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

  /** Metadata decode. PNG/GIF/WAV headers are parsed for real (see
    * object doc); any other payload takes the STUB branch (deterministic
    * crc-seeded pseudo-dimensions standing in for a full codec).
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
          .when(isWav(p), lit("audio/wav"))
          .otherwise(concat(col("modality"), lit("/raw"))))
      .withColumn(
        "width",
        when(isPng(p), be(p, 17, 4)) // IHDR width, bytes 16..19 (0-based)
          .when(isGif(p), le(p, 7, 2)) // logical screen width
          .when(isWav(p), lit(null))
          // STUB branch (full codec would go here)
          .otherwise(crc32(p) % 1920)
          .cast("int"))
      .withColumn(
        "height",
        when(isPng(p), be(p, 21, 4)) // IHDR height, bytes 20..23
          .when(isGif(p), le(p, 9, 2))
          .when(isWav(p), lit(null))
          .otherwise(crc32(p) % 1080) // STUB branch
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
