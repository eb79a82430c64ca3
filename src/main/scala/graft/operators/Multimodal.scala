package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side plumbing (schema, batched processing shape,
  * partition-friendly derivations) is real and tested; the actual codec
  * step is STUBBED — this container has no image/audio libraries, so
  * `decodeMeta` derives deterministic pseudo-metadata from the bytes
  * where a real implementation would parse the media header. The stub
  * is confined to `decodeMeta`/`frameSample` internals; swapping in a
  * real decoder changes no schema or call site.
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
      StructField("height", IntegerType))), nullable = true)))

  /** Wrap the documents table as a multimodal asset table (text bytes
    * as the payload — the plumbing is payload-agnostic).
    */
  def assets(docs: DataFrame, modality: String = "text"): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      lit(modality).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * A real decoder would parse the media container header here; the
    * derivation below (size + first-byte-seeded dimensions) stands in
    * so the schema/plumbing can be exercised and tested end-to-end.
    */
  def decodeMeta(assets: DataFrame): DataFrame =
    assets
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("digest", sha2(col("payload"), 256))
      .withColumn("fmt", concat(col("modality"), lit("/raw")))
      // STUB dimension derivation (header parse goes here):
      .withColumn("width", (crc32(col("payload")) % 1920).cast("int"))
      .withColumn("height", (crc32(col("payload")) % 1080).cast("int"))
      .withColumn(
        "meta",
        struct(col("n_bytes"), col("fmt"), col("width"), col("height")))
      .select(col("id"), col("modality"), col("payload"), col("meta"), col("digest"))

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
