package graft.functions

import java.lang.Long.rotateLeft
import java.nio.charset.StandardCharsets

/** Independent pure-Scala XXH64 (64-bit xxHash), written from the public
  * xxHash specification (github.com/Cyan4973/xxHash, XXH64 algorithm).
  *
  * Purpose: generate DuckDB oracles for pipelines built on Spark's
  * `xxhash64` function, which DuckDB cannot evaluate. Spark's
  * `xxhash64(c1, c2, …)` chains per-column hashes starting from seed 42
  * (each column's hash seeds the next); the helpers at the bottom
  * reproduce that chaining for the column-type combinations the dedup
  * pipeline uses. Equivalence with Spark's implementation is asserted
  * over randomized inputs in XxHashRefSpec — this file deliberately does
  * NOT call any Spark code, otherwise it would be no oracle at all.
  */
object XxHash64Ref {

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  val SparkSeed = 42L

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  /** XXH64 of a 4-byte int (Spark hashes IntegerType this way). */
  def hashInt(i: Int, seed: Long): Long = {
    var hash = seed + P5 + 4L
    hash ^= (i & 0xFFFFFFFFL) * P1
    hash = rotateLeft(hash, 23) * P2 + P3
    fmix(hash)
  }

  /** XXH64 of an 8-byte long (Spark hashes LongType this way). */
  def hashLong(l: Long, seed: Long): Long = {
    var hash = seed + P5 + 8L
    hash ^= rotateLeft(l * P2, 31) * P1
    hash = rotateLeft(hash, 27) * P1 + P4
    fmix(hash)
  }

  private def getLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) |
      ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) |
      ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  private def getInt(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  /** XXH64 of a byte array (little-endian word reads, per the spec —
    * Spark hashes StringType over its UTF-8 bytes this way).
    */
  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    val length = bytes.length
    var offset = 0
    var hash =
      if (length >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        val limit = length - 32
        while (offset <= limit) {
          v1 = rotateLeft(v1 + getLong(bytes, offset) * P2, 31) * P1
          v2 = rotateLeft(v2 + getLong(bytes, offset + 8) * P2, 31) * P1
          v3 = rotateLeft(v3 + getLong(bytes, offset + 16) * P2, 31) * P1
          v4 = rotateLeft(v4 + getLong(bytes, offset + 24) * P2, 31) * P1
          offset += 32
        }
        var h = rotateLeft(v1, 1) + rotateLeft(v2, 7) + rotateLeft(v3, 12) + rotateLeft(v4, 18)
        def merge(hh: Long, v: Long): Long =
          (hh ^ (rotateLeft(v * P2, 31) * P1)) * P1 + P4
        h = merge(h, v1)
        h = merge(h, v2)
        h = merge(h, v3)
        merge(h, v4)
      } else seed + P5
    hash += length
    while (offset + 8 <= length) {
      hash ^= rotateLeft(getLong(bytes, offset) * P2, 31) * P1
      hash = rotateLeft(hash, 27) * P1 + P4
      offset += 8
    }
    if (offset + 4 <= length) {
      hash ^= getInt(bytes, offset) * P1
      hash = rotateLeft(hash, 23) * P2 + P3
      offset += 4
    }
    while (offset < length) {
      hash ^= (bytes(offset) & 0xFFL) * P5
      hash = rotateLeft(hash, 11) * P1
      offset += 1
    }
    fmix(hash)
  }

  // ---- Spark `xxhash64(...)` chaining equivalents --------------------

  /** == Spark `xxhash64(lit(i), col(s))`. */
  def sparkIntString(i: Int, s: String): Long =
    hashBytes(s.getBytes(StandardCharsets.UTF_8), hashInt(i, SparkSeed))

  /** == Spark `xxhash64(lit(b), m0, m1, …)` over long columns. */
  def sparkIntLongs(b: Int, ms: Seq[Long]): Long =
    ms.foldLeft(hashInt(b, SparkSeed))((h, m) => hashLong(m, h))

  /** == Spark `xxhash64(c0, c1, …)` over long columns (seed 42, each
    * column's hash seeding the next — same chaining as above without
    * the leading int literal).
    */
  def sparkLongs(ms: Seq[Long]): Long =
    ms.foldLeft(SparkSeed)((h, m) => hashLong(m, h))

  /** == Spark `xxhash64(col)` over one string column. */
  def sparkString(s: String): Long =
    hashBytes(s.getBytes(StandardCharsets.UTF_8), SparkSeed)
}
