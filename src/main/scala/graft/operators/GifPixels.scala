package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL pixel-level compute for GIF — the third container family after
  * BMP (raw bytes, expression tier) and PNG (deflate, Inflater tier):
  * GIF image data is LZW-compressed index streams over a color table,
  * and LZW is plain integer/bit arithmetic — a full GENERAL decoder
  * (growing code table to the 12-bit cap, the KwKwK code==next case,
  * clear/end codes, sub-block framing, extension skipping, local color
  * tables) is a page of JVM code with zero dependencies. Like the PNG
  * codec it runs in a typed map (no builtin can LZW-decode); synthesis
  * + stats follow the closed-form certification pattern: Spark decodes
  * actual bytes, the DuckDB oracle recomputes the expected channel
  * means from the pixel/palette formulas alone (GIF87a, global
  * 256-color table, non-interlaced).
  *
  * Pixel (x, y) of image `id` carries palette INDEX
  * `(id·13 + x·7 + y·11) mod 256`; palette entry j is
  * `(r, g, b) = (j, (j·3+17) mod 256, (j·7+29) mod 256)`.
  */
object GifPixels {

  private def gifW(id: Long): Int = (id % 6 + 1).toInt
  private def gifH(id: Long): Int = (id % 5 + 1).toInt
  private def palR(j: Int): Int = j
  private def palG(j: Int): Int = (j * 3 + 17) % 256
  private def palB(j: Int): Int = (j * 7 + 29) % 256
  private def pixIdx(id: Long, x: Int, y: Int): Int = ((id * 13 + x * 7 + y * 11) % 256).toInt

  /** LSB-first bit writer for the LZW code stream. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      cur |= code << nBits
      nBits += width
      while (nBits >= 8) {
        out.write(cur & 0xFF)
        cur >>>= 8
        nBits -= 8
      }
    }
    def bytes(): Array[Byte] = {
      if (nBits > 0) { out.write(cur & 0xFF); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** One valid GIF87a: logical screen descriptor, global 256-color
    * table from the palette formula, one non-interlaced image, and a
    * SPEC-MINIMAL LZW stream (a clear code before every literal, so the
    * code table never grows and every code is minCode+1 bits — valid
    * per the spec, trivially correct; the general-compression decode
    * path is certified in-spec against ImageIO-WRITTEN files instead).
    * `javax.imageio` reads these back bit-exactly (spec-asserted).
    */
  private[graft] def gifBytes(id: Long): Array[Byte] = {
    val w = gifW(id)
    val h = gifH(id)
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF87a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16(w); le16(h)
    out.write(0xF7) // GCT present, 8 bits/channel, 256 entries
    out.write(0) // background color index
    out.write(0) // no aspect ratio
    (0 until 256).foreach { j => out.write(palR(j)); out.write(palG(j)); out.write(palB(j)) }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0) // no local table, not interlaced
    val minCode = 8
    out.write(minCode)
    val clear = 1 << minCode
    val bw = new BitWriter
    bw.write(clear, minCode + 1)
    for (y <- 0 until h; x <- 0 until w) {
      bw.write(pixIdx(id, x, y), minCode + 1)
      bw.write(clear, minCode + 1) // keep the table empty: width stays minCode+1
    }
    bw.write(clear + 1, minCode + 1) // end of information
    val data = bw.bytes()
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Synthesize one closed-form GIF per document (non-negative ids). */
  def synthesizeGifAssets(docs: DataFrame): DataFrame =
    Multimodal.synthesizedWith(docs, "image")(gifBytes)

  /** GENERAL GIF LZW decode of the first image: returns (width, height,
    * sumR, sumG, sumB) over the palette-mapped pixels. Rejects
    * interlaced or malformed streams loudly rather than guessing.
    */
  private[graft] def decodeGifRgb(p: Array[Byte]): (Int, Int, Long, Long, Long) = {
    def u(i: Int): Int = p(i) & 0xFF
    def le16At(i: Int): Int = u(i) | (u(i + 1) << 8)
    require(
      p.length > 13 && p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte,
      "not a GIF payload")
    var off = 10 // signature + logical screen w/h (image descriptor is authoritative)
    val flags = u(off); off += 3
    var palette: Array[Int] = null // packed 0xRRGGBB
    if ((flags & 0x80) != 0) {
      val n = 1 << ((flags & 7) + 1)
      palette =
        Array.tabulate(n)(j => (u(off + 3 * j) << 16) | (u(off + 3 * j + 1) << 8) | u(off + 3 * j + 2))
      off += 3 * n
    }
    while (u(off) == 0x21) { // extension blocks: label + sub-blocks
      off += 2
      while (u(off) != 0) off += 1 + u(off)
      off += 1
    }
    require(u(off) == 0x2C, f"expected image descriptor, got 0x${u(off)}%02X")
    val w = le16At(off + 5)
    val h = le16At(off + 7)
    require(w > 0 && h > 0, s"empty GIF dimensions ${w}x$h") // ÷0 guard in the stats shape
    val iflags = u(off + 9)
    off += 10
    // interlace (0x40, and ImageIO's writer emits it by default) only
    // PERMUTES row order across its 4 passes — the index multiset is
    // unchanged, so the channel SUMS this decoder returns are exact
    // either way; a position-returning variant would reorder rows by
    // the 8/8/4/2 pass schedule here
    if ((iflags & 0x80) != 0) { // local color table overrides
      val n = 1 << ((iflags & 7) + 1)
      palette =
        Array.tabulate(n)(j => (u(off + 3 * j) << 16) | (u(off + 3 * j + 1) << 8) | u(off + 3 * j + 2))
      off += 3 * n
    }
    require(palette != null, "no color table")
    val minCode = u(off); off += 1
    val data = new java.io.ByteArrayOutputStream() // concatenate sub-blocks
    while (u(off) != 0) {
      val n = u(off)
      data.write(p, off + 1, n)
      off += 1 + n
    }
    val bytes = data.toByteArray

    // ---- general LZW (GIF variant, LSB-first) ----
    val clear = 1 << minCode
    val end = clear + 1
    val MaxCodes = 4096
    val prefix = new Array[Int](MaxCodes)
    val tailB = new Array[Int](MaxCodes)
    val len = new Array[Int](MaxCodes)
    (0 until clear).foreach { c => prefix(c) = -1; tailB(c) = c; len(c) = 1 }
    var next = 0
    var width = 0
    def resetTable(): Unit = { next = end + 1; width = minCode + 1 }
    def firstByte(code: Int): Int = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      tailB(c)
    }
    val idx = new Array[Int](w * h)
    var nOut = 0
    var bitPos = 0
    def read(w0: Int): Int = {
      if ((bitPos + w0 - 1) >> 3 >= bytes.length) return end // truncated: stop
      var v = 0
      var got = 0
      while (got < w0) {
        val b = bitPos >> 3
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, w0 - got)
        v |= (((bytes(b) & 0xFF) >> (bitPos & 7)) & ((1 << take) - 1)) << got
        got += take
        bitPos += take
      }
      v
    }
    def emit(code: Int): Unit = {
      val l = len(code)
      require(nOut + l <= idx.length, s"LZW output exceeds $w x $h pixels")
      var i = nOut + l - 1
      var c = code
      while (c >= 0) { idx(i) = tailB(c); i -= 1; c = prefix(c) }
      nOut += l
    }
    var prev = -1
    resetTable()
    var done = false
    while (!done && nOut < idx.length) {
      val code = read(width)
      if (code == end) done = true
      else if (code == clear) { resetTable(); prev = -1 }
      else if (prev == -1) {
        require(code < clear, s"first code after clear must be a literal, got $code")
        emit(code)
        prev = code
      } else {
        require(code <= next && next <= MaxCodes, s"code $code beyond table (next=$next)")
        if (code < next) {
          emit(code)
          if (next < MaxCodes) {
            prefix(next) = prev; tailB(next) = firstByte(code); len(next) = len(prev) + 1
            next += 1
          }
        } else { // KwKwK: expansion = expansion(prev) ++ firstByte(prev)
          require(next < MaxCodes, "KwKwK with a full table")
          prefix(next) = prev; tailB(next) = firstByte(prev); len(next) = len(prev) + 1
          next += 1
          emit(next - 1)
        }
        if (width < 12 && next == (1 << width)) width += 1
        prev = code
      }
    }
    require(nOut == idx.length, s"decoded $nOut of ${idx.length} pixels")

    var sr = 0L; var sg = 0L; var sb = 0L
    idx.foreach { j =>
      require(j < palette.length, s"index $j beyond ${palette.length}-color table")
      val rgb = palette(j)
      sr += (rgb >> 16) & 0xFF
      sg += (rgb >> 8) & 0xFF
      sb += rgb & 0xFF
    }
    (w, h, sr, sg, sb)
  }

  /** REAL GIF pixel statistics — the [[Multimodal.bmpPixelStats]] shape:
    * per image, each channel's mean in per-mille over the LZW-decoded,
    * palette-mapped pixels.
    */
  def gifPixelStats(assets: DataFrame): DataFrame =
    Multimodal.pixelStatsWith(assets)(decodeGifRgb)

  /** Closed-form DuckDB twin of GIF synthesize→stats. */
  val GifPixelStatsSql: String = {
    val j = "(doc_id * 13 + x * 7 + y * 11) % 256"
    def mean(chan: String) = s"CAST(sum($chan) * 1000 // (w * h) AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id, CAST(doc_id % 6 + 1 AS BIGINT) AS w,
       |         CAST(doc_id % 5 + 1 AS BIGINT) AS h
       |  FROM documents WHERE doc_id >= 0),
       |xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM d),
       |ys AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
       |px AS (SELECT doc_id, w, h, $j AS j FROM ys)
       |SELECT doc_id AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |       ${mean("(j * 7 + 29) % 256")} AS mean_b_permille,
       |       ${mean("(j * 3 + 17) % 256")} AS mean_g_permille,
       |       ${mean("j")} AS mean_r_permille
       |FROM px GROUP BY doc_id, w, h ORDER BY id""".stripMargin
  }
}
