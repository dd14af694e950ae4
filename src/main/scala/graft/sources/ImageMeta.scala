package graft.sources

/** Real image-container metadata extraction — no codec libraries needed:
  * PNG, JPEG, GIF and BMP all carry their pixel dimensions in documented
  * fixed header structures (PNG IHDR chunk, JPEG SOFn marker segment, GIF
  * logical screen descriptor, BMP BITMAPINFOHEADER), so format + width +
  * height parse from the first few hundred bytes without decompressing a
  * single pixel. This is exactly the cheap first pass a 100 TB multimodal
  * pipeline runs over every payload (routing, sanity filters, aspect-ratio
  * stats) before any expensive decode.
  *
  * [[synthesize]] builds minimal spec-valid containers (correct magic,
  * header structure and PNG chunk CRCs, dummy pixel data) for fixtures —
  * deliberately a separate code path from [[parse]] so the gate's
  * parser-vs-twin comparison exercises real byte-level parsing, not a
  * shared helper.
  */
object ImageMeta {

  final case class Meta(format: String, width: Int, height: Int)

  private def u16be(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u16le(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse container metadata; None for unrecognized/truncated payloads. */
  def parse(b: Array[Byte]): Option[Meta] = {
    if (b.length >= 24 && b.take(8).sameElements(PngSig) && new String(b, 12, 4, "US-ASCII") == "IHDR")
      Some(Meta("image/png", u32be(b, 16).toInt, u32be(b, 20).toInt))
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) jpegSof(b)
    else if (b.length >= 10 && (new String(b, 0, 6, "US-ASCII") == "GIF87a" || new String(b, 0, 6, "US-ASCII") == "GIF89a"))
      Some(Meta("image/gif", u16le(b, 6), u16le(b, 8)))
    else if (b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
      Some(Meta("image/bmp", i32le(b, 18), math.abs(i32le(b, 22)))) // height may be negative (top-down rows)
    else None
  }

  /** Walk JPEG marker segments to the first SOFn (baseline/progressive
    * frame header): [precision u8][height u16be][width u16be]. */
  private def jpegSof(b: Array[Byte]): Option[Meta] = {
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None // marker misalignment
      val m = b(i + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone markers, no length
      else if (m == 0xd9 || m == 0xda) return None // EOI / start-of-scan before any SOF
      else {
        val len = u16be(b, i + 2)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) { // SOFn
          if (i + 9 > b.length) return None
          return Some(Meta("image/jpeg", u16be(b, i + 7), u16be(b, i + 5)))
        }
        i += 2 + len
      }
    }
    None
  }

  // ---- fixture synthesis ---------------------------------------------------

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32(); c.update(b); c.getValue
  }
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Minimal spec-valid container of the given format and dimensions with
    * `junk` dummy body bytes (deterministic from the seed). */
  def synthesize(format: String, w: Int, h: Int, junk: Int, seed: Int): Array[Byte] = {
    val body = Array.tabulate(junk)(k => ((seed * 31 + k * 7) % 251).toByte)
    format match {
      case "image/png" =>
        val ihdrData = be32(w.toLong) ++ be32(h.toLong) ++ Array[Byte](8, 2, 0, 0, 0) // 8-bit RGB
        val ihdr = "IHDR".getBytes("US-ASCII") ++ ihdrData
        val idat = "IDAT".getBytes("US-ASCII") ++ body
        val iend = "IEND".getBytes("US-ASCII")
        PngSig ++
          be32(ihdrData.length.toLong) ++ ihdr ++ be32(crc32(ihdr)) ++
          be32(body.length.toLong) ++ idat ++ be32(crc32(idat)) ++
          be32(0L) ++ iend ++ be32(crc32(iend))
      case "image/jpeg" =>
        val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
          "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
        val sofData = Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
        val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(2 + sofData.length) ++ sofData
        Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ sof0 ++
          Array(0xff, 0xda).map(_.toByte) ++ be16(8) ++ body ++ Array(0xff, 0xd9).map(_.toByte)
      case "image/gif" =>
        "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0) ++ body ++ Array(0x3b.toByte)
      case "image/bmp" =>
        val pixelOfs = 14 + 40
        "BM".getBytes("US-ASCII") ++ le32(pixelOfs + body.length) ++ le32(0) ++ le32(pixelOfs) ++
          le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0) ++ le32(body.length) ++
          le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ body
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }
  }
}
