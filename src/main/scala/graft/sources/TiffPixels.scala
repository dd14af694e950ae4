package graft.sources

/** REAL pixel decode for classic TIFF (TIFF 6.0 spec): little-endian
  * header, first-IFD tag walk, strip assembly, and — the compressed face —
  * PackBits (the spec's §9 byte-oriented RLE), completing the container
  * family: BMP raw rows (x33), PNG deflate+filters (x70), GIF LZW (x71),
  * JPEG DCT (x80), and now the dominant scanned-document/legacy-raster
  * container. Scope: II byte order, 8-bit RGB chunky (PhotometricInterpretation
  * 2, SamplesPerPixel 3, BitsPerSample 8,8,8), Compression 1 (none) or
  * 32773 (PackBits), strip-organized. Structural lies ⇒ None, the sibling
  * discipline: wrong magic/bits/photometric, out-of-bounds strips, a
  * PackBits stream that over/under-runs its declared byte count or
  * produces the wrong number of bytes for its strip, all quarantine.
  *
  * The x163 oracle replays the fixture's pixel formula through the shared
  * 8×8 resample/checksum contract ([[BmpPixels.checksum]]'s arithmetic),
  * proving IFD walk + strip math + PackBits without touching a byte;
  * TiffPixelsSpec additionally pins both compressions against the JDK's
  * own ImageIO TIFF plugin (JDK 9+), the PNG-conformance discipline.
  */
object TiffPixels {

  private def u16le(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** one IFD entry's values as Longs (SHORT or LONG, inline or at offset) */
  private def values(b: Array[Byte], typ: Int, count: Long, at: Int): Option[IndexedSeq[Long]] = {
    val sz = typ match { case 3 => 2; case 4 => 4; case _ => return None }
    if (count < 0 || count > (1L << 20)) return None
    val total = sz * count
    val base =
      if (total <= 4) at // inline in the value field
      else {
        val ofs = u32le(b, at)
        if (ofs + total > b.length) return None
        ofs.toInt
      }
    if (base + total > b.length) return None
    Some(
      (0 until count.toInt).map(i => if (sz == 2) u16le(b, base + 2 * i).toLong else u32le(b, base + 4 * i))
    )
  }

  /** Decode PackBits into exactly `expect` bytes consuming exactly
    * `len` input bytes — anything else is a structural lie. */
  private[sources] def unpackBits(b: Array[Byte], ofs: Int, len: Int, expect: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expect)
    var i = ofs; var o = 0
    val end = ofs + len
    while (i < end && o < expect) {
      val n = b(i); i += 1
      if (n >= 0) { // literal run of n+1
        if (i + n + 1 > end || o + n + 1 > expect) return None
        System.arraycopy(b, i, out, o, n + 1); i += n + 1; o += n + 1
      } else if (n != -128) { // repeat next byte 1-n times
        if (i >= end || o + (1 - n) > expect) return None
        java.util.Arrays.fill(out, o, o + 1 - n, b(i)); i += 1; o += 1 - n
      } // -128: no-op
    }
    if (i == end && o == expect) Some(out) else None
  }

  /** Decoded image in the shared [[BmpPixels.Image]] shape (top-down). */
  def decode(b: Array[Byte]): Option[BmpPixels.Image] = {
    if (b.length < 8 || b(0) != 'I'.toByte || b(1) != 'I'.toByte || u16le(b, 2) != 42) return None
    val ifd = u32le(b, 4)
    if (ifd + 2 > b.length) return None
    val n = u16le(b, ifd.toInt)
    if (ifd + 2 + n * 12 + 4 > b.length) return None
    var w = -1L; var h = -1L; var comp = 1L; var photo = -1L; var spp = 1L; var rps = Long.MaxValue
    var bits: IndexedSeq[Long] = IndexedSeq(1L)
    var offsets: IndexedSeq[Long] = IndexedSeq.empty
    var counts: IndexedSeq[Long] = IndexedSeq.empty
    for (e <- 0 until n) {
      val at = ifd.toInt + 2 + e * 12
      val tag = u16le(b, at); val typ = u16le(b, at + 2); val cnt = u32le(b, at + 4)
      def vs: Option[IndexedSeq[Long]] = values(b, typ, cnt, at + 8)
      def v1: Option[Long] = vs.flatMap(_.headOption)
      tag match {
        case 256 => w = v1.getOrElse(return None)
        case 257 => h = v1.getOrElse(return None)
        case 258 => bits = vs.getOrElse(return None)
        case 259 => comp = v1.getOrElse(return None)
        case 262 => photo = v1.getOrElse(return None)
        case 273 => offsets = vs.getOrElse(return None)
        case 277 => spp = v1.getOrElse(return None)
        case 278 => rps = v1.getOrElse(return None)
        case 279 => counts = vs.getOrElse(return None)
        case _   => () // unknown tags are legal; skip
      }
    }
    if (w <= 0 || h <= 0 || w > (1L << 16) || h > (1L << 16)) return None
    if (photo != 2 || spp != 3 || !(bits.length == 3 && bits.forall(_ == 8L))) return None
    if (comp != 1 && comp != 32773) return None
    if (rps <= 0) return None
    val rpsN = math.min(rps, h) // a huge RowsPerStrip means one strip; also keeps h+rps-1 overflow-free
    val nStrips = ((h + rpsN - 1) / rpsN).toInt
    if (offsets.length != nStrips || counts.length != nStrips) return None
    val wi = w.toInt; val hi = h.toInt
    val out = new Array[Byte](wi * hi * 3)
    var strip = 0
    while (strip < nStrips) {
      val rows = math.min(rpsN, h - strip * rpsN).toInt
      val expect = rows * wi * 3
      val ofs = offsets(strip); val len = counts(strip)
      if (ofs < 0 || len < 0 || ofs + len > b.length) return None
      val data =
        if (comp == 1) {
          if (len != expect) return None
          java.util.Arrays.copyOfRange(b, ofs.toInt, (ofs + len).toInt)
        } else unpackBits(b, ofs.toInt, len.toInt, expect).getOrElse(return None)
      System.arraycopy(data, 0, out, (strip * rpsN).toInt * wi * 3, expect)
      strip += 1
    }
    Some(
      BmpPixels.Image(
        wi,
        hi,
        (x, y) => {
          val o = (y * wi + x) * 3
          ((out(o) & 0xff, out(o + 1) & 0xff, out(o + 2) & 0xff))
        }
      )
    )
  }

  /** compression tag of a decodable payload ("none" / "packbits") —
    * surfaced so the gate pins the dispatch, not just the pixels */
  def compressionOf(b: Array[Byte]): Option[String] = {
    if (b.length < 8 || b(0) != 'I'.toByte || b(1) != 'I'.toByte || u16le(b, 2) != 42) return None
    val ifd = u32le(b, 4)
    if (ifd + 2 > b.length) return None
    val n = u16le(b, ifd.toInt)
    (0 until n)
      .map(e => ifd.toInt + 2 + e * 12)
      .find(at => u16le(b, at) == 259)
      .map(at => u32le(b, at + 8) match { case 32773 => "packbits"; case _ => "none" })
      .orElse(Some("none"))
  }

  // ------------------------------------------------------------- writer
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** straightforward PackBits encoder: repeat runs ≥ 3 as repeats, else
    * literals (any valid encoding decodes identically — the decoder is
    * what the gate proves) */
  private[sources] def packBits(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < row.length) {
      var run = 1
      while (i + run < row.length && row(i + run) == row(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(1 - run); out.write(row(i)); i += run
      } else {
        var lit = i + run
        var r2 = 1
        while (lit < row.length && r2 < 3 && lit - i < 128) {
          r2 = 1
          while (lit + r2 < row.length && row(lit + r2) == row(lit) && r2 < 128) r2 += 1
          if (r2 < 3) lit += r2
        }
        // the scan can overshoot the 128 boundary by one r2<3 step — cap
        val litLen = math.min(math.min(lit, row.length) - i, 128)
        out.write(litLen - 1)
        out.write(row, i, litLen)
        i += litLen
      }
    }
    out.toByteArray
  }

  /** Spec-valid classic TIFF (II, 8-bit RGB chunky, 8-row strips) whose
    * pixel (x, y) carries `rgbAt(x, y)`; PackBits-compressed per strip
    * when `pack` — fixture-vs-parser discipline. */
  def synthesize(w: Int, h: Int, rgbAt: (Int, Int) => (Int, Int, Int), pack: Boolean): Array[Byte] = {
    val rps = 8
    val nStrips = (h + rps - 1) / rps
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val raw = new Array[Byte](rows * w * 3)
      for (ry <- 0 until rows; x <- 0 until w) {
        val (r, g, bl) = rgbAt(x, s * rps + ry)
        val o = (ry * w + x) * 3
        raw(o) = r.toByte; raw(o + 1) = g.toByte; raw(o + 2) = bl.toByte
      }
      if (pack) packBits(raw) else raw
    }
    val nTags = 9
    val ifdOfs = 8
    val ifdSize = 2 + nTags * 12 + 4
    val bitsOfs = ifdOfs + ifdSize
    val offArrOfs = bitsOfs + 6
    val cntArrOfs = offArrOfs + (if (nStrips > 1) 4 * nStrips else 0)
    val dataOfs = cntArrOfs + (if (nStrips > 1) 4 * nStrips else 0)
    val stripOfs = strips.scanLeft(dataOfs.toLong)((a, s) => a + s.length).init
    def entry(tag: Int, typ: Int, count: Long, value: Long): Array[Byte] =
      le16(tag) ++ le16(typ) ++ le32(count) ++ le32(value)
    val entries =
      entry(256, 4, 1, w.toLong) ++
        entry(257, 4, 1, h.toLong) ++
        entry(258, 3, 3, bitsOfs.toLong) ++
        entry(259, 3, 1, if (pack) 32773L else 1L) ++
        entry(262, 3, 1, 2L) ++
        entry(273, 4, nStrips.toLong, if (nStrips > 1) offArrOfs.toLong else stripOfs.head) ++
        entry(277, 3, 1, 3L) ++
        entry(278, 4, 1, rps.toLong) ++
        entry(279, 4, nStrips.toLong, if (nStrips > 1) cntArrOfs.toLong else strips.head.length.toLong)
    val header = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(ifdOfs.toLong)
    val ifd = le16(nTags) ++ entries ++ le32(0L)
    val bitsArr = le16(8) ++ le16(8) ++ le16(8)
    val offArr = if (nStrips > 1) stripOfs.flatMap(le32(_)).toArray else Array.emptyByteArray
    val cntArr = if (nStrips > 1) strips.flatMap(s => le32(s.length.toLong)).toArray else Array.emptyByteArray
    header ++ ifd ++ bitsArr ++ offArr ++ cntArr ++ strips.flatten.toArray
  }
}

/** Fixture for the x163 gate: 250 classic TIFFs (even ids uncompressed,
  * odd PackBits) whose pixels follow a closed-form formula — the BMP/PNG
  * pattern; alternating-run columns make PackBits repeat AND literal
  * paths load-bearing. */
object TiffFixture {
  val dir = "/root/repo/spark-warehouse/graft_tiff"
  val payloadPath = s"$dir/payloads"
  val twinPath = s"$dir/twin"

  /** pixel formula — mirrored verbatim in the x163 oracle SQL; the
    * x div 4 term creates 4-wide horizontal runs so PackBits repeats
    * actually occur (a pure per-pixel formula would be all literals) */
  def rgbAt(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 5 + (x / 4) * 7 + y * 3) % 256).toInt,
    ((id * 3 + (x / 4) * 2 + y * 11) % 256).toInt,
    ((id * 17 + (x / 4) + y * 7) % 256).toInt
  )

  def rows: Seq[(Long, Array[Byte], Int, Int, String)] = (0 until 250).map { i =>
    val w = 6 + (i * 7) % 40
    val h = 5 + (i * 11) % 30
    val pack = i % 2 == 1
    (i.toLong, TiffPixels.synthesize(w, h, rgbAt(i.toLong), pack), w, h, if (pack) "packbits" else "none")
  }

  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!new java.io.File(twinPath).exists()) {
      new java.io.File(dir).mkdirs()
      import spark.implicits._
      val r = rows
      r.map { case (id, p, _, _, _) => (id, p) }
        .toDF("img_id", "payload")
        .coalesce(1).write.mode("overwrite").parquet(payloadPath)
      r.map { case (id, _, w, h, c) => (id, w, h, c) }
        .toDF("img_id", "width", "height", "compression")
        .coalesce(1).write.mode("overwrite").parquet(twinPath)
    }
  }
}
