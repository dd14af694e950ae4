package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL pixel decode for PNG (truecolor, 8-bit) — pure JDK, no codec
  * library: the compressed IDAT stream is zlib/deflate, which
  * `java.util.zip.Inflater` handles, and the rest of the format is byte
  * arithmetic from the public spec (RFC 2083 / W3C PNG): chunk walk with
  * CRC32 verification, then per-scanline unfiltering through the five
  * filter types (None/Sub/Up/Average/Paeth). This moves PNG from the
  * "compressed ⇒ stubbed" family into the real-decode family alongside BMP
  * (x33), WAV PCM (x34) and rawvideo (x35): the x70 gate query decodes
  * writer-emitted PNGs and checksums/aHashes the pixels, and the DuckDB
  * oracle recomputes both from the fixture's closed-form pixel formula —
  * it never parses a byte of PNG, so a hash match proves signature →
  * chunk walk → inflate → unfilter → resample end-to-end.
  *
  * Scope: bit depth 8, color type 2 (RGB), non-interlaced — the dominant
  * lossless-web shape. Anything else (palette, alpha, 16-bit, Adam7)
  * returns None: quarantine, never a thrown task. All offsets are
  * bounds-checked against the payload (untrusted executor-side bytes —
  * the same discipline as [[ImageMeta]]/[[BmpPixels]]).
  *
  * Conformance is pinned two independent ways (PngPixelsSpec): the JDK's
  * own ImageIO PNG reader decodes [[synthesize]]'s output to the same
  * pixels (writer validity), and this decoder agrees with ImageIO on
  * every fixture payload (reader validity).
  */
object PngPixels {

  private val Signature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    * the linear estimate a + b - c, ties broken a, then b. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode an 8-bit truecolor non-interlaced PNG; None for anything else
    * (including any CRC mismatch — corrupt payloads quarantine cleanly). */
  def decode(b: Array[Byte]): Option[BmpPixels.Image] = {
    if (b.length < 8 + 25 || !Signature.indices.forall(i => b(i) == Signature(i))) return None
    var o = 8
    var w = 0; var h = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new CRC32
    while (!seenIend) {
      if (o + 8 > b.length) return None
      val len = u32be(b, o)
      // chunk length is a u31 by spec; also guard the window against the payload
      if (len > Int.MaxValue - 12 || o + 12 + len > b.length) return None
      val n = len.toInt
      val typ = new String(b, o + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(b, o + 4, 4 + n)
      if (crc.getValue != u32be(b, o + 8 + n)) return None
      typ match {
        case "IHDR" =>
          if (n != 13 || seenIhdr) return None
          seenIhdr = true
          val wL = u32be(b, o + 8); val hL = u32be(b, o + 12)
          val bitDepth = b(o + 16) & 0xff; val colorType = b(o + 17) & 0xff
          val compression = b(o + 18) & 0xff; val filterMethod = b(o + 19) & 0xff
          val interlace = b(o + 20) & 0xff
          if (bitDepth != 8 || colorType != 2 || compression != 0 || filterMethod != 0 || interlace != 0)
            return None
          // cap total raw size so a crafted header can't allocate unboundedly:
          // h * (1 + 3w) must fit an Int (also rejects w/h = 0 or > 2^24)
          if (wL <= 0 || hL <= 0 || wL > (1 << 24) || hL > (1 << 24) || hL * (1 + 3 * wL) > Int.MaxValue)
            return None
          w = wL.toInt; h = hL.toInt
        case "IDAT" => if (!seenIhdr) return None else idat.write(b, o + 8, n)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) are skippable by design
      }
      o += 12 + n
    }
    if (!seenIhdr) return None
    val stride = 3 * w
    val rawLen = h * (1 + stride)
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < rawLen && !inf.finished()) {
        val k = inf.inflate(raw, got, rawLen - got)
        // k == 0 without progress: truncated stream (needsInput) or a
        // zlib FDICT preset-dictionary header (needsDictionary — inflate
        // would return 0 forever; PNG forbids FDICT, so quarantine)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += k
      }
      // exact-size contract: the stream must produce every scanline byte
      // and nothing more (a trailing byte means the header lied)
      if (got != rawLen || inf.inflate(new Array[Byte](1)) != 0) return None
    } catch { case _: java.util.zip.DataFormatException => return None } finally inf.end()
    // unfilter in place into a flat pixel buffer: recon(x) per spec §6,
    // with left/up/up-left = 0 beyond the image edge
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      if (f > 4) return None
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val filt = raw(rowIn + x) & 0xff
        val a = if (x >= 3) px(rowOut + x - 3) & 0xff else 0
        val up = if (y > 0) px(rowOut - stride + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) px(rowOut - stride + x - 3) & 0xff else 0
        val recon = f match {
          case 0 => filt
          case 1 => filt + a
          case 2 => filt + up
          case 3 => filt + ((a + up) >> 1)
          case 4 => filt + paeth(a, up, c)
        }
        px(rowOut + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    Some(BmpPixels.Image(w, h, (x, y0) => {
      val p = y0 * stride + x * 3
      ((px(p) & 0xff, px(p + 1) & 0xff, px(p + 2) & 0xff))
    }))
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(t); crc.update(data)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }

  /** Spec-valid 8-bit RGB PNG whose pixel (x, y) carries `rgbAt(x, y)`,
    * scanline y filtered with type `filterAt(y)` (0–4) — the FORWARD
    * filter transform, a separate code path from [[decode]]'s inverse
    * (fixture-vs-parser discipline, as [[BmpPixels.synthesize]]). The
    * compressed stream is split across multiple IDAT chunks so the
    * decoder's concatenation path is always exercised. */
  def synthesize(
      w: Int,
      h: Int,
      rgbAt: (Int, Int) => (Int, Int, Int),
      filterAt: Int => Int = _ % 5
  ): Array[Byte] = {
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    for (y <- 0 until h) {
      for (x <- 0 until w) {
        val (r, g, b) = rgbAt(x, y)
        cur(x * 3) = r; cur(x * 3 + 1) = g; cur(x * 3 + 2) = b
      }
      val f = filterAt(y) % 5
      raw(y * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val a = if (x >= 3) cur(x - 3) else 0
        val up = if (y > 0) prev(x) else 0
        val c = if (x >= 3 && y > 0) prev(x - 3) else 0
        val out = f match {
          case 0 => cur(x)
          case 1 => cur(x) - a
          case 2 => cur(x) - up
          case 3 => cur(x) - ((a + up) >> 1)
          case 4 => cur(x) - paeth(a, up, c)
        }
        raw(y * (1 + stride) + 1 + x) = (out & 0xff).toByte
      }
      System.arraycopy(cur, 0, prev, 0, stride)
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](raw.length + 64)
    val outBytes = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) outBytes.write(buf, 0, def_.deflate(buf))
    def_.end()
    val compressed = outBytes.toByteArray
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++ Array[Byte](8, 2, 0, 0, 0)
    val idats = compressed.grouped(800).map(g => chunk("IDAT", g)).reduce(_ ++ _)
    Signature ++ chunk("IHDR", ihdr) ++ idats ++ chunk("IEND", Array.empty[Byte])
  }
}

/** Fixture for the x70 real-PNG gate query: 250 PNGs whose pixel values
  * follow a closed-form formula of (img_id, x, y) — exactly what lets the
  * DuckDB oracle recompute the decoded, resampled checksum AND the aHash
  * from first principles without parsing a byte of PNG. Scanline filters
  * cycle through all five types with a per-image phase, so the whole
  * unfilter surface is load-bearing for the gate hash. */
object PngFixture {
  val dir = "/root/repo/spark-warehouse/graft_png"
  val payloadPath = s"$dir/payloads"
  val twinPath = s"$dir/twin"

  /** pixel formula — mirrored verbatim in the x70 oracle SQL */
  def rgbAt(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 5 + x * 7 + y * 3) % 256).toInt,
    ((id * 9 + x * 2 + y * 5) % 256).toInt,
    ((id * 3 + x * 4 + y * 7) % 256).toInt
  )

  def rows: Seq[(Long, Array[Byte], Int, Int)] = (0 until 250).map { i =>
    val w = 5 + (i * 7) % 40
    val h = 4 + (i * 11) % 32
    (i.toLong, PngPixels.synthesize(w, h, rgbAt(i.toLong), y => (y + i) % 5), w, h)
  }

  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!new java.io.File(twinPath).exists()) {
      new java.io.File(dir).mkdirs()
      import spark.implicits._
      val r = rows
      r.map { case (id, p, _, _) => (id, p) }
        .toDF("img_id", "payload")
        .coalesce(1).write.mode("overwrite").parquet(payloadPath)
      r.map { case (id, _, w, h) => (id, w, h) }
        .toDF("img_id", "width", "height")
        .coalesce(1).write.mode("overwrite").parquet(twinPath)
    }
  }
}
