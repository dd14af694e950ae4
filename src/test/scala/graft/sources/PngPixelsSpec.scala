package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class PngPixelsSpec extends AnyFunSuite {

  private val formula = (x: Int, y: Int) => ((x * 40 + y) % 256, (y * 30 + x) % 256, (x + y * 7) % 256)

  test("synthesize → decode round-trips every pixel through every filter type") {
    // one fixed filter per image exercises each unfilter branch in
    // isolation; the cycling default exercises their interaction
    for (f <- 0 to 4; (w, h) <- Seq((5, 7), (1, 4), (16, 3))) {
      val img = PngPixels.decode(PngPixels.synthesize(w, h, formula, _ => f)).get
      assert(img.width === w && img.height === h)
      for (x <- 0 until w; y <- 0 until h)
        assert(img.rgb(x, y) === formula(x, y), s"pixel ($x,$y) of ${w}x$h filter $f")
    }
    val img = PngPixels.decode(PngPixels.synthesize(13, 11, formula)).get
    for (x <- 0 until 13; y <- 0 until 11) assert(img.rgb(x, y) === formula(x, y))
  }

  test("writer conformance: the JDK's own ImageIO PNG reader agrees on every pixel") {
    // independent-decoder pin (the pandas.read_sas pattern): ImageIO's PNG
    // plugin decodes our writer's output to the same pixels, proving the
    // emitted bytes are spec-valid PNG, not merely self-consistent
    val (w, h) = (23, 17)
    val bytes = PngPixels.synthesize(w, h, formula)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref.getWidth === w && ref.getHeight === h)
    for (x <- 0 until w; y <- 0 until h) {
      val argb = ref.getRGB(x, y)
      val got = ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      assert(got === formula(x, y), s"ImageIO pixel ($x,$y)")
    }
  }

  test("reader conformance: this decoder agrees with ImageIO on every fixture payload") {
    for ((id, bytes, w, h) <- PngFixture.rows.take(40)) {
      val ours = PngPixels.decode(bytes).get
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ours.width === w && ref.getWidth === w && ours.height === h && ref.getHeight === h)
      for (x <- 0 until w; y <- 0 until h) {
        val argb = ref.getRGB(x, y)
        assert(ours.rgb(x, y) === (((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)), s"img $id ($x,$y)")
      }
    }
  }

  test("x278 toggle twins: scratch and JDK IDAT compressors yield pixel-identical files; ImageIO reads both") {
    val f = (x: Int, y: Int) => ((x * 19 + y * 5) % 256, (x * 3 + y * 23) % 256, (x * 7 + y * 11) % 256)
    val a = PngPixels.synthesize(23, 17, f) // scratch (default)
    PngPixels.useScratchDeflate = false
    val b =
      try PngPixels.synthesize(23, 17, f)
      finally PngPixels.useScratchDeflate = true
    for (img <- Seq(a, b)) {
      val ours = PngPixels.decode(img).get
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
      for (x <- 0 until 23; y <- 0 until 17) {
        assert(ours.rgb(x, y) === f(x, y))
        val argb = ref.getRGB(x, y)
        assert((((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)) === f(x, y))
      }
    }
  }

  test("IDAT split across chunks is reassembled (large image forces multiple chunks)") {
    val (w, h) = (64, 64) // raw ≈ 12 KiB ⇒ several 800-byte IDAT chunks
    val bytes = PngPixels.synthesize(w, h, formula)
    val img = PngPixels.decode(bytes).get
    for (x <- Seq(0, 31, 63); y <- Seq(0, 31, 63)) assert(img.rgb(x, y) === formula(x, y))
  }

  test("rejects corrupt and out-of-scope payloads (quarantine, never a throw)") {
    val ok = PngPixels.synthesize(8, 6, formula)
    assert(PngPixels.decode("not a png at all".getBytes) === None)
    assert(PngPixels.decode(ok.take(20)) === None) // truncated mid-IHDR
    assert(PngPixels.decode(ok.dropRight(15)) === None) // truncated: IEND gone
    // flip one IDAT byte: CRC verification must catch it
    val corrupt = ok.clone()
    corrupt(8 + 25 + 12) = (corrupt(8 + 25 + 12) ^ 0x40).toByte
    assert(PngPixels.decode(corrupt) === None)
    // grayscale (color type 0) is out of scope → None, not garbage pixels
    val gray = ok.clone(); gray(8 + 8 + 9) = 0
    assert(PngPixels.decode(gray) === None) // (CRC now wrong too — either guard suffices)
    // crafted IHDR dims that would overflow the raw-size Int must be rejected
    assert(PngPixels.decode(ImageMeta.synthesize("image/png", 1 << 25, 1 << 25, junk = 4, seed = 7)) === None)
  }

  test("zlib FDICT preset-dictionary header quarantines instead of hanging") {
    // PNG forbids FDICT, but a crafted payload can set it: inflate() then
    // returns 0 forever with needsDictionary() true — the decode loop must
    // bail to None, not spin. Build a spec-shaped PNG whose IDAT is a
    // valid-CRC chunk holding an FDICT zlib header (0x78 0xBB + 4 dict-id
    // bytes): 0x78BB % 31 == 0, so the header itself is well-formed.
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]) = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be32(2L) ++ be32(2L) ++ Array[Byte](8, 2, 0, 0, 0)
    val fdictIdat = Array(0x78.toByte, 0xbb.toByte, 1.toByte, 2.toByte, 3.toByte, 4.toByte)
    val crafted = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", fdictIdat) ++ chunk("IEND", Array.empty[Byte])
    assert(PngPixels.decode(crafted) === None)
  }

  test("palette: synthesize → decode round-trips the PLTE lookup; ImageIO agrees") {
    val pal = (0 until 19).map(j => ((j * 13) % 256, (j * 7 + 5) % 256, (j * 3 + 11) % 256))
    val idx = (x: Int, y: Int) => (x * 5 + y * 3) % pal.size
    for (f <- 0 to 4) {
      val bytes = PngPixels.synthesizePalette(9, 7, pal, idx, _ => f)
      val img = PngPixels.decode(bytes).get
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (x <- 0 until 9; y <- 0 until 7) {
        assert(img.rgb(x, y) === pal(idx(x, y)), s"palette ($x,$y) filter $f")
        val argb = ref.getRGB(x, y)
        assert(img.rgb(x, y) === (((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)), s"ImageIO ($x,$y)")
      }
    }
  }

  test("RGBA: white-composite matches ImageIO's alpha channel composited the same way") {
    val rgba = (x: Int, y: Int) => ((x * 31 + y) % 256, (y * 17 + x) % 256, (x * 3 + y * 5) % 256, (x * 23 + y * 9) % 256)
    val bytes = PngPixels.synthesizeRgba(11, 8, rgba)
    val img = PngPixels.decode(bytes).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    def over(a: Int, c: Int) = (a * c + (255 - a) * 255) / 255
    for (x <- 0 until 11; y <- 0 until 8) {
      val (r, g, b, a) = rgba(x, y)
      assert(img.rgb(x, y) === ((over(a, r), over(a, g), over(a, b))), s"composite ($x,$y)")
      // ImageIO keeps the channels; composite ITS values identically
      val argb = ref.getRGB(x, y)
      val (ia, ir, ig, ib) = ((argb >>> 24) & 0xff, (argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      assert((ia, ir, ig, ib) === ((a, r, g, b)), s"ImageIO channels ($x,$y)")
    }
  }

  test("palette/alpha structural lies quarantine: bad index, missing PLTE, tRNS") {
    val pal = (0 until 8).map(j => (j, j, j))
    val ok = PngPixels.synthesizePalette(6, 5, pal, (x, y) => (x + y) % pal.size)
    assert(PngPixels.decode(ok).isDefined)
    // index 200 with an 8-entry palette: the writer encodes it happily,
    // the decoder must reject it eagerly
    assert(PngPixels.decode(PngPixels.synthesizePalette(6, 5, pal, (_, _) => 200)) === None)
    // strip the PLTE chunk (it sits right after IHDR: 8 sig + 25 ihdr,
    // PLTE total = 12 + 24 bytes): indexed without a palette is a lie
    val noPlte = ok.take(8 + 25) ++ ok.drop(8 + 25 + 12 + pal.size * 3)
    assert(PngPixels.decode(noPlte) === None)
    // a tRNS chunk (palette transparency) is out of scope and must
    // quarantine rather than decode opaque
    def chunk(typ: String, data: Array[Byte]) = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      Array(((data.length >> 24) & 0xff).toByte, ((data.length >> 16) & 0xff).toByte,
        ((data.length >> 8) & 0xff).toByte, (data.length & 0xff).toByte) ++ t ++ data ++
        Array(((crc.getValue >> 24) & 0xff).toByte, ((crc.getValue >> 16) & 0xff).toByte,
          ((crc.getValue >> 8) & 0xff).toByte, (crc.getValue & 0xff).toByte)
    }
    val insertAt = 8 + 25 + 12 + pal.size * 3 // right after PLTE
    // a VALID palette tRNS now decodes (x144) — entry 0's alpha 0x7f
    // composites over white, other entries stay opaque
    val withTrns = ok.take(insertAt) ++ chunk("tRNS", Array[Byte](0x7f)) ++ ok.drop(insertAt)
    val timg = PngPixels.decode(withTrns).get
    def over(a: Int, c: Int) = (a * c + (255 - a) * 255) / 255
    for (x <- 0 until 6; y <- 0 until 5) {
      val j = (x + y) % pal.size
      val a = if (j == 0) 0x7f else 255
      assert(timg.rgb(x, y) === ((over(a, j), over(a, j), over(a, j))), s"tRNS ($x,$y)")
    }
    // still-quarantined tRNS shapes: longer than the palette; a keyed
    // tRNS on truecolor of the WRONG length (x230 accepts exactly 6)
    val tooLong = ok.take(insertAt) ++ chunk("tRNS", Array.fill[Byte](pal.size + 1)(0x10)) ++ ok.drop(insertAt)
    assert(PngPixels.decode(tooLong) === None)
    val rgbBytes = PngPixels.synthesize(6, 5, (x, y) => (x, y, x + y))
    val rgbTrnsShort = rgbBytes.take(8 + 25) ++ chunk("tRNS", Array[Byte](0, 1, 0, 2)) ++ rgbBytes.drop(8 + 25)
    assert(PngPixels.decode(rgbTrnsShort) === None)
    // ... while a spec-length keyed tRNS on truecolor now DECODES (x230):
    // exactly pixel (1,2) of this fixture matches the (1,2,3) key
    val rgbTrns = rgbBytes.take(8 + 25) ++ chunk("tRNS", Array[Byte](0, 1, 0, 2, 0, 3)) ++ rgbBytes.drop(8 + 25)
    val keyed = PngPixels.decode(rgbTrns).get
    for (x <- 0 until 6; y <- 0 until 5)
      assert(keyed.rgb(x, y) === (if ((x, y, x + y) == ((1, 2, 3))) ((255, 255, 255)) else ((x, y, x + y))))
    // a key sample that does not FIT the 8-bit depth (nonzero high byte)
    // is spec-invalid (§11.3.2) and quarantines — it must not decode
    // fully-opaque by silently never matching (advice-found)
    val rgbBadKey = rgbBytes.take(8 + 25) ++ chunk("tRNS", Array[Byte](1, 1, 0, 2, 0, 3)) ++ rgbBytes.drop(8 + 25)
    assert(PngPixels.decode(rgbBadKey) === None)
    val grayBytes = PngPixels.synthesizeGray(6, 5, (x, y) => x * 16 + y)
    val grayBadKey = grayBytes.take(8 + 25) ++ chunk("tRNS", Array[Byte](2, 7)) ++ grayBytes.drop(8 + 25)
    assert(PngPixels.decode(grayBadKey) === None)
  }

  test("tRNS: prefix alpha composites over white; ImageIO channels agree; opaque past the prefix") {
    val pal = (0 until 21).map(j => ((j * 13 + 2) % 256, (j * 7 + 5) % 256, (j * 3 + 11) % 256))
    val alpha = Seq(0, 64, 128, 200, 255) // prefix of 5; entries 5..20 opaque
    val idx = (x: Int, y: Int) => (x * 5 + y * 3) % pal.size
    val bytes = PngPixels.synthesizePalette(9, 7, pal, idx, trnsAlpha = alpha)
    val img = PngPixels.decode(bytes).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    def over(a: Int, c: Int) = (a * c + (255 - a) * 255) / 255
    for (x <- 0 until 9; y <- 0 until 7) {
      val j = idx(x, y)
      val a = if (j < alpha.size) alpha(j) else 255
      val (r, g, b) = pal(j)
      assert(img.rgb(x, y) === ((over(a, r), over(a, g), over(a, b))), s"composite ($x,$y)")
      // ImageIO carries the palette channels + alpha; compare raw channels
      val argb = ref.getRGB(x, y)
      assert((((argb >>> 24) & 0xff, (argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)) === ((a, r, g, b)),
        s"ImageIO channels ($x,$y)")
    }
  }

  test("x100 fixture: every color type decodes to its composed formula") {
    for ((id, bytes, w, h, ctype) <- PngExtFixture.rows.take(30)) {
      val img = PngPixels.decode(bytes).get
      assert(img.width === w && img.height === h)
      def over(a: Int, c: Int) = (a * c + (255 - a) * 255) / 255
      for (x <- Seq(0, w / 2, w - 1); y <- Seq(0, h / 2, h - 1)) {
        val expected = ctype match {
          case 3 => PngExtFixture.palAt(id)(PngExtFixture.idxAt(id)(x, y))
          case 6 =>
            val (r, g, b, a) = PngExtFixture.rgbaAt(id)(x, y)
            (over(a, r), over(a, g), over(a, b))
          case _ => PngFixture.rgbAt(id)(x, y)
        }
        assert(img.rgb(x, y) === expected, s"img $id ctype $ctype ($x,$y)")
      }
    }
  }

  test("gate fixture: decoded checksum and aHash equal the first-principles formula") {
    for ((id, bytes, w, h) <- PngFixture.rows.take(25)) {
      val img = PngPixels.decode(bytes).get
      assert(img.width === w && img.height === h)
      val tile = BmpPixels.resizeNearest(img, 8, 8)
      // expected from the closed-form formula + the same floor resize map
      val expected = for (j <- 0 until 8; i <- 0 until 8)
        yield PngFixture.rgbAt(id)(i * w / 8, j * h / 8)
      assert(tile === expected, s"img $id")
      assert(BmpPixels.checksum(tile) === BmpPixels.checksum(expected))
    }
  }

  test("Adam7: interlaced decode equals the sequential pixels; ImageIO agrees (x146)") {
    // sizes straddling the 8x8 pass grid: tiny (some passes empty), odd, larger
    for ((w, h) <- Seq((1, 1), (3, 2), (7, 5), (8, 8), (9, 7), (20, 13))) {
      val formula = (x: Int, y: Int) => ((x * 31 + y * 7) % 256, (y * 17 + x * 3) % 256, (x * 5 + y * 13) % 256)
      val bytes = PngPixels.synthesizeInterlaced(w, h, formula)
      val img = PngPixels.decode(bytes).get
      assert(img.width === w && img.height === h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (x <- 0 until w; y <- 0 until h) {
        assert(img.rgb(x, y) === formula(x, y), s"($w x $h) pixel ($x,$y)")
        val argb = ref.getRGB(x, y)
        assert(img.rgb(x, y) === (((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)), s"ImageIO ($x,$y)")
      }
    }
  }

  test("grayscale: decode replicates the channel; ImageIO agrees (x146)") {
    val gray = (x: Int, y: Int) => (x * 29 + y * 11) % 256
    val bytes = PngPixels.synthesizeGray(10, 6, gray)
    val img = PngPixels.decode(bytes).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (x <- 0 until 10; y <- 0 until 6) {
      val g = gray(x, y)
      assert(img.rgb(x, y) === ((g, g, g)), s"gray ($x,$y)")
      // compare RAW raster samples: getRGB would run TYPE_BYTE_GRAY
      // through Java's linear-gray → sRGB conversion (11 becomes 59),
      // while the PNG sample itself IS the gray value per spec
      assert(ref.getRaster.getSample(x, y, 0) === g, s"ImageIO raster ($x,$y)")
    }
  }

  test("gray+alpha: white composite; ImageIO raster carries both channels (x168)") {
    val ga = PngDepthFixture.gaAt(5L) _
    val bytes = PngPixels.synthesizeGrayAlpha(11, 7, ga)
    val img = PngPixels.decode(bytes).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (x <- 0 until 11; y <- 0 until 7) {
      val (g, a) = ga(x, y)
      val v = (a * g + (255 - a) * 255) / 255
      assert(img.rgb(x, y) === ((v, v, v)), s"composite ($x,$y)")
      // raster comparison avoids the gray→sRGB getRGB conversion
      assert(ref.getRaster.getSample(x, y, 0) === g, s"gray raster ($x,$y)")
      assert(ref.getRaster.getSample(x, y, 1) === a, s"alpha raster ($x,$y)")
    }
  }

  test("16-bit gray and RGB: big-endian samples, rounded reduction; ImageIO raster agrees (x168)") {
    def red16(s: Int) = (s * 255 + 32767) / 65535
    val g16 = PngDepthFixture.g16At(4L) _
    val gb = PngPixels.synthesizeGray16(9, 6, g16)
    val gi = PngPixels.decode(gb).get
    val gr = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb))
    for (x <- 0 until 9; y <- 0 until 6) {
      val s = g16(x, y)
      assert(gi.rgb(x, y) === ((red16(s), red16(s), red16(s))), s"gray16 ($x,$y)")
      // the 16-bit raster sample must survive EXACTLY — stronger than
      // any 8-bit comparison, and immune to color-model conversions
      assert(gr.getRaster.getSample(x, y, 0) === s, s"gray16 raster ($x,$y)")
    }
    val c16 = PngDepthFixture.rgb16At(8L) _
    val cb = PngPixels.synthesizeRgb16(8, 5, c16)
    val ci = PngPixels.decode(cb).get
    val cr = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
    for (x <- 0 until 8; y <- 0 until 5) {
      val (r, g, b) = c16(x, y)
      assert(ci.rgb(x, y) === ((red16(r), red16(g), red16(b))), s"rgb16 ($x,$y)")
      assert(cr.getRaster.getSample(x, y, 0) === r, s"r16 raster ($x,$y)")
      assert(cr.getRaster.getSample(x, y, 1) === g, s"g16 raster ($x,$y)")
      assert(cr.getRaster.getSample(x, y, 2) === b, s"b16 raster ($x,$y)")
    }
  }

  test("16-bit relabeling of an 8-bit body still quarantines (raw-size contract, x230)") {
    // take a valid 8-bit RGBA payload and relabel its IHDR depth to 16
    // (CRC refreshed): the TYPE is now in scope (x230), but the channel
    // byte count doubles and the inflate exact-size contract breaks —
    // the decoder must return None, never truncated pixels
    val rgba = PngPixels.synthesizeRgba(6, 4, (x, y) => (x, y, x + y, 200))
    val patched = rgba.clone()
    patched(24) = 16
    val crc = new java.util.zip.CRC32
    crc.update(patched, 12, 17) // type + 13 IHDR data bytes
    val v = crc.getValue
    patched(29) = ((v >> 24) & 0xff).toByte
    patched(30) = ((v >> 16) & 0xff).toByte
    patched(31) = ((v >> 8) & 0xff).toByte
    patched(32) = (v & 0xff).toByte
    assert(PngPixels.decode(patched).isEmpty, "undersized 16-bit body accepted")
    assert(PngPixels.kindOf(patched) === Some("rgba16"), "header dispatch labels the claimed kind")
    // 16-bit indexed stays out: spec-invalid combination
    val pal3 = PngPixels.synthesizePalette(4, 3, Seq((1, 2, 3)), (_, _) => 0)
    val p16 = pal3.clone()
    p16(24) = 16
    val c2 = new java.util.zip.CRC32
    c2.update(p16, 12, 17)
    val v2 = c2.getValue
    p16(29) = ((v2 >> 24) & 0xff).toByte
    p16(30) = ((v2 >> 16) & 0xff).toByte
    p16(31) = ((v2 >> 8) & 0xff).toByte
    p16(32) = (v2 & 0xff).toByte
    assert(PngPixels.decode(p16).isEmpty)
    assert(PngPixels.kindOf(p16).isEmpty)
  }
  test("x230: 16-bit gray+alpha — ImageIO raster agrees on raw samples; decode applies the 16-bit composite") {
    val (w, h) = (9, 7)
    val ga = (x: Int, y: Int) => ((x * 4799 + y * 9601 + 77) % 65536, (x * 4801 + y * 9613 + 31) % 65536)
    val bytes = PngPixels.synthesizeGrayAlpha16(w, h, ga)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val raster = ref.getRaster
    def red16(s: Int) = (s * 255 + 32767) / 65535
    def over16(a: Int, c: Int) = red16(((a.toLong * c + (65535L - a) * 65535L) / 65535L).toInt)
    val img = PngPixels.decode(bytes).get
    for (x <- 0 until w; y <- 0 until h) {
      val (g, a) = ga(x, y)
      assert(raster.getSample(x, y, 0) === g && raster.getSample(x, y, 1) === a, s"ImageIO raw ($x,$y)")
      val v = over16(a, g)
      assert(img.rgb(x, y) === ((v, v, v)), s"composite ($x,$y)")
    }
  }

  test("x230: 16-bit RGBA — ImageIO raster agrees; per-channel 16-bit composite") {
    val (w, h) = (8, 6)
    val rgba = (x: Int, y: Int) =>
      ((x * 4799 + y * 11) % 65536, (x * 4801 + y * 13) % 65536, (x * 4813 + y * 17) % 65536, (x * 4817 + y * 19) % 65536)
    val bytes = PngPixels.synthesizeRgba16(w, h, rgba)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val raster = ref.getRaster
    def red16(s: Int) = (s * 255 + 32767) / 65535
    def over16(a: Int, c: Int) = red16(((a.toLong * c + (65535L - a) * 65535L) / 65535L).toInt)
    val img = PngPixels.decode(bytes).get
    for (x <- 0 until w; y <- 0 until h) {
      val (r, g, b, a) = rgba(x, y)
      assert(Seq(raster.getSample(x, y, 0), raster.getSample(x, y, 1), raster.getSample(x, y, 2),
        raster.getSample(x, y, 3)) === Seq(r, g, b, a), s"ImageIO raw ($x,$y)")
      assert(img.rgb(x, y) === ((over16(a, r), over16(a, g), over16(a, b))), s"composite ($x,$y)")
    }
  }

  test("x230: 8-bit keyed transparency — ImageIO reports alpha 0 exactly at key pixels") {
    val (w, h) = (10, 9)
    val gray = (x: Int, y: Int) => (x * 13 + y * 7) % 256
    val key = gray(0, 0)
    val bytes = PngPixels.synthesizeGrayKeyed(w, h, gray, key)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val img = PngPixels.decode(bytes).get
    var matched = 0
    for (x <- 0 until w; y <- 0 until h) {
      val g = gray(x, y)
      val ia = (ref.getRGB(x, y) >>> 24) & 0xff
      if (g == key) { matched += 1; assert(ia === 0, s"ImageIO alpha ($x,$y)"); assert(img.rgb(x, y) === ((255, 255, 255))) }
      else { assert(ia === 255, s"ImageIO alpha ($x,$y)"); assert(img.rgb(x, y) === ((g, g, g))) }
    }
    assert(matched > 0, "fixture must contain key pixels")
  }

  test("x230: 16-bit keyed RGB — raster raw samples agree; exact triple match goes white") {
    val (w, h) = (7, 8)
    val rgb = (x: Int, y: Int) => ((x * 4799 + y) % 65536, (x * 4801 + y * 3) % 65536, (x * 4813 + y * 5) % 65536)
    val key = rgb(0, 0)
    val bytes = PngPixels.synthesizeRgb16Keyed(w, h, rgb, key)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val raster = ref.getRaster
    def red16(s: Int) = (s * 255 + 32767) / 65535
    val img = PngPixels.decode(bytes).get
    var matched = 0
    for (x <- 0 until w; y <- 0 until h) {
      val (r, g, b) = rgb(x, y)
      assert(Seq(raster.getSample(x, y, 0), raster.getSample(x, y, 1), raster.getSample(x, y, 2)) === Seq(r, g, b))
      if ((r, g, b) == key) { matched += 1; assert(img.rgb(x, y) === ((255, 255, 255))) }
      else assert(img.rgb(x, y) === ((red16(r), red16(g), red16(b))), s"($x,$y)")
    }
    assert(matched > 0)
  }

  test("x230: tRNS on alpha-carrying types still quarantines (spec-forbidden)") {
    // craft: take a valid gray+alpha PNG and splice a tRNS chunk before IDAT
    val ok = PngPixels.synthesizeGrayAlpha(6, 5, (x, y) => ((x * 7 + y) % 256, (y * 11 + x) % 256))
    def chunkAt(b: Array[Byte], off: Int): (String, Int) = {
      val len = (((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) | ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)).toInt
      (new String(b, off + 4, 4, "US-ASCII"), 12 + len)
    }
    var o = 8
    var idatAt = -1
    while (idatAt < 0) { val (t, sz) = chunkAt(ok, o); if (t == "IDAT") idatAt = o else o += sz }
    val crc = new java.util.zip.CRC32
    val data = Array[Byte](0, 42)
    crc.update("tRNS".getBytes("US-ASCII")); crc.update(data)
    val trns = Array[Byte](0, 0, 0, 2) ++ "tRNS".getBytes("US-ASCII") ++ data ++
      Array(((crc.getValue >> 24) & 0xff).toByte, ((crc.getValue >> 16) & 0xff).toByte,
        ((crc.getValue >> 8) & 0xff).toByte, (crc.getValue & 0xff).toByte)
    val crafted = ok.take(idatAt) ++ trns ++ ok.drop(idatAt)
    assert(PngPixels.decode(crafted) === None)
  }

}
