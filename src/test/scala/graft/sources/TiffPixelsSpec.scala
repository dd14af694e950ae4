package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** TIFF laws beyond the gate's formula checksums: pixel-for-pixel
  * conformance against the JDK's own ImageIO TIFF plugin (JDK 9+) for
  * all three compressions AND both directions (the plugin also serves as
  * the official ENCODER — it emits big-endian MM with LZW/PackBits, so
  * the MM read path is what official-encoder conformance exercises),
  * PackBits/LZW round-trip and edge behavior, and the structural-lie
  * quarantines. */
class TiffPixelsSpec extends AnyFunSuite {

  private def viaImageIO(b: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "ImageIO could not read the synthesized TIFF")
    img
  }

  private def writeViaImageIO(img: java.awt.image.BufferedImage, compression: Option[String]): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    compression.foreach { c =>
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    bos.toByteArray
  }

  test("decode matches ImageIO pixel-for-pixel: uncompressed, PackBits and LZW") {
    for ((tag, name) <- Seq((1L, "none"), (32773L, "packbits"), (5L, "lzw"))) {
      val (w, h) = (37, 19) // straddles the 8-row strip grid
      val bytes = TiffPixels.synthesize(w, h, TiffFixture.rgbAt(9L), tag)
      val mine = TiffPixels.decode(bytes).get
      val ref = viaImageIO(bytes)
      assert(mine.width === ref.getWidth && mine.height === ref.getHeight)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val exp = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        assert(mine.rgb(x, y) === exp, s"comp=$name pixel ($x,$y)")
      }
      assert(TiffPixels.compressionOf(bytes).contains(name))
    }
  }

  test("official-encoder conformance: ImageIO-written MM TIFFs decode pixel-for-pixel") {
    // the JDK TIFF writer emits big-endian (MM) — this is the MM read
    // path's conformance source; 61×45 crosses the 9-bit LZW width
    // boundary with the writer's own (single-strip) layout choices
    val (w, h) = (61, 45)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = TiffFixture.rgbAt(5L)(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    for (comp <- Seq(Some("LZW"), Some("PackBits"), None)) {
      val bytes = writeViaImageIO(img, comp)
      assert(bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte, "expected a big-endian fixture")
      val mine = TiffPixels.decode(bytes)
        .getOrElse(fail(s"MM TIFF with comp=$comp quarantined"))
      assert(mine.width === w && mine.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(mine.rgb(x, y) === TiffFixture.rgbAt(5L)(x, y), s"comp=$comp pixel ($x,$y)")
    }
  }

  test("packBits encoder/decoder round-trip incl. long runs and literal tails") {
    val cases = Seq(
      Array.fill(300)(7.toByte), // runs > 128 split
      Array.tabulate(257)(i => i.toByte), // pure literals > 128 split
      Array[Byte](1, 1, 2, 3, 3, 3, 3, 4, 5), // mixed
      (Array.fill(130)(9.toByte) ++ Array.tabulate(5)(_.toByte)),
      Array[Byte](1)
    )
    for (c <- cases) {
      val enc = TiffPixels.packBits(c)
      val dec = TiffPixels.unpackBits(enc, 0, enc.length, c.length)
      assert(dec.exists(_.sameElements(c)), s"round-trip failed for len ${c.length}")
    }
    // a stream that under-produces or over-consumes quarantines
    assert(TiffPixels.unpackBits(Array[Byte](3, 1, 2), 0, 3, 10).isEmpty)
    assert(TiffPixels.unpackBits(Array[Byte](-2, 5, 0, 9), 0, 4, 3).isEmpty)
  }

  test("LZW round-trip crosses the 9→10-bit early-change boundary and the 4094 table clear") {
    // high-entropy bytes defeat matching, so codes ≈ bytes: 5000 bytes
    // forces >4094 table entries → a mid-stream clear; 600 crosses 511
    val cases = Seq(
      Array.tabulate(600)(i => ((i * 31 + (i * i) % 97) % 256).toByte),
      Array.tabulate(5000)(i => ((i * 131 + (i * i * 7) % 251) % 256).toByte),
      Array.fill(1000)(42.toByte), // maximal matches, KwKwK chains
      Array[Byte](1),
      Array.tabulate(12)(i => (i % 3).toByte)
    )
    for (c <- cases) {
      val enc = TiffPixels.lzwPack(c)
      val dec = TiffPixels.lzwUnpack(enc, 0, enc.length, c.length)
      assert(dec.exists(_.sameElements(c)), s"LZW round-trip failed for len ${c.length}")
    }
    // structural lies: no leading clear / truncation / trailing garbage
    val enc = TiffPixels.lzwPack(Array.tabulate(100)(_.toByte))
    assert(TiffPixels.lzwUnpack(enc, 0, enc.length, 99).isEmpty, "wrong expected length accepted")
    assert(TiffPixels.lzwUnpack(enc.dropRight(2), 0, enc.length - 2, 100).isEmpty, "truncation accepted")
    assert(
      TiffPixels.lzwUnpack(enc ++ Array[Byte](0, 0), 0, enc.length + 2, 100).isEmpty,
      "post-EOI garbage accepted"
    )
    assert(TiffPixels.lzwUnpack(Array[Byte](0, 0, 0), 0, 3, 1).isEmpty, "missing leading ClearCode accepted")
  }

  test("structural lies quarantine") {
    val good = TiffPixels.synthesize(10, 10, TiffFixture.rgbAt(1L), 32773L)
    assert(TiffPixels.decode(good).nonEmpty)
    def patched(f: Array[Byte] => Unit): Array[Byte] = { val c = good.clone(); f(c); c }
    assert(TiffPixels.decode(patched(c => c(0) = 'M')).isEmpty, "half-swapped magic accepted")
    assert(TiffPixels.decode(good.dropRight(4)).isEmpty, "truncated strips accepted")
    // photometric: entry 5 (tag 262) value at ifd(8) + 2 + 4*12 + 8
    val photoAt = 8 + 2 + 4 * 12 + 8
    assert(TiffPixels.decode(patched(c => c(photoAt) = 1)).isEmpty, "grayscale photometric accepted")
    // compression tag (entry 4) relabeled 32773 → 5: PackBits bytes fed
    // through the LZW path must quarantine (no leading ClearCode — the
    // PackBits encoder never emits the 0x80 no-op first)
    val compAt = 8 + 2 + 3 * 12 + 8
    assert(TiffPixels.decode(patched(c => c(compAt + 1) = 0)).isEmpty, "mislabeled compression accepted")
  }

  test("predictor 2 (horizontal differencing) round-trips LZW and matches ImageIO") {
    val (w, h) = (23, 11)
    val bytes = TiffPixels.synthesize(w, h, TiffFixture.rgbAt(3L), 5L, predictor2 = true)
    val mine = TiffPixels.decode(bytes).getOrElse(fail("predictor-2 LZW quarantined"))
    val ref = viaImageIO(bytes)
    for (y <- 0 until h; x <- 0 until w) {
      assert(mine.rgb(x, y) === TiffFixture.rgbAt(3L)(x, y), s"formula ($x,$y)")
      val rgb = ref.getRGB(x, y)
      assert(mine.rgb(x, y) === (((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)), s"vs ImageIO ($x,$y)")
    }
    // §14 pairs the predictor with LZW; PackBits+predictor is
    // non-standard (ImageIO ignores the tag there) — quarantine
    val pb = TiffPixels.synthesize(w, h, TiffFixture.rgbAt(3L), 32773L, predictor2 = true)
    assert(TiffPixels.decode(pb).isEmpty, "predictor-2 PackBits accepted")
    // unknown predictor values quarantine too (floating-point = 3);
    // predictor entry is the 10th (tag 317 sorts last), value at +8
    val predAt = 8 + 2 + 9 * 12 + 8
    val p3 = { val c = bytes.clone(); c(predAt) = 3; c }
    assert(TiffPixels.decode(p3).isEmpty, "predictor=3 accepted")
  }
}
