package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** TIFF laws beyond the gate's formula checksums: pixel-for-pixel
  * conformance against the JDK's own ImageIO TIFF plugin (JDK 9+) for
  * BOTH compressions, PackBits round-trip/edge behavior, and the
  * structural-lie quarantines. */
class TiffPixelsSpec extends AnyFunSuite {

  private def viaImageIO(b: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "ImageIO could not read the synthesized TIFF")
    img
  }

  test("decode matches ImageIO pixel-for-pixel: uncompressed and PackBits") {
    for (pack <- Seq(false, true)) {
      val (w, h) = (37, 19) // straddles the 8-row strip grid
      val bytes = TiffPixels.synthesize(w, h, TiffFixture.rgbAt(9L), pack)
      val mine = TiffPixels.decode(bytes).get
      val ref = viaImageIO(bytes)
      assert(mine.width === ref.getWidth && mine.height === ref.getHeight)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val exp = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        assert(mine.rgb(x, y) === exp, s"pack=$pack pixel ($x,$y)")
      }
      assert(TiffPixels.compressionOf(bytes).contains(if (pack) "packbits" else "none"))
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

  test("structural lies quarantine") {
    val good = TiffPixels.synthesize(10, 10, TiffFixture.rgbAt(1L), pack = true)
    assert(TiffPixels.decode(good).nonEmpty)
    def patched(f: Array[Byte] => Unit): Array[Byte] = { val c = good.clone(); f(c); c }
    assert(TiffPixels.decode(patched(c => c(0) = 'M')).isEmpty, "big-endian magic accepted")
    assert(TiffPixels.decode(good.dropRight(4)).isEmpty, "truncated strips accepted")
    // photometric: entry 5 (tag 262) value at ifd(8) + 2 + 4*12 + 8
    val photoAt = 8 + 2 + 4 * 12 + 8
    assert(TiffPixels.decode(patched(c => c(photoAt) = 1)).isEmpty, "grayscale photometric accepted")
    // compression tag (entry 4) to an unsupported scheme (LZW = 5)
    val compAt = 8 + 2 + 3 * 12 + 8
    assert(TiffPixels.decode(patched(c => c(compAt + 1) = 0)).isEmpty, "LZW accepted") // 0x8005 -> 0x0005
  }
}
