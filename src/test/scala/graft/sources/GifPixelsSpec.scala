package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class GifPixelsSpec extends AnyFunSuite {

  private val idx = (x: Int, y: Int) => (x * 11 + y * 17) % 256
  private val pal = (i: Int) => ((i * 2 + 1) % 256, (i * 3 + 5) % 256, (255 - i) % 256)

  test("synthesize → decode round-trips every pixel (dictionary stays small)") {
    for ((w, h) <- Seq((6, 5), (1, 7), (40, 31))) {
      val img = GifPixels.decode(GifPixels.synthesize(w, h, idx, pal)).get
      assert(img.width === w && img.height === h)
      for (x <- 0 until w; y <- 0 until h)
        assert(img.rgb(x, y) === pal(idx(x, y)), s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("round-trips through 12-bit codes and a mid-stream clear reset") {
    // 160×160 = 25.6k pixels of structured content: the greedy dictionary
    // passes 4096 entries, forcing codeSize growth to 12 bits AND the
    // encoder's clear-reset path — both must be invisible to the decoder
    val (w, h) = (160, 160)
    val f = (x: Int, y: Int) => (x * x + y * 3 + (x / 7) * y) % 256
    val img = GifPixels.decode(GifPixels.synthesize(w, h, f, pal)).get
    for (x <- 0 until w by 3; y <- 0 until h by 3)
      assert(img.rgb(x, y) === pal(f(x, y)), s"pixel ($x,$y)")
  }

  test("writer conformance: the JDK's own ImageIO GIF reader agrees on every pixel") {
    val (w, h) = (29, 21)
    val bytes = GifPixels.synthesize(w, h, idx, pal)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref.getWidth === w && ref.getHeight === h)
    for (x <- 0 until w; y <- 0 until h) {
      val argb = ref.getRGB(x, y)
      assert((((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)) === pal(idx(x, y)), s"($x,$y)")
    }
  }

  test("reader conformance: this decoder agrees with ImageIO on every fixture payload") {
    for ((id, bytes, w, h) <- GifFixture.rows.take(40)) {
      val ours = GifPixels.decode(bytes).get
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ours.width === w && ref.getWidth === w && ours.height === h && ref.getHeight === h)
      for (x <- 0 until w; y <- 0 until h) {
        val argb = ref.getRGB(x, y)
        assert(ours.rgb(x, y) === (((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)), s"img $id ($x,$y)")
      }
    }
  }

  test("rejects corrupt and out-of-scope payloads (quarantine, never a throw)") {
    val ok = GifPixels.synthesize(8, 6, idx, pal)
    assert(GifPixels.decode("GIF89a but not really".getBytes) === None)
    assert(GifPixels.decode(ok.take(12)) === None) // truncated screen descriptor
    assert(GifPixels.decode(ok.dropRight(10)) === None) // truncated LZW stream
    // interlace flag set → out of scope, clean None
    val inter = ok.clone(); inter(13 + 768 + 9) = (inter(13 + 768 + 9) | 0x40).toByte
    assert(GifPixels.decode(inter) === None)
    // the metadata-only synthesized GIF (ImageMeta) has junk pixel data
    assert(GifPixels.decode(ImageMeta.synthesize("image/gif", 64, 64, junk = 16, seed = 3)) === None)
  }

  test("gate fixture: decoded checksum equals the first-principles composite formula") {
    for ((id, bytes, w, h) <- GifFixture.rows.take(25)) {
      val img = GifPixels.decode(bytes).get
      val tile = BmpPixels.resizeNearest(img, 8, 8)
      val expected = for (j <- 0 until 8; i <- 0 until 8)
        yield GifFixture.palette(GifFixture.idxAt(id)(i * w / 8, j * h / 8))
      assert(tile === expected, s"img $id")
    }
  }
}
