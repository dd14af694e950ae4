package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class JpegPixelsSpec extends AnyFunSuite {

  private val q8 = Array.fill(64)(8)
  private val q16 = Array.fill(64)(16)

  /** grayscale DC-only payload: block (bx,by) decodes to the flat value
    * `dc(bx,by)` exactly (IDCT of a lone DC is F/8; quant step 8 makes
    * the product an integer, so rounding is a no-op). */
  private def grayDcOnly(w: Int, h: Int, dc: (Int, Int) => Int): Array[Byte] =
    JpegPixels.synthesize(w, h, 1, Seq(q8), (_, bx, by) => {
      val z = new Array[Int](64); z(0) = dc(bx, by) - 128; z
    })

  test("zigzag table matches the T.81 Figure A.6 sequence") {
    val expected = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26, 33, 40, 48,
      41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15,
      23, 30, 37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    assert(JpegPixels.ZigZag.toSeq === expected.toSeq)
  }

  test("DC-only grayscale round-trips exactly, across block boundaries and crops") {
    val dc = (bx: Int, by: Int) => 16 + (bx * 31 + by * 17) % 224
    for ((w, h) <- Seq((8, 8), (5, 7), (24, 16), (21, 13), (1, 1))) {
      val img = JpegPixels.decode(grayDcOnly(w, h, dc)).get
      assert(img.width === w && img.height === h)
      for (x <- 0 until w; y <- 0 until h) {
        val v = dc(x / 8, y / 8)
        assert(img.rgb(x, y) === ((v, v, v)), s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("writer conformance: the JDK's own ImageIO JPEG reader agrees exactly on DC-only") {
    // independent-decoder pin: libjpeg's DC-only IDCT shortcut is exact,
    // so ImageIO must reproduce our flat blocks bit-for-bit, proving the
    // emitted marker structure, Huffman tables and entropy stream are
    // spec-valid JPEG, not merely self-consistent
    val dc = (bx: Int, by: Int) => 20 + (bx * 41 + by * 23) % 200
    val bytes = grayDcOnly(19, 14, dc)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref.getWidth === 19 && ref.getHeight === 14)
    // raw raster samples: getRGB would re-encode linear gray as sRGB
    for (x <- 0 until 19; y <- 0 until 14)
      assert(ref.getRaster.getSample(x, y, 0) === dc(x / 8, y / 8), s"ImageIO pixel ($x,$y)")
  }

  test("AC coefficients: decoder agrees with a direct (non-separable) reference IDCT") {
    // planted pseudo-random quantized coefficients, including runs that
    // need ZRL (>15 zeros) and mid-block EOBs; the reference computes the
    // raw 2-D IDCT sum independently of the decoder's separable two-pass
    val rng = new scala.util.Random(7)
    val coefs = Array.fill(4, 4)(Array.tabulate(64) { k =>
      if (k == 0) rng.nextInt(200) - 100
      else if (rng.nextInt(10) == 0) rng.nextInt(40) - 20 // sparse: long zero runs
      else 0
    })
    val bytes = JpegPixels.synthesize(32, 32, 1, Seq(q16), (_, bx, by) => coefs(by)(bx))
    val img = JpegPixels.decode(bytes).get
    def refPixel(z: Array[Int], x: Int, y: Int): Int = {
      var s = 0.0
      for (k <- 0 until 64) {
        val nat = JpegPixels.ZigZag(k); val v = nat / 8; val u = nat % 8
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        s += cu * cv * (z(k) * 16) *
          math.cos((2 * x + 1) * u * math.Pi / 16) * math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      math.max(0, math.min(255, math.round(0.25 * s).toInt + 128))
    }
    for (x <- 0 until 32; y <- 0 until 32) {
      val expected = refPixel(coefs(y / 8)(x / 8), x % 8, y % 8)
      assert(img.rgb(x, y)._1 === expected, s"pixel ($x,$y)")
    }
    // and ImageIO stays within libjpeg's fixed-point envelope of the same
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (x <- 0 until 32; y <- 0 until 32) {
      val got = ref.getRaster.getSample(x, y, 0) // raw sample, not sRGB-encoded
      assert(math.abs(got - img.rgb(x, y)._1) <= 1, s"ImageIO drift at ($x,$y): $got vs ${img.rgb(x, y)._1}")
    }
  }

  test("3-component 4:4:4 color: fixed-point YCbCr→RGB matches the closed form; ImageIO within ±2") {
    val bytes = JpegFixture.payload(3L, 21, 18)
    val img = JpegPixels.decode(bytes).get
    val s = Array(1, -1, -1, 1, 1, -1, -1, 1)
    for (x <- 0 until 21; y <- 0 until 18) {
      val (bx, by) = (x / 8, y / 8)
      val yv = JpegFixture.yAt(3L, bx, by) + s(x % 8) * JpegFixture.acAt(3L, bx, by)
      val expected = JpegPixels.ycc2rgb(yv, JpegFixture.cbAt(3L, bx, by), JpegFixture.crAt(3L, bx, by))
      assert(img.rgb(x, y) === expected, s"pixel ($x,$y)")
    }
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (x <- 0 until 21; y <- 0 until 18) {
      val argb = ref.getRGB(x, y)
      val (r, g, b) = img.rgb(x, y)
      assert(math.abs(((argb >> 16) & 0xff) - r) <= 2, s"R drift ($x,$y)")
      assert(math.abs(((argb >> 8) & 0xff) - g) <= 2, s"G drift ($x,$y)")
      assert(math.abs((argb & 0xff) - b) <= 2, s"B drift ($x,$y)")
    }
  }

  test("SOS component order binds by id, not position (T.81 allows any scan order)") {
    // same pixels must come back whatever order the scan lists Y/Cb/Cr in,
    // because the Cs ids — not list positions — bind scan entries to frame
    // components and the MCU interleave follows the scan order
    val q8s = Seq(q8, q8)
    def coef(c: Int, bx: Int, by: Int): Array[Int] = {
      val z = new Array[Int](64)
      z(0) = (40 + c * 50 + bx * 13 + by * 7) % 200 - 100
      z
    }
    val normal = JpegPixels.decode(JpegPixels.synthesize(17, 10, 3, q8s, coef)).get
    val reordered = JpegPixels.decode(JpegPixels.synthesize(17, 10, 3, q8s, coef, scanOrder = Seq(2, 0, 1))).get
    for (x <- 0 until 17; y <- 0 until 10)
      assert(reordered.rgb(x, y) === normal.rgb(x, y), s"pixel ($x,$y)")
    // (no ImageIO cross-check here: the JDK's native reader is stricter
    // than T.81 and rejects non-SOF-ordered SOS listings outright —
    // "Invalid component ID in SOS" — so id-binding is pinned against our
    // own decoder's SOF-ordered result instead)
  }

  test("adversarial DC walk quarantines instead of overflowing the dequant multiply") {
    // every block repeats a +1023 DC diff; pred passes the spec's 11-bit
    // range after a few blocks — decode must bail to None, not wrap Int
    val bytes = JpegPixels.synthesize(64, 8, 1, Seq(Array.fill(64)(255)), (_, bx, _) => {
      val z = new Array[Int](64); z(0) = (bx + 1) * 1023; z
    })
    assert(JpegPixels.decode(bytes) === None)
  }

  test("DC difference prediction is load-bearing across the interleaved MCU stream") {
    // strictly increasing DC per block makes every diff nonzero; a broken
    // predictor shifts every block after the first
    val img = JpegPixels.decode(grayDcOnly(40, 8, (bx, _) => 30 + bx * 40)).get
    for (bx <- 0 until 5) assert(img.rgb(bx * 8, 0)._1 === 30 + bx * 40)
  }

  test("byte stuffing: entropy bytes of 0xFF survive the round trip") {
    // scan many DC values so some Huffman-packed stream contains 0xFF —
    // verified by decoding everything back exactly
    for (seed <- 0 until 8) {
      val dc = (bx: Int, by: Int) => (seed * 37 + bx * 73 + by * 91) % 256
      val img = JpegPixels.decode(grayDcOnly(32, 24, dc)).get
      for (bx <- 0 until 4; by <- 0 until 3)
        assert(img.rgb(bx * 8, by * 8)._1 === dc(bx, by), s"seed $seed block ($bx,$by)")
    }
  }

  test("rejects corrupt and out-of-scope payloads (quarantine, never a throw)") {
    val ok = JpegFixture.payload(1L, 16, 16)
    assert(JpegPixels.decode("not a jpeg".getBytes) === None)
    assert(JpegPixels.decode(ok.take(30)) === None) // truncated in the tables
    assert(JpegPixels.decode(ok.dropRight(ok.length / 2)) === None) // truncated entropy stream
    // progressive SOF2 is out of scope: flip the SOF marker byte
    val prog = ok.clone()
    val sofAt = (0 until ok.length - 1).find(i => (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegPixels.decode(prog) === None)
    // crafted dims that would blow the plane cap must be rejected
    val big = ok.clone()
    big(sofAt + 5) = 0x1f.toByte; big(sofAt + 6) = 0xff.toByte // height 8191
    big(sofAt + 7) = 0x1f.toByte; big(sofAt + 8) = 0xff.toByte // width 8191
    assert(JpegPixels.decode(big) === None)
  }

  test("gate fixture: decoded checksum equals the first-principles formula") {
    val s = Array(1, -1, -1, 1, 1, -1, -1, 1)
    for ((id, bytes, w, h) <- JpegFixture.rows.take(25)) {
      val img = JpegPixels.decode(bytes).get
      assert(img.width === w && img.height === h)
      val tile = BmpPixels.resizeNearest(img, 8, 8)
      val expected = for (j <- 0 until 8; i <- 0 until 8) yield {
        val (sx, sy) = (i * w / 8, j * h / 8)
        val (bx, by) = (sx / 8, sy / 8)
        val yv = JpegFixture.yAt(id, bx, by) + s(sx % 8) * JpegFixture.acAt(id, bx, by)
        JpegPixels.ycc2rgb(yv, JpegFixture.cbAt(id, bx, by), JpegFixture.crAt(id, bx, by))
      }
      assert(tile === expected, s"img $id")
    }
  }
}
