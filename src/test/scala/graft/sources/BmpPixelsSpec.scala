package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class BmpPixelsSpec extends AnyFunSuite {

  test("synthesize → decode round-trips every pixel (stride padding honored)") {
    // widths chosen to hit all four stride paddings (w*3 mod 4 ∈ {0,1,2,3})
    for (w <- Seq(4, 5, 6, 7); h <- Seq(3, 8)) {
      val rgbAt = (x: Int, y: Int) => ((x * 40 + y) % 256, (y * 30 + x) % 256, (x + y * 7) % 256)
      val img = BmpPixels.decode(BmpPixels.synthesize(w, h, rgbAt)).get
      assert(img.width === w && img.height === h)
      for (x <- 0 until w; y <- 0 until h)
        assert(img.rgb(x, y) === rgbAt(x, y), s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("identity resize preserves raster order; checksum is position-sensitive") {
    val img = BmpPixels.decode(BmpPixels.synthesize(3, 2, (x, y) => (x, y, x + y))).get
    val same = BmpPixels.resizeNearest(img, 3, 2)
    assert(same === (for (j <- 0 until 2; i <- 0 until 3) yield img.rgb(i, j)))
    // swapping two distinct pixels must change the checksum
    val swapped = same.updated(0, same(5)).updated(5, same(0))
    assert(BmpPixels.checksum(same) !== BmpPixels.checksum(swapped))
  }

  test("downsample picks floor-mapped source pixels") {
    val img = BmpPixels.decode(BmpPixels.synthesize(8, 8, (x, y) => (x * 10, y * 10, 0))).get
    val tiny = BmpPixels.resizeNearest(img, 2, 2)
    // targets (0,0),(1,0),(0,1),(1,1) → sources (0,0),(4,0),(0,4),(4,4)
    assert(tiny === IndexedSeq((0, 0, 0), (40, 0, 0), (0, 40, 0), (40, 40, 0)))
  }

  test("rejects non-BMP, truncated, and non-24bpp payloads") {
    assert(BmpPixels.decode("definitely not a bitmap".getBytes) === None)
    val ok = BmpPixels.synthesize(4, 4, (_, _) => (1, 2, 3))
    assert(BmpPixels.decode(ok.take(40)) === None) // truncated header
    assert(BmpPixels.decode(ok.dropRight(8)) === None) // truncated pixel data
    // the metadata-only synthesized BMP (ImageMeta) has junk "pixels" of the
    // wrong length — the bounds check must reject rather than read past
    assert(BmpPixels.decode(ImageMeta.synthesize("image/bmp", 64, 64, junk = 10, seed = 1)) === None)
  }

  test("rejects crafted headers whose Int stride overflows (quarantine, not throw)") {
    def patch32(b: Array[Byte], o: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      c(o) = (v & 0xff).toByte; c(o + 1) = ((v >> 8) & 0xff).toByte
      c(o + 2) = ((v >> 16) & 0xff).toByte; c(o + 3) = ((v >> 24) & 0xff).toByte
      c
    }
    val ok = BmpPixels.synthesize(4, 4, (_, _) => (1, 2, 3))
    // width ≥ ~715M made Int `w * 3` wrap negative pre-fix, slipping past the
    // bounds guard and reading out of bounds later; now it must decode to None
    for (w <- Seq(715827883, Int.MaxValue, 1431655766))
      assert(BmpPixels.decode(patch32(ok, 18, w)) === None, s"w=$w")
    // huge height with small width: stride*h must be computed in Long
    assert(BmpPixels.decode(patch32(ok, 22, Int.MaxValue)) === None)
  }

  test("gate fixture: decoded checksum equals the first-principles formula") {
    BmpFixture.rows.take(20).foreach { case (id, payload, w, h) =>
      val img = BmpPixels.decode(payload).get
      assert(img.width === w && img.height === h)
      val cs = BmpPixels.checksum(BmpPixels.resizeNearest(img, 8, 8))
      val expected = (for (j <- 0 until 8; i <- 0 until 8) yield {
        val (r, g, b) = BmpFixture.rgbAt(id)(i * w / 8, j * h / 8)
        (j * 8 + i + 1).toLong * (3L * r + 5L * g + 7L * b)
      }).sum
      assert(cs === expected, s"img $id")
    }
  }
}
