package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class ImageMetaSpec extends AnyFunSuite {

  test("parses synthesized containers of every supported format") {
    for (fmt <- Seq("image/png", "image/jpeg", "image/gif", "image/bmp")) {
      val b = ImageMeta.synthesize(fmt, 640, 480, junk = 100, seed = 7)
      assert(ImageMeta.parse(b) === Some(ImageMeta.Meta(fmt, 640, 480)), fmt)
    }
  }

  test("JPEG: SOF found behind multiple APPn/comment segments") {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte) ++
        Array((((payload.length + 2) >> 8) & 0xff).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val sofData = Array[Byte](8, 1, 0x2c, 2, 0x58, 1, 1, 0x11, 0) // h=300, w=600
    val jpeg = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xe1, Array.fill[Byte](30)(1)) ++ // APP1 (EXIF-ish)
      seg(0xfe, "a comment".getBytes) ++ // COM
      seg(0xdb, Array.fill[Byte](65)(2)) ++ // DQT
      seg(0xc2, sofData) // SOF2 progressive
    assert(ImageMeta.parse(jpeg) === Some(ImageMeta.Meta("image/jpeg", 600, 300)))
  }

  test("BMP top-down (negative height) reports absolute height") {
    val b = ImageMeta.synthesize("image/bmp", 32, 64, junk = 8, seed = 1)
    // flip height to -64 (top-down row order)
    val v = -64
    b(22) = (v & 0xff).toByte; b(23) = ((v >> 8) & 0xff).toByte
    b(24) = ((v >> 16) & 0xff).toByte; b(25) = ((v >> 24) & 0xff).toByte
    assert(ImageMeta.parse(b) === Some(ImageMeta.Meta("image/bmp", 32, 64)))
  }

  test("garbage, truncated and scan-before-SOF payloads return None") {
    assert(ImageMeta.parse("not an image at all".getBytes) === None)
    assert(ImageMeta.parse(Array[Byte](0x89.toByte, 0x50)) === None)
    val png = ImageMeta.synthesize("image/png", 10, 10, 4, 1)
    assert(ImageMeta.parse(png.take(20)) === None) // truncated before IHDR dims
    // JPEG that hits start-of-scan without any SOF
    val noSof = Array(0xff, 0xd8, 0xff, 0xda, 0, 4, 9, 9).map(_.toByte)
    assert(ImageMeta.parse(noSof) === None)
  }

  test("gate fixture payloads parse to exactly the twin metadata") {
    ImageFixture.rows.foreach { case (id, payload, fmt, w, h) =>
      assert(ImageMeta.parse(payload) === Some(ImageMeta.Meta(fmt, w, h)), s"img $id")
    }
  }
}
