package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class ImageDispatchSpec extends AnyFunSuite {

  test("sniffs and routes each format to its decoder") {
    val formula = (x: Int, y: Int) => ((x * 3 + y) % 256, (y * 5 + x) % 256, (x + y) % 256)
    val bmp = BmpPixels.synthesize(9, 7, formula)
    val png = PngPixels.synthesize(9, 7, formula)
    val jpeg = JpegFixture.payload(5L, 9, 7)
    val gif = GifFixture.rows.head._2
    assert(ImageDispatch.decodeAny(bmp).map(_._1) === Some("bmp"))
    assert(ImageDispatch.decodeAny(png).map(_._1) === Some("png"))
    assert(ImageDispatch.decodeAny(jpeg).map(_._1) === Some("jpeg"))
    assert(ImageDispatch.decodeAny(gif).map(_._1) === Some("gif"))
    // routed decode = direct decode, pixel for pixel
    val (_, viaDispatch) = ImageDispatch.decodeAny(png).get
    val direct = PngPixels.decode(png).get
    for (x <- 0 until 9; y <- 0 until 7) assert(viaDispatch.rgb(x, y) === direct.rgb(x, y))
  }

  test("unrecognized and sniff-matching-but-corrupt payloads quarantine") {
    assert(ImageDispatch.decodeAny("plain text, no magic".getBytes) === None)
    assert(ImageDispatch.decodeAny(Array[Byte](1, 2, 3)) === None)
    // right magic, broken body: the per-format decoder's quarantine carries through
    val broken = PngPixels.synthesize(5, 5, (_, _) => (1, 2, 3)).take(30)
    assert(ImageDispatch.decodeAny(broken) === None)
  }
}
