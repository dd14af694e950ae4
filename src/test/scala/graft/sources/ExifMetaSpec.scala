package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** x197 EXIF: formula truth both byte orders, the structural APP1 walk,
  * and the quarantine matrix. */
class ExifMetaSpec extends AnyFunSuite {

  test("all 200 fixture JPEGs parse to the formula metadata (both byte orders)") {
    (0L until 200L).foreach { i =>
      val m = ExifMeta.parse(ExifFixture.fileBytes(i)).getOrElse(fail(s"img $i quarantined"))
      assert(m === ExifFixture.meta(i), s"img $i")
    }
  }

  test("APP1 is found structurally: a preceding APP0 segment containing 'Exif' does not confuse the walk") {
    val base = ExifFixture.fileBytes(3L)
    // splice an APP0 whose body contains the bytes "Exif" BEFORE the real
    // APP1 — a byte-scanning locator would bind to the wrong segment
    val decoy = "JFIFExif decoy".getBytes("ISO-8859-1")
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte,
      (((decoy.length + 2) >> 8) & 0xff).toByte, ((decoy.length + 2) & 0xff).toByte) ++ decoy
    val spliced = base.take(2) ++ app0 ++ base.drop(2)
    assert(ExifMeta.parse(spliced) === Some(ExifFixture.meta(3L)))
  }

  test("structural lies quarantine: orientation range, truncation, bad magic, runaway offsets") {
    val good = ExifFixture.fileBytes(4L) // MM
    assert(ExifMeta.parse(good).isDefined)
    assert(ExifMeta.parse(good.take(good.length / 2)).isEmpty, "truncation")
    val noSoi = good.clone(); noSoi(1) = 0x00
    assert(ExifMeta.parse(noSoi).isEmpty, "bad SOI")
    // orientation 9: locate the SHORT value of tag 0x0112 (MM: tag bytes
    // 01 12) and overwrite with 9
    val tagAt = (0 until good.length - 12).find(i =>
      good(i) == 0x01.toByte && good(i + 1) == 0x12.toByte && good(i + 2) == 0x00 && good(i + 3) == 0x03
    ).get
    val badOrient = good.clone()
    badOrient(tagAt + 8) = 0x00; badOrient(tagAt + 9) = 0x09
    assert(ExifMeta.parse(badOrient).isEmpty, "orientation 9 must quarantine")
    // runaway Exif sub-IFD pointer (tag 0x8769, type LONG): point past EOF
    val ptrAt = (0 until good.length - 12).find(i =>
      good(i) == 0x87.toByte && good(i + 1) == 0x69.toByte
    ).get
    val badPtr = good.clone()
    badPtr(ptrAt + 8) = 0x7f; badPtr(ptrAt + 9) = 0xff.toByte
    assert(ExifMeta.parse(badPtr).isEmpty, "runaway sub-IFD offset must quarantine")
  }
}
