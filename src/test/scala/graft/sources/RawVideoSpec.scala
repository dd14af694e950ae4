package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class RawVideoSpec extends AnyFunSuite {

  test("synthesize → decode round-trips every pixel of every frame") {
    val f = (t: Int, x: Int, y: Int) => ((t * 50 + x) % 256, (x * 3 + y) % 256, (t + y * 9) % 256)
    val v = RawVideo.decode(RawVideo.synthesize(5, 3, 4, f)).get
    assert((v.width, v.height, v.nFrames) === ((5, 3, 4)))
    for (t <- 0 until 4; y <- 0 until 3; x <- 0 until 5)
      assert(v.rgb(t, x, y) === f(t, x, y), s"frame $t pixel ($x,$y)")
  }

  test("sampling schedule and per-frame checksum match first principles") {
    assert(RawVideo.sampleIndices(10, 3) === Seq(0, 3, 6, 9))
    assert(RawVideo.sampleIndices(3, 3) === Seq(0))
    val (id, payload, w, h, n) = RawVideoFixture.rows(7)
    val v = RawVideo.decode(payload).get
    RawVideo.sampleIndices(n, 3).foreach { t =>
      val expected = (for (j <- 0 until 4; i <- 0 until 4) yield {
        val (r, g, b) = RawVideoFixture.rgbAt(id)(t, i * w / 4, j * h / 4)
        (j * 4 + i + 1).toLong * (3L * r + 5L * g + 7L * b)
      }).sum
      assert(RawVideo.frameChecksum(v, t, 4, 4) === expected, s"video $id frame $t")
    }
  }

  test("rejects wrong magic, truncation, and inconsistent frame counts") {
    val ok = RawVideo.synthesize(4, 4, 2, (_, _, _) => (1, 2, 3))
    assert(RawVideo.decode("GRV2".getBytes ++ ok.drop(4)) === None)
    assert(RawVideo.decode(ok.dropRight(1)) === None) // length mismatch
    assert(RawVideo.decode(ok ++ Array[Byte](0)) === None)
    assert(RawVideo.decode(ok.take(12)) === None) // truncated header
  }
}
