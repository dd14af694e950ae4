package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** x190 Ogg walk: fixture truth, the custom CRC vs an independent
  * bit-at-a-time implementation, real cross-page continuation, and the
  * structural quarantine matrix. */
class OggPagesSpec extends AnyFunSuite {

  test("all 200 fixture streams reassemble to the formula packets") {
    (0L until 200L).foreach { s =>
      val pks = OggPages.parse(OggFixture.fileBytes(s)).getOrElse(fail(s"ogg $s quarantined"))
      assert(pks.length === OggFixture.nPackets(s))
      pks.zipWithIndex.foreach { case (p, j) =>
        assert(java.util.Arrays.equals(p.bytes, OggFixture.packet(s, j.toLong)), s"ogg $s packet $j")
      }
    }
  }

  test("the table-driven Ogg CRC equals an independent bit-at-a-time implementation") {
    def crcBitwise(b: Array[Byte]): Int = {
      var r = 0
      b.foreach { byte =>
        r ^= (byte & 0xff) << 24
        (0 until 8).foreach { _ =>
          r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        }
      }
      r
    }
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val b = Array.fill(1 + rnd.nextInt(300))(rnd.nextInt(256).toByte)
      assert(OggPages.crc(b, 0, b.length) === crcBitwise(b))
    }
  }

  test("cross-page packet continuation is exercised and flagged correctly") {
    // stream 6: its six lacing values (200 | 255,105 | 255,255,10)
    // straddle the 4-per-page boundary MID-packet, forcing a continued page
    val b = OggFixture.fileBytes(6L)
    // count pages with the continuation flag
    var o = 0
    var contPages = 0
    while (o + 27 <= b.length && b(o) == 'O') {
      val flags = b(o + 5) & 0xff
      if ((flags & 1) != 0) contPages += 1
      val nSegs = b(o + 26) & 0xff
      val bodyLen = (0 until nSegs).map(i => b(o + 27 + i) & 0xff).sum
      o += 27 + nSegs + bodyLen
    }
    assert(contPages > 0, "fixture must exercise a continued packet")
    assert(OggPages.parse(b).isDefined)
  }

  test("structural lies quarantine: CRC flip, sequence gap, carry-flag lie, lost EOS, post-EOS data") {
    val good = OggFixture.fileBytes(6L)
    assert(OggPages.parse(good).isDefined)
    def pageOffsets(b: Array[Byte]): Seq[Int] = {
      var o = 0
      val out = Seq.newBuilder[Int]
      while (o + 27 <= b.length) {
        out += o
        val nSegs = b(o + 26) & 0xff
        o += 27 + nSegs + (0 until nSegs).map(i => b(o + 27 + i) & 0xff).sum
      }
      out.result()
    }
    val offs = pageOffsets(good)
    assert(offs.length >= 2)
    // flip one body byte of page 0 → CRC mismatch
    val flip = good.clone(); flip(offs(1) - 1) = (flip(offs(1) - 1) ^ 0x01).toByte
    assert(OggPages.parse(flip).isEmpty, "CRC flip must quarantine")
    // renumber page 1's sequence (and fix its CRC so ONLY the gap trips)
    val gap = good.clone()
    gap(offs(1) + 18) = (gap(offs(1) + 18) + 1).toByte
    val p1len = (if (offs.length > 2) offs(2) else good.length) - offs(1)
    val c = OggPages.crc(gap, offs(1), p1len, zeroFrom = offs(1) + 22, zeroLen = 4)
    (0 until 4).foreach(i => gap(offs(1) + 22 + i) = ((c >> (8 * i)) & 0xff).toByte)
    assert(OggPages.parse(gap).isEmpty, "sequence gap must quarantine")
    // truncate the final page → EOS never seen
    assert(OggPages.parse(good.take(offs.last)).isEmpty, "missing EOS must quarantine")
    // bytes after the EOS page
    assert(OggPages.parse(good ++ Array[Byte](1, 2)).isEmpty, "post-EOS data must quarantine")
    // flip page 1's continuation flag (re-CRC'd): carry-state contract
    val carry = good.clone()
    carry(offs(1) + 5) = (carry(offs(1) + 5) ^ 0x01).toByte
    val c2 = OggPages.crc(carry, offs(1), p1len, zeroFrom = offs(1) + 22, zeroLen = 4)
    (0 until 4).foreach(i => carry(offs(1) + 22 + i) = ((c2 >> (8 * i)) & 0xff).toByte)
    assert(OggPages.parse(carry).isEmpty, "carry-flag lie must quarantine")
  }
}
