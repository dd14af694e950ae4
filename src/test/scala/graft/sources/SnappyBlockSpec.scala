package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** x198 Snappy reader: fixture truth, official-library cross-agreement
  * both directions, the tag-form matrix, and the quarantine matrix. */
class SnappyBlockSpec extends AnyFunSuite {

  test("all 200 fixture payloads decode to the formula content") {
    (0L until 200L).foreach { z =>
      val got = SnappyBlock.decode(SnappyFixture.fileBytes(z))
        .getOrElse(fail(s"payload $z quarantined"))
      assert(new String(got, "UTF-8") === SnappyFixture.content(z), s"payload $z")
    }
  }

  test("official snappy-java agrees with our reader on arbitrary material") {
    val samples = Seq(
      "",                                   // empty: varint 0, no elements
      "x",                                  // one literal
      "ab" * 200,                           // period-2 run (offset-2 overlap copy)
      ("A" * 300) + "tail",                 // long run + literal tail
      (0 until 500).map(i => s"line $i ${i * i}\n").mkString, // >60-byte literals + far matches
      new String(Array.tabulate(256)(_.toByte).map(b => (b & 0x7f).toChar)) * 3
    )
    samples.foreach { s0 =>
      val raw = s0.getBytes("UTF-8")
      val comp = org.xerial.snappy.Snappy.compress(raw)
      val ours = SnappyBlock.decode(comp).getOrElse(fail(s"quarantined: ${s0.take(20)}"))
      assert(java.util.Arrays.equals(ours, raw), s"mismatch on sample ${s0.take(20)}")
      // and the reverse: the official decoder accepts what we decoded from
      assert(java.util.Arrays.equals(org.xerial.snappy.Snappy.uncompress(comp), ours))
    }
  }

  test("hand-built streams exercise every tag form (spec-level known answers)") {
    // literal(5 bytes "hello") — tag (5-1)<<2 | 00
    val lit = Array[Byte](5, (4 << 2).toByte, 'h', 'e', 'l', 'l', 'o')
    assert(SnappyBlock.decode(lit).map(new String(_, "UTF-8")) === Some("hello"))
    // "ab" + offset-2 len-6 copy (tag form 10: len-1 = 5) = "abababab"
    val c2 = Array[Byte](8, (1 << 2).toByte, 'a', 'b', ((5 << 2) | 2).toByte, 2, 0)
    assert(SnappyBlock.decode(c2).map(new String(_, "UTF-8")) === Some("abababab"))
    // 1-byte-offset form (01): len-4 in bits 2..4, offset high bits 5..7
    // "abcd" + copy(off 4, len 4) = "abcdabcd"
    val c1 = Array[Byte](8, (3 << 2).toByte, 'a', 'b', 'c', 'd', 1, 4)
    assert(SnappyBlock.decode(c1).map(new String(_, "UTF-8")) === Some("abcdabcd"))
    // 4-byte-offset form (11): same copy, offset 4 as LE32
    val c4 = Array[Byte](8, (3 << 2).toByte, 'a', 'b', 'c', 'd', ((3 << 2) | 3).toByte, 4, 0, 0, 0)
    assert(SnappyBlock.decode(c4).map(new String(_, "UTF-8")) === Some("abcdabcd"))
    // 61-escape literal: 100 bytes, length-1=99 in one extra byte
    val body = Array.fill[Byte](100)('q')
    val esc = Array[Byte](100, (60 << 2).toByte, 99) ++ body
    assert(SnappyBlock.decode(esc).map(_.length) === Some(100))
    // offset-1 RLE: "z" + copy(off 1, len 7) = "zzzzzzzz"
    val rle = Array[Byte](8, 0, 'z', ((3 << 2) | 1).toByte, 1)
    assert(SnappyBlock.decode(rle).map(new String(_, "UTF-8")) === Some("zzzzzzzz"))
  }

  test("structural lies quarantine: truncation, bad offset, length lies, trailing bytes") {
    val good = SnappyFixture.fileBytes(3L)
    assert(SnappyBlock.decode(good).isDefined)
    assert(SnappyBlock.decode(good.take(good.length - 2)).isEmpty, "truncated body")
    assert(SnappyBlock.decode(good ++ Array[Byte](7)).isEmpty, "trailing byte")
    assert(SnappyBlock.decode(Array.empty[Byte]).isEmpty, "empty input (no varint)")
    assert(SnappyBlock.decode(Array[Byte](-1, -1, -1, -1, -1)).isEmpty, "runaway varint")
    // declared length longer than the elements produce
    val lenLie = good.clone(); lenLie(0) = (lenLie(0) + 1).toByte
    assert(SnappyBlock.decode(lenLie).isEmpty, "declared-length lie (long)")
    // copy reaching back before the start of the output
    val badOff = Array[Byte](8, (1 << 2).toByte, 'a', 'b', ((5 << 2) | 2).toByte, 9, 0)
    assert(SnappyBlock.decode(badOff).isEmpty, "offset beyond produced bytes")
    val zeroOff = Array[Byte](8, (1 << 2).toByte, 'a', 'b', ((5 << 2) | 2).toByte, 0, 0)
    assert(SnappyBlock.decode(zeroOff).isEmpty, "offset 0")
    // crafted huge preamble must not allocate (bound check, not OOM)
    val huge = Array[Byte](-1, -1, -1, -1, 15) // varint ≈ 4 GiB
    assert(SnappyBlock.decode(huge).isEmpty, "unbounded declared length")
  }
}
