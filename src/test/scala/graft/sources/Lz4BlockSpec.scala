package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** x199 LZ4 reader: fixture truth, official-library cross-agreement,
  * hand-built sequence known answers, and the quarantine matrix. */
class Lz4BlockSpec extends AnyFunSuite {

  private def frame(raw: Array[Byte], comp: Array[Byte]): Array[Byte] = {
    val n = raw.length
    Array[Byte](n.toByte, (n >> 8).toByte, (n >> 16).toByte, (n >> 24).toByte) ++ comp
  }

  test("all 200 fixture payloads decode to the formula content") {
    (0L until 200L).foreach { z =>
      val got = Lz4Block.decode(Lz4Fixture.fileBytes(z))
        .getOrElse(fail(s"payload $z quarantined"))
      assert(new String(got, "UTF-8") === Lz4Fixture.content(z), s"payload $z")
    }
  }

  test("official lz4-java agrees with our reader on arbitrary material") {
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val safe = net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
    val samples = Seq(
      "",
      "y",
      "ab" * 300,                            // period-2 overlap match
      ("B" * 400) + "end",                   // long run, >15 match-length escapes
      (0 until 600).map(i => s"row $i ${i * 7}\n").mkString, // >15 literal escapes + far matches
      "no-repeats: " + (0 until 64).map(i => ('0' + (i * 7) % 75).toChar).mkString
    )
    samples.foreach { s0 =>
      val raw = s0.getBytes("UTF-8")
      val c = comp.compress(raw)
      val ours = Lz4Block.decode(frame(raw, c)).getOrElse(fail(s"quarantined: ${s0.take(20)}"))
      assert(java.util.Arrays.equals(ours, raw), s"mismatch on ${s0.take(20)}")
      assert(java.util.Arrays.equals(safe.decompress(c, raw.length), ours))
    }
  }

  test("hand-built sequences (spec-level known answers)") {
    // one literals-only sequence: token 0x50, "hello"
    val lit = Array[Byte](5, 0, 0, 0, 0x50, 'h', 'e', 'l', 'l', 'o')
    assert(Lz4Block.decode(lit).map(new String(_, "UTF-8")) === Some("hello"))
    // "ab" + match(off 2, len 6) + final literals "!" :
    // token 0x22 (2 literals, mlen 2+4=6), "ab", offset 2, token 0x10, "!"
    val seq = Array[Byte](9, 0, 0, 0, 0x22, 'a', 'b', 2, 0, 0x10, '!')
    assert(Lz4Block.decode(seq).map(new String(_, "UTF-8")) === Some("abababab!"))
    // literal-length escape: 15 + 5 = 20 literals
    val esc = Array[Byte](20, 0, 0, 0, 0xf0.toByte, 5) ++ Array.fill[Byte](20)('q')
    assert(Lz4Block.decode(esc).map(_.length) === Some(20))
    // match-length escape: "z" + match(off 1, len 15+4+3=22) + final "" :
    // declared 23; token 0x1f, "z", off 1, ext 3, final token 0x00
    val mesc = Array[Byte](23, 0, 0, 0, 0x1f, 'z', 1, 0, 3, 0x00)
    assert(Lz4Block.decode(mesc).map(new String(_, "UTF-8")) === Some("z" * 23))
    // empty: declared 0, no body
    assert(Lz4Block.decode(Array[Byte](0, 0, 0, 0)).map(_.length) === Some(0))
  }

  test("structural lies quarantine") {
    val good = Lz4Fixture.fileBytes(5L)
    assert(Lz4Block.decode(good).isDefined)
    assert(Lz4Block.decode(good.take(good.length - 2)).isEmpty, "truncated body")
    assert(Lz4Block.decode(good ++ Array[Byte](3)).isEmpty, "trailing byte")
    assert(Lz4Block.decode(Array[Byte](1, 0)).isEmpty, "truncated header")
    // declared-length lie (one longer): final sequence under-fills
    val lenLie = good.clone(); lenLie(0) = (lenLie(0) + 1).toByte
    assert(Lz4Block.decode(lenLie).isEmpty, "declared-length lie")
    // offset 0 and offset beyond produced bytes
    val off0 = Array[Byte](8, 0, 0, 0, 0x22, 'a', 'b', 0, 0, 0x10, '!')
    assert(Lz4Block.decode(off0).isEmpty, "offset 0")
    val offBig = Array[Byte](9, 0, 0, 0, 0x22, 'a', 'b', 9, 0, 0x10, '!')
    assert(Lz4Block.decode(offBig).isEmpty, "offset beyond produced")
    // final sequence with a non-zero match nibble
    val badFinal = Array[Byte](5, 0, 0, 0, 0x53, 'h', 'e', 'l', 'l', 'o')
    assert(Lz4Block.decode(badFinal).isEmpty, "non-zero final match nibble")
    // crafted huge declared size must not allocate
    val huge = Array[Byte](-1, -1, -1, 0x70, 0x10, 'x')
    assert(Lz4Block.decode(huge).isEmpty, "unbounded declared length")
    // runaway literal-length extension past EOF
    val runaway = Array[Byte](40, 0, 0, 0, 0xf0.toByte, 0xff.toByte, 0xff.toByte)
    assert(Lz4Block.decode(runaway).isEmpty, "runaway literal extension")
  }
}
