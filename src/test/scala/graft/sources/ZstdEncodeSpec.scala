package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Conformance for the from-scratch RFC 8878 ENCODER (x279) — the x268
  * discipline mirrored onto zstd: every emitted frame must be decoded
  * byte-exactly by the OFFICIAL implementation (zstd-jni) AND by graft's
  * own from-scratch [[ZstdFrame]] decoder, across content shapes, sizes
  * (empty → multi-block) and forced block strategies, so all three block
  * emitters stay load-bearing.
  */
class ZstdEncodeSpec extends AnyFunSuite {

  private def officialDecode(comp: Array[Byte], n: Int): Option[Array[Byte]] =
    try Some(com.github.luben.zstd.Zstd.decompress(comp, n))
    catch { case _: com.github.luben.zstd.ZstdException => None }

  private def roundtrip(raw: Array[Byte], allow: Int = ZstdEncode.AllowAll): Array[Byte] = {
    val comp = ZstdEncode.compress(raw, allow)
    val jni = officialDecode(comp, raw.length)
    assert(jni.isDefined, s"official decoder rejected the frame (n=${raw.length}, allow=$allow)")
    assert(java.util.Arrays.equals(jni.get, raw), s"official decode differs (n=${raw.length}, allow=$allow)")
    val self = ZstdFrame.decode(comp)
    assert(self.isDefined, s"scratch decoder rejected the frame (n=${raw.length}, allow=$allow)")
    assert(java.util.Arrays.equals(self.get, raw), s"scratch decode differs (n=${raw.length}, allow=$allow)")
    comp
  }

  test("fixture content classes, all 200 ids, both decoders byte-exact") {
    (0L until 200L).foreach(z => roundtrip(ZstdFixture.content(z).getBytes("UTF-8")))
  }

  test("every forced strategy round-trips on every content class") {
    for {
      z <- 0L until 40L
      allow <- Seq(ZstdEncode.AllowRaw, ZstdEncode.AllowSeq, ZstdEncode.AllowRaw | ZstdEncode.AllowRle)
    } roundtrip(ZstdFixture.content(z).getBytes("UTF-8"), allow)
  }

  test("size sweep including empty, 1-byte, and multi-block frames") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 2, 3, 31, 32, 255, 256, 4095, 4096, 65791, 65792, 200000, 300000)) {
      val skew = Array.tabulate[Byte](n)(_ => ('a' + rnd.nextInt(5)).toByte)
      roundtrip(skew)
    }
  }

  test("pure runs pick RLE blocks; the frame stays tiny") {
    val run = Array.fill[Byte](100000)('Q')
    val comp = roundtrip(run)
    assert(comp.length < 32, s"RLE frame should be a few bytes, got ${comp.length}")
  }

  test("high-entropy input falls back to raw blocks; overhead is bounded") {
    val rnd = new scala.util.Random(13)
    val raw = new Array[Byte](50000)
    rnd.nextBytes(raw)
    val comp = roundtrip(raw)
    assert(comp.length <= raw.length + 3 * ((raw.length / (124 << 10)) + 1) + 10)
  }

  test("auto pick never loses to a forced strategy") {
    for (z <- 0L until 60L) {
      val raw = ZstdFixture.content(z).getBytes("UTF-8")
      val auto = ZstdEncode.compress(raw).length
      val forced = Seq(ZstdEncode.AllowRaw, ZstdEncode.AllowRle | ZstdEncode.AllowRaw, ZstdEncode.AllowSeq)
        .map(a => ZstdEncode.compress(raw, a).length)
        .min
      assert(auto <= forced, s"auto $auto > forced $forced at z=$z")
    }
  }

  test("compressible text actually compresses through the sequence path") {
    val text = ("the quick brown fox jumps over the lazy dog. " * 200).getBytes("UTF-8")
    val comp = roundtrip(text)
    assert(comp.length < text.length / 3, s"expected real compression, got ${comp.length}/${text.length}")
  }

  test("official zstd output decodes through scratch decoder and vice versa (both directions pinned)") {
    for (z <- 0L until 30L) {
      val raw = ZstdFixture.content(z).getBytes("UTF-8")
      // official encode → scratch decode (x227's direction)
      val offComp = com.github.luben.zstd.Zstd.compress(raw, 3)
      assert(ZstdFrame.decode(offComp).exists(java.util.Arrays.equals(_, raw)))
      // scratch encode → official decode (x279's direction)
      roundtrip(raw)
    }
  }

  // ------------------------------------------------ Huffman literals (x280)

  test("forced-Huffman literals round-trip on every content class and a size sweep") {
    for (z <- 0L until 40L) {
      val raw = ZstdFixture.content(z).getBytes("UTF-8")
      val comp = ZstdEncode.compress(raw, ZstdEncode.AllowAll, forceHuf = true)
      assert(officialDecode(comp, raw.length).exists(java.util.Arrays.equals(_, raw)), s"jni z=$z")
      assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, raw)), s"self z=$z")
    }
    val rnd = new scala.util.Random(29)
    for (n <- Seq(16, 100, 1023, 1024, 1100, 5000, 40000)) {
      val hex = Array.tabulate[Byte](n)(_ => "0123456789abcdef".charAt(rnd.nextInt(16)).toByte)
      val comp = ZstdEncode.compress(hex, ZstdEncode.AllowAll, forceHuf = true)
      assert(officialDecode(comp, n).exists(java.util.Arrays.equals(_, hex)), s"jni n=$n")
      assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, hex)), s"self n=$n")
    }
  }

  test("entropy-skewed literals engage Huffman under the cost pick and win") {
    val rnd = new scala.util.Random(31)
    val hex = Array.tabulate[Byte](3000)(_ => "0123456789abcdef".charAt(rnd.nextInt(16)).toByte)
    val withHuf = ZstdEncode.compress(hex, ZstdEncode.AllowAll)
    val withoutHuf = ZstdEncode.compress(hex, ZstdEncode.AllowAll & ~ZstdEncode.AllowHuf)
    assert(withHuf.length < withoutHuf.length, s"${withHuf.length} !< ${withoutHuf.length}")
    assert(officialDecode(withHuf, hex.length).exists(java.util.Arrays.equals(_, hex)))
    assert(ZstdFrame.decode(withHuf).exists(java.util.Arrays.equals(_, hex)))
  }

  test("4-stream literals: a matchless pair enumeration forces >1023 literals through Huffman") {
    // all ordered pairs (a,b), a != b, over a 34-symbol alphabet: consecutive
    // pairs are unique, so LZ77 matches are rare collisions and the literal
    // set stays far above the 1023 single-stream ceiling
    val syms = (40 until 74).map(_.toByte).toArray
    val bos = new java.io.ByteArrayOutputStream()
    for (a <- syms; b <- syms if a != b) { bos.write(a); bos.write(b) }
    val raw = bos.toByteArray // 2244 bytes
    val comp = ZstdEncode.compress(raw, ZstdEncode.AllowAll, forceHuf = true)
    assert(officialDecode(comp, raw.length).exists(java.util.Arrays.equals(_, raw)))
    assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, raw)))
    // 34-symbol alphabet → ≤ 6 bits/byte once Huffman engages
    val plain = ZstdEncode.compress(raw, ZstdEncode.AllowAll & ~ZstdEncode.AllowHuf)
    assert(comp.length < plain.length)
  }

  test("bytes above 128 disable the direct weight description; encoder stays valid") {
    val rnd = new scala.util.Random(37)
    val wide = Array.tabulate[Byte](2000)(_ => (rnd.nextInt(200) + 50).toByte) // maxUsed > 128
    val comp = ZstdEncode.compress(wide, ZstdEncode.AllowAll, forceHuf = true)
    assert(officialDecode(comp, wide.length).exists(java.util.Arrays.equals(_, wide)))
    assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, wide)))
  }

  // -------------------------------------------- custom FSE tables (x281)

  test("forced custom FSE tables round-trip on every content class and size sweep") {
    for (z <- 0L until 40L) {
      val raw = ZstdFixture.content(z).getBytes("UTF-8")
      val comp = ZstdEncode.compress(raw, ZstdEncode.AllowAll, forceFse = true)
      assert(officialDecode(comp, raw.length).exists(java.util.Arrays.equals(_, raw)), s"jni z=$z")
      assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, raw)), s"self z=$z")
    }
    val rnd = new scala.util.Random(41)
    for (n <- Seq(50, 500, 5000, 50000, 200000)) {
      val text = Array.tabulate[Byte](n)(_ => "abcde fgh ij klmno pqr".charAt(rnd.nextInt(22)).toByte)
      val comp = ZstdEncode.compress(text, ZstdEncode.AllowAll, forceFse = true)
      assert(officialDecode(comp, n).exists(java.util.Arrays.equals(_, text)), s"jni n=$n")
      assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, text)), s"self n=$n")
    }
  }

  test("custom tables include the RLE sequence mode: constant-offset content") {
    // a strict period-7 repetition: after the first period every match has
    // offset 7 → a single distinct OF code → RLE mode for that channel
    val raw = ("ABCDEFG" * 500).getBytes("UTF-8")
    val comp = ZstdEncode.compress(raw, ZstdEncode.AllowAll, forceFse = true)
    assert(officialDecode(comp, raw.length).exists(java.util.Arrays.equals(_, raw)))
    assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, raw)))
  }

  test("skewed sequence distributions: custom tables win the cost pick on large uniform text") {
    // one dominant (ll, ml, offset) pattern — the predefined distributions
    // pay for generality the content does not use
    val raw = (0 until 3000).map(i => s"row ${i % 7} body").mkString("\n").getBytes("UTF-8")
    val withFse = ZstdEncode.compress(raw, ZstdEncode.AllowAll)
    val withoutFse = ZstdEncode.compress(raw, ZstdEncode.AllowAll & ~ZstdEncode.AllowFse)
    assert(withFse.length <= withoutFse.length)
    assert(officialDecode(withFse, raw.length).exists(java.util.Arrays.equals(_, raw)))
    assert(ZstdFrame.decode(withFse).exists(java.util.Arrays.equals(_, raw)))
  }

  // ------------------------------------------- repeat offsets (x291)

  test("repeat offsets round-trip on every class and never lose the cost pick") {
    for (z <- 0L until 60L) {
      val raw = ZstdFixture.content(z).getBytes("UTF-8")
      val withRep = ZstdEncode.compress(raw)
      val withoutRep = ZstdEncode.compress(raw, ZstdEncode.AllowAll & ~ZstdEncode.AllowRep)
      assert(withRep.length <= withoutRep.length, s"z=$z: rep ${withRep.length} > ${withoutRep.length}")
      assert(officialDecode(withRep, raw.length).exists(java.util.Arrays.equals(_, raw)), s"jni z=$z")
      assert(ZstdFrame.decode(withRep).exists(java.util.Arrays.equals(_, raw)), s"self z=$z")
    }
  }

  test("repeat offsets actually engage: constant-stride recurrences shrink") {
    // The r10 whole-block matcher collapses pure periodic text ("abc"*N)
    // into ONE sequence — no second offset to repeat. Reps need MANY
    // sequences sharing an offset: unique literal runs interleaved with a
    // recurring phrase at constant stride, so every phrase match carries
    // the same distance while the literals between keep the matches
    // separate.
    val rnd = new scala.util.Random(7)
    val sb = new StringBuilder
    (0 until 800).foreach { _ =>
      (0 until 8).foreach(_ => sb.append(('a' + rnd.nextInt(26)).toChar))
      sb.append("the quick brown fox")
    }
    val raw = sb.toString.getBytes("UTF-8")
    val withRep = ZstdEncode.compress(raw, ZstdEncode.AllowAll & ~ZstdEncode.AllowRle) // RLE block would hide it
    val withoutRep = ZstdEncode.compress(raw, ZstdEncode.AllowAll & ~ZstdEncode.AllowRle & ~ZstdEncode.AllowRep)
    assert(withRep.length < withoutRep.length, s"${withRep.length} !< ${withoutRep.length}")
    assert(officialDecode(withRep, raw.length).exists(java.util.Arrays.equals(_, raw)))
    assert(ZstdFrame.decode(withRep).exists(java.util.Arrays.equals(_, raw)))
  }

  test("repeat-offset history threads across blocks (multi-block frames, raw-block gaps)") {
    // 300 KB periodic text → 3 blocks; block 2+ inherit block 1's history.
    val rnd = new scala.util.Random(51)
    val periodic = new StringBuilder
    while (periodic.length < 300000) periodic.append("lorem ipsum dolor sit amet #").append(rnd.nextInt(4)).append(' ')
    val raw = periodic.toString.getBytes("UTF-8")
    val comp = ZstdEncode.compress(raw)
    assert(officialDecode(comp, raw.length).exists(java.util.Arrays.equals(_, raw)), "jni multi-block reps")
    assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, raw)), "self multi-block reps")
    // compressible + incompressible + compressible: the middle RAW block
    // must leave the history untouched for block 3
    val noise = new Array[Byte](130000)
    rnd.nextBytes(noise)
    val mixed = raw.take(130000) ++ noise ++ raw.take(130000)
    val compMixed = ZstdEncode.compress(mixed)
    assert(officialDecode(compMixed, mixed.length).exists(java.util.Arrays.equals(_, mixed)), "jni raw-gap reps")
    assert(ZstdFrame.decode(compMixed).exists(java.util.Arrays.equals(_, mixed)), "self raw-gap reps")
  }

  test("fuzz: 300 random payload shapes × random strategy masks round-trip through both decoders") {
    val rnd = new scala.util.Random(0xc0dec)
    var i = 0
    while (i < 300) {
      val n = rnd.nextInt(6) match {
        case 0 => 0
        case 1 => rnd.nextInt(32)
        case 2 => rnd.nextInt(1000)
        case 3 => rnd.nextInt(10000)
        case 4 => 120000 + rnd.nextInt(20000) // straddles the block boundary
        case _ => rnd.nextInt(300000) // multi-block
      }
      val raw = rnd.nextInt(4) match {
        case 0 => { val b = new Array[Byte](n); rnd.nextBytes(b); b } // entropy
        case 1 => Array.tabulate[Byte](n)(_ => ('a' + rnd.nextInt(4)).toByte) // skewed
        case 2 => Array.fill[Byte](n)((rnd.nextInt(256) - 128).toByte) // run
        case _ => // periodic with noise
          val period = 1 + rnd.nextInt(40)
          Array.tabulate[Byte](n)(j => if (rnd.nextInt(50) == 0) rnd.nextInt(96).toByte else ('0' + (j % period) % 75).toByte)
      }
      val allow = (rnd.nextInt(32) | ZstdEncode.AllowRaw) & ZstdEncode.AllowAll | (rnd.nextInt(2) * ZstdEncode.AllowRep)
      val comp = ZstdEncode.compress(raw, allow, forceHuf = rnd.nextBoolean(), forceFse = rnd.nextBoolean())
      assert(officialDecode(comp, raw.length).exists(java.util.Arrays.equals(_, raw)), s"jni i=$i n=$n allow=$allow")
      assert(ZstdFrame.decode(comp).exists(java.util.Arrays.equals(_, raw)), s"self i=$i n=$n allow=$allow")
      i += 1
    }
  }

  test("deterministic: same input, same bytes") {
    val raw = ZstdFixture.content(17L).getBytes("UTF-8")
    assert(java.util.Arrays.equals(ZstdEncode.compress(raw), ZstdEncode.compress(raw)))
  }
}
