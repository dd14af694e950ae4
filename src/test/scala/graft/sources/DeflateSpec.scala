package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** RFC 1951/1950/1952 ENCODER (x268) — the x264 conformance split run in
  * reverse: the from-scratch encoder writes, and the OFFICIAL
  * implementation (JDK Inflater / GZIPInputStream — zlib itself) must
  * decode every stream byte-exactly; graft's own from-scratch decoder
  * (x264) must agree, closing the loop without either side echoing the
  * other's tables. All three block strategies and all three wrappers are
  * exercised, plus the degenerate shapes a strict inflater rejects when an
  * encoder gets the spec's edge clauses wrong (incomplete litlen tables,
  * single-distance codes, HDIST trimming, CL-code completeness).
  */
class DeflateSpec extends AnyFunSuite {

  private def inflateJdk(comp: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(comp)
    val bos = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    try {
      var ok = true
      while (ok && !inf.finished()) {
        val n = inf.inflate(tmp)
        bos.write(tmp, 0, n)
        // finished may flip DURING the zero-output call (empty payloads)
        if (n == 0 && !inf.finished() && (inf.needsInput() || inf.needsDictionary())) ok = false
      }
      if (ok) Some(bos.toByteArray) else None
    } catch { case _: java.util.zip.DataFormatException => None } finally inf.end()
  }

  private val rnd = new java.util.Random(20260815L)
  private def randomBytes(n: Int): Array[Byte] = { val a = new Array[Byte](n); rnd.nextBytes(a); a }

  private val payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.empty[Byte],
    "one" -> Array[Byte](42),
    "two" -> Array[Byte](1, 2),
    "three-run" -> Array[Byte](9, 9, 9),
    "ascii" -> "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"),
    "overlap" -> ("abc" * 200).getBytes("UTF-8"), // dist < len copies
    "runs" -> ("A" * 1000 + "B" * 500 + "A" * 1000).getBytes("UTF-8"),
    "allbytes" -> Array.tabulate(1024)(i => i.toByte),
    "tokens" -> (0 until 4000).map(i => s"tok${i % 23} ").mkString.getBytes("UTF-8"),
    "random" -> randomBytes(4096),
    "maxlen" -> (Array.fill[Byte](300)(7) ++ Array.fill[Byte](258)(7)),
    "fardist" -> {
      val head = "needle-1234567890".getBytes("UTF-8")
      head ++ randomBytes(31000) ++ head // back-reference near the window edge
    },
    "big" -> (0 until 3000).map(i => s"line $i value ${i * 37 % 101}\n").mkString.getBytes("UTF-8"),
    "huge" -> randomBytes(140000) // > 2×65535: stored path must chunk
  )

  test("raw deflate: every payload × strategy decodes byte-exactly under zlib AND the x264 decoder") {
    for {
      (name, data) <- payloads
      allow <- Seq(Deflate.AllowStored, Deflate.AllowFixed, Deflate.AllowDynamic, Deflate.AllowAll)
    } {
      val comp = Deflate.deflateRaw(data, allow)
      val jdk = inflateJdk(comp)
      assert(jdk.isDefined, s"$name allow=$allow: zlib rejected the stream")
      assert(jdk.get.toSeq === data.toSeq, s"$name allow=$allow: zlib bytes")
      val mine = Inflate.raw(comp, 0, comp.length, 64 << 20)
      assert(mine.isDefined, s"$name allow=$allow: own decoder rejected")
      assert(mine.get.data.toSeq === data.toSeq, s"$name allow=$allow: own bytes")
      assert(mine.get.consumed === comp.length, s"$name allow=$allow: stream fully consumed")
    }
  }

  test("cost pick: auto never exceeds any forced strategy, and dynamic wins on skewed text") {
    val text = (0 until 4000).map(i => s"tok${i % 23} ").mkString.getBytes("UTF-8")
    val auto = Deflate.deflateRaw(text).length
    val stored = Deflate.deflateRaw(text, Deflate.AllowStored).length
    val fixed = Deflate.deflateRaw(text, Deflate.AllowFixed).length
    val dyn = Deflate.deflateRaw(text, Deflate.AllowDynamic).length
    assert(auto <= stored && auto <= fixed && auto <= dyn)
    assert(dyn < fixed && fixed < stored, s"dyn=$dyn fixed=$fixed stored=$stored")
    // incompressible bytes: stored must win the auto pick
    val noise = randomBytes(8192)
    assert(Deflate.deflateRaw(noise).length <= noise.length + 5 * 2 + 2)
  }

  test("degenerate alphabets: dynamic is excluded, not mis-encoded") {
    // empty input and a 1–2 byte input have <2 used litlen symbols (EOB
    // only / EOB+1) — a dynamic table would be incomplete; the forced-
    // dynamic mask must fall back to a stream zlib still accepts
    for (data <- Seq(Array.empty[Byte], Array[Byte](7), Array[Byte](7, 7))) {
      val comp = Deflate.deflateRaw(data, Deflate.AllowDynamic)
      assert(inflateJdk(comp).map(_.toSeq) === Some(data.toSeq))
    }
    // exactly two used litlen symbols (one literal + EOB) IS encodable
    // dynamically: both get 1-bit codes, a complete tree
    val d2 = Array[Byte](5, 6)
    val comp2 = Deflate.deflateRaw(Array.fill[Byte](64)(5) ++ Array.fill[Byte](64)(6), Deflate.AllowDynamic)
    assert(inflateJdk(comp2).isDefined)
    assert(inflateJdk(Deflate.deflateRaw(d2, Deflate.AllowAll)).map(_.toSeq) === Some(d2.toSeq))
  }

  test("single-distance-code streams carry the §3.2.7 one-unused-code shape zlib accepts") {
    // one repeated 4-gram at one distance → exactly one used distance code
    val data = ("wxyz" * 400).getBytes("UTF-8")
    val comp = Deflate.deflateRaw(data, Deflate.AllowDynamic)
    assert(inflateJdk(comp).map(_.toSeq) === Some(data.toSeq))
    assert(Inflate.raw(comp, 0, comp.length, 1 << 20).get.data.toSeq === data.toSeq)
  }

  test("zlib wrapper: header FCHECK and Adler-32 verify under both decoders") {
    for ((name, data) <- payloads) {
      val comp = Deflate.zlibCompress(data)
      assert((((comp(0) & 0xff) * 256 + (comp(1) & 0xff)) % 31) === 0, s"$name FCHECK")
      // official twin
      val inf = new java.util.zip.Inflater()
      inf.setInput(comp)
      val bos = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        bos.write(tmp, 0, n)
        if (n == 0 && !inf.finished() && inf.needsInput()) fail(s"$name: zlib twin stalled")
      }
      inf.end()
      assert(bos.toByteArray.toSeq === data.toSeq, s"$name zlib twin")
      assert(Inflate.zlib(comp, 64 << 20).map(_.toSeq) === Some(data.toSeq), s"$name own zlib")
    }
  }

  test("gzip wrapper: GZIPInputStream (zlib) decodes; trailer CRC-32 + ISIZE verify; members concat") {
    for ((name, data) <- payloads) {
      val comp = Deflate.gzipCompress(data)
      val g = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(comp))
      val bos = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = g.read(tmp)
      while (n >= 0) { bos.write(tmp, 0, n); n = g.read(tmp) }
      assert(bos.toByteArray.toSeq === data.toSeq, s"$name gzip twin")
      assert(Inflate.gunzip(comp, 64 << 20).map(_.toSeq) === Some(data.toSeq), s"$name own gunzip")
    }
    // multi-member concatenation is part of RFC 1952; both decoders walk it
    val a = "first member ".getBytes("UTF-8")
    val b = "second member".getBytes("UTF-8")
    val cat = Deflate.gzipCompress(a) ++ Deflate.gzipCompress(b)
    assert(Inflate.gunzip(cat, 1 << 20).map(new String(_, "UTF-8")) === Some("first member second member"))
  }

  test("determinism: identical input → identical bytes across calls") {
    val data = (0 until 999).map(i => s"d$i ${i * 7 % 13}\n").mkString.getBytes("UTF-8")
    val x = Deflate.deflateRaw(data)
    assert(Deflate.deflateRaw(data).toSeq === x.toSeq)
    assert(Deflate.gzipCompress(data).toSeq === Deflate.gzipCompress(data).toSeq)
  }

  test("package-merge lengths are Kraft-complete, depth-limited, and optimal-monotone") {
    val freq = Array(90, 1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 0, 0, 144, 233, 377)
    val lens = Deflate.limitedLengths(freq, 7)
    assert(lens.max <= 7)
    assert(lens.zip(freq).forall { case (l, f) => (l > 0) === (f > 0) })
    // completeness: sum 2^-l == 1 over used symbols
    val kraft = lens.filter(_ > 0).map(l => 1 << (7 - l)).sum
    assert(kraft === (1 << 7))
    // monotone: a strictly higher-frequency symbol never gets a longer code
    for (i <- freq.indices; j <- freq.indices if freq(i) > freq(j) && freq(j) > 0)
      assert(lens(i) <= lens(j), s"freq ${freq(i)}>${freq(j)} but len ${lens(i)}>${lens(j)}")
    // the 15-limit alphabet too, with a Fibonacci ramp that unlimited
    // Huffman would drive past depth 15
    val ramp = {
      var a = 1L; var b = 1L
      Array.fill(25) { val f = a; val t = a + b; a = b; b = t; math.min(f, Int.MaxValue).toInt }
    }
    val l15 = Deflate.limitedLengths(ramp, 15)
    assert(l15.max <= 15 && l15.min >= 1)
    assert(l15.filter(_ > 0).map(l => 1L << (15 - l)).sum === (1L << 15))
  }
}
