package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** RFC 1951/1950/1952 decoder (x264) — the x198/x199/x227 conformance
  * split: the OFFICIAL implementation (JDK Deflater/GZIPOutputStream,
  * which wraps zlib itself) writes every fixture; the from-scratch reader
  * must reproduce bytes AND the consumed-count contract exactly, across
  * every compression level and strategy; malformed shapes quarantine.
  * The PNG/ZIP/WARC/Avro suites re-run their whole corpora through this
  * decoder too (useScratch defaults true), so the format-level specs are
  * additional conformance surface.
  */
class InflateSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte], level: Int, strategy: Int = java.util.zip.Deflater.DEFAULT_STRATEGY)
      : Array[Byte] = {
    val d = new java.util.zip.Deflater(level, true)
    d.setStrategy(strategy)
    d.setInput(data)
    d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) bos.write(tmp, 0, d.deflate(tmp))
    d.end()
    bos.toByteArray
  }

  private val rnd = new java.util.Random(20260815L)
  private def randomBytes(n: Int): Array[Byte] = { val a = new Array[Byte](n); rnd.nextBytes(a); a }

  private val payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.empty[Byte],
    "one" -> Array[Byte](42),
    "ascii" -> "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"),
    "runs" -> ("A" * 1000 + "B" * 500 + "A" * 1000).getBytes("UTF-8"),
    "allbytes" -> Array.tabulate(1024)(i => i.toByte),
    "tokens" -> (0 until 4000).map(i => s"tok${i % 23} ").mkString.getBytes("UTF-8"),
    "random" -> randomBytes(4096), // incompressible → stored blocks at most levels
    "maxlen" -> (Array.fill[Byte](300)(7) ++ Array.fill[Byte](258)(7)), // 258-length matches
    "fardist" -> {
      val head = "needle-1234567890".getBytes("UTF-8")
      head ++ randomBytes(31000) ++ head // back-reference near the 32 KiB window edge
    },
    "big" -> (0 until 3000).map(i => s"line $i value ${i * 37 % 101}\n").mkString.getBytes("UTF-8")
  )

  test("raw deflate: byte- and consumed-identical to the JDK twin at every level and strategy") {
    var stored = 0; var fixed = 0; var dyn = 0
    for {
      (name, data) <- payloads
      level <- Seq(0, 1, 6, 9)
      strategy <- Seq(
        java.util.zip.Deflater.DEFAULT_STRATEGY,
        java.util.zip.Deflater.FILTERED,
        java.util.zip.Deflater.HUFFMAN_ONLY
      )
    } {
      val comp = deflate(data, level, strategy)
      val mine = Inflate.raw(comp, 0, comp.length, 64 << 20)
      val jdk = Inflate.rawJdk(comp, 0, comp.length, 64 << 20)
      assert(mine.isDefined && jdk.isDefined, s"$name level=$level strat=$strategy")
      assert(mine.get.data.toSeq === data.toSeq, s"$name level=$level strat=$strategy bytes")
      assert(mine.get.data.toSeq === jdk.get.data.toSeq, s"$name level=$level strat=$strategy twin")
      assert(mine.get.consumed === jdk.get.consumed, s"$name level=$level strat=$strategy consumed")
      stored += mine.get.nStored; fixed += mine.get.nFixed; dyn += mine.get.nDynamic
    }
    // the matrix is conformance-COMPLETE across block types: level 0
    // emits stored, small/huffman-only inputs emit fixed, big text emits
    // dynamic — all three decoders are load-bearing
    assert(stored > 0 && fixed > 0 && dyn > 0, s"block coverage stored=$stored fixed=$fixed dynamic=$dyn")
  }

  test("raw deflate at an offset reports consumed relative to the member start") {
    val data = "offset payload with some repetition repetition repetition".getBytes("UTF-8")
    val comp = deflate(data, 9)
    val buf = Array.fill[Byte](7)(0x55) ++ comp ++ Array.fill[Byte](9)(0x66)
    val o = Inflate.raw(buf, 7, buf.length, 1 << 20).get
    assert(o.data.toSeq === data.toSeq)
    assert(o.consumed === comp.length) // trailing garbage is never consumed
  }

  test("zlib: round-trip, FDICT quarantine, bad FCHECK, corrupted Adler-32") {
    val data = "zlib wrapper payload ".getBytes("UTF-8") ++ randomBytes(500)
    val d = new java.util.zip.Deflater(6)
    d.setInput(data); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) bos.write(tmp, 0, d.deflate(tmp))
    d.end()
    val z = bos.toByteArray
    assert(Inflate.zlib(z, 1 << 20).get.toSeq === data.toSeq)
    // FDICT set (with FCHECK re-fixed) quarantines
    val fd = z.clone()
    fd(1) = (fd(1) | 0x20).toByte
    val rem = (((fd(0) & 0xff) << 8) | (fd(1) & 0xf0)) % 31
    fd(1) = ((fd(1) & 0xf0) | ((31 - rem) % 31)).toByte
    assert(Inflate.zlib(fd, 1 << 20) === None)
    // FCHECK violation quarantines
    val fc = z.clone(); fc(1) = (fc(1) ^ 1).toByte
    assert(Inflate.zlib(fc, 1 << 20) === None)
    // corrupted Adler-32 trailer quarantines
    val ad = z.clone(); ad(ad.length - 1) = (ad(ad.length - 1) ^ 0x7f).toByte
    assert(Inflate.zlib(ad, 1 << 20) === None)
  }

  test("gzip: member round-trip, full-member consumed, multi-member concat, trailer checks") {
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(data); g.close()
      bos.toByteArray
    }
    val a = "first member line\n".getBytes("UTF-8")
    val b = ("second " * 400).getBytes("UTF-8")
    val ga = gz(a); val gb = gz(b)
    val m = Inflate.gzipMember(ga, 0, 1 << 20).get
    assert(m.data.toSeq === a.toSeq)
    assert(m.consumed === ga.length) // header + body + 8-byte trailer, exactly
    // two concatenated members (the WARC transport shape)
    val both = ga ++ gb
    assert(Inflate.gunzip(both, 1 << 20).get.toSeq === (a ++ b).toSeq)
    val second = Inflate.gzipMember(both, ga.length, 1 << 20).get
    assert(second.data.toSeq === b.toSeq && second.consumed === gb.length)
    // corrupted CRC32 trailer quarantines
    val bad = ga.clone(); bad(bad.length - 5) = (bad(bad.length - 5) ^ 1).toByte
    assert(Inflate.gzipMember(bad, 0, 1 << 20) === None)
    // wrong ISIZE quarantines
    val bi = ga.clone(); bi(bi.length - 1) = (bi(bi.length - 1) ^ 1).toByte
    assert(Inflate.gzipMember(bi, 0, 1 << 20) === None)
    // reserved FLG bits quarantine
    val rf = ga.clone(); rf(3) = (rf(3) | 0x80).toByte
    assert(Inflate.gzipMember(rf, 0, 1 << 20) === None)
    // truncated body quarantines; trailing garbage fails gunzip
    assert(Inflate.gzipMember(ga.take(ga.length - 12), 0, 1 << 20) === None)
    assert(Inflate.gunzip(ga ++ Array[Byte](1, 2, 3), 1 << 20) === None)
    // optional header fields: FEXTRA + FNAME crafted around the same body
    val deflated = java.util.Arrays.copyOfRange(ga, 10, ga.length) // default header is 10 bytes, no options
    val crafted = Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8).toByte, 0, 0, 0, 0, 0, 3) ++
      Array[Byte](3, 0) ++ Array[Byte](9, 9, 9) ++ // FEXTRA: XLEN=3
      "name.txt".getBytes("UTF-8") ++ Array[Byte](0) ++ // FNAME
      deflated
    val cm = Inflate.gzipMember(crafted, 0, 1 << 20).get
    assert(cm.data.toSeq === a.toSeq && cm.consumed === crafted.length)
  }

  test("malformed DEFLATE shapes quarantine, never return wrong bytes") {
    // reserved block type 11
    assert(Inflate.raw(Array[Byte](0x07), 0, 1, 1024) === None)
    // stored block with NLEN not the ones-complement of LEN
    assert(Inflate.raw(Array[Byte](0x01, 2, 0, 0, 0, 'a', 'b'), 0, 7, 1024) === None)
    // ... and the valid twin decodes (the corruption above is load-bearing)
    val ok = Inflate.raw(Array[Byte](0x01, 2, 0, 0xfd.toByte, 0xff.toByte, 'a', 'b'), 0, 7, 1024).get
    assert(new String(ok.data, "UTF-8") === "ab" && ok.nStored === 1)
    // fixed block whose first symbol is a match: distance before output start
    val bits = new scala.collection.mutable.ArrayBuffer[Int]
    def push(v: Int, n: Int): Unit = { var k = 0; while (k < n) { bits += (v >> k) & 1; k += 1 } } // LSB-first
    def pushCode(code: Int, n: Int): Unit = { var k = n - 1; while (k >= 0) { bits += (code >> k) & 1; k -= 1 } }
    push(1, 1); push(1, 2) // BFINAL, BTYPE=01
    pushCode(1, 7) // literal/length symbol 257 (7-bit code 0000001) = length 3
    pushCode(0, 5) // distance symbol 0 = distance 1, but output is empty
    val crafted = bits.grouped(8).map(g => g.zipWithIndex.map { case (v, i) => v << i }.sum.toByte).toArray
    assert(Inflate.raw(crafted, 0, crafted.length, 1024) === None)
    // truncated stream (mid-block end of input)
    val comp = deflate(("xyz" * 500).getBytes("UTF-8"), 9)
    assert(Inflate.raw(comp, 0, comp.length - 5, 1 << 20) === None)
    // output cap: a decompression bomb stops at maxOut
    assert(Inflate.raw(deflate(new Array[Byte](100000), 9), 0, Int.MaxValue, 4096) === None)
  }

  test("the production call sites dispatch through the toggle and the twins agree") {
    val png = PngPixels.synthesize(9, 7, (x, y) => (x * 20, y * 30, (x + y) * 10))
    val prev = Inflate.useScratch
    try {
      Inflate.useScratch = true
      val a = PngPixels.decode(png).get
      Inflate.useScratch = false
      val b = PngPixels.decode(png).get
      for (x <- 0 until 9; y <- 0 until 7) assert(a.rgb(x, y) === b.rgb(x, y))
    } finally Inflate.useScratch = prev
  }
}
