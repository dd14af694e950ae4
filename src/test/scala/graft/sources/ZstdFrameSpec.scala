package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Conformance for the from-scratch RFC 8878 decoder: every fixture is
  * compressed by the OFFICIAL zstd (Spark's bundled zstd-jni) and must
  * decode bit-exactly — across compression levels (different table
  * strategies), sizes (single- vs 4-stream Huffman, multi-block frames),
  * and content shapes (runs → RLE, text → Huffman+FSE, high-entropy →
  * raw blocks). Structural lies quarantine to None, never wrong bytes.
  */
class ZstdFrameSpec extends AnyFunSuite {

  private def official(raw: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(raw, level)

  private def roundtrip(raw: Array[Byte], level: Int = 3): Unit = {
    val dec = ZstdFrame.decode(official(raw, level))
    assert(dec.isDefined, s"decode failed (n=${raw.length}, level=$level)")
    assert(java.util.Arrays.equals(dec.get, raw), s"bytes differ (n=${raw.length}, level=$level)")
  }

  test("fixture content classes, all 200 ids, official encoder agreement") {
    (0L until 200L).foreach(z => roundtrip(ZstdFixture.content(z).getBytes("UTF-8")))
  }

  test("compression levels exercise different table strategies") {
    val text = ZstdFixture.content(7L).getBytes("UTF-8")
    for (lvl <- Seq(1, 3, 9, 19)) roundtrip(text, lvl)
  }

  test("size sweep: single-stream vs 4-stream Huffman, multi-block frames") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 2, 100, 500, 1024, 1500, 5000, 20000, 200000)) {
      // skewed alphabet → compressible → Huffman paths
      val skew = Array.tabulate[Byte](n)(i => ('a' + (rnd.nextInt(6) * rnd.nextInt(3)) % 26).toByte)
      roundtrip(skew)
    }
  }

  test("pure runs (RLE blocks) and alternating structure") {
    roundtrip(Array.fill[Byte](700)('Q'))
    roundtrip(Array.fill[Byte](200000)('Q'))
    roundtrip(Array.tabulate[Byte](4096)(i => (i % 2).toByte))
  }

  test("high-entropy input (raw blocks)") {
    val rnd = new scala.util.Random(7)
    val raw = new Array[Byte](10000)
    rnd.nextBytes(raw)
    roundtrip(raw)
  }

  test("repeat-offset stress: interleaved periodic patterns") {
    val sb = new StringBuilder
    for (i <- 0 until 500) sb.append(if (i % 3 == 0) "abcdefgh" else if (i % 3 == 1) "abcdefgh" else s"x${i % 10}y")
    roundtrip(sb.toString.getBytes("UTF-8"))
  }

  test("quarantine matrix: structural lies → None, never wrong bytes") {
    val good = official(ZstdFixture.content(3L).getBytes("UTF-8"))
    assert(ZstdFrame.decode(Array.emptyByteArray).isEmpty)
    assert(ZstdFrame.decode(good.take(3)).isEmpty) // truncated magic
    val badMagic = good.clone(); badMagic(0) = 0x00
    assert(ZstdFrame.decode(badMagic).isEmpty)
    val dictFlag = good.clone(); dictFlag(4) = (dictFlag(4) | 0x01).toByte
    assert(ZstdFrame.decode(dictFlag).isEmpty) // dictionary frames refused
    val reserved = good.clone(); reserved(4) = (reserved(4) | 0x08).toByte
    assert(ZstdFrame.decode(reserved).isEmpty) // reserved descriptor bit
    assert(ZstdFrame.decode(good ++ Array[Byte](0x00)).isEmpty) // trailing bytes
    assert(ZstdFrame.decode(good.dropRight(1)).isEmpty) // truncated body
  }

  test("checksum-flagged frames are refused, not silently unverified") {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setChecksum(true)
    val framed = ctx.compress(ZstdFixture.content(5L).getBytes("UTF-8"))
    assert(ZstdFrame.decode(framed).isEmpty)
  }
}
