package graft.sources

/** x268 — DEFLATE **encoder** from the public spec (RFC 1951), closing the
  * codec story in BOTH directions: round 8/9 replaced every borrowed
  * *decoder* (Snappy x198, LZ4 x199, zstd x227, DEFLATE x264); this is the
  * write side, so the engine can emit the dominant crawl/archive transport
  * (gzip WARC, zip, zlib PNG) without `java.util.zip.Deflater`.
  *
  * Reference behavior studied from dangkhoipham/data_engineering_capstone
  * (its S3/Airflow pipeline ships gzip'd inputs; see `dags/libs/lib.py`) —
  * the format itself is RFC 1951/1950/1952, implemented from the spec text.
  *
  * Shape:
  *   - LZ77: 3-byte hash chains over a 32 KiB window, max match 258,
  *     bounded chain walk + zlib-style lazy matching (defer a literal when
  *     the next position holds a strictly longer match). Deterministic.
  *   - Entropy: per payload the encoder COSTS all three RFC block types and
  *     emits the cheapest — stored (§3.2.4, 65535-byte chunking), fixed
  *     Huffman (§3.2.6), dynamic Huffman (§3.2.7: package-merge
  *     length-limited codes ≤15 bits, code-length code ≤7 bits, RLE
  *     16/17/18 header). A strategy mask lets the gate force each path so
  *     all three emitters stay load-bearing.
  *   - Degenerate dynamic shapes are excluded rather than special-cased:
  *     with <2 used litlen symbols (empty input) a dynamic table would be
  *     an incomplete litlen code, which strict inflaters reject — the cost
  *     pick falls back to fixed/stored. A single used DISTANCE code is
  *     emitted at length 1 (explicitly legal per §3.2.7: "one code length
  *     of one, with one unused code"); zero distances emit HDIST=1 with a
  *     single zero length.
  *
  * Conformance twin is zlib itself: `java.util.zip.Inflater` must decode
  * every emitted stream byte-exactly, and graft's own from-scratch
  * [[Inflate]] (x264) must agree — both pinned in the x268 gate row.
  */
object Deflate {

  // ------------------------------------------------------------ bit writer

  /** LSB-first bit packer (RFC 1951 §3.1.1). Huffman codes are written
    * MSB-of-code-first, i.e. bit-reversed before packing; extra bits and
    * header fields are written as plain LSB-first integers. */
  private final class BitW {
    private var buf = new Array[Byte](1 << 12)
    private var nBytes = 0
    private var acc = 0L
    private var nBits = 0

    private def flushAcc(): Unit = {
      while (nBits >= 8) {
        if (nBytes == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        buf(nBytes) = (acc & 0xff).toByte
        nBytes += 1
        acc >>>= 8
        nBits -= 8
      }
    }

    def bits(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << nBits
      nBits += n
      flushAcc()
    }

    /** A canonical Huffman code of length n, packed per §3.1.1. */
    def code(c: Int, n: Int): Unit = {
      var r = 0
      var i = 0
      while (i < n) { r = (r << 1) | ((c >> i) & 1); i += 1 }
      bits(r, n)
    }

    def alignByte(): Unit = if (nBits % 8 != 0) bits(0, 8 - (nBits % 8))

    def rawBytes(b: Array[Byte], off: Int, len: Int): Unit = {
      require(nBits == 0, "raw bytes only on a byte boundary")
      if (nBytes + len > buf.length) {
        var cap = buf.length
        while (cap < nBytes + len) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
      System.arraycopy(b, off, buf, nBytes, len)
      nBytes += len
    }

    def result(): Array[Byte] = {
      alignByte()
      java.util.Arrays.copyOf(buf, nBytes)
    }
  }

  // --------------------------------------------------- §3.2.5 code tables

  private val LenBase =
    Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195,
      227, 258)
  private val LenExtra =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase =
    Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073,
      4097, 6145, 8193, 12289, 16385, 24577)
  private val DistExtra =
    Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

  /** length (3..258) -> litlen symbol 257..285, precomputed. */
  private val LenSym: Array[Int] = {
    val a = new Array[Int](259)
    var s = 0
    while (s < 29) {
      val hi = if (s == 28) 258 else LenBase(s + 1) - 1
      var v = LenBase(s)
      while (v <= hi) { a(v) = 257 + s; v += 1 }
      s += 1
    }
    a
  }

  private def distSym(d: Int): Int = {
    var s = 29
    while (DistBase(s) > d) s -= 1
    s
  }

  // ------------------------------------------------------------- LZ77 pass

  private val MinMatch = 3
  private val MaxMatch = 258
  private val WinSize = 32768
  private val HashBits = 15
  private val MaxChain = 256

  /** Token stream: literals as 0..255; matches packed as
    * (1<<30) | (len<<16) | dist. */
  private[sources] def tokenize(data: Array[Byte]): Array[Int] = {
    val n = data.length
    val out = new Array[Int](n + 1)
    var nOut = 0
    if (n < MinMatch + 1) {
      var i = 0
      while (i < n) { out(nOut) = data(i) & 0xff; nOut += 1; i += 1 }
      return java.util.Arrays.copyOf(out, nOut)
    }
    val head = new Array[Int](1 << HashBits)
    java.util.Arrays.fill(head, -1)
    val prev = new Array[Int](n)

    def hash(i: Int): Int =
      (((data(i) & 0xff) << 10) ^ ((data(i + 1) & 0xff) << 5) ^ (data(i + 2) & 0xff)) & ((1 << HashBits) - 1)

    def insert(i: Int): Unit = if (i + MinMatch <= n) { // hash reads i..i+2
      val h = hash(i)
      prev(i) = head(h)
      head(h) = i
    }

    /** longest match at position i, walking the chain; returns (len<<16)|dist
      * or 0. Ties resolve to the nearest (first-found) candidate. */
    def findMatch(i: Int, minLen: Int): Int = {
      if (i + MinMatch > n) return 0
      var cand = head(hash(i))
      var chain = MaxChain
      var bestLen = minLen - 1
      var bestDist = 0
      val maxLen = math.min(MaxMatch, n - i)
      while (cand >= 0 && i - cand <= WinSize && chain > 0) {
        if (cand < i && data(cand + bestLen.max(0).min(maxLen - 1)) == data(i + bestLen.max(0).min(maxLen - 1))) {
          var l = 0
          while (l < maxLen && data(cand + l) == data(i + l)) l += 1
          if (l > bestLen) { bestLen = l; bestDist = i - cand }
        }
        cand = prev(cand)
        chain -= 1
      }
      if (bestLen >= minLen && bestDist >= 1) (bestLen << 16) | bestDist else 0
    }

    var i = 0
    var pendingLit = -1 // deferred literal position for lazy matching
    var pendingMatch = 0 // match found AT pendingLit
    while (i < n) {
      val m = if (i + MinMatch <= n) findMatch(i, MinMatch) else 0
      if (pendingLit >= 0) {
        val pl = pendingMatch >>> 16
        if (m != 0 && (m >>> 16) > pl) {
          // the deferred position's match lost to a longer one here
          out(nOut) = data(pendingLit) & 0xff; nOut += 1
          pendingLit = i; pendingMatch = m
          insert(i)
          i += 1
        } else {
          // emit the deferred match; skip its span
          out(nOut) = (1 << 30) | pendingMatch; nOut += 1
          val end = pendingLit + pl
          // i is pendingLit+1 and already inserted; insert the rest
          while (i < end) { insert(i); i += 1 }
          pendingLit = -1; pendingMatch = 0
        }
      } else if (m != 0) {
        pendingLit = i; pendingMatch = m
        insert(i)
        i += 1
      } else {
        out(nOut) = data(i) & 0xff; nOut += 1
        insert(i)
        i += 1
      }
    }
    if (pendingLit >= 0) {
      // input ended while a match was deferred: emit it
      out(nOut) = (1 << 30) | pendingMatch; nOut += 1
    }
    java.util.Arrays.copyOf(out, nOut)
  }

  // ------------------------------------------- length-limited Huffman codes

  /** Package-merge (Larmore–Hirschberg): optimal code lengths ≤ maxLen for
    * the non-zero frequencies. Deterministic: ties resolve by symbol index.
    * Returns an all-symbols length array (0 = unused). Requires the number
    * of used symbols to fit maxLen (2^maxLen ≥ used), which holds for every
    * DEFLATE alphabet (≤286 symbols, maxLen 15; ≤19 symbols, maxLen 7). */
  private[sources] def limitedLengths(freq: Array[Int], maxLen: Int): Array[Int] = {
    val used = (0 until freq.length).filter(freq(_) > 0).toArray
    val lengths = new Array[Int](freq.length)
    if (used.isEmpty) return lengths
    if (used.length == 1) { lengths(used(0)) = 1; return lengths }
    // items: (weight, coverage bitset over used-symbol indices as count map)
    // classic package-merge over levels maxLen..1
    final case class Item(w: Long, syms: Array[Int]) // syms = per-used-idx count
    def leafList(): Array[Item] =
      used.zipWithIndex.map { case (s, k) =>
        val c = new Array[Int](used.length); c(k) = 1; Item(freq(s).toLong, c)
      }
    def merge(a: Array[Item], b: Array[Item]): Array[Item] = {
      val out = new Array[Item](a.length + b.length)
      var i = 0; var j = 0; var o = 0
      while (i < a.length || j < b.length) {
        val takeA = j >= b.length || (i < a.length && a(i).w <= b(j).w)
        if (takeA) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }
    def pack(items: Array[Item]): Array[Item] = {
      val np = items.length / 2
      val out = new Array[Item](np)
      var p = 0
      while (p < np) {
        val x = items(2 * p); val y = items(2 * p + 1)
        val c = new Array[Int](used.length)
        var k = 0
        while (k < used.length) { c(k) = x.syms(k) + y.syms(k); k += 1 }
        out(p) = Item(x.w + y.w, c)
        p += 1
      }
      out
    }
    val leaves = leafList().sortBy(it => (it.w, used(it.syms.indexWhere(_ == 1))))
    var prev = leaves
    var lvl = 1
    while (lvl < maxLen) {
      prev = merge(leaves, pack(prev))
      lvl += 1
    }
    // take the first 2*(used-1) items of the final level; each symbol's
    // total multiplicity across taken items = its code length
    val take = 2 * (used.length - 1)
    val counts = new Array[Int](used.length)
    var t = 0
    while (t < take) {
      val c = prev(t).syms
      var k = 0
      while (k < used.length) { counts(k) += c(k); k += 1 }
      t += 1
    }
    var k = 0
    while (k < used.length) { lengths(used(k)) = counts(k); k += 1 }
    lengths
  }

  /** Canonical codes from lengths, §3.2.2 (same construction the decoder
    * uses, producing the codes it will read back). */
  private[sources] def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxL = lengths.max
    val codes = new Array[Int](lengths.length)
    if (maxL == 0) return codes
    val counts = new Array[Int](maxL + 1)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    val next = new Array[Int](maxL + 2)
    var code = 0
    var l = 1
    while (l <= maxL) { next(l) = code; code = (code + counts(l)) << 1; l += 1 }
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = next(lengths(s)); next(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  // ----------------------------------------------------- block-type costing

  private def tokenFreqs(tokens: Array[Int]): (Array[Int], Array[Int]) = {
    val lit = new Array[Int](286)
    val dst = new Array[Int](30)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if ((t & (1 << 30)) == 0) lit(t) += 1
      else {
        lit(LenSym((t >>> 16) & 0x3fff)) += 1
        dst(distSym(t & 0xffff)) += 1
      }
      i += 1
    }
    lit(256) += 1 // EOB
    (lit, dst)
  }

  private def fixedLitLen(s: Int): Int = if (s < 144) 8 else if (s < 256) 9 else if (s < 280) 7 else 8

  private def costBits(lit: Array[Int], dst: Array[Int], litLen: Int => Int, dstLen: Int => Int): Long = {
    var bits = 0L
    var s = 0
    while (s < 286) {
      if (lit(s) > 0) {
        val extra = if (s >= 265 && s < 285) LenExtra(s - 257) else 0
        bits += lit(s).toLong * (litLen(s) + extra)
      }
      s += 1
    }
    s = 0
    while (s < 30) {
      if (dst(s) > 0) bits += dst(s).toLong * (dstLen(s) + DistExtra(s))
      s += 1
    }
    bits
  }

  // ------------------------------------------------ dynamic header encoding

  /** RLE of the concatenated (litlen ++ dist) length vector per §3.2.7:
    * tokens (sym, extraVal, extraBits) with sym 0..18. */
  private def rleLengths(all: Array[Int]): Array[(Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < all.length) {
      val v = all(i)
      var run = 1
      while (i + run < all.length && all(i + run) == v) run += 1
      if (v == 0) {
        var left = run
        while (left >= 11) { val n = math.min(left, 138); out += ((18, n - 11, 7)); left -= n }
        if (left >= 3) { out += ((17, left - 3, 3)); left = 0 }
        while (left > 0) { out += ((0, 0, 0)); left -= 1 }
      } else {
        out += ((v, 0, 0))
        var left = run - 1
        while (left >= 3) { val n = math.min(left, 6); out += ((16, n - 3, 2)); left -= n }
        while (left > 0) { out += ((v, 0, 0)); left -= 1 }
      }
      i += run
    }
    out.toArray
  }

  private final case class DynPlan(
      litLens: Array[Int],
      dstLens: Array[Int],
      hlit: Int,
      hdist: Int,
      clLens: Array[Int],
      hclen: Int,
      rle: Array[(Int, Int, Int)],
      headerBits: Long,
      bodyBits: Long
  )

  /** Build the full dynamic plan, or None when the litlen alphabet is
    * degenerate (<2 used symbols → incomplete code a strict inflater may
    * reject). */
  private def dynamicPlan(lit: Array[Int], dst: Array[Int]): Option[DynPlan] = {
    if (lit.count(_ > 0) < 2) return None
    val litLens = limitedLengths(lit, 15)
    val dstLens = limitedLengths(dst, 15)
    val hlit = math.max(257, 286 - litLens.reverse.takeWhile(_ == 0).length)
    val nDst = dstLens.count(_ > 0)
    // §3.2.7: a single used distance code is sent at length 1 (one unused
    // code — limitedLengths already yields that shape); zero used codes are
    // sent as HDIST=1 with a single zero length.
    val dstSend: Array[Int] = if (nDst == 0) new Array[Int](30) else dstLens
    val hdist = math.max(1, 30 - dstSend.reverse.takeWhile(_ == 0).length)
    val all = litLens.take(hlit) ++ dstSend.take(hdist)
    val rle = rleLengths(all)
    val clFreq = new Array[Int](19)
    rle.foreach { case (s, _, _) => clFreq(s) += 1 }
    val clLens = limitedLengths(clFreq, 7)
    // zlib rejects an INCOMPLETE code-length code (unlike the distance
    // code): a single used CL symbol would get length 1 with an unused
    // sibling. Pad with a never-emitted second length-1 code to complete it.
    if (clLens.count(_ > 0) == 1) {
      val pad = (0 until 19).find(clLens(_) == 0).get
      clLens(pad) = 1
    }
    val hclenFull = 19 - ClOrder.reverse.takeWhile(clLens(_) == 0).length
    val hclen = math.max(4, hclenFull)
    var header = 5L + 5 + 4 + 3L * hclen
    rle.foreach { case (s, _, eb) => header += clLens(s) + eb }
    val body = costBits(lit, dst, litLens(_), s => if (dstLens(s) > 0) dstLens(s) else 0)
    Some(DynPlan(litLens, dstLens, hlit, hdist, clLens, hclen, rle, header, body))
  }

  // -------------------------------------------------------------- emitters

  private def emitTokens(
      w: BitW,
      tokens: Array[Int],
      litCode: Array[Int],
      litLen: Array[Int],
      dstCode: Array[Int],
      dstLen: Array[Int]
  ): Unit = {
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if ((t & (1 << 30)) == 0) w.code(litCode(t), litLen(t))
      else {
        val len = (t >>> 16) & 0x3fff
        val dist = t & 0xffff
        val ls = LenSym(len)
        w.code(litCode(ls), litLen(ls))
        if (ls >= 265 && ls < 285) w.bits(len - LenBase(ls - 257), LenExtra(ls - 257))
        val ds = distSym(dist)
        w.code(dstCode(ds), dstLen(ds))
        if (DistExtra(ds) > 0) w.bits(dist - DistBase(ds), DistExtra(ds))
      }
      i += 1
    }
    w.code(litCode(256), litLen(256)) // EOB
  }

  /** Strategy masks for [[deflateRaw]]. */
  val AllowStored = 1
  val AllowFixed = 2
  val AllowDynamic = 4
  val AllowAll: Int = AllowStored | AllowFixed | AllowDynamic

  /** Raw DEFLATE stream for `data`. `allow` masks the block strategies the
    * cost pick may choose from (the gate forces each path; production use
    * is [[AllowAll]]). Stored always remains as the fallback when a forced
    * strategy is structurally unavailable (dynamic on a degenerate
    * alphabet). */
  def deflateRaw(data: Array[Byte], allow: Int = AllowAll): Array[Byte] = {
    val w = new BitW
    val tokens = tokenize(data)
    val (lit, dst) = tokenFreqs(tokens)
    val storedBits: Long = {
      val chunks = math.max(1, (data.length + 65534) / 65535)
      // per chunk: up-to-7 align + 3 type bits + LEN/NLEN
      chunks * (3L + 7 + 32) + 8L * data.length
    }
    val fixedBits: Long = 3 + costBits(lit, dst, fixedLitLen, _ => 5)
    val dyn = if ((allow & AllowDynamic) != 0) dynamicPlan(lit, dst) else None
    val dynBits: Long = dyn.map(p => 3 + p.headerBits + p.bodyBits).getOrElse(Long.MaxValue)

    val candidates = Seq(
      (if ((allow & AllowStored) != 0) storedBits else Long.MaxValue, 0),
      (if ((allow & AllowFixed) != 0) fixedBits else Long.MaxValue, 1),
      (dynBits, 2)
    )
    val choice = candidates.minBy(_._1) match {
      case (Long.MaxValue, _) => 0 // nothing allowed/available: stored fallback
      case (_, c) => c
    }

    choice match {
      case 0 =>
        var off = 0
        if (data.length == 0) {
          w.bits(1, 1); w.bits(0, 2) // BFINAL, stored
          w.alignByte()
          w.bits(0, 16); w.bits(0xffff, 16)
        } else
          while (off < data.length) {
            val len = math.min(65535, data.length - off)
            val fin = if (off + len >= data.length) 1 else 0
            w.bits(fin, 1); w.bits(0, 2)
            w.alignByte()
            w.bits(len, 16); w.bits(len ^ 0xffff, 16)
            w.rawBytes(data, off, len)
            off += len
          }
      case 1 =>
        w.bits(1, 1); w.bits(1, 2)
        val litLens = Array.tabulate(288)(fixedLitLen)
        val litCodes = canonicalCodes(litLens)
        val dstLens = Array.fill(32)(5)
        val dstCodes = canonicalCodes(dstLens)
        emitTokens(w, tokens, litCodes, litLens, dstCodes, dstLens)
      case 2 =>
        val p = dyn.get
        w.bits(1, 1); w.bits(2, 2)
        w.bits(p.hlit - 257, 5)
        w.bits(p.hdist - 1, 5)
        w.bits(p.hclen - 4, 4)
        val clCodes = canonicalCodes(p.clLens)
        var k = 0
        while (k < p.hclen) { w.bits(p.clLens(ClOrder(k)), 3); k += 1 }
        p.rle.foreach { case (s, ev, eb) =>
          w.code(clCodes(s), p.clLens(s))
          if (eb > 0) w.bits(ev, eb)
        }
        val litCodes = canonicalCodes(p.litLens)
        val dstCodes = canonicalCodes(p.dstLens)
        emitTokens(w, tokens, litCodes, p.litLens, dstCodes, p.dstLens)
    }
    w.result()
  }

  /** RFC 1950 zlib stream: CMF/FLG (deflate, 32K window, FCHECK) + Adler-32. */
  def zlibCompress(data: Array[Byte], allow: Int = AllowAll): Array[Byte] = {
    val body = deflateRaw(data, allow)
    val cmf = 0x78
    var flg = 0 // FLEVEL 0, FDICT 0
    val rem = (cmf * 256 + flg) % 31
    if (rem != 0) flg += 31 - rem
    val adler = Inflate.adler32(data)
    val out = new Array[Byte](2 + body.length + 4)
    out(0) = cmf.toByte
    out(1) = flg.toByte
    System.arraycopy(body, 0, out, 2, body.length)
    var i = 0
    while (i < 4) { out(2 + body.length + i) = ((adler >>> (8 * (3 - i))) & 0xff).toByte; i += 1 }
    out
  }

  /** RFC 1952 gzip member: fixed deterministic header (MTIME=0, XFL=0,
    * OS=255 unknown), CRC-32 + ISIZE trailer. */
  def gzipCompress(data: Array[Byte], allow: Int = AllowAll): Array[Byte] = {
    val body = deflateRaw(data, allow)
    val out = new Array[Byte](10 + body.length + 8)
    out(0) = 0x1f.toByte; out(1) = 0x8b.toByte; out(2) = 8 // magic, CM=deflate
    // FLG=0, MTIME=0, XFL=0 already zero
    out(9) = 0xff.toByte // OS unknown
    System.arraycopy(body, 0, out, 10, body.length)
    val crc = Inflate.crc32(data)
    val isize = data.length.toLong & 0xffffffffL
    var i = 0
    while (i < 4) {
      out(10 + body.length + i) = ((crc >>> (8 * i)) & 0xff).toByte
      out(14 + body.length + i) = ((isize >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }
}
