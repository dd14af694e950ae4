package graft.sources

/** x279 — zstd **encoder** from the public spec (RFC 8878), the write half
  * of x227: round 9 session 2 gave the engine gzip/zip/png EMIT paths
  * (x276–x278) on top of the from-scratch DEFLATE encoder (x268); this
  * closes the remaining codec direction so the modern default
  * parquet/ORC/shuffle transport can be written without zstd-jni on the
  * hot path. Conformance twin is the official implementation itself
  * (facebook/zstd via Spark's bundled zstd-jni must decode every emitted
  * frame byte-exactly) and graft's own from-scratch [[ZstdFrame]] decoder
  * must agree — the exact mirror of the x268 gate discipline.
  *
  * Reference behavior studied from dangkhoipham/data_engineering_capstone
  * (its parquet outputs ride Spark's default codecs; see
  * `dags/libs/lib.py:52-218` for the pipeline the formats serve) — the
  * format itself is RFC 8878, implemented from the spec text.
  *
  * Shape (the valid subset a v1 encoder needs — every choice decodable by
  * ANY conforming decoder):
  *   - Frame: magic + single-segment header with the smallest sufficient
  *     frame-content-size field; no dictionary, no checksum (x227
  *     quarantines checksum frames by design, and the twin gate needs the
  *     scratch decoder to accept its own encoder's output).
  *   - Blocks ≤ 124 KiB (headroom under the spec's 128 KiB cap so even a
  *     forced-compressed incompressible block stays legal): per block the
  *     encoder COSTS Raw, RLE (all-bytes-equal) and Compressed and emits
  *     the cheapest; a strategy mask lets the gate force each path so all
  *     three emitters stay load-bearing (the x268 AllowStored/Fixed/
  *     Dynamic pattern).
  *   - Compressed blocks: LZ77 matches from x268's hash-chain tokenizer
  *     (32 KiB window, min match 3 — a strict subset of zstd's offset
  *     space, so every emitted offset is legal), literals Raw or RLE,
  *     sequences in Predefined_Mode FSE — the RFC 3.1.1.3.2.2 default
  *     distributions, so no table description is emitted and the decoder
  *     side is pinned to the exact tables x227 already proved against the
  *     official decoder. Repeat-offset codes are never emitted
  *     (Offset_Value = offset + 3 always > 3), sidestepping the history
  *     rules on the write side.
  *   - FSE encoding is the decode-table inverse: states are chosen
  *     BACKWARD (last symbol first) using the decoder's own
  *     (symbol, nbBits, baseline) arrays — for a symbol s and required
  *     next-state t there is exactly ONE state of s whose
  *     [baseline, baseline + 2^nbBits) range covers t; the bitstream is
  *     assembled back-to-front under the padding-sentinel law of
  *     RFC 3.1.1.7. Building the encoder ON the decoder's tables makes
  *     table disagreement structurally impossible.
  *
  * Out of scope (valid subset, not missing correctness): Huffman-compressed
  * literals (see [[ZstdEncode.AllowHuf]] — x280 adds them), custom FSE
  * table descriptions, repeat offsets, multi-frame concatenation.
  *
  * Scale shape: per-payload pure function under `mapPartitions` (the
  * x98/x151/x198/x199/x268 byte-codec class) — a corpus of payloads
  * compresses embarrassingly parallel, no shuffle before the output sort.
  */
object ZstdEncode {

  val AllowRaw = 1
  val AllowRle = 2
  val AllowSeq = 4
  val AllowHuf = 8 // x280: Huffman-compressed literals inside Seq blocks
  val AllowFse = 16 // x281: custom FSE table descriptions for sequences
  val AllowRep = 32 // x291: repeat-offset codes against the three-slot history
  val AllowAll: Int = AllowRaw | AllowRle | AllowSeq | AllowHuf | AllowFse | AllowRep

  private val MagicLE = 0xfd2fb528L
  private val BlockMax = 124 << 10 // ≤ the spec's min(Window_Size, 128 KiB) with forced-compressed headroom

  // ------------------------------------------------------- backward writer

  /** Backward bitstream assembler (RFC 3.1.1.7 inverse): fields are
    * appended in DECODER READ ORDER; `emit` lays them out so the first
    * field occupies the highest live bits, then sets the padding-sentinel
    * 1 just above the last live bit.
    */
  private final class BackW {
    private var vals = new Array[Long](64) // (value << 8) | width
    private var n = 0
    private var total = 0
    def field(v: Int, w: Int): Unit = if (w > 0) {
      if (n == vals.length) vals = java.util.Arrays.copyOf(vals, n * 2)
      vals(n) = (v.toLong << 8) | w
      n += 1
      total += w
    }
    def emit(out: java.io.ByteArrayOutputStream): Unit = {
      val bytes = new Array[Byte]((total >> 3) + 1)
      def set(i: Int): Unit = bytes(i >> 3) = (bytes(i >> 3) | (1 << (i & 7))).toByte
      set(total) // sentinel
      var cursor = total
      var j = 0
      while (j < n) {
        val w = (vals(j) & 0xff).toInt
        val v = vals(j) >>> 8
        cursor -= w
        var k = 0
        while (k < w) { if (((v >>> k) & 1) != 0) set(cursor + k); k += 1 }
        j += 1
      }
      out.write(bytes, 0, bytes.length)
    }
  }

  // ------------------------------------------------------------ FSE encode

  /** Encode-side view of a decode table: for each symbol, its states in
    * ascending order; `transition(sym, next)` finds the unique state of
    * `sym` covering `next` and the bits that move the decoder there.
    */
  private final class FseEnc(t: ZstdFrame.FseTable) {
    val accuracyLog: Int = t.accuracyLog
    private val symStates: Array[Array[Int]] = {
      val maxSym = (0 until t.size).map(t.symbol(_)).max
      val grouped = Array.fill(maxSym + 1)(List.empty[Int])
      var st = t.size - 1
      while (st >= 0) { grouped(t.symbol(st)) = st :: grouped(t.symbol(st)); st -= 1 }
      grouped.map(_.toArray)
    }
    def firstState(sym: Int): Int = symStates(sym)(0)
    /** (state, extraBits, width) such that baseline(state)+extraBits = next. */
    def transition(sym: Int, next: Int): (Int, Int, Int) = {
      val sts = symStates(sym)
      var i = 0
      while (i < sts.length) {
        val st = sts(i)
        val lo = t.baseline(st)
        val w = t.nbBits(st)
        if (next >= lo && next < lo + (1 << w)) return (st, next - lo, w)
        i += 1
      }
      throw new IllegalStateException(s"fse encode: no state of symbol $sym covers $next")
    }
  }

  private lazy val llEnc = new FseEnc(ZstdFrame.llDefaultTable)
  private lazy val ofEnc = new FseEnc(ZstdFrame.ofDefaultTable)
  private lazy val mlEnc = new FseEnc(ZstdFrame.mlDefaultTable)

  // ------------------------------------- custom FSE tables (x281, mode 2)

  /** Forward LSB-first bit writer (RFC 4.1.1 table descriptions). */
  private final class FwdBitW {
    private var buf = new Array[Byte](64)
    private var bitPos = 0
    def bits(v: Int, n: Int): Unit = {
      var k = 0
      while (k < n) {
        val abs = bitPos + k
        if ((abs >> 3) >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        if (((v >> k) & 1) != 0) buf(abs >> 3) = (buf(abs >> 3) | (1 << (abs & 7))).toByte
        k += 1
      }
      bitPos += n
    }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) >> 3)
  }

  /** Deterministic largest-remainder normalization of raw symbol counts to
    * a 2^al slot table (no "less than 1" −1 slots — a valid, simpler
    * subset). Every present symbol gets ≥ 1 slot; the sum is exactly 2^al.
    */
  private def normalize(freq: Array[Int], n: Int, al: Int): Array[Int] = {
    val size = 1 << al
    val norm = new Array[Int](freq.length)
    var sum = 0
    var s = 0
    while (s < freq.length) {
      if (freq(s) > 0) {
        norm(s) = math.max(1, (freq(s).toLong * size / n).toInt)
        sum += norm(s)
      }
      s += 1
    }
    if (sum < size) {
      // round-robin extra slots in largest-remainder order (ties → lower symbol)
      var diff = size - sum
      val order = (0 until freq.length)
        .filter(freq(_) > 0)
        .sortBy(s0 => (-(freq(s0).toLong * size % n), s0))
        .toArray
      var i = 0
      while (diff > 0) {
        norm(order(i % order.length)) += 1
        diff -= 1
        i += 1
      }
    } else if (sum > size) {
      var diff = sum - size
      while (diff > 0) {
        var mx = -1
        s = 0
        while (s < freq.length) { if (norm(s) > 1 && (mx < 0 || norm(s) > norm(mx))) mx = s; s += 1 }
        norm(mx) -= 1
        diff -= 1
      }
    }
    norm
  }

  /** Serialize a normalized-count table (the exact write-inverse of
    * [[ZstdFrame.readFseDesc]]'s adaptive-width scheme, RFC 4.1.1).
    */
  private def writeFseDesc(norm: Array[Int], al: Int): Array[Byte] = {
    val w = new FwdBitW
    w.bits(al - 5, 4)
    var lastNz = norm.length - 1
    while (lastNz >= 0 && norm(lastNz) == 0) lastNz -= 1
    var remaining = (1 << al) + 1
    var threshold = 1 << al
    var nb = al + 1
    var sym = 0
    while (sym <= lastNz) {
      val count = norm(sym)
      val v = count + 1
      val max = (2 * threshold - 1) - remaining
      if (v < max) w.bits(v, nb - 1)
      else if (v < threshold) w.bits(v, nb)
      else w.bits(v + max, nb)
      remaining -= (if (count < 0) -count else count)
      sym += 1
      if (count == 0) {
        var z = 0
        while (sym + z <= lastNz && norm(sym + z) == 0) z += 1
        var zz = z
        while (zz >= 3) { w.bits(3, 2); zz -= 3 }
        w.bits(zz, 2)
        sym += z
      }
      while (remaining > 1 && remaining < threshold) { nb -= 1; threshold >>= 1 }
    }
    require(remaining == 1, s"fse desc normalization did not land on 1 (got $remaining)")
    w.bytes
  }

  /** Channel plan for one sequence-code stream: mode bits, the table
    * description bytes (empty for predefined, 1 symbol byte for RLE), and
    * the encoder view of the table the DECODER will build from them.
    */
  private final class ChanPlan(val mode: Int, val desc: Array[Byte], val enc: FseEnc)

  private def customChan(codes: Array[Int], nSeq: Int, maxAL: Int): ChanPlan = {
    var maxC = 0
    var i = 0
    while (i < nSeq) { if (codes(i) > maxC) maxC = codes(i); i += 1 }
    val freq = new Array[Int](maxC + 1)
    i = 0
    while (i < nSeq) { freq(codes(i)) += 1; i += 1 }
    val distinct = freq.count(_ > 0)
    if (distinct == 1) {
      val norm = new Array[Int](maxC + 1)
      norm(maxC) = 1
      new ChanPlan(1, Array(maxC.toByte), new FseEnc(new ZstdFrame.FseTable(0, norm)))
    } else {
      val needed = 32 - Integer.numberOfLeadingZeros(distinct - 1) // ceil log2
      val scale = 63 - java.lang.Long.numberOfLeadingZeros(nSeq.toLong) // floor log2
      val al = math.min(maxAL, math.max(5, math.max(needed, scale.toInt)))
      val norm = normalize(freq, nSeq, al)
      new ChanPlan(2, writeFseDesc(norm, al), new FseEnc(new ZstdFrame.FseTable(al, norm)))
    }
  }

  private def llCodeOf(ll: Int): Int = {
    if (ll < 16) ll
    else {
      var c = 35
      while (ZstdFrame.LLBase(c) > ll) c -= 1
      c
    }
  }
  private def mlCodeOf(ml: Int): Int = {
    if (ml <= 34) ml - 3
    else {
      var c = 52
      while (ZstdFrame.MLBase(c) > ml) c -= 1
      c
    }
  }

  // ------------------------------------------------------ literals section

  private def litHeader(ltype: Int, regen: Int, out: java.io.ByteArrayOutputStream): Unit = {
    if (regen <= 31) out.write(ltype | (regen << 3))
    else if (regen <= 4095) {
      out.write(ltype | 0x04 | ((regen & 0xf) << 4))
      out.write((regen >> 4) & 0xff)
    } else {
      out.write(ltype | 0x0c | ((regen & 0xf) << 4))
      out.write((regen >> 4) & 0xff)
      out.write((regen >> 12) & 0xff)
    }
  }

  /** Literals section: cost-picks Raw / RLE / Huffman-compressed under the
    * strategy mask (Raw is always available as the structural fallback;
    * `forceHuf` overrides the cost pick whenever Huffman is legal, so the
    * gate can pin the Huffman emitters as load-bearing).
    */
  private def writeLiterals(
      lits: Array[Byte],
      nLits: Int,
      out: java.io.ByteArrayOutputStream,
      allow: Int,
      forceHuf: Boolean
  ): Unit = {
    var rle = nLits > 0 && (allow & AllowRle) != 0
    var i = 1
    while (rle && i < nLits) { rle = lits(i) == lits(0); i += 1 }

    var hufBody: Array[Byte] = null
    var hufFour = false
    if ((allow & AllowHuf) != 0 && nLits >= 16) {
      val freq = new Array[Int](256)
      i = 0
      while (i < nLits) { freq(lits(i) & 0xff) += 1; i += 1 }
      val plan = new HufPlan(freq)
      if (plan.legal) {
        val (b, four) = plan.body(lits, nLits)
        // single-stream is only header-expressible with comp ≤ 1023
        if (four || b.length <= 1023) { hufBody = b; hufFour = four }
      }
    }

    // exact section costs (header + payload) — the auto_min gate pin has
    // zero margin, so the cost model must be the emitted byte count
    def litHeaderSize(regen: Int): Int = if (regen <= 31) 1 else if (regen <= 4095) 2 else 3
    def hufHeaderSize(regen: Int, comp: Int): Int =
      if (regen <= 1023 && comp <= 1023) 3 else if (regen <= 16383 && comp <= 16383) 4 else 5
    val rawCost = litHeaderSize(nLits) + nLits
    val hufCost =
      if (hufBody == null) Int.MaxValue
      else hufHeaderSize(nLits, hufBody.length) + hufBody.length
    if (hufBody != null && (forceHuf || (!rle && hufCost < rawCost))) {
      hufHeader(nLits, hufBody.length, hufFour, out)
      out.write(hufBody, 0, hufBody.length)
    } else if (rle) {
      litHeader(1, nLits, out)
      out.write(lits(0))
    } else {
      litHeader(0, nLits, out)
      out.write(lits, 0, nLits)
    }
  }

  // ---------------------------------------------- Huffman literals (x280)

  /** Huffman plan for a literals set: canonical codes assigned by the
    * exact law the decoder's table construction implies (symbols grouped
    * by weight ascending, natural order within a weight; a weight-w
    * symbol's first table cell >> (w-1) IS its code, read MSB-first by
    * the peek-tableLog decode loop). Direct 4-bit weight description —
    * legal whenever the highest used byte is ≤ 128 (the h≥128 header form
    * carries at most 128 explicit weights; the last used symbol's weight
    * is deduced by the power-of-two completion law, which our complete
    * package-merge lengths satisfy by construction). Returns null when
    * the alphabet shape is out of the direct-description range.
    */
  private final class HufPlan(freq: Array[Int]) {
    val maxUsed: Int = {
      var m = -1
      var s = 0
      while (s < 256) { if (freq(s) > 0) m = s; s += 1 }
      m
    }
    private val distinct = (0 until 256).count(freq(_) > 0)
    val legal: Boolean = distinct >= 2 && maxUsed <= 128
    var tableLog = 0
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    var desc: Array[Byte] = null
    if (legal) {
      val lens = Deflate.limitedLengths(java.util.Arrays.copyOf(freq, maxUsed + 1), 11)
      tableLog = lens.max
      val weights = new Array[Int](maxUsed + 1)
      var s = 0
      while (s <= maxUsed) { weights(s) = if (lens(s) > 0) tableLog + 1 - lens(s) else 0; s += 1 }
      // decoder-mirror rank walk → canonical codes
      val rankNext = new Array[Int](tableLog + 2)
      var w = 1
      var cur = 0
      while (w <= tableLog) {
        rankNext(w) = cur
        s = 0
        while (s <= maxUsed) { if (weights(s) == w) cur += 1 << (w - 1); s += 1 }
        w += 1
      }
      s = 0
      while (s <= maxUsed) {
        val ww = weights(s)
        if (ww > 0) {
          codeOf(s) = rankNext(ww) >> (ww - 1)
          lenOf(s) = tableLog + 1 - ww
          rankNext(ww) += 1 << (ww - 1)
        }
        s += 1
      }
      // direct weight description: explicit weights for symbols 0..maxUsed-1
      val n = maxUsed
      desc = new Array[Byte](1 + (n + 1) / 2)
      desc(0) = (127 + n).toByte
      var i = 0
      while (i < n) {
        val nib = weights(i)
        if (i % 2 == 0) desc(1 + i / 2) = (desc(1 + i / 2) | (nib << 4)).toByte
        else desc(1 + i / 2) = (desc(1 + i / 2) | nib).toByte
        i += 1
      }
      // FSE-compressed weight description (RFC 4.2.1.2, r10): direct costs
      // (maxUsed+1)/2 bytes, which dominates small wide-alphabet payloads
      // (hex text: 52 table bytes on a ~100-byte stream — the measured
      // class-2 gap). Exact byte cost-pick against direct; termination
      // edges fall back rather than ship.
      val fse = fseWeightDesc(weights, n)
      if (fse != null && fse.length < desc.length) desc = fse
    }
    private def streamBytes(lits: Array[Byte], from: Int, until: Int): Array[Byte] = {
      val bw = new BackW
      var i = from
      while (i < until) { val s = lits(i) & 0xff; bw.field(codeOf(s), lenOf(s)); i += 1 }
      val bos = new java.io.ByteArrayOutputStream((until - from) / 2 + 2)
      bw.emit(bos)
      bos.toByteArray
    }
    /** Full compressed-literals body (tree description + streams + jump
      * table when 4-stream) and whether it is 4-stream. Single stream is
      * only header-encodable for regen ≤ 1023 (size_format 0).
      */
    def body(lits: Array[Byte], nLits: Int): (Array[Byte], Boolean) = {
      val bos = new java.io.ByteArrayOutputStream(nLits / 2 + desc.length + 8)
      bos.write(desc, 0, desc.length)
      if (nLits <= 1023) {
        val s0 = streamBytes(lits, 0, nLits)
        bos.write(s0, 0, s0.length)
        (bos.toByteArray, false)
      } else {
        val seg = (nLits + 3) / 4
        val s = Array(
          streamBytes(lits, 0, seg),
          streamBytes(lits, seg, 2 * seg),
          streamBytes(lits, 2 * seg, 3 * seg),
          streamBytes(lits, 3 * seg, nLits)
        )
        var k = 0
        while (k < 3) { bos.write(s(k).length & 0xff); bos.write((s(k).length >> 8) & 0xff); k += 1 }
        k = 0
        while (k < 4) { bos.write(s(k), 0, s(k).length); k += 1 }
        (bos.toByteArray, true)
      }
    }
  }

  /** FSE-compress the explicit weight stream w_0..w_{n-1} (RFC 4.2.1.2):
    * [1-byte total][FSE table description, AL ≤ 6][backward bitstream —
    * st1 then st2 init states, then interleaved state updates in decode
    * read order]. Decode alternates st1/st2 and terminates when an update
    * read overflows into zero padding, so the encoder must end the stream
    * exactly at the last successful update AND land the terminating state
    * on an entry with nbBits ≥ 1 (a zero-width update never overflows —
    * the decoder would emit ghost weights). Returns null whenever the
    * shape can't be expressed (single-symbol table, no wide final state,
    * > 127 bytes) — the caller keeps the direct description. */
  private def fseWeightDesc(wts: Array[Int], n: Int): Array[Byte] = {
    if (n < 2) return null
    val freq = new Array[Int](12)
    var i = 0
    while (i < n) { freq(wts(i)) += 1; i += 1 }
    val distinct = freq.count(_ > 0)
    if (distinct < 2) return null // one symbol → all nbBits can be 0, no termination
    val needed = 32 - Integer.numberOfLeadingZeros(distinct - 1)
    val scale = (63 - java.lang.Long.numberOfLeadingZeros(n.toLong)).toInt
    val al = math.min(6, math.max(5, math.max(needed, scale)))
    val norm = normalize(freq, n, al)
    val tdesc = writeFseDesc(norm, al)
    val tab = new ZstdFrame.FseTable(al, norm)
    val enc = new FseEnc(tab)
    // terminating state must overflow the empty stream: nbBits ≥ 1
    def wideState(sym: Int): Int = {
      var st = 0
      while (st < tab.size) {
        if (tab.symbol(st) == sym && tab.nbBits(st) >= 1) return st
        st += 1
      }
      -1
    }
    val e = (n + 1) / 2 // even-index weights ride st1
    val o = n / 2 // odd-index weights ride st2
    val st1 = new Array[Int](e); val u1b = new Array[Int](e); val u1w = new Array[Int](e)
    val st2 = new Array[Int](o); val u2b = new Array[Int](o); val u2w = new Array[Int](o)
    // the chain whose LAST update the decoder attempts is st1 for even n,
    // st2 for odd n — that chain's final state needs nbBits ≥ 1
    if (n % 2 == 0) {
      val ws = wideState(wts(2 * (e - 1)))
      if (ws < 0) return null
      st1(e - 1) = ws
      st2(o - 1) = enc.firstState(wts(2 * (o - 1) + 1))
    } else {
      val ws = wideState(wts(2 * (o - 1) + 1))
      if (ws < 0) return null
      st2(o - 1) = ws
      st1(e - 1) = enc.firstState(wts(2 * (e - 1)))
    }
    var j = e - 2
    while (j >= 0) {
      val (s, b, w) = enc.transition(wts(2 * j), st1(j + 1)); st1(j) = s; u1b(j) = b; u1w(j) = w
      j -= 1
    }
    j = o - 2
    while (j >= 0) {
      val (s, b, w) = enc.transition(wts(2 * j + 1), st2(j + 1)); st2(j) = s; u2b(j) = b; u2w(j) = w
      j -= 1
    }
    // bitstream fields in decoder read order: init states, then updates
    // interleaved u1_0, u2_0, u1_1, u2_1, … (the decoder reads a state's
    // update right after emitting its symbol)
    val bw = new BackW
    bw.field(st1(0), al)
    bw.field(st2(0), al)
    val m1 = e - 1
    val m2 = o - 1
    var k = 0
    while (k < math.max(m1, m2)) {
      if (k < m1) bw.field(u1b(k), u1w(k))
      if (k < m2) bw.field(u2b(k), u2w(k))
      k += 1
    }
    val bos = new java.io.ByteArrayOutputStream(32)
    bw.emit(bos)
    val stream = bos.toByteArray
    val total = tdesc.length + stream.length
    if (total > 127) return null // header byte < 128 IS the FSE marker
    val out = new Array[Byte](1 + total)
    out(0) = total.toByte
    System.arraycopy(tdesc, 0, out, 1, tdesc.length)
    System.arraycopy(stream, 0, out, 1 + tdesc.length, stream.length)
    out
  }

  /** ltype-2 literals header for (regen, comp) with the right size_format. */
  private def hufHeader(regen: Int, comp: Int, fourStreams: Boolean, out: java.io.ByteArrayOutputStream): Unit = {
    if (regen <= 1023 && comp <= 1023) {
      val sf = if (fourStreams) 1 else 0
      out.write(2 | (sf << 2) | ((regen & 0xf) << 4))
      out.write(((regen >> 4) & 0x3f) | ((comp & 3) << 6))
      out.write((comp >> 2) & 0xff)
    } else if (regen <= 16383 && comp <= 16383) {
      out.write(2 | (2 << 2) | ((regen & 0xf) << 4))
      out.write((regen >> 4) & 0xff)
      out.write(((regen >> 12) & 0x3) | ((comp & 0x3f) << 2))
      out.write((comp >> 6) & 0xff)
    } else {
      out.write(2 | (3 << 2) | ((regen & 0xf) << 4))
      out.write((regen >> 4) & 0xff)
      out.write(((regen >> 12) & 0x3f) | ((comp & 3) << 6))
      out.write((comp >> 2) & 0xff)
      out.write((comp >> 10) & 0xff)
    }
  }

  // ------------------------------------------------------------ LZ pass
  // zstd-native tokenizer (r10): the encoder previously reused
  // Deflate.tokenize, inheriting deflate's format limits — 258-byte match
  // cap, 32 KiB window, 16-bit token packing — none of which bind in
  // zstd, whose ML code table reaches 131074 and whose single-segment
  // window spans the frame. This finder searches the WHOLE block
  // (≤ 124 KiB) and extends matches to the block end, so an 800-byte run
  // is ONE sequence instead of four capped ones — the measured gap on the
  // match-heavy corpora (NOTES r9s3) was mostly these caps, not the
  // search policy. Same hash-chain + 1-step-lazy structure as the deflate
  // pass; tokens are Longs (literal = byte value; match =
  // (1<<62) | len<<24 | dist) because zstd's lengths and offsets outgrow
  // the deflate pass's bit packing.

  private val ZMinMatch = 3
  private val ZHashBits = 16
  private val ZMaxChain = 256

  private def tokenizeZ(data: Array[Byte]): Array[Long] = {
    val n = data.length
    val out = new Array[Long](n + 1)
    var nOut = 0
    if (n < ZMinMatch + 1) {
      var i = 0
      while (i < n) { out(nOut) = (data(i) & 0xff).toLong; nOut += 1; i += 1 }
      return java.util.Arrays.copyOf(out, nOut)
    }
    val head = new Array[Int](1 << ZHashBits)
    java.util.Arrays.fill(head, -1)
    val prev = new Array[Int](n)

    def hash(i: Int): Int =
      (((data(i) & 0xff) << 11) ^ ((data(i + 1) & 0xff) << 6) ^ (data(i + 2) & 0xff)) & ((1 << ZHashBits) - 1)

    def insert(i: Int): Unit = if (i + ZMinMatch <= n) {
      val h = hash(i)
      prev(i) = head(h)
      head(h) = i
    }

    /** longest match at i as (len<<24)|dist, or 0; nearest wins ties */
    def findMatch(i: Int, minLen: Int): Long = {
      if (i + ZMinMatch > n) return 0L
      var cand = head(hash(i))
      var chain = ZMaxChain
      var bestLen = minLen - 1
      var bestDist = 0
      val maxLen = n - i
      while (cand >= 0 && chain > 0) {
        val probe = math.min(bestLen.max(0), maxLen - 1)
        if (cand < i && data(cand + probe) == data(i + probe)) {
          var l = 0
          while (l < maxLen && data(cand + l) == data(i + l)) l += 1
          if (l > bestLen) { bestLen = l; bestDist = i - cand }
        }
        cand = prev(cand)
        chain -= 1
      }
      if (bestLen >= minLen && bestDist >= 1) (bestLen.toLong << 24) | bestDist.toLong else 0L
    }

    var i = 0
    var pendingLit = -1
    var pendingMatch = 0L
    while (i < n) {
      val m = if (i + ZMinMatch <= n) findMatch(i, ZMinMatch) else 0L
      if (pendingLit >= 0) {
        val pl = (pendingMatch >>> 24).toInt
        if (m != 0L && (m >>> 24).toInt > pl) {
          out(nOut) = (data(pendingLit) & 0xff).toLong; nOut += 1
          pendingLit = i; pendingMatch = m
          insert(i)
          i += 1
        } else {
          out(nOut) = (1L << 62) | pendingMatch; nOut += 1
          val end = pendingLit + pl
          while (i < end) { insert(i); i += 1 }
          pendingLit = -1; pendingMatch = 0L
        }
      } else if (m != 0L) {
        pendingLit = i; pendingMatch = m
        insert(i)
        i += 1
      } else {
        out(nOut) = (data(i) & 0xff).toLong; nOut += 1
        insert(i)
        i += 1
      }
    }
    if (pendingLit >= 0) {
      out(nOut) = (1L << 62) | pendingMatch; nOut += 1
    }
    java.util.Arrays.copyOf(out, nOut)
  }

  // ----------------------------------------------------- compressed blocks

  /** Compressed-block payload (literals + sequences) for one block of
    * input. Always constructible; the caller costs it against Raw/RLE.
    */
  /** `repsIn`: the frame's three-slot repeat-offset history AT BLOCK ENTRY
    * (the decoder carries it across blocks; raw/RLE blocks leave it
    * untouched). Returns the payload and the history at block exit.
    */
  private def compressedBlock(
      data: Array[Byte],
      allow: Int,
      forceHuf: Boolean,
      forceFse: Boolean,
      repsIn: Array[Long]
  ): (Array[Byte], Array[Long]) = {
    val tokens = tokenizeZ(data)
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)

    // split the token stream into (ll, ofVal, ml) sequences + tail literals
    val lits = new Array[Byte](data.length)
    var nLits = 0
    var pos = 0
    var nSeq = 0
    val seqLL = new Array[Int](tokens.length)
    val seqOF = new Array[Int](tokens.length)
    val seqML = new Array[Int](tokens.length)
    var runStartLits = 0 // literals accumulated since the previous sequence
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if ((tok & (1L << 62)) == 0) {
        lits(nLits) = data(pos)
        nLits += 1
        runStartLits += 1
        pos += 1
      } else {
        val len = ((tok >>> 24) & 0x3fffff).toInt
        val dist = (tok & 0xffffff).toInt
        seqLL(nSeq) = runStartLits
        seqOF(nSeq) = dist + 3
        seqML(nSeq) = len
        nSeq += 1
        runStartLits = 0
        pos += len
      }
      t += 1
    }

    writeLiterals(lits, nLits, out, allow, forceHuf)

    if (nSeq == 0) {
      out.write(0) // zero sequences, section ends
      return (out.toByteArray, repsIn)
    }

    // repeat-offset substitution (x291): walk FORWARD mirroring the
    // decoder's three-slot history (RFC 3.1.1.5) and rewrite seqOF to the
    // cheapest matching repeat code (ofVal 1..3; the ll==0 index shift
    // honored; the rep0−1 trick never emitted). Codes 0/1 cost ≤1 extra
    // bit vs ~11–15 for an explicit offset. The history STILL advances
    // when reps are disabled — the decoder updates it on every explicit
    // offset regardless.
    var r0 = repsIn(0); var r1 = repsIn(1); var r2 = repsIn(2)
    locally {
      var i0 = 0
      while (i0 < nSeq) {
        val off = (seqOF(i0) - 3).toLong // current entries are explicit offset+3
        val ll = seqLL(i0)
        val ofVal =
          if ((allow & AllowRep) == 0) -1
          else if (ll != 0) {
            if (off == r0) 1 else if (off == r1) 2 else if (off == r2) 3 else -1
          } else {
            if (off == r1) 1 else if (off == r2) 2 else -1
          }
        if (ofVal > 0) {
          seqOF(i0) = ofVal
          val idx = ofVal + (if (ll == 0) 1 else 0)
          idx match {
            case 1 => // r0 stays front
            case 2 => val t = r1; r1 = r0; r0 = t
            case 3 => val t = r2; r2 = r1; r1 = r0; r0 = t
          }
        } else {
          r2 = r1; r1 = r0; r0 = off
        }
        i0 += 1
      }
    }

    // per-sequence codes
    val llC = new Array[Int](nSeq)
    val ofC = new Array[Int](nSeq)
    val mlC = new Array[Int](nSeq)
    var i = 0
    while (i < nSeq) {
      llC(i) = llCodeOf(seqLL(i))
      mlC(i) = mlCodeOf(seqML(i))
      ofC(i) = 31 - Integer.numberOfLeadingZeros(seqOF(i))
      i += 1
    }

    /** Full sequences section for one table choice per channel. */
    def section(ll: ChanPlan, of: ChanPlan, ml: ChanPlan): Array[Byte] = {
      val sec = new java.io.ByteArrayOutputStream(nSeq + 32)
      if (nSeq < 128) sec.write(nSeq)
      else if (nSeq < 0x7f00) { sec.write(128 + (nSeq >> 8)); sec.write(nSeq & 0xff) }
      else { sec.write(255); sec.write((nSeq - 0x7f00) & 0xff); sec.write(((nSeq - 0x7f00) >> 8) & 0xff) }
      sec.write((ll.mode << 6) | (of.mode << 4) | (ml.mode << 2))
      sec.write(ll.desc, 0, ll.desc.length)
      sec.write(of.desc, 0, of.desc.length)
      sec.write(ml.desc, 0, ml.desc.length)

      // state chains, chosen backward (see scaladoc)
      def chain(enc: FseEnc, codes: Array[Int]): (Array[Int], Array[Int], Array[Int]) = {
        val st = new Array[Int](nSeq)
        val upd = new Array[Int](nSeq)
        val updW = new Array[Int](nSeq)
        st(nSeq - 1) = enc.firstState(codes(nSeq - 1))
        var j = nSeq - 2
        while (j >= 0) {
          val (s, bits, w) = enc.transition(codes(j), st(j + 1))
          st(j) = s
          upd(j) = bits
          updW(j) = w
          j -= 1
        }
        (st, upd, updW)
      }
      val (llSt, llUp, llUw) = chain(ll.enc, llC)
      val (ofSt, ofUp, ofUw) = chain(of.enc, ofC)
      val (mlSt, mlUp, mlUw) = chain(ml.enc, mlC)

      // bitstream fields in decoder read order (RFC 3.1.1.4)
      val bw = new BackW
      bw.field(llSt(0), ll.enc.accuracyLog)
      bw.field(ofSt(0), of.enc.accuracyLog)
      bw.field(mlSt(0), ml.enc.accuracyLog)
      var k = 0
      while (k < nSeq) {
        bw.field(seqOF(k) - (1 << ofC(k)), ofC(k))
        bw.field(seqML(k) - ZstdFrame.MLBase(mlC(k)), ZstdFrame.MLBits(mlC(k)))
        bw.field(seqLL(k) - ZstdFrame.LLBase(llC(k)), ZstdFrame.LLBits(llC(k)))
        if (k < nSeq - 1) {
          bw.field(llUp(k), llUw(k))
          bw.field(mlUp(k), mlUw(k))
          bw.field(ofUp(k), ofUw(k))
        }
        k += 1
      }
      bw.emit(sec)
      sec.toByteArray
    }

    val empty = new Array[Byte](0)
    val predef = section(
      new ChanPlan(0, empty, llEnc),
      new ChanPlan(0, empty, ofEnc),
      new ChanPlan(0, empty, mlEnc)
    )
    val chosen =
      if ((allow & AllowFse) == 0 && !forceFse) predef
      else {
        val custom = section(
          customChan(llC, nSeq, 9),
          customChan(ofC, nSeq, 8),
          customChan(mlC, nSeq, 9)
        )
        if (forceFse || custom.length < predef.length) custom else predef
      }
    out.write(chosen, 0, chosen.length)
    (out.toByteArray, Array(r0, r1, r2))
  }

  // ------------------------------------------------------------------ frame

  /** Compress `data` into one zstd frame. `allow` masks the block
    * strategies the cost pick may use (the x268 pattern); Raw is always
    * available as the structural fallback for empty blocks.
    */
  def compress(
      data: Array[Byte],
      allow: Int = AllowAll,
      forceHuf: Boolean = false,
      forceFse: Boolean = false
  ): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    // magic, LE
    out.write((MagicLE & 0xff).toInt)
    out.write(((MagicLE >> 8) & 0xff).toInt)
    out.write(((MagicLE >> 16) & 0xff).toInt)
    out.write(((MagicLE >> 24) & 0xff).toInt)
    // single-segment frame header with the smallest FCS field
    val size = data.length
    if (size <= 255) {
      out.write(0x20) // fcsFlag 0, single-segment → 1-byte FCS
      out.write(size)
    } else if (size <= 65535 + 256) {
      out.write(0x20 | (1 << 6))
      val v = size - 256
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    } else {
      out.write(0x20 | (2 << 6))
      out.write(size & 0xff); out.write((size >> 8) & 0xff)
      out.write((size >> 16) & 0xff); out.write((size >> 24) & 0xff)
    }

    val nBlocks = math.max(1, (size + BlockMax - 1) / BlockMax)
    var curReps = Array(1L, 4L, 8L) // frame-scoped (RFC 3.1.1.5)
    var b = 0
    while (b < nBlocks) {
      val from = b * BlockMax
      val until = math.min(size, from + BlockMax)
      val len = until - from
      val chunk = java.util.Arrays.copyOfRange(data, from, until)
      val last = b == nBlocks - 1

      // candidates: (size, tieOrder, btype, payload)
      var pendingReps: Array[Long] = null // rep history IF the compressed candidate wins
      var bestSize = Int.MaxValue
      var bestOrder = Int.MaxValue
      var bestType = -1
      var bestPayload: Array[Byte] = null
      def consider(sz: Int, order: Int, btype: Int, payload: Array[Byte]): Unit =
        if (sz < bestSize || (sz == bestSize && order < bestOrder)) {
          bestSize = sz; bestOrder = order; bestType = btype; bestPayload = payload
        }
      if (len == 0) consider(3, 0, 0, chunk) // empty input: one raw block
      else {
        if ((allow & AllowRle) != 0) {
          var rle = true
          var i = 1
          while (rle && i < len) { rle = chunk(i) == chunk(0); i += 1 }
          if (rle) consider(4, 0, 1, Array(chunk(0)))
        }
        if ((allow & AllowSeq) != 0) {
          // rep rewriting is itself cost-picked: turning offsets into rep
          // codes can GROW a custom FSE description (a new low symbol
          // lengthens the serialized count table — spec-caught, 1 byte),
          // so the with-reps candidate must win by exact byte count
          val cands =
            if ((allow & AllowRep) != 0)
              Seq(
                compressedBlock(chunk, allow, forceHuf, forceFse, curReps),
                compressedBlock(chunk, allow & ~AllowRep, forceHuf, forceFse, curReps)
              )
            else Seq(compressedBlock(chunk, allow, forceHuf, forceFse, curReps))
          val (payload, repsOut) = cands.minBy(_._1.length)
          // RFC 8878 §3.1.1.2: a Compressed_Block's size must be STRICTLY
          // smaller than its regenerated size — otherwise the spec requires
          // a Raw_Block, so a forced-Seq strategy falls back rather than
          // emit an invalid frame (the official decoder rejects it).
          if (payload.length < len) { consider(3 + payload.length, 1, 2, payload); pendingReps = repsOut }
        }
        if ((allow & AllowRaw) != 0 || bestType < 0) consider(3 + len, 2, 0, chunk)
      }

      val bsize = if (bestType == 0) len else if (bestType == 1) len else bestPayload.length
      val bh = (if (last) 1 else 0) | (bestType << 1) | (bsize << 3)
      out.write(bh & 0xff); out.write((bh >> 8) & 0xff); out.write((bh >> 16) & 0xff)
      if (bestType == 0) out.write(bestPayload, 0, len) else out.write(bestPayload, 0, bestPayload.length)
      if (bestType == 2) curReps = pendingReps // raw/RLE blocks leave the history untouched
      b += 1
    }
    out.toByteArray
  }
}
