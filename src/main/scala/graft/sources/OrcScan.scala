package graft.sources

import scala.collection.mutable.ArrayBuffer

/** x299 — ORC read from first principles: the OTHER columnar warehouse
  * format (Hive/Trino's native store, x106's interchange surface) decoded
  * with zero `org.apache.orc` imports, from the public ORC v1
  * specification (orc.apache.org/specification): protobuf postscript/
  * footer/stripe-footer walked by a minimal wire-format reader, the
  * 3-byte chunk compression framing with zlib chunks inflated by the
  * repo's own x264 DEFLATE decoder, and the full RLEv2 integer family —
  * SHORT_REPEAT, DIRECT, PATCHED_BASE, DELTA (big-endian bit packing,
  * the 5-bit width table, zigzag where the stream is signed) — plus
  * byte-RLE, boolean (bit) RLE present streams, IEEE-LE double streams,
  * and both string encodings (DIRECT_V2 length+data, DICTIONARY_V2
  * dictionary+lengths+indices).
  *
  * Conformance split (the x119/x282 pattern): fixtures are written by the
  * OFFICIAL writer (Spark's ORC sink), this reader shares no code with
  * it, and the gate oracle rebuilds the census from the SOURCE parquet
  * table via DuckDB — cross-format AND cross-engine at once.
  *
  * Scope (the shape the official writer emits for flat tabular data):
  * LONG/INT (RLEv2 DIRECT_V2), DOUBLE (DIRECT), STRING (both v2
  * encodings), nullable via PRESENT streams; chunk codecs NONE, ZLIB,
  * SNAPPY, LZ4 (unframed blocks), ZSTD — every one through the repo's
  * own from-scratch decoders. Out of scope, rejected cleanly:
  * timestamps/decimals/nested types, LZO, ACID tables, encryption.
  *
  * Scale shape: stripes are the split grain exactly as in the real scan
  * path (a task decodes whole stripes; the file tail is the only shared
  * read); here one file = one task under `mapPartitions` on the file
  * list, stripes decoded sequentially inside.
  */
object OrcScan {

  private case class Bad(msg: String) extends Exception(msg)

  // -------------------------------------------------------- protobuf wire

  private final class PB(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var cont = true
      while (cont) {
        if (pos >= end) throw Bad("pb varint overrun")
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        cont = (x & 0x80) != 0
      }
      v
    }
    /** iterate fields; handler returns true if consumed, else skipped. */
    def fields(f: (Int, Int) => Boolean): Unit =
      while (hasMore) {
        val key = varint()
        val fid = (key >>> 3).toInt
        val wt = (key & 7).toInt
        if (!f(fid, wt)) skip(wt)
      }
    def lenDelim(): (Int, Int) = {
      val n = varint().toInt
      val from = pos
      pos += n
      if (pos > end) throw Bad("pb bytes overrun")
      (from, from + n)
    }
    def sub(): PB = { val (f, t) = lenDelim(); new PB(b, f, t) }
    def str(): String = { val (f, t) = lenDelim(); new String(b, f, t - f, "UTF-8") }
    def skip(wt: Int): Unit = wt match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lenDelim()
      case 5 => pos += 4
      case w => throw Bad(s"pb wire type $w")
    }
  }

  // ------------------------------------------- compressed stream inflation

  /** Undo the ORC chunked-compression framing: 3-byte LE header
    * (len << 1 | isOriginal), chunks decoded by the repo's OWN codec
    * family — zlib x264, snappy x198, lz4 x199, zstd x227.
    * CompressionKind: 0 NONE, 1 ZLIB, 2 SNAPPY, 4 LZ4, 5 ZSTD (LZO 3
    * quarantines).
    */
  private def inflateStream(
      b: Array[Byte],
      from: Int,
      until: Int,
      kind: Int,
      blockSize: Int = 1 << 20
  ): Array[Byte] = {
    if (kind == 0) return java.util.Arrays.copyOfRange(b, from, until)
    if (kind != 1 && kind != 2 && kind != 4 && kind != 5) throw Bad(s"unsupported orc compression $kind")
    val out = new java.io.ByteArrayOutputStream((until - from) * 3 + 64)
    var p = from
    while (p < until) {
      if (p + 3 > until) throw Bad("chunk header overrun")
      val h = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16)
      p += 3
      val len = h >>> 1
      if (p + len > until) throw Bad("chunk overrun")
      if ((h & 1) == 1) out.write(b, p, len) // original (uncompressed) chunk
      else {
        val chunk = java.util.Arrays.copyOfRange(b, p, p + len)
        val inf = kind match {
          case 1 => Inflate.raw(b, p, p + len, 64 << 20).map(_.data)
          case 2 => SnappyBlock.decode(chunk)
          case 4 => Lz4Block.decodeUnframed(chunk, blockSize) // ORC chunks carry no length prefix
          case 5 => ZstdFrame.decode(chunk)
        }
        val data = inf.getOrElse(throw Bad(s"chunk decode failed (kind $kind)"))
        out.write(data, 0, data.length)
      }
      p += len
    }
    out.toByteArray
  }

  // --------------------------------------------------------------- RLEv2

  /** Round a bit width up to the RLEv2 fixed-width table. */
  private def closestFixedBits(n: Int): Int =
    if (n <= 24) math.max(1, n)
    else if (n <= 26) 26
    else if (n <= 28) 28
    else if (n <= 30) 30
    else if (n <= 32) 32
    else if (n <= 40) 40
    else if (n <= 48) 48
    else if (n <= 56) 56
    else 64

  private val WidthTable: Array[Int] = {
    val t = new Array[Int](32)
    var i = 0
    while (i < 24) { t(i) = i + 1; i += 1 }
    t(24) = 26; t(25) = 28; t(26) = 30; t(27) = 32; t(28) = 40; t(29) = 48; t(30) = 56; t(31) = 64
    t
  }

  private final class BitsBE(b: Array[Byte], var pos: Int) {
    private var bit = 0
    def read(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) {
        if (pos >= b.length) throw Bad("rle bits overrun")
        val x = (b(pos) >> (7 - bit)) & 1
        v = (v << 1) | x
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        k += 1
      }
      v
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  /** signed LEB128 varint (zigzag) / unsigned, per the spec. */
  private def uvarint(b: Array[Byte], p0: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = p0
    var cont = true
    while (cont) {
      val x = b(p) & 0xff; p += 1
      v |= (x & 0x7fL) << shift
      shift += 7
      cont = (x & 0x80) != 0
    }
    (v, p)
  }
  private def svarint(b: Array[Byte], p0: Int): (Long, Int) = {
    val (u, p) = uvarint(b, p0)
    ((u >>> 1) ^ -(u & 1), p)
  }

  /** Decode `n` RLEv2 values; `signed` applies zigzag to SHORT_REPEAT /
    * DIRECT / PATCHED_BASE payloads and the DELTA base.
    */
  def rleV2(b: Array[Byte], n: Int, signed: Boolean): Array[Long] = {
    val out = new Array[Long](n)
    var o = 0
    var p = 0
    while (o < n) {
      val h = b(p) & 0xff
      (h >>> 6) match {
        case 0 => // SHORT_REPEAT
          val width = ((h >>> 3) & 7) + 1
          val rep = (h & 7) + 3
          var v = 0L
          var k = 0
          while (k < width) { v = (v << 8) | (b(p + 1 + k) & 0xffL); k += 1 }
          if (signed) v = (v >>> 1) ^ -(v & 1)
          p += 1 + width
          var i = 0
          while (i < rep) { out(o) = v; o += 1; i += 1 }
        case 1 => // DIRECT
          val w = WidthTable((h >>> 1) & 31)
          val len = (((h & 1) << 8) | (b(p + 1) & 0xff)) + 1
          val bits = new BitsBE(b, p + 2)
          var i = 0
          while (i < len) {
            var v = bits.read(w)
            if (signed) v = (v >>> 1) ^ -(v & 1)
            out(o) = v; o += 1
            i += 1
          }
          bits.align()
          p = bits.pos
        case 2 => // PATCHED_BASE
          val w = WidthTable((h >>> 1) & 31)
          val len = (((h & 1) << 8) | (b(p + 1) & 0xff)) + 1
          val h3 = b(p + 2) & 0xff
          val bw = ((h3 >>> 5) & 7) + 1 // base width bytes
          val pwCode = h3 & 31
          val pw = WidthTable(pwCode) // patch width bits
          val h4 = b(p + 3) & 0xff
          val pgw = ((h4 >>> 5) & 7) + 1 // patch gap width bits
          val pll = h4 & 31 // patch list length
          var base = 0L
          var k = 0
          while (k < bw) { base = (base << 8) | (b(p + 4 + k) & 0xffL); k += 1 }
          // MSB of the base is its sign bit
          val signBit = 1L << (bw * 8 - 1)
          if ((base & signBit) != 0) base = -(base & (signBit - 1))
          val bits = new BitsBE(b, p + 4 + bw)
          val vals = new Array[Long](len)
          var i = 0
          while (i < len) { vals(i) = bits.read(w); i += 1 }
          bits.align()
          // patch list: pll entries, each packed at closestFixedBits(pgw+pw)
          // (the reference rounds the COMBINED entry width up to the fixed
          // table — e.g. 31 → 32 — leaving high padding bits; reading gap
          // then patch tightly mis-shifts every entry)
          val entryW = closestFixedBits(pgw + pw)
          val pbits = new BitsBE(b, bits.pos)
          var idx = 0
          var e = 0
          while (e < pll) {
            val entry = pbits.read(entryW)
            val gap = (entry >>> pw).toInt
            val patch = entry & ((1L << pw) - 1)
            idx += gap
            vals(idx) = vals(idx) | (patch << w)
            e += 1
          }
          pbits.align()
          i = 0
          while (i < len) { out(o) = base + vals(i); o += 1; i += 1 }
          p = pbits.pos
        case _ => // DELTA
          val wCode = (h >>> 1) & 31
          val w = if (wCode == 0) 0 else WidthTable(wCode)
          val len = (((h & 1) << 8) | (b(p + 1) & 0xff)) + 1
          var q = p + 2
          val (base0, q1) = if (signed) svarint(b, q) else uvarint(b, q)
          q = q1
          val (deltaBase, q2) = svarint(b, q)
          q = q2
          out(o) = base0; o += 1
          var prev = base0
          if (len >= 2) {
            prev = base0 + deltaBase
            out(o) = prev; o += 1
          }
          if (w > 0) {
            val bits = new BitsBE(b, q)
            var i = 2
            while (i < len) {
              val d = bits.read(w)
              prev = if (deltaBase >= 0) prev + d else prev - d
              out(o) = prev; o += 1
              i += 1
            }
            bits.align()
            q = bits.pos
          } else {
            var i = 2
            while (i < len) { prev += deltaBase; out(o) = prev; o += 1; i += 1 }
          }
          p = q
      }
    }
    out
  }

  /** Byte RLE (the boolean/present carrier): header 0..127 → run of
    * (h+3) copies; −1..−128 → that many literal bytes.
    */
  def byteRle(b: Array[Byte], nBytes: Int): Array[Byte] = {
    val out = new Array[Byte](nBytes)
    var o = 0
    var p = 0
    while (o < nBytes) {
      val h = b(p); p += 1
      if (h >= 0) {
        val run = h + 3
        val v = b(p); p += 1
        var i = 0
        while (i < run && o < nBytes) { out(o) = v; o += 1; i += 1 }
      } else {
        val lit = -h
        var i = 0
        while (i < lit && o < nBytes) { out(o) = b(p); p += 1; o += 1; i += 1 }
      }
    }
    out
  }

  /** Boolean RLE: byte RLE over bit-packed bytes, MSB-first. */
  def boolRle(b: Array[Byte], n: Int): Array[Boolean] = {
    val bytes = byteRle(b, (n + 7) / 8)
    Array.tabulate(n)(i => ((bytes(i >> 3) >> (7 - (i & 7))) & 1) == 1)
  }

  // ----------------------------------------------------------------- file

  final case class OrcCol(name: String, kind: Int) // kinds: 4 LONG, 3 INT, 6 DOUBLE, 7 STRING (spec ids)

  final case class OrcData(
      cols: Vector[OrcCol],
      rows: Vector[Array[Any]],
      stripesTotal: Int = 0,
      stripesDecoded: Int = 0
  )

  /** `wanted`: decode only these leaf columns (physical pruning — a
    * skipped column's streams are never touched, and unsupported types
    * outside the selection cost nothing). None = all columns.
    */
  def decode(bytes: Array[Byte], wanted: Option[Seq[String]] = None): Option[OrcData] =
    try Some(decodeOrThrow(bytes, wanted))
    catch { case _: Bad | _: IndexOutOfBoundsException | _: NegativeArraySizeException => None }

  /** Range-pruned read (x301, the x293 analog): decode only stripes whose
    * IntegerStatistics window on `filterCol` (from the file's Metadata
    * section) intersects [lo, hi], then filter rows exactly; stripes
    * without statistics decode conservatively. Counts are reported in
    * the returned OrcData.
    */
  def decodeRange(
      bytes: Array[Byte],
      wanted: Seq[String],
      filterCol: String,
      lo: Long,
      hi: Long
  ): Option[OrcData] =
    try Some(decodeOrThrow(bytes, Some(wanted), Some((filterCol, lo, hi))))
    catch { case _: Bad | _: IndexOutOfBoundsException | _: NegativeArraySizeException => None }

  /** diagnostic twin: the structural reason a file quarantines (spec use). */
  private[sources] def decodeErr(bytes: Array[Byte]): String =
    try { decodeOrThrow(bytes); "ok" }
    catch { case e: Throwable => s"${e.getClass.getSimpleName}: ${e.getMessage} @ ${e.getStackTrace.take(2).mkString(" / ")}" }

  private def decodeOrThrow(
      bytes: Array[Byte],
      wanted: Option[Seq[String]] = None,
      range: Option[(String, Long, Long)] = None
  ): OrcData = {
    val n = bytes.length
    if (n < 16) throw Bad("too short")
    val psLen = bytes(n - 1) & 0xff
    val psFrom = n - 1 - psLen
    // postscript (never compressed): footerLength fid 1, compression fid 2,
    // magic "ORC" fid 8000 (orc_proto.proto)
    var footerLen = -1L
    var compression = 0
    var blockSize = 1 << 20
    var metaLen = 0
    var magicOk = false
    locally {
      val pb = new PB(bytes, psFrom, n - 1)
      pb.fields { (fid, wt) =>
        (fid, wt) match {
          case (1, 0)    => footerLen = pb.varint(); true
          case (2, 0)    => compression = pb.varint().toInt; true
          case (3, 0)    => blockSize = pb.varint().toInt; true
          case (5, 0)    => metaLen = pb.varint().toInt; true
          case (8000, 2) => magicOk = pb.str() == "ORC"; true
          case _         => false
        }
      }
    }
    if (!magicOk) throw Bad("postscript magic missing")
    if (footerLen <= 0) throw Bad("no footer length")
    val footerEnd = psFrom
    val footerFrom = footerEnd - footerLen.toInt
    val footer = inflateStream(bytes, footerFrom, footerEnd, compression, blockSize)

    // Footer: stripes (fid 3), types (fid 4), numberOfRows (fid 6)
    final case class Stripe(offset: Long, indexLen: Long, dataLen: Long, footLen: Long, rows: Long)
    val stripes = ArrayBuffer.empty[Stripe]
    val typeKinds = ArrayBuffer.empty[Int]
    val typeSubs = ArrayBuffer.empty[Vector[Int]]
    val fieldNames = ArrayBuffer.empty[String]
    locally {
      val pb = new PB(footer, 0, footer.length)
      pb.fields { (fid, wt) =>
        (fid, wt) match {
          case (3, 2) =>
            val sp = pb.sub()
            var off = 0L; var il = 0L; var dl = 0L; var fl = 0L; var rw = 0L
            sp.fields { (f2, _) =>
              f2 match {
                case 1 => off = sp.varint(); true
                case 2 => il = sp.varint(); true
                case 3 => dl = sp.varint(); true
                case 4 => fl = sp.varint(); true
                case 5 => rw = sp.varint(); true
                case _ => false
              }
            }
            stripes += Stripe(off, il, dl, fl, rw)
            true
          case (4, 2) =>
            val tp = pb.sub()
            var kind = -1
            val subs = ArrayBuffer.empty[Int]
            tp.fields { (f2, w2) =>
              (f2, w2) match {
                case (1, 0) => kind = tp.varint().toInt; true
                case (2, 0) => subs += tp.varint().toInt; true
                case (2, 2) => // packed repeated
                  val s2 = tp.sub()
                  while (s2.hasMore) subs += s2.varint().toInt
                  true
                case (3, 2) => fieldNames += tp.str(); true
                case _      => false
              }
            }
            typeKinds += kind
            typeSubs += subs.toVector
            true
          case _ => false
        }
      }
    }
    if (typeKinds.isEmpty || typeKinds(0) != 12) throw Bad("root must be a struct") // 12 = STRUCT
    val leafIds = typeSubs(0)
    val selected = leafIds.zipWithIndex.filter { case (_, i) =>
      wanted.forall(_.contains(fieldNames(i)))
    }
    wanted.foreach { w =>
      val have = selected.map { case (_, i) => fieldNames(i) }.toSet
      w.foreach(c => if (!have.contains(c)) throw Bad(s"no column $c"))
    }
    val cols = selected.map { case (tid, i) =>
      val k = typeKinds(tid)
      if (k != 0 && k != 3 && k != 4 && k != 6 && k != 7)
        throw Bad(s"unsupported orc type kind $k") // bool/int/long/double/string only
      OrcCol(fieldNames(i), k)
    }
    val selIds = selected.map(_._1)

    // x301: per-stripe IntegerStatistics for the filter column, from the
    // Metadata section ([metadata][footer][postscript]); a stripe without
    // stats decodes conservatively
    val stripeWindows: Option[Vector[Option[(Long, Long)]]] = range.map { case (fc, _, _) =>
      val fIdx = selected.indexWhere { case (_, i) => fieldNames(i) == fc }
      if (fIdx < 0) throw Bad(s"filter column $fc not selected")
      val fTid = selIds(fIdx)
      if (metaLen <= 0) Vector.fill(stripes.length)(None)
      else {
        val metaFrom = footerFrom - metaLen
        val meta = inflateStream(bytes, metaFrom, footerFrom, compression, blockSize)
        val wins = ArrayBuffer.empty[Option[(Long, Long)]]
        val pb = new PB(meta, 0, meta.length)
        pb.fields { (fid, wt) =>
          (fid, wt) match {
            case (1, 2) => // StripeStatistics
              val sp = pb.sub()
              var tid = 0
              var win: Option[(Long, Long)] = None
              sp.fields { (f2, w2) =>
                (f2, w2) match {
                  case (1, 2) => // ColumnStatistics, in type-id order
                    val cp = sp.sub()
                    if (tid == fTid) {
                      cp.fields { (f3, w3) =>
                        (f3, w3) match {
                          case (2, 2) => // IntegerStatistics
                            val ip = cp.sub()
                            var mn = Option.empty[Long]
                            var mx = Option.empty[Long]
                            ip.fields { (f4, _) =>
                              f4 match {
                                case 1 => mn = Some { val u = ip.varint(); (u >>> 1) ^ -(u & 1) }; true
                                case 2 => mx = Some { val u = ip.varint(); (u >>> 1) ^ -(u & 1) }; true
                                case _ => false
                              }
                            }
                            for (a <- mn; b0 <- mx) win = Some((a, b0))
                            true
                          case _ => false
                        }
                      }
                    }
                    tid += 1
                    true
                  case _ => false
                }
              }
              wins += win
              true
            case _ => false
          }
        }
        if (wins.length == stripes.length) wins.toVector else Vector.fill(stripes.length)(None)
      }
    }

    var stripesDecoded = 0
    val rows = ArrayBuffer.empty[Array[Any]]
    stripes.zipWithIndex.foreach { case (st, stIdx) =>
      val skip = (range, stripeWindows) match {
        case (Some((_, lo, hi)), Some(ws)) =>
          ws(stIdx) match {
            case Some((mn, mx)) => mx < lo || mn > hi
            case None           => false
          }
        case _ => false
      }
      if (!skip) {
      stripesDecoded += 1
      val sfFrom = (st.offset + st.indexLen + st.dataLen).toInt
      val sf = inflateStream(bytes, sfFrom, sfFrom + st.footLen.toInt, compression, blockSize)
      // StripeFooter: streams (fid 1), columns encodings (fid 2)
      final case class Strm(kind: Int, column: Int, length: Long)
      val streams = ArrayBuffer.empty[Strm]
      val encodings = ArrayBuffer.empty[(Int, Int)] // (kind, dictSize)
      locally {
        val pb = new PB(sf, 0, sf.length)
        pb.fields { (fid, wt) =>
          (fid, wt) match {
            case (1, 2) =>
              val sp = pb.sub()
              var k = 0; var c = 0; var l = 0L
              sp.fields { (f2, _) =>
                f2 match {
                  case 1 => k = sp.varint().toInt; true
                  case 2 => c = sp.varint().toInt; true
                  case 3 => l = sp.varint(); true
                  case _ => false
                }
              }
              streams += Strm(k, c, l)
              true
            case (2, 2) =>
              val ep = pb.sub()
              var k = 0; var ds = 0
              ep.fields { (f2, _) =>
                f2 match {
                  case 1 => k = ep.varint().toInt; true
                  case 2 => ds = ep.varint().toInt; true
                  case _ => false
                }
              }
              encodings += ((k, ds))
              true
            case _ => false
          }
        }
      }
      // locate each stream's byte range: the footer lists ALL streams in
      // file order — index-region kinds (ROW_INDEX 6, BLOOM 7/8) first,
      // then the data region — so one cumulative walk from the stripe
      // start places everything
      var cursor = st.offset.toInt
      val ranges = streams.map { s0 =>
        val r = (s0, cursor, cursor + s0.length.toInt)
        cursor += s0.length.toInt
        r
      }
      def streamOf(column: Int, kind: Int): Option[Array[Byte]] =
        ranges.find(r => r._1.column == column && r._1.kind == kind).map { case (_, f, t) =>
          inflateStream(bytes, f, t, compression, blockSize)
        }

      val nRows = st.rows.toInt
      val colVals: Vector[Array[Any]] = cols.zipWithIndex.map { case (c, i) =>
        val tid = selIds(i)
        val present = streamOf(tid, 0).map(b0 => boolRle(b0, nRows)) // kind 0 = PRESENT
        val nonNull = present.map(_.count(identity)).getOrElse(nRows)
        val enc = encodings(tid)
        val vals: Array[Any] = try c.kind match {
          case 0 => // BOOLEAN: DATA is bit RLE over the non-null values
            val data = streamOf(tid, 1).getOrElse(throw Bad("missing bool data"))
            boolRle(data, nonNull).map(v => v: Any)
          case 3 | 4 => // INT / LONG: DATA (kind 1) RLEv2 signed
            if (enc._1 != 2) throw Bad(s"int encoding ${enc._1} unsupported") // DIRECT_V2
            val data = streamOf(tid, 1).getOrElse(throw Bad("missing int data"))
            rleV2(data, nonNull, signed = true).map(v => v: Any)
          case 6 => // DOUBLE: DATA ieee754 LE
            val data = streamOf(tid, 1).getOrElse(throw Bad("missing double data"))
            Array.tabulate[Any](nonNull) { j =>
              var v = 0L
              var k = 0
              while (k < 8) { v |= (data(j * 8 + k) & 0xffL) << (8 * k); k += 1 }
              java.lang.Double.longBitsToDouble(v)
            }
          case 7 => // STRING
            enc._1 match {
              case 2 => // DIRECT_V2: DATA bytes + LENGTH rle
                val data = streamOf(tid, 1).getOrElse(throw Bad("missing string data"))
                val lens = rleV2(streamOf(tid, 2).getOrElse(throw Bad("missing lengths")), nonNull, signed = false)
                val out0 = new Array[Any](nonNull)
                var off = 0
                var j = 0
                while (j < nonNull) {
                  out0(j) = new String(data, off, lens(j).toInt, "UTF-8")
                  off += lens(j).toInt
                  j += 1
                }
                out0
              case 3 => // DICTIONARY_V2: DATA indices + DICTIONARY_DATA + LENGTH
                val dictSize = enc._2
                val dictData = streamOf(tid, 3).getOrElse(throw Bad("missing dictionary data"))
                val dictLens = rleV2(streamOf(tid, 2).getOrElse(throw Bad("missing dict lengths")), dictSize, signed = false)
                val dict = new Array[String](dictSize)
                var off = 0
                var j = 0
                while (j < dictSize) {
                  dict(j) = new String(dictData, off, dictLens(j).toInt, "UTF-8")
                  off += dictLens(j).toInt
                  j += 1
                }
                val idx = rleV2(streamOf(tid, 1).getOrElse(throw Bad("missing indices")), nonNull, signed = false)
                idx.map(v => dict(v.toInt): Any)
              case other => throw Bad(s"string encoding $other unsupported")
            }
          case other => throw Bad(s"type kind $other")
        } catch {
          case e: ArrayIndexOutOfBoundsException => throw Bad(s"col ${c.name} (kind ${c.kind}, enc $enc): $e")
        }
        // weave nulls back per the present stream
        present match {
          case None => vals
          case Some(pr) =>
            val out0 = new Array[Any](nRows)
            var v = 0
            var j = 0
            while (j < nRows) {
              if (pr(j)) { out0(j) = vals(v); v += 1 }
              j += 1
            }
            out0
        }
      }
      val fIdx = range.map { case (fc, _, _) => cols.indexWhere(_.name == fc) }.getOrElse(-1)
      var j = 0
      while (j < nRows) {
        val keep = range match {
          case Some((_, lo, hi)) =>
            val v = colVals(fIdx)(j)
            v != null && v.asInstanceOf[Long] >= lo && v.asInstanceOf[Long] <= hi
          case None => true
        }
        if (keep) rows += cols.indices.map(colVals(_)(j)).toArray
        j += 1
      }
      }
    }
    OrcData(cols.toVector, rows.toVector, stripes.length, stripesDecoded)
  }
}
