package graft.sources

import scala.collection.mutable.ArrayBuffer

/** x282 — parquet read from first principles: the engine's OWN storage
  * format, decoded with zero `org.apache.parquet` imports. Everything from
  * the published format spec (apache/parquet-format: Thrift compact
  * protocol metadata, RLE/bit-packed hybrid levels, PLAIN +
  * RLE_DICTIONARY value encodings) with the page codecs the repo already
  * built from their own specs — Snappy x198, gzip/zlib x264, zstd x227.
  *
  * Reference behavior studied from dangkhoipham/data_engineering_capstone
  * (its pipeline's outputs are parquet on S3; `dags/libs/lib.py:171-218`) —
  * the format itself is the public parquet-format spec.
  *
  * Why it matters at 100 TB: parquet IS the engine's data plane. A reader
  * built from the spec makes the x256 layout audit self-contained (no
  * library on EITHER side of the cross-parser check), turns column
  * projection into byte-range arithmetic (a skipped column's chunk is
  * never read — visible here as `wanted`), and row groups are the
  * distribution grain exactly as in the real scan path.
  *
  * Coverage (the subset the fixture writers — parquet-cpp-arrow and
  * Spark's parquet-mr — actually emit for the engine's tables):
  *   - Footer: PAR1 magic both ends, Thrift compact FileMetaData (schema
  *     tree with def/rep levels derived from repetition types, row groups,
  *     column chunks, codecs, encodings, page offsets).
  *   - Pages: v1 data pages + dictionary pages (v2 data pages too — the
  *     separate uncompressed-levels layout); page-level encoding switch
  *     (dictionary fallback to PLAIN mid-chunk).
  *   - Levels: RLE/bit-packed hybrid, 4-byte-length-prefixed in v1,
  *     unprefixed in v2; definition and repetition.
  *   - Values: PLAIN for INT32/INT64/FLOAT/DOUBLE/BYTE_ARRAY/BOOLEAN,
  *     RLE_DICTIONARY / PLAIN_DICTIONARY indices over a PLAIN dictionary.
  *   - Assembly: flat optional/required columns, and single-level LIST
  *     nesting (the embeddings table's `list<float>`), driven entirely by
  *     the schema-derived (maxDef, maxRep).
  *
  * Out of scope, rejected cleanly (quarantine, never wrong bytes): INT96,
  * FIXED_LEN_BYTE_ARRAY, DELTA encodings, deeper nesting, encrypted
  * footers, LZ4/Brotli pages.
  *
  * Scale shape: the file list is the planning unit (driver-side,
  * file-count-sized, same as every scan); file bytes decode per-task under
  * `mapPartitions`. Column pruning happens at chunk-offset grain — a
  * pruned column costs zero bytes read. Row groups inside a file are
  * independent decode units.
  */
object ParquetScan {

  private case class Bad(msg: String) extends Exception(msg)

  // ------------------------------------------------- thrift compact reader

  /** Minimal Thrift compact-protocol cursor (public spec: thrift
    * compact-protocol.md). Struct parsing loops field headers (delta-coded
    * ids, type nibbles) until STOP; callers switch on (fieldId, type) and
    * must consume exactly the value — `skip` handles everything unclaimed.
    */
  private final class TC(b: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var cont = true
      while (cont) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        shift += 7
        cont = (x & 0x80) != 0
        if (shift > 70) throw Bad("varint overrun")
      }
      v
    }
    def zig(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    def i32(): Int = zig().toInt
    def i64(): Long = zig()
    def binary(): Array[Byte] = {
      val n = varint().toInt
      if (n < 0 || pos + n > b.length) throw Bad("binary overrun")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      out
    }
    def string(): String = new String(binary(), "UTF-8")

    /** Parse one struct: `f(fieldId, typeNibble)` returns true if it
      * consumed the value, false to have it skipped.
      */
    def struct(f: (Int, Int) => Boolean): Unit = {
      var fid = 0
      var done = false
      while (!done) {
        val h = u8()
        if (h == 0) done = true
        else {
          val t = h & 0xf
          val delta = h >>> 4
          fid = if (delta == 0) zig().toInt else fid + delta
          if (!f(fid, t)) skip(t)
        }
      }
    }

    /** List header → (size, elemType). */
    def listHeader(): (Int, Int) = {
      val h = u8()
      val t = h & 0xf
      val sz = if ((h >>> 4) == 15) varint().toInt else h >>> 4
      (sz, t)
    }

    def skip(t: Int): Unit = t match {
      case 1 | 2  => () // bool: value lives in the field-header nibble
      case 3      => pos += 1
      case 4 | 5 | 6 => varint()
      case 7      => pos += 8
      case 8      => val n = varint().toInt; pos += n
      case 9 | 10 =>
        val (sz, et) = listHeader()
        var i = 0
        while (i < sz) { if (et == 1 || et == 2) pos += 1 else skip(et); i += 1 }
      case 11 =>
        val sz = varint().toInt
        if (sz > 0) {
          val kv = u8()
          var i = 0
          while (i < sz) { skip(kv >>> 4); skip(kv & 0xf); i += 1 }
        }
      case 12 => struct((_, _) => false)
      case other => throw Bad(s"unknown thrift type $other")
    }
  }

  // ------------------------------------------------------ metadata structs

  /** One leaf column: dotted path, physical type, levels, chunk layout. */
  final case class LeafMeta(
      path: String,
      ptype: Int, // 0 bool, 1 i32, 2 i64, 4 float, 5 double, 6 byte_array (3 int96, 7 flba rejected)
      maxDef: Int,
      maxRep: Int,
      codec: Int, // 0 none, 1 snappy, 2 gzip, 6 zstd, 7 lz4_raw supported
      leafOptional: Boolean, // the LEAF element's own repetition (list shape disambiguation)
      numValues: Long,
      dataPageOffset: Long,
      dictPageOffset: Long, // -1 when absent
      totalCompressed: Long,
      statMin: Array[Byte] = null, // Statistics min_value/max_value, PLAIN singles
      statMax: Array[Byte] = null
  ) {
    /** decode an int64 stats value (null → None). */
    private def i64(b: Array[Byte]): Option[Long] =
      if (b == null || b.length != 8) None
      else {
        var v = 0L
        var k = 0
        while (k < 8) { v |= (b(k) & 0xffL) << (8 * k); k += 1 }
        Some(v)
      }
    def statMinLong: Option[Long] = i64(statMin)
    def statMaxLong: Option[Long] = i64(statMax)
  }

  final case class RowGroupMeta(numRows: Long, leaves: Vector[LeafMeta])

  /** Schema-walk facts per leaf, independent of row groups — what a
    * DataSource needs to infer a table schema even from an empty file.
    * `logical` tags: "string", "date", "decimal", "ts_{millis|micros|
    * nanos}_{utc|ntz}", "" = none. */
  final case class LeafInfo(maxDef: Int, maxRep: Int, leafOptional: Boolean, ptype: Int, logical: String)

  final case class FileMeta(
      numRows: Long,
      rowGroups: Vector[RowGroupMeta],
      leafOrder: Vector[String],
      leaves: Vector[(String, LeafInfo)] = Vector.empty)

  private final case class SchemaEl(
      name: String,
      ptype: Int,
      repetition: Int, // 0 required 1 optional 2 repeated
      numChildren: Int,
      conv: Int,      // ConvertedType enum, -1 when absent (UTF8=0, DATE=6)
      logical: String // LogicalType union, "" when absent
  )

  /** Parse the footer's FileMetaData. */
  def footer(bytes: Array[Byte]): FileMeta = {
    val n = bytes.length
    if (n < 12 || bytes(0) != 'P' || bytes(1) != 'A' || bytes(2) != 'R' || bytes(3) != '1')
      throw Bad("missing leading PAR1")
    if (bytes(n - 4) != 'P' || bytes(n - 3) != 'A' || bytes(n - 2) != 'R' || bytes(n - 1) != '1')
      throw Bad("missing trailing PAR1")
    val flen = (bytes(n - 8) & 0xff) | ((bytes(n - 7) & 0xff) << 8) | ((bytes(n - 6) & 0xff) << 16) |
      ((bytes(n - 5) & 0xff) << 24)
    val start = n - 8 - flen
    if (flen <= 0 || start < 4) throw Bad("bad footer length")
    val tc = new TC(bytes, start)

    var numRows = -1L
    val schema = ArrayBuffer.empty[SchemaEl]
    val rowGroups = ArrayBuffer.empty[RowGroupMeta]

    def parseSchemaEl(): SchemaEl = {
      var name = ""
      var ptype = -1
      var rep = 0
      var children = 0
      var conv = -1
      var logical = ""
      tc.struct {
        case (1, _) => ptype = tc.i32(); true
        case (3, _) => rep = tc.i32(); true
        case (4, _) => name = tc.string(); true
        case (5, _) => children = tc.i32(); true
        case (6, _) => conv = tc.i32(); true
        case (10, 12) => // LogicalType union (members are empty structs,
          // except TIMESTAMP which carries {isAdjustedToUTC, unit-union})
          tc.struct {
            case (1, 12) => logical = "string"; tc.skip(12); true
            case (5, 12) => logical = "decimal"; tc.skip(12); true
            case (6, 12) => logical = "date"; tc.skip(12); true
            case (8, 12) =>
              var utc = false
              var unit = "micros"
              tc.struct {
                case (1, bt) => utc = bt == 1; true // bool lives in the nibble
                case (2, 12) =>
                  tc.struct {
                    case (1, 12) => unit = "millis"; tc.skip(12); true
                    case (2, 12) => unit = "micros"; tc.skip(12); true
                    case (3, 12) => unit = "nanos"; tc.skip(12); true
                    case _       => false
                  }
                  true
                case _ => false
              }
              logical = s"ts_${unit}_${if (utc) "utc" else "ntz"}"
              true
            case _ => false
          }
          true
        case _ => false
      }
      // pre-2.4 writers carry only ConvertedType — normalize onto the tags
      if (logical.isEmpty) logical = conv match {
        case 0  => "string"
        case 6  => "date"
        case 9  => "ts_millis_utc"
        case 10 => "ts_micros_utc"
        case _  => ""
      }
      SchemaEl(name, ptype, rep, children, conv, logical)
    }

    def parseColumnMeta(): LeafMeta = {
      var ptype = -1
      var codec = -1
      var numValues = -1L
      var dataOff = -1L
      var dictOff = -1L
      var totalComp = -1L
      var path = Vector.empty[String]
      var stMin: Array[Byte] = null
      var stMax: Array[Byte] = null
      tc.struct {
        case (1, _) => ptype = tc.i32(); true
        case (3, _) =>
          val (sz, _) = tc.listHeader()
          var i = 0
          while (i < sz) { path = path :+ tc.string(); i += 1 }
          true
        case (4, _)  => codec = tc.i32(); true
        case (5, _)  => numValues = tc.i64(); true
        case (7, _)  => totalComp = tc.i64(); true
        case (9, _)  => dataOff = tc.i64(); true
        case (11, _) => dictOff = tc.i64(); true
        case (12, 12) => // Statistics: modern min_value/max_value
          tc.struct {
            case (5, 8) => stMax = tc.binary(); true
            case (6, 8) => stMin = tc.binary(); true
            case _      => false
          }
          true
        case _ => false
      }
      LeafMeta(path.mkString("."), ptype, 0, 0, codec, leafOptional = false, numValues, dataOff, dictOff, totalComp, stMin, stMax)
    }

    def parseColumnChunk(): LeafMeta = {
      var lm: LeafMeta = null
      tc.struct {
        case (3, 12) => lm = parseColumnMeta(); true
        case _       => false
      }
      if (lm == null) throw Bad("column chunk without metadata")
      lm
    }

    def parseRowGroup(): RowGroupMeta = {
      var rows = -1L
      val cols = ArrayBuffer.empty[LeafMeta]
      tc.struct {
        case (1, 9) =>
          val (sz, _) = tc.listHeader()
          var i = 0
          while (i < sz) { cols += parseColumnChunk(); i += 1 }
          true
        case (3, _) => rows = tc.i64(); true
        case _      => false
      }
      RowGroupMeta(rows, cols.toVector)
    }

    tc.struct {
      case (2, 9) =>
        val (sz, _) = tc.listHeader()
        var i = 0
        while (i < sz) { schema += parseSchemaEl(); i += 1 }
        true
      case (3, _) => numRows = tc.i64(); true
      case (4, 9) =>
        val (sz, _) = tc.listHeader()
        var i = 0
        while (i < sz) { rowGroups += parseRowGroup(); i += 1 }
        true
      case _ => false
    }

    // walk the schema tree: leaf (maxDef, maxRep) from repetition types
    if (schema.isEmpty) throw Bad("empty schema")
    val levels = scala.collection.mutable.LinkedHashMap.empty[String, LeafInfo]
    var idx = 1 // skip root
    def walk(prefix: Vector[String], d0: Int, r0: Int): Unit = {
      val el = schema(idx)
      idx += 1
      val d = d0 + (if (el.repetition != 0) 1 else 0)
      val r = r0 + (if (el.repetition == 2) 1 else 0)
      if (el.numChildren == 0)
        levels += ((prefix :+ el.name).mkString(".") ->
          LeafInfo(d, r, el.repetition == 1, el.ptype, el.logical))
      else {
        var c = 0
        while (c < el.numChildren) { walk(prefix :+ el.name, d, r); c += 1 }
      }
    }
    val rootChildren = schema(0).numChildren
    var c = 0
    while (c < rootChildren) { walk(Vector.empty, 0, 0); c += 1 }

    val rgs = rowGroups.map { rg =>
      RowGroupMeta(
        rg.numRows,
        rg.leaves.map { lm =>
          val li = levels.getOrElse(lm.path, throw Bad(s"chunk path ${lm.path} not in schema"))
          lm.copy(maxDef = li.maxDef, maxRep = li.maxRep, leafOptional = li.leafOptional)
        }
      )
    }
    FileMeta(numRows, rgs.toVector, levels.keys.toVector, levels.toVector)
  }

  // ------------------------------------------------- RLE/bit-packed hybrid

  /** Decode `n` level/index values of `bitWidth` bits from the hybrid
    * encoding (parquet-format Encodings.md).
    */
  private def hybrid(b: Array[Byte], from: Int, until: Int, bitWidth: Int, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    if (bitWidth == 0) return out
    var pos = from
    var o = 0
    val byteW = (bitWidth + 7) >> 3
    while (o < n) {
      if (pos >= until) throw Bad("hybrid overrun")
      // varint header
      var h = 0L
      var shift = 0
      var cont = true
      while (cont) {
        val x = b(pos) & 0xff; pos += 1
        h |= (x & 0x7fL) << shift
        shift += 7
        cont = (x & 0x80) != 0
      }
      if ((h & 1) == 0) {
        val run = (h >>> 1).toInt
        var v = 0
        var k = 0
        while (k < byteW) { v |= (b(pos) & 0xff) << (8 * k); pos += 1; k += 1 }
        var i = 0
        while (i < run && o < n) { out(o) = v; o += 1; i += 1 }
      } else {
        val groups = (h >>> 1).toInt
        val total = groups * 8
        var bit = 0
        var i = 0
        while (i < total && o < n) {
          var v = 0
          var k = 0
          while (k < bitWidth) {
            val abs = bit + k
            v |= ((b(pos + (abs >> 3)) >> (abs & 7)) & 1) << k
            k += 1
          }
          out(o) = v; o += 1
          bit += bitWidth
          i += 1
        }
        pos += (total * bitWidth + 7) >> 3
      }
    }
    out
  }

  private def bitsFor(maxLevel: Int): Int =
    if (maxLevel == 0) 0 else 32 - Integer.numberOfLeadingZeros(maxLevel)

  // ----------------------------------------------------------- value decode

  /** PLAIN-decode `n` values of physical type `ptype` starting at `from`;
    * returns (values, bytesConsumed). Values are Long / Float / Double /
    * Array[Byte] / Boolean boxed in Array[Any].
    */
  private def plain(b: Array[Byte], from: Int, n: Int, ptype: Int): (Array[Any], Int) = {
    val out = new Array[Any](n)
    var pos = from
    def i32le(): Int = {
      val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) | ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def i64le(): Long = {
      var v = 0L
      var k = 0
      while (k < 8) { v |= (b(pos) & 0xffL) << (8 * k); pos += 1; k += 1 }
      v
    }
    var i = 0
    ptype match {
      case 0 => // boolean, bit-packed LSB-first
        while (i < n) { out(i) = ((b(pos + (i >> 3)) >> (i & 7)) & 1) == 1; i += 1 }
        pos += (n + 7) >> 3
      case 1 => while (i < n) { out(i) = i32le().toLong; i += 1 }
      case 2 => while (i < n) { out(i) = i64le(); i += 1 }
      case 4 => while (i < n) { out(i) = java.lang.Float.intBitsToFloat(i32le()); i += 1 }
      case 5 => while (i < n) { out(i) = java.lang.Double.longBitsToDouble(i64le()); i += 1 }
      case 6 =>
        while (i < n) {
          val len = i32le()
          if (len < 0 || pos + len > b.length) throw Bad("byte_array overrun")
          out(i) = java.util.Arrays.copyOfRange(b, pos, pos + len)
          pos += len
          i += 1
        }
      case other => throw Bad(s"unsupported physical type $other")
    }
    (out, pos - from)
  }

  private def decompress(codec: Int, b: Array[Byte], from: Int, until: Int, uncompressed: Int): Array[Byte] =
    codec match {
      case 0 => java.util.Arrays.copyOfRange(b, from, until)
      case 1 =>
        SnappyBlock
          .decode(java.util.Arrays.copyOfRange(b, from, until))
          .getOrElse(throw Bad("snappy page failed"))
      case 2 =>
        Inflate
          .gunzip(java.util.Arrays.copyOfRange(b, from, until), math.max(uncompressed, 1) + 64)
          .getOrElse(throw Bad("gzip page failed"))
      case 6 =>
        ZstdFrame
          .decode(java.util.Arrays.copyOfRange(b, from, until))
          .getOrElse(throw Bad("zstd page failed"))
      case 7 =>
        Lz4Block
          .decode(java.util.Arrays.copyOfRange(b, from, until))
          .getOrElse(throw Bad("lz4_raw page failed"))
      case other => throw Bad(s"unsupported codec $other")
    }

  // -------------------------------------------------------- chunk decoding

  /** Decoded leaf column of one row group: parallel (def, rep, value)
    * streams; `values` holds only the non-null leaf values in order.
    */
  final case class LeafData(
      defs: Array[Int],
      reps: Array[Int],
      values: Array[Any],
      maxDef: Int,
      maxRep: Int,
      leafOptional: Boolean
  )

  /** Decode one column chunk from the full file bytes. */
  def readChunk(bytes: Array[Byte], lm: LeafMeta): LeafData = {
    // this reader addresses the file as one byte array, so every chunk
    // offset must fit in Int range AND inside the array — reject cleanly
    // instead of letting .toInt wrap negative and mis-address bytes
    // (files ≥ 2 GiB are the builtin reader's territory)
    if (lm.dataPageOffset < 0 || lm.dataPageOffset > bytes.length ||
      lm.dictPageOffset > bytes.length || lm.numValues > Int.MaxValue)
      throw Bad(
        s"chunk offsets out of range for a ${bytes.length}-byte buffer: " +
          s"data=${lm.dataPageOffset} dict=${lm.dictPageOffset} n=${lm.numValues}")
    var pos = if (lm.dictPageOffset >= 0) lm.dictPageOffset.toInt else lm.dataPageOffset.toInt
    var dict: Array[Any] = null
    val defs = new Array[Int](lm.numValues.toInt)
    val reps = new Array[Int](lm.numValues.toInt)
    val values = ArrayBuffer.empty[Any]
    var got = 0

    while (got < lm.numValues) {
      // ---- PageHeader (thrift compact)
      val tc = new TC(bytes, pos)
      var ptype = -1
      var uncomp = -1
      var comp = -1
      var v1Num = -1
      var v1Enc = -1
      var v2Num = -1
      var v2Nulls = -1
      var v2Enc = -1
      var v2DefLen = -1
      var v2RepLen = -1
      var v2Compressed = true
      var dictNum = -1
      tc.struct {
        case (1, _) => ptype = tc.i32(); true
        case (2, _) => uncomp = tc.i32(); true
        case (3, _) => comp = tc.i32(); true
        case (5, 12) =>
          tc.struct {
            case (1, _) => v1Num = tc.i32(); true
            case (2, _) => v1Enc = tc.i32(); true
            case _      => false
          }
          true
        case (7, 12) =>
          tc.struct {
            case (1, _) => dictNum = tc.i32(); true
            case _      => false
          }
          true
        case (8, 12) =>
          tc.struct {
            case (1, _) => v2Num = tc.i32(); true
            case (2, _) => v2Nulls = tc.i32(); true
            case (4, _) => v2Enc = tc.i32(); true
            case (5, _) => v2DefLen = tc.i32(); true
            case (6, _) => v2RepLen = tc.i32(); true
            case (7, t) => v2Compressed = t == 1; true
            case _      => false
          }
          true
        case _ => false
      }
      val dataStart = tc.pos
      pos = dataStart + comp

      ptype match {
        case 2 => // dictionary page: PLAIN values
          val page = decompress(lm.codec, bytes, dataStart, dataStart + comp, uncomp)
          val (vals, _) = plain(page, 0, dictNum, lm.ptype)
          dict = vals
        case 0 => // data page v1
          val page = decompress(lm.codec, bytes, dataStart, dataStart + comp, uncomp)
          var p = 0
          var repArr: Array[Int] = null
          if (lm.maxRep > 0) {
            val len = (page(p) & 0xff) | ((page(p + 1) & 0xff) << 8) | ((page(p + 2) & 0xff) << 16) |
              ((page(p + 3) & 0xff) << 24)
            p += 4
            repArr = hybrid(page, p, p + len, bitsFor(lm.maxRep), v1Num)
            p += len
          }
          var defArr: Array[Int] = null
          if (lm.maxDef > 0) {
            val len = (page(p) & 0xff) | ((page(p + 1) & 0xff) << 8) | ((page(p + 2) & 0xff) << 16) |
              ((page(p + 3) & 0xff) << 24)
            p += 4
            defArr = hybrid(page, p, p + len, bitsFor(lm.maxDef), v1Num)
            p += len
          }
          var nNonNull = 0
          var i = 0
          while (i < v1Num) {
            val d = if (defArr == null) lm.maxDef else defArr(i)
            defs(got + i) = d
            reps(got + i) = if (repArr == null) 0 else repArr(i)
            if (d == lm.maxDef) nNonNull += 1
            i += 1
          }
          decodeValues(page, p, v1Enc, nNonNull, lm, dict, values)
          got += v1Num
        case 3 => // data page v2: levels stored uncompressed, before values
          val defLen = math.max(v2DefLen, 0)
          val repLen = math.max(v2RepLen, 0)
          if (lm.maxRep > 0) {
            val r = hybrid(bytes, dataStart, dataStart + repLen, bitsFor(lm.maxRep), v2Num)
            var i = 0
            while (i < v2Num) { reps(got + i) = r(i); i += 1 }
          }
          if (lm.maxDef > 0) {
            val d = hybrid(bytes, dataStart + repLen, dataStart + repLen + defLen, bitsFor(lm.maxDef), v2Num)
            var i = 0
            while (i < v2Num) { defs(got + i) = d(i); i += 1 }
          } else {
            var i = 0
            while (i < v2Num) { defs(got + i) = lm.maxDef; i += 1 }
          }
          val vFrom = dataStart + repLen + defLen
          val page =
            if (v2Compressed) decompress(lm.codec, bytes, vFrom, dataStart + comp, uncomp - repLen - defLen)
            else java.util.Arrays.copyOfRange(bytes, vFrom, dataStart + comp)
          var nNonNull = 0
          var i = 0
          while (i < v2Num) { if (defs(got + i) == lm.maxDef) nNonNull += 1; i += 1 }
          decodeValues(page, 0, v2Enc, nNonNull, lm, dict, values)
          got += v2Num
        case other => throw Bad(s"unsupported page type $other")
      }
    }
    if (got != lm.numValues) throw Bad("value count mismatch")
    LeafData(defs, reps, values.toArray, lm.maxDef, lm.maxRep, lm.leafOptional)
  }

  private def decodeValues(
      page: Array[Byte],
      from: Int,
      encoding: Int,
      n: Int,
      lm: LeafMeta,
      dict: Array[Any],
      out: ArrayBuffer[Any]
  ): Unit = encoding match {
    case 0 => // PLAIN
      val (vals, _) = plain(page, from, n, lm.ptype)
      out ++= vals
    case 2 | 8 => // PLAIN_DICTIONARY / RLE_DICTIONARY indices
      if (dict == null) throw Bad("dictionary encoding without dictionary page")
      if (n > 0) {
        val bw = page(from) & 0xff
        val idx = hybrid(page, from + 1, page.length, bw, n)
        var i = 0
        while (i < n) {
          val j = idx(i)
          if (j < 0 || j >= dict.length) throw Bad("dictionary index out of range")
          out += dict(j)
          i += 1
        }
      }
    case other => throw Bad(s"unsupported value encoding $other")
  }

  // --------------------------------------------------------------- assembly

  /** Assemble one leaf's (defs, reps, values) into per-row cells.
    * maxRep == 0: one cell per value (null below maxDef). maxRep == 1:
    * single-level list — rep 0 starts a row; with L = maxDef the def
    * levels mean: L a value, L-1 a null element (only when the leaf itself
    * is optional), one below that an EMPTY list, anything lower a null
    * list (Dremel shredding, parquet-format LogicalTypes.md).
    */
  def assemble(ld: LeafData, numRows: Int): Array[Any] = {
    val rows = new Array[Any](numRows)
    if (ld.maxRep == 0) {
      require(ld.defs.length == numRows, s"flat column: ${ld.defs.length} values vs $numRows rows")
      var v = 0
      var i = 0
      while (i < numRows) {
        if (ld.defs(i) == ld.maxDef) { rows(i) = ld.values(v); v += 1 }
        i += 1
      }
    } else if (ld.maxRep == 1) {
      val nullElemDef = if (ld.leafOptional) ld.maxDef - 1 else Int.MinValue
      val emptyDef = ld.maxDef - (if (ld.leafOptional) 2 else 1)
      var v = 0
      var r = -1
      var cur: ArrayBuffer[Any] = null
      var i = 0
      while (i < ld.defs.length) {
        if (ld.reps(i) == 0) {
          if (r >= 0) rows(r) = if (cur == null) null else cur.toVector
          r += 1
          cur = null
        }
        val d = ld.defs(i)
        if (d == ld.maxDef) {
          if (cur == null) cur = ArrayBuffer.empty[Any]
          cur += ld.values(v); v += 1
        } else if (d == nullElemDef) {
          if (cur == null) cur = ArrayBuffer.empty[Any]
          cur += null
        } else if (d == emptyDef) {
          if (cur == null) cur = ArrayBuffer.empty[Any]
        } // below emptyDef: null list — cur stays null
        i += 1
      }
      if (r >= 0) rows(r) = if (cur == null) null else cur.toVector
      require(r == numRows - 1, s"list column assembled ${r + 1} rows vs $numRows")
    } else throw Bad(s"nesting depth ${ld.maxRep} unsupported")
    rows
  }

  /** Range-pruned read (x293): decode ONLY the row groups whose
    * [min, max] statistics on int64 column `filterCol` intersect
    * [lo, hi] — the writer's own x289 stats consumed by the engine's own
    * reader — then filter rows exactly. A row group without stats is
    * conservatively decoded. Returns (cols, rows, rgTotal, rgDecoded).
    */
  def readFileRange(
      bytes: Array[Byte],
      wanted: Seq[String],
      filterCol: String,
      lo: Long,
      hi: Long
  ): (Vector[String], Vector[Array[Any]], Int, Int) = {
    val fm = footer(bytes)
    val cols = wanted.toVector
    val fIdx = cols.indexOf(filterCol)
    require(fIdx >= 0, s"filter column $filterCol must be selected")
    val rows = ArrayBuffer.empty[Array[Any]]
    var decoded = 0
    fm.rowGroups.foreach { rg =>
      val byPath = rg.leaves.map(l => l.path -> l).toMap
      val flm = byPath.getOrElse(filterCol, throw Bad(s"no column $filterCol"))
      val skip = (flm.statMinLong, flm.statMaxLong) match {
        case (Some(mn), Some(mx)) => mx < lo || mn > hi
        case _                    => false // no stats → decode conservatively
      }
      if (!skip) {
        decoded += 1
        val perCol = cols.map { c =>
          val lm = byPath.getOrElse(c, throw Bad(s"no column $c"))
          assemble(readChunk(bytes, lm), rg.numRows.toInt)
        }
        var i = 0
        while (i < rg.numRows.toInt) {
          val v = perCol(fIdx)(i)
          if (v != null && v.asInstanceOf[Long] >= lo && v.asInstanceOf[Long] <= hi)
            rows += perCol.map(_(i)).toArray
          i += 1
        }
      }
    }
    (cols, rows.toVector, fm.rowGroups.length, decoded)
  }

  /** Parquet data files under `path` (file or directory) — the planning
    * unit, driver-side and file-count-sized like every scan's file list.
    */
  def listFiles(s: org.apache.spark.sql.SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p)
        .map(_.getPath)
        .filter(q => q.getName.endsWith(".parquet") && !q.getName.startsWith("_"))
        .map(_.toUri.getPath)
        .toSeq
        .sorted
    else Seq(p.toUri.getPath)
  }

  /** Read selected columns of a whole file into row-major cells. Column
    * pruning is physical: unselected chunks' byte ranges are never touched.
    */
  def readFile(bytes: Array[Byte], wanted: Seq[String]): (Vector[String], Vector[Array[Any]]) = {
    val fm = footer(bytes)
    val cols = wanted.toVector
    val rows = ArrayBuffer.empty[Array[Any]]
    fm.rowGroups.foreach { rg =>
      val byPath = rg.leaves.map(l => l.path -> l).toMap
      val perCol = cols.map { c =>
        val lm = byPath.getOrElse(c, throw Bad(s"no column $c"))
        assemble(readChunk(bytes, lm), rg.numRows.toInt)
      }
      var i = 0
      while (i < rg.numRows.toInt) {
        rows += perCol.map(_(i)).toArray
        i += 1
      }
    }
    (cols, rows.toVector)
  }
}
