package graft.sources

/** x297 — Avro Object Container WRITER from first principles, the export
  * half of x119 and the fourth member of the emit-what-you-ingest family
  * (gzip-WARC x276, ZIP x277, PNG x278, parquet x286): magic `Obj\1`,
  * file-metadata map (schema JSON + codec), deterministic 16-byte sync
  * marker (md5 of the schema — reproducible builds, no RNG), blocks of
  * (row count, byte size, payload, sync), and the Avro binary encoding —
  * zigzag varints, length-prefixed UTF-8, little-endian IEEE doubles,
  * 1-byte booleans, `["null", T]` unions. The `deflate` codec is x268's
  * raw DEFLATE (nowrap, as the spec requires) — no java.util.zip anywhere.
  *
  * Conformance twins: the OFFICIAL Apache Avro library from the Spark
  * classpath must read every emitted file (pinned in the gate row), and
  * graft's own from-scratch [[AvroScan]] must agree.
  *
  * Scale shape: per-payload pure function (the byte-codec class); as a
  * sink it is the per-task leaf of a partitioned write like x286.
  */
object AvroWrite {

  /** tpe ∈ {"long", "double", "string", "boolean"}. */
  final case class AvField(name: String, tpe: String, nullable: Boolean)

  private final class W {
    val out = new java.io.ByteArrayOutputStream(1024)
    def zig(v: Long): Unit = {
      var u = (v << 1) ^ (v >> 63)
      while ((u & ~0x7fL) != 0) { out.write(((u & 0x7f) | 0x80).toInt); u >>>= 7 }
      out.write(u.toInt)
    }
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def str(s: String): Unit = { val b = s.getBytes("UTF-8"); zig(b.length.toLong); raw(b) }
    def dbl(d: Double): Unit = {
      val v = java.lang.Double.doubleToLongBits(d)
      var k = 0
      while (k < 8) { out.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
    }
  }

  def schemaJson(fields: Seq[AvField]): String = {
    val fs = fields
      .map { f =>
        val t = if (f.nullable) s"""["null","${f.tpe}"]""" else s""""${f.tpe}""""
        s"""{"name":"${f.name}","type":$t}"""
      }
      .mkString(",")
    s"""{"type":"record","name":"graft_x297","fields":[$fs]}"""
  }

  private def encodeCell(w: W, f: AvField, v: Any): Unit = {
    if (f.nullable) {
      if (v == null) { w.zig(0L); return }
      w.zig(1L)
    } else require(v != null, s"null in non-nullable field ${f.name}")
    f.tpe match {
      case "long"    => w.zig(v.asInstanceOf[Long])
      case "double"  => w.dbl(v.asInstanceOf[Double])
      case "string"  => w.str(v.asInstanceOf[String])
      case "boolean" => w.out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case other     => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  /** One container file. `codec`: "null", "deflate" (x268 raw) or
    * "snappy" (x303: store-mode snappy + big-endian CRC-32 suffix). */
  def write(
      fields: Seq[AvField],
      rows: Seq[Array[Any]],
      codec: String = "deflate",
      blockRows: Int = 1000
  ): Array[Byte] = {
    require(codec == "null" || codec == "deflate" || codec == "snappy", s"unsupported codec $codec")
    val json = schemaJson(fields)
    val sync = java.security.MessageDigest.getInstance("MD5").digest(json.getBytes("UTF-8"))
    val w = new W
    w.raw(Array[Byte]('O', 'b', 'j', 1))
    w.zig(2L) // metadata map: 2 entries
    w.str("avro.schema"); w.str(json)
    w.str("avro.codec"); w.str(codec)
    w.zig(0L) // map end
    w.raw(sync)
    rows.grouped(math.max(1, blockRows)).foreach { block =>
      val bw = new W
      block.foreach(r => fields.zipWithIndex.foreach { case (f, i) => encodeCell(bw, f, r(i)) })
      val raw0 = bw.out.toByteArray
      val payload = codec match {
        case "deflate" => Deflate.deflateRaw(raw0)
        case "snappy" =>
          val body = SnappyBlock.encodeStored(raw0)
          val crc = Inflate.crc32(raw0)
          body ++ Array[Byte](((crc >> 24) & 0xff).toByte, ((crc >> 16) & 0xff).toByte, ((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
        case _ => raw0
      }
      w.zig(block.length.toLong)
      w.zig(payload.length.toLong)
      w.raw(payload)
      w.raw(sync)
    }
    w.out.toByteArray
  }
}

/** x297 content formulas: per blob a handful of rows with every supported
  * shape (long, nullable long, double, string, boolean), codec alternating
  * by id — closed-form so the DuckDB oracle rebuilds the census without
  * touching an Avro byte.
  */
object AvroFixture {
  import AvroWrite._

  val fields = Seq(
    AvField("id", "long", nullable = false),
    AvField("name", "string", nullable = false),
    AvField("val", "double", nullable = false),
    AvField("opt", "long", nullable = true),
    AvField("flag", "boolean", nullable = false)
  )

  def rows(z: Long): Seq[Array[Any]] =
    (0L until (3 + z % 7)).map { i =>
      Array[Any](
        z * 100 + i,
        s"n${(z * 31 + i * 7) % 50}",
        ((z + i) % 1000) * 0.25,
        if (i % 3 == 0) null else java.lang.Long.valueOf(z + i),
        (z + i) % 2 == 0
      )
    }

  def codec(z: Long): String = if (z % 2 == 0) "null" else "deflate"

  def fileBytes(z: Long): Array[Byte] = write(fields, rows(z), codec(z))
}
