package graft.sources

import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

/** x119 Avro reader: cross-validated against the OFFICIAL library's bytes
  * over every supported primitive, both codecs, and the null union;
  * structural lies quarantine. */
class AvroScanSpec extends AnyFunSuite {

  private val schemaJson =
    """{"type":"record","name":"T","fields":[
      |{"name":"i","type":"int"},
      |{"name":"l","type":"long"},
      |{"name":"f","type":"float"},
      |{"name":"d","type":"double"},
      |{"name":"b","type":"boolean"},
      |{"name":"s","type":"string"},
      |{"name":"ns","type":["null","string"]},
      |{"name":"nl","type":["null","long"]}]}""".stripMargin

  private def writeOfficial(codec: Option[org.apache.avro.file.CodecFactory], n: Int): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    codec.foreach(w.setCodec)
    w.create(schema, bos)
    for (k <- 0 until n) {
      val r = new GenericData.Record(schema)
      r.put("i", k * 7 - 3)
      r.put("l", k.toLong * -48271L)
      r.put("f", k * 0.5f)
      r.put("d", k * 0.125 - 100.0)
      r.put("b", k % 3 == 0)
      r.put("s", s"row-$k-é中") // multi-byte UTF-8
      r.put("ns", if (k % 4 == 0) null else s"opt-$k")
      r.put("nl", if (k % 5 == 0) null else java.lang.Long.valueOf(k * 11L))
      w.append(r)
    }
    w.close()
    bos.toByteArray
  }

  private def check(bytes: Array[Byte], n: Int): Unit = {
    val data = AvroScan.decode(bytes).getOrElse(fail("decode quarantined a valid file"))
    assert(data.rows.size === n)
    assert(data.fields.map(_.name) === Seq("i", "l", "f", "d", "b", "s", "ns", "nl"))
    for (k <- 0 until n) {
      val r = data.rows(k)
      assert(r(0) === k * 7 - 3)
      assert(r(1) === k.toLong * -48271L)
      assert(r(2) === k * 0.5f)
      assert(r(3) === k * 0.125 - 100.0)
      assert(r(4) === (k % 3 == 0))
      assert(r(5) === s"row-$k-é中")
      assert(r(6) === (if (k % 4 == 0) null else s"opt-$k"))
      assert(r(7) === (if (k % 5 == 0) null else k * 11L))
    }
  }

  test("reads official-library bytes exactly: null codec") {
    check(writeOfficial(None, 500), 500)
  }

  test("reads official-library bytes exactly: deflate codec, multiple blocks") {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.setSyncInterval(1 << 10) // force several blocks
    w.create(schema, bos)
    for (k <- 0 until 2000) {
      val r = new GenericData.Record(schema)
      r.put("i", k * 7 - 3); r.put("l", k.toLong * -48271L); r.put("f", k * 0.5f)
      r.put("d", k * 0.125 - 100.0); r.put("b", k % 3 == 0); r.put("s", s"row-$k-é中")
      r.put("ns", if (k % 4 == 0) null else s"opt-$k")
      r.put("nl", if (k % 5 == 0) null else java.lang.Long.valueOf(k * 11L))
      w.append(r)
    }
    w.close()
    check(bos.toByteArray, 2000)
  }

  // -------------------------------------------------- write side (x297)

  test("x297 writer: both codecs round-trip through the scratch scanner AND the official library") {
    for (z <- 0L until 30L) {
      val bytes = AvroFixture.fileBytes(z)
      val own = AvroScan.decode(bytes)
      assert(own.isDefined, s"scratch scan rejected z=$z")
      assert(own.get.rows.length == (3 + z % 7), s"row count z=$z")
      val rdr = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]()
      )
      try {
        var i = 0
        while (rdr.hasNext) {
          val rec = rdr.next()
          assert(rec.get("id").asInstanceOf[Long] == z * 100 + i)
          i += 1
        }
        assert(i == (3 + z % 7))
      } finally rdr.close()
    }
  }

  test("x297 writer: multi-block files, empty files, deterministic bytes, required-null refusal") {
    import AvroWrite._
    val fs = Seq(AvField("k", "long", nullable = false))
    val many = (0L until 5000L).map(k => Array[Any](k))
    val bytes = write(fs, many, "deflate", blockRows = 700) // 8 blocks
    val own = AvroScan.decode(bytes)
    assert(own.exists(_.rows.length == 5000))
    assert(own.get.rows.map(_.head.asInstanceOf[Long]) == (0L until 5000L))
    val empty = write(fs, Seq.empty, "null")
    assert(AvroScan.decode(empty).exists(_.rows.isEmpty))
    assert(java.util.Arrays.equals(write(fs, many, "deflate"), write(fs, many, "deflate")))
    intercept[IllegalArgumentException](write(fs, Seq(Array[Any](null)), "null"))
  }

  test("snappy codec (x303): official snappy files decode with CRC verification; own store-mode snappy round-trips both ways") {
    // official writer → scratch scanner (real compressed snappy + CRC)
    val official = writeOfficial(Some(org.apache.avro.file.CodecFactory.snappyCodec()), 500)
    val got = AvroScan.decode(official)
    assert(got.exists(_.rows.length == 500), "official snappy avro must decode")
    // corrupting the CRC suffix quarantines (verified, never skipped)
    val bad = official.clone(); bad(official.length - 20) = (bad(official.length - 20) ^ 0x55).toByte
    assert(AvroScan.decode(bad).isEmpty || AvroScan.decode(bad).exists(_.rows.length != 500))
    // own writer (store-mode snappy) → scratch scanner AND official reader
    for (z <- 0L until 20L) {
      val bytes = AvroWrite.write(AvroFixture.fields, AvroFixture.rows(z), "snappy")
      assert(AvroScan.decode(bytes).exists(_.rows.length == (3 + z % 7)), s"own snappy z=$z")
      val rdr = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]()
      )
      try {
        var i = 0
        while (rdr.hasNext) { assert(rdr.next().get("id").asInstanceOf[Long] == z * 100 + i); i += 1 }
        assert(i == (3 + z % 7))
      } finally rdr.close()
    }
  }

  test("quarantine matrix: magic, codec, sync corruption, truncation") {
    val good = writeOfficial(Some(org.apache.avro.file.CodecFactory.deflateCodec(6)), 200)
    assert(AvroScan.decode(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(AvroScan.decode(badMagic) === None)
    // unsupported codec: official bzip2-coded file must quarantine, not crash
    val bzip2 = writeOfficial(Some(org.apache.avro.file.CodecFactory.bzip2Codec()), 50)
    assert(AvroScan.decode(bzip2) === None)
    // corrupt the trailing sync marker
    val badSync = good.clone(); badSync(badSync.length - 1) = (badSync.last ^ 0x7f).toByte
    assert(AvroScan.decode(badSync) === None)
    assert(AvroScan.decode(good.dropRight(5)) === None)
  }
}
