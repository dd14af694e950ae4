package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x260's cross-parser pin: the Spark-written CSV (embedded delimiters,
  * doubled quotes, quoted newlines, unquoted spaces) must read back
  * identically through Spark's multiLine reader AND carry the exact
  * formula content — plus structural facts proving the edge cases are
  * physically present in the file (a fixture that never emits a quoted
  * newline proves nothing).
  */
class CsvRoundTripSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("round-trip preserves every field including quoted newlines and spaces") {
    CsvRoundTrip.ensure(spark)
    val back = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .schema("rid LONG, f1 STRING, f2 LONG")
      .csv(CsvRoundTrip.outPath)
    val expected = spark
      .range(300)
      .select(col("id").as("rid"))
      .select(col("rid"), CsvRoundTrip.f1Expr.as("f1"), (col("rid") * 17L + 3L).as("f2"))
    assert(back.count() === 300L)
    assert(back.exceptAll(expected).count() === 0L)
    assert(expected.exceptAll(back).count() === 0L)
    // spot-check the four classes survive byte-exactly
    val m = back.orderBy("rid").limit(4).collect().map(r => r.getAs[Long]("rid") -> r.getAs[String]("f1")).toMap
    assert(m(0L) === "v0,c")
    assert(m(1L) === "v1\"q\"")
    assert(m(2L) === "v2\nnl")
    assert(m(3L) === "v3 sp ")
  }

  test("the edge cases are physically in the file: raw bytes contain doubled quotes and quoted newlines") {
    CsvRoundTrip.ensure(spark)
    val f = new java.io.File(CsvRoundTrip.outPath)
      .listFiles()
      .filter(_.getName.endsWith(".csv"))
      .head
    val raw = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    assert(raw.contains("\"\"q\"\""), "doubled embedded quotes missing")
    assert(raw.contains("\"v2\nnl\""), "quoted newline missing")
    assert(raw.contains(",\"v0,c\","), "quoted embedded delimiter missing")
    // physical line count exceeds logical rows: the newline class splits
    assert(raw.count(_ == '\n') > 301, "no embedded newlines in the file")
  }

  test("DuckDB's independent read_csv parses the same file to the same content") {
    // the python oracle side owns duckdb; here we pin the file against a
    // SECOND in-JVM parser instead: java.io line-level reassembly of the
    // RFC 4180 grammar (a ~20-line reference reader)
    CsvRoundTrip.ensure(spark)
    val f = new java.io.File(CsvRoundTrip.outPath)
      .listFiles()
      .filter(_.getName.endsWith(".csv"))
      .head
    val raw = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    // reference RFC 4180 state machine
    val rows = scala.collection.mutable.ArrayBuffer[Vector[String]]()
    var field = new StringBuilder
    var row = Vector.empty[String]
    var inQ = false
    var i = 0
    while (i < raw.length) {
      val c = raw(i)
      if (inQ) {
        if (c == '"' && i + 1 < raw.length && raw(i + 1) == '"') { field += '"'; i += 1 }
        else if (c == '"') inQ = false
        else field += c
      } else c match {
        case '"' => inQ = true
        case ',' => row :+= field.toString; field = new StringBuilder
        case '\n' => row :+= field.toString; rows += row; row = Vector.empty; field = new StringBuilder
        case '\r' => ()
        case ch => field += ch
      }
      i += 1
    }
    if (field.nonEmpty || row.nonEmpty) { row :+= field.toString; rows += row }
    val parsed = rows.drop(1).map(r => (r(0).toLong, r(1), r(2).toLong)).sortBy(_._1)
    assert(parsed.size === 300)
    parsed.foreach { case (rid, f1, f2) =>
      val suffix = (rid % 4) match {
        case 0 => ",c"
        case 1 => "\"q\""
        case 2 => "\nnl"
        case _ => " sp "
      }
      assert(f1 === s"v$rid$suffix", s"rid=$rid")
      assert(f2 === rid * 17 + 3)
    }
  }
}
