package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x209 Luhn redaction + x210 Benford audit: checksum laws on crafted
  * digit runs, and the conforming-vs-engineered statistic contrast. */
class LuhnBenfordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def luhnRef(s: String): Boolean = {
    var t = 0
    s.reverse.zipWithIndex.foreach { case (ch, i) =>
      var d = ch - '0'
      if (i % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      t += d
    }
    t % 10 == 0
  }

  test("x209: every single-digit corruption of a valid PAN flips luhn_valid") {
    import spark.implicits._
    val base = "4539578763621486"
    assert(luhnRef(base))
    // doc i (i in 1..16) carries the PAN with digit i-1 bumped; doc 0 the valid one.
    // ids chosen ≠ 5,7 (mod 11) so the in-query plant adds nothing.
    val docs = (0 to 16).map { i =>
      val idNo = Seq(0, 1, 2, 3, 4, 6, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 19)(i).toLong
      val pan =
        if (i == 0) base
        else {
          val c = base.toCharArray
          c(i - 1) = (('0' + (c(i - 1) - '0' + 1) % 10)).toChar
          new String(c)
        }
      (idNo, s"payment with $pan attached")
    }
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(
      dir, "documents",
      docs.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source", "length(text) AS n_chars")
    )
    val got = Curation.queries("x209_luhn_redact")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.forall(_._2), "every doc carries a 16-digit run")
    assert(got.count(_._3) === 1, "exactly the uncorrupted PAN validates")
    assert(got.find(_._1 == 0L).get._3, "the valid PAN is doc 0")
  }

  test("x210: log-uniform magnitudes conform to Benford; uniform-range prices do not") {
    import spark.implicits._
    def stat(prices: Seq[Double]): Long = {
      val dir = TestSpark.tempDir()
      TestSpark.writeTable(dir, "orders", prices.toDF("o_totalprice"))
      Analytic.queries("x210_benford")(spark, dir).collect().head.getLong(4)
    }
    // 9000 log-uniform magnitudes: 10^(1 + i/1500) dollars
    val conforming = (0 until 9000).map(i => math.pow(10.0, 1.0 + i / 1500.0))
    // 9000 uniform-range prices (the TPC-H shape): 900.00 .. 999.99
    val engineered = (0 until 9000).map(i => 900.0 + (i % 100) + (i % 7) / 10.0)
    val cStat = stat(conforming)
    val eStat = stat(engineered)
    assert(cStat < 2000L, s"log-uniform stat $cStat should be near 0")
    assert(eStat > 100000L, s"uniform-range stat $eStat should explode")
    assert(eStat > cStat * 50, "the contrast is the audit")
  }
}
