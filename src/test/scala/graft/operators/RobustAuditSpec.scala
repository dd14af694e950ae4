package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x295/x296 — the robust-audit pair against planted distributions. */
class RobustAuditSpec extends AnyFunSuite {

  private lazy val s = TestSpark.spark
  import s.implicits._

  private def ordersFixture(rows: Seq[(String, Double)]): String = {
    val dir = TestSpark.tempDir()
    val df = rows.zipWithIndex
      .map { case ((p, price), i) => (i.toLong, i.toLong, "O", price, "1995-01-01", p) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "dt", "o_orderpriority")
      .withColumn("o_orderdate", col("dt").cast("timestamp"))
      .drop("dt")
    TestSpark.writeTable(dir, "orders", df)
    dir
  }

  test("x295: planted median, MAD and the single 3·MAD outlier") {
    // group A: cents {100..900 by 100} → med 500, dev {0,100,..,400} each
    // twice → MAD 200; one extra wild point 10000 → dev 9500 > 600
    val a = (1 to 9).map(i => ("A", i.toDouble)) :+ ("A", 100.0)
    val dir = ordersFixture(a)
    val out = Analytic.queries("x295_mad_outliers")(s, dir).collect()
    assert(out.length == 1)
    val r = out.head
    // cents: 100..900, 10000; n=10, med = rank ((10-1)*50)//100+1 = 5 → 500
    assert(r.getAs[Long]("med") == 500L)
    // devs: {400,300,200,100,0,100,200,300,400,9500} sorted → rank 5 = 200
    assert(r.getAs[Long]("mad") == 200L)
    assert(r.getAs[Long]("n_out") == 1L, "only the wild point exceeds 3*MAD=600")
    assert(r.getAs[Long]("out_ppm") == 100000L)
  }

  test("x298: calibration cells satisfy the ECE identity and bin algebra on real data") {
    val out = Analytic.queries("x298_gbt_calibration")(s, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin <= 9)
      val n = r.getAs[Long]("n")
      val gap = r.getAs[Long]("gap_ppm")
      assert(gap == math.abs(r.getAs[Long]("mean_sc_ppm") - r.getAs[Long]("obs_ppm")))
      assert(r.getAs[Long]("npos") <= n)
    }
    // ECE is the n-weighted mean of gaps (floor)
    val ece = out.head.getAs[Long]("ece_ppm")
    val expected = out.map(r => r.getAs[Long]("n") * r.getAs[Long]("gap_ppm")).sum / out.map(_.getAs[Long]("n")).sum
    assert(ece == expected)
  }

  test("x296: planted digit census with exact gaps and TVD") {
    // 9 rows with first digits 1..9 exactly once → obs 111111 ppm each
    val rows = (1 to 9).map(d => ("1-URGENT", d * 1.00))
    val out = Analytic.queries("x296_benford")(s, ordersFixture(rows)).collect()
    assert(out.length == 9)
    val exp = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L, 6 -> 66946L,
      7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
    out.foreach { r =>
      val d = r.getAs[Long]("digit").toInt
      assert(r.getAs[Long]("n") == 1L)
      assert(r.getAs[Long]("obs_ppm") == 111111L)
      assert(r.getAs[Long]("exp_ppm") == exp(d))
      assert(r.getAs[Long]("gap_ppm") == math.abs(111111L - exp(d)))
    }
    val tvd = out.head.getAs[Long]("tvd_ppm")
    assert(tvd == exp.keys.map(d => math.abs(111111L - exp(d))).sum / 2)
    // the constants are ⌊log10(1+1/d)·1e6⌋ and sum to 999995 (floor loss)
    assert(exp.values.sum == 999995L)
    exp.foreach { case (d, e) => assert(e == math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong) }
  }
}
