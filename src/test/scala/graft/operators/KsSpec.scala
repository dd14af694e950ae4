package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x220 KS laws: identical samples → D = 0, disjoint supports → D = 1e6
  * at the boundary, a half-shift → exactly 0.5 with the min-v argmax
  * tiebreak. */
class KsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(String, Double)]): (Long, Long, Long, Long, Boolean) = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(dir, "lineitem", rows.toDF("l_returnflag", "l_extendedprice"))
    val r = Analytic.queries("x220_ks_test")(spark, dir).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
  }

  test("identical multisets give D = 0") {
    val vals = (1 to 20).map(_.toDouble)
    val rows = vals.map(v => ("R", v)) ++ vals.map(v => ("N", v))
    val (_, _, _, d, _) = run(rows)
    assert(d === 0L)
  }

  test("disjoint supports give D = 1e6 exactly at the lower support's top") {
    val rows = (1 to 10).map(i => ("R", i.toDouble)) ++ (11 to 25).map(i => ("N", i.toDouble))
    val (n1, n2, atV, d, rLeads) = run(rows)
    assert((n1, n2) === ((10L, 15L)))
    assert(d === 1000000L)
    assert(atV === 1000L, "argmax at R's max value (cents)")
    assert(rLeads, "the lower-support CDF leads")
  }

  test("a half-overlap shift gives D = 1/2 with the min-v argmax tiebreak") {
    val rows = (1 to 10).map(i => ("R", i.toDouble)) ++ (6 to 15).map(i => ("N", i.toDouble))
    val (_, _, atV, d, _) = run(rows)
    assert(d === 500000L)
    assert(atV === 500L, "gap ties at v=5 and v=10 — min v wins")
  }
}
