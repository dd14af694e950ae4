package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x214 Mann–Whitney laws: complete separation pins both extremes of the
  * rank-biserial effect, all-ties lands exactly on 0, and the midrank
  * identity Σ2·midrank = n(n+1) holds over the pooled sample. */
class MannWhitneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(String, Double)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(
      dir, "lineitem",
      rows.toDF("l_returnflag", "l_extendedprice")
    )
    val r = Analytic.queries("x214_mannwhitney")(spark, dir).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("complete separation: R all larger → rbc = -1e6; R all smaller → +1e6") {
    val rBig = Seq.fill(10)(("R", 100.0)) ++ Seq.fill(15)(("N", 1.0))
    val (n1, n2, _, u, rbc) = run(rBig)
    assert((n1, n2) === ((10L, 15L)))
    assert(u === 2 * n1 * n2, "doubled U at its maximum")
    assert(rbc === -1000000L)
    val rSmall = Seq.fill(10)(("R", 1.0)) ++ Seq.fill(15)(("N", 100.0))
    assert(run(rSmall)._5 === 1000000L)
  }

  test("identical distributions (all tied) give rbc exactly 0") {
    val (_, _, _, u, rbc) = run(Seq.fill(12)(("R", 5.0)) ++ Seq.fill(8)(("N", 5.0)))
    assert(rbc === 0L)
    assert(u === 12L * 8L, "U at exactly half its range (doubled units)")
  }

  test("the pooled midrank identity: R1_2x + R2_2x = n(n+1)") {
    val rows = (0 until 30).map(i => (if (i % 3 == 0) "R" else "N", (i % 7).toDouble + 1))
    val (n1, n2, r1, _, _) = run(rows)
    // compute R2 by swapping labels
    val (m1, _, r2, _, _) = run(rows.map { case (g, v) => (if (g == "R") "N" else "R", v) })
    assert(m1 === n2)
    val n = n1 + n2
    assert(r1 + r2 === n * (n + 1), "midranks partition the pooled rank mass")
  }
}
