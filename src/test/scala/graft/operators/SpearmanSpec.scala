package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x219 Spearman laws on crafted streams: exact ±1e6 at the monotone
  * extremes (tie-free), and midrank-reference agreement under ties. The
  * engine's pairs are (price, price+jitter) and (disc, tax) — the spec
  * drives them through controlled lineitem fixtures. */
class SpearmanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Long, Int, Double, Double, Double)]): Map[String, (Long, Long)] = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(
      dir, "lineitem",
      rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
    )
    Analytic.queries("x219_spearman")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  /** reference midrank Spearman in 2x units */
  private def rhoRef(xs: Seq[Long], ys: Seq[Long]): Long = {
    def twoMid(v: Seq[Long]): Map[Long, Long] = {
      val sorted = v.sorted
      v.distinct.map { x =>
        val p = sorted.indexOf(x) + 1L
        val t = v.count(_ == x).toLong
        x -> (2 * p + t - 1)
      }.toMap
    }
    val rx = twoMid(xs); val ry = twoMid(ys)
    val s2 = xs.zip(ys).map { case (a, b) =>
      val dd = rx(a) - ry(b); BigInt(dd) * dd
    }.sum
    val n = BigInt(xs.length)
    (BigInt(1000000) - BigInt(3) * s2 * 1000000 / (2 * n * (n * n - 1))).toLong
  }

  test("perfectly anticorrelated disc/tax hits -1e6 exactly; identical hits ~1e6") {
    // disc = i, tax = K - i (tie-free): reversal is exactly -1e6
    val n = 40
    val rows = (0 until n).map(i => (i.toLong, 1, 1000.0 + i, i / 100.0, (n - i) / 100.0))
    assert(run(rows)("disc_tax")._2 === -1000000L)
    // disc = tax: identical ranks → ρ = 1e6
    val same = (0 until n).map(i => (i.toLong, 1, 1000.0 + i, i / 100.0, i / 100.0))
    assert(run(same)("disc_tax")._2 === 1000000L)
  }

  test("heavy ties match the midrank reference exactly") {
    val n = 60
    val rows = (0 until n).map { i =>
      (i.toLong, 1, 1000.0 + (i % 5), (i % 3) / 100.0, (i % 4) / 100.0)
    }
    val got = run(rows)("disc_tax")._2
    val want = rhoRef(
      (0 until n).map(i => (i % 3).toLong),
      (0 until n).map(i => (i % 4).toLong)
    )
    assert(got === want)
  }
}
