package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x200 group-wise skyline: the grid prune is exact (never drops a skyline
  * point, never keeps a dominated one) on adversarial shapes the fixture
  * tables don't exhibit — a pure anti-chain (nothing prunable), a pure
  * chain (everything but one point pruned), duplicate points, and a brand
  * of one. Every case compares against the definitional quadratic
  * NOT-EXISTS computed independently here. */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** write a part.parquet with the given (brand, key, price, size) rows
    * and run x200 over it */
  private def run(rows: Seq[(String, Long, Double, Int)]): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(
      dir, "part",
      rows.toDF("p_brand", "p_partkey", "p_retailprice", "p_size")
    )
    Analytic.queries("x200_skyline")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  /** definitional quadratic skyline over the same rows */
  private def brute(rows: Seq[(String, Long, Double, Int)]): Seq[(String, Long, Long, Long)] =
    rows
      .map { case (b, k, p, s) => (b, k, math.round(p * 100), s.toLong) }
      .filter { case (b, _, p, s) =>
        !rows.exists { case (b2, _, p2d, s2i) =>
          val (p2, s2) = (math.round(p2d * 100), s2i.toLong)
          b2 == b && p2 <= p && s2 <= s && (p2 < p || s2 < s)
        }
      }
      .sortBy(_._2)

  test("anti-chain: every point is on the frontier (prune must keep all)") {
    // strictly decreasing price, strictly increasing size — nothing dominates
    val rows = (0 until 40).map(i => ("B1", i.toLong, 1000.0 - i, 1 + i))
    assert(run(rows) === brute(rows))
    assert(run(rows).size === 40)
  }

  test("chain: one global minimum dominates everything") {
    val rows = (0 until 40).map(i => ("B1", i.toLong, 900.0 + i, 1 + i))
    val got = run(rows)
    assert(got === brute(rows))
    assert(got.map(_._2) === Seq(0L))
  }

  test("duplicate points: ties dominate nothing, both stay") {
    val rows = Seq(
      ("B1", 1L, 900.0, 5), ("B1", 2L, 900.0, 5), // identical pair
      ("B1", 3L, 901.0, 5), // dominated by both
      ("B1", 4L, 900.0, 4) // dominates the pair
    )
    val got = run(rows)
    assert(got === brute(rows))
    assert(got.map(_._2) === Seq(4L))
    // and without the dominator the tied pair both survive
    val got2 = run(rows.take(3))
    assert(got2.map(_._2) === Seq(1L, 2L))
  }

  test("many brands incl. singletons: frontiers are independent") {
    val rows =
      (0 until 30).map(i => ("B1", i.toLong, 900.0 + (i * 7) % 100, 1 + (i * 11) % 50)) ++
        Seq(("B2", 100L, 999.0, 50)) ++ // singleton brand: trivially skyline
        (0 until 30).map(i => ("B3", (200 + i).toLong, 999.0 - i, 50 - i))
    assert(run(rows) === brute(rows))
    assert(run(rows).exists(_._2 == 100L), "singleton-brand point must survive")
  }

  test("dense clustered points: survivors band stays exact under heavy pruning") {
    // a tight cluster far from the origin plus one near-origin staircase
    val cluster = (0 until 200).map(i => ("B1", i.toLong, 990.0 + (i % 10) * 0.01, 40 + (i % 7)))
    val stairs = (0 until 5).map(i => ("B1", (500 + i).toLong, 905.0 - i, 2 + i))
    val rows = cluster ++ stairs
    assert(run(rows) === brute(rows))
  }
}
