package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x93 grid proximity join: the 3×3-stencil candidate generation must
  * find exactly the Chebyshev-≤d pairs — including pairs straddling a
  * cell boundary — emit no duplicates, and miss just-outside pairs. */
class GridJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted geometry: same-cell, cross-boundary, corner and just-outside pairs") {
    import spark.implicits._
    val d = 10L
    // cells are 10x10: (1,2) same cell; (3,4) adjacent cells, within d;
    // (5,6) diagonal corner within d; (7,8) adjacent cells but beyond d;
    // 9 isolated
    val pts = Seq(
      (1L, 3L, 3L),
      (2L, 7L, 5L), // same cell as 1, cheb 4
      (3L, 9L, 20L),
      (4L, 12L, 22L), // x crosses the 10-boundary, cheb 3
      (5L, 19L, 39L),
      (6L, 21L, 41L), // diagonal corner, cheb 2
      (7L, 40L, 60L),
      (8L, 52L, 60L), // adjacent cells, cheb 12 > d -> excluded
      (9L, 90L, 90L)
    ).toDF("id", "x", "y")
    val got = Advanced
      .gridProximityJoin(pts, d)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("cheb")))
      .toSet
    assert(got === Set((1L, 2L, 4L), (3L, 4L, 3L), (5L, 6L, 2L)))
  }

  test("agrees with brute force on a dense planted cluster (no dups, none missed)") {
    import spark.implicits._
    val d = 5L
    val raw = (0L until 40L).map(i => (i, (i * 37) % 23, (i * 53) % 19))
    val pts = raw.toDF("id", "x", "y")
    val got = Advanced
      .gridProximityJoin(pts, d)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .sorted
    val brute = (for {
      (a, xa, ya) <- raw; (b, xb, yb) <- raw
      if a < b && math.abs(xa - xb) <= d && math.abs(ya - yb) <= d
    } yield (a, b)).sorted
    assert(got.toSeq === brute)
    assert(got.length === got.toSet.size) // exactly once per pair
  }
}
