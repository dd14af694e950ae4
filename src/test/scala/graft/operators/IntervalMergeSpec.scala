package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x212 island laws: disjoint stays split, touching merges, containment
  * collapses, and the strict-gap boundary opens a new island. */
class IntervalMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** rows of (suppkey, shipdate, duration_days 1..14); en = st + dur */
  private def run(rows: Seq[(Long, String, Int)]): Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(
      dir, "lineitem",
      rows.map { case (k, ds, dur) => (k, ds, (dur - 1).toDouble) }
        .toDF("l_suppkey", "ds", "l_quantity")
        .selectExpr("l_suppkey", "CAST(ds AS TIMESTAMP) AS l_shipdate", "l_quantity")
    )
    Analytic.queries("x212_interval_merge")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("disjoint intervals stay separate islands; covered days sum exactly") {
    // [1..4], [10..12], [20..25] → 3 islands, 4+3+6 covered
    val got = run(Seq((1L, "1995-01-01", 3), (1L, "1995-01-10", 2), (1L, "1995-01-20", 5)))
    assert(got(1L) === ((3L, 3L, 13L, 6L)))
  }

  test("touching intervals merge (end == next start is coverage, not a gap)") {
    // [1..4] + [4..6] → one island [1..6]
    val got = run(Seq((2L, "1995-01-01", 3), (2L, "1995-01-04", 2)))
    assert(got(2L) === ((2L, 1L, 6L, 6L)))
    // but a 1-day gap opens a new island: [1..4], [6..8]
    val got2 = run(Seq((3L, "1995-01-01", 3), (3L, "1995-01-06", 2)))
    assert(got2(3L) === ((2L, 2L, 7L, 4L)))
  }

  test("containment collapses to the outer span; chains collapse transitively") {
    // [1..14] contains [3..5]; then [2..4],[4..7],[7..9] chain into [2..9]
    val a = run(Seq((4L, "1995-01-01", 13), (4L, "1995-01-03", 2)))
    assert(a(4L) === ((2L, 1L, 14L, 14L)))
    val b = run(Seq((5L, "1995-02-02", 2), (5L, "1995-02-04", 3), (5L, "1995-02-07", 2)))
    assert(b(5L) === ((3L, 1L, 8L, 8L)))
  }

  test("keys are independent") {
    val got = run(Seq((6L, "1995-01-01", 3), (7L, "1995-01-02", 3)))
    assert(got(6L)._2 === 1L)
    assert(got(7L)._2 === 1L)
    assert(got.size === 2)
  }
}
