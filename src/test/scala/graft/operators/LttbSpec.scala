package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x223 downsampling laws: endpoints pinned, one point per bucket, a
  * spike always survives its bucket (the metric's whole point — uniform
  * sampling would lose it), short series degrade to identity. */
class LttbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** one order per (pri, month) so the census equals the series */
  private def run(series: Seq[(String, Int, Double)]): Seq[(String, Long, String, Long)] = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    val rows = series.map { case (pri, i, v) =>
      (pri, f"${1995 + i / 12}%04d-${1 + i % 12}%02d-10", v)
    }
    TestSpark.writeTable(
      dir, "orders",
      rows.toDF("o_orderpriority", "ds", "o_totalprice")
        .selectExpr("o_orderpriority", "CAST(ds AS DATE) AS o_orderdate", "o_totalprice")
    )
    Analytic.queries("x223_lttb_downsample")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("a lone spike in a flat 64-month series survives; endpoints pinned; 16 buckets") {
    val series = (0 until 64).map(i => ("P", i, if (i == 37) 9999.0 else 100.0))
    val got = run(series)
    assert(got.length === 16)
    assert(got.map(_._2).sorted === (0L until 16L), "one point per bucket")
    assert(got.head._3 === "1995-01", "first point pinned")
    assert(got.last._3 === "2000-04", "last point pinned")
    assert(got.exists(_._4 === 999900L), "the spike must survive downsampling")
  }

  test("short series pass through as identity") {
    val series = (0 until 10).map(i => ("P", i, 100.0 + i))
    val got = run(series)
    assert(got.length === 10, "n <= 16 keeps every point")
    assert(got.map(_._4) === (0 until 10).map(i => 10000L + 100 * i))
  }

  test("series are independent and deterministic") {
    val series = (0 until 40).flatMap(i => Seq(("A", i, 100.0 + i % 7), ("B", i, 500.0 - i % 5)))
    val got = run(series)
    assert(got.count(_._1 == "A") === 16)
    assert(got.count(_._1 == "B") === 16)
    assert(run(series) === got)
  }
}
