package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x205 Holt smoothing: closed-form waveforms — a constant series is a
  * fixpoint from t=0, a linear ramp's trend converges geometrically to
  * the true slope, and declines drive the trend negative (the truncating
  * division's signed leg). */
class HoltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** one-priority orders table: month i (spread over years) → price i */
  private def run(ys: Seq[Double]): Seq[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    val rows = ys.zipWithIndex.map { case (y, i) =>
      ("P", f"${1995 + i / 12}%04d-${1 + i % 12}%02d-15", y)
    }
    TestSpark.writeTable(
      dir, "orders",
      rows.toDF("o_orderpriority", "ds", "o_totalprice")
        .selectExpr("o_orderpriority", "CAST(ds AS DATE) AS o_orderdate", "o_totalprice")
    )
    Analytic.queries("x205_holt_smoothing")(spark, dir)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
  }

  test("constant series is a fixpoint: level = y, trend = 0, forecast = y") {
    val got = run(Seq.fill(24)(500.0))
    got.foreach { case (mth, y, l, b, f) =>
      assert(y === 50000L)
      assert(l === 50000L, mth)
      assert(b === 0L, mth)
      assert(f === 50000L, mth)
    }
  }

  test("linear ramp: trend converges to the true monthly slope") {
    // y_t = 1000 + 100·t dollars → slope 10000 cents/month
    val got = run((0 until 48).map(t => 1000.0 + 100.0 * t))
    val lastTrend = got.last._4
    assert(math.abs(lastTrend - 10000L) <= 500L, s"trend $lastTrend vs true 10000")
    // and the one-step forecast tracks the next value within a tight band
    val lastForecast = got.last._5
    val nextY = math.round((1000.0 + 100.0 * 48) * 100)
    assert(math.abs(lastForecast - nextY) <= 6000L, s"forecast $lastForecast vs next $nextY")
  }

  test("declining series drives the trend negative") {
    val got = run((0 until 24).map(t => 5000.0 - 150.0 * t))
    assert(got.drop(2).forall(_._4 < 0L), "trend must be negative on a steady decline")
  }
}
