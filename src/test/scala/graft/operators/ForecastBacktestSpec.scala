package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x255's verdict must be EARNED: on a planted linear trend the drift
  * forecaster wins, on a planted weekly cycle the seasonal-naive wins,
  * and on a constant series all tie at zero error (the tiebreak order is
  * then the documented naive-first convention). The spec drives the same
  * pipeline shape over synthetic daily series.
  */
class ForecastBacktestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** replicate the x255 core over an explicit (day, rev) series */
  private def backtest(series: Seq[(Long, Long)]): (String, Long, Long, Long) = {
    val dir = TestSpark.tempDir()
    // the gate query reads `orders`; drive the same arithmetic via a
    // synthetic orders table whose (o_orderdate, o_totalprice) reproduce
    // the series exactly (one order per day, cents = rev)
    series
      .toDF("day", "rev")
      .select(
        col("day").as("o_orderkey"),
        lit(1L).as("o_custkey"),
        expr("CAST(timestamp_micros(day * 86400000000) AS TIMESTAMP_NTZ)").as("o_orderdate"),
        (col("rev") / 100.0).as("o_totalprice")
      )
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val r = Analytic.queries("x255_forecast_backtest")(spark, dir).collect().head
    (
      r.getAs[String]("winner"),
      r.getAs[Long]("mae_naive"),
      r.getAs[Long]("mae_snaive"),
      r.getAs[Long]("mae_drift")
    )
  }

  test("planted linear trend: drift wins with zero error") {
    val series = (0L until 60L).map(d => (d, 10000L + d * 700L))
    val (winner, _, _, maeDrift) = backtest(series)
    assert(winner === "drift")
    assert(maeDrift === 0L)
  }

  test("planted weekly cycle: seasonal-naive wins with zero error") {
    val series = (0L until 63L).map(d => (d, 10000L + (d % 7) * 3000L))
    val (winner, _, maeSnaive, _) = backtest(series)
    assert(winner === "seasonal_naive")
    assert(maeSnaive === 0L)
  }

  test("constant series: all tie at zero, naive wins by the tiebreak order") {
    val series = (0L until 40L).map(d => (d, 50000L))
    val (winner, maeN, maeS, maeD) = backtest(series)
    assert((maeN, maeS, maeD) === ((0L, 0L, 0L)))
    assert(winner === "naive")
  }
}
