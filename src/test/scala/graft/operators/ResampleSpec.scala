package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x110 resample + gap-fill: hand-computed linear interpolation on a
  * synthetic event stream — grid-on-observation degeneracy, mid/quarter
  * points, LOCF at the right edge, and the too-narrow-span exclusion. */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L // 1h micros

  private lazy val dir: String = {
    val d = TestSpark.tempDir()
    val rows = Seq(
      // user 10: 10.0 at 00:00, 22.0 at 12:00
      (1L, "2024-01-01 00:00:00", 10L, "a", 10.0, "{}"),
      (2L, "2024-01-01 12:00:00", 10L, "a", 22.0, "{}"),
      // user 20: single observation — ceil(min) > floor(max), no grid rows
      (3L, "2024-01-01 03:00:00", 20L, "a", 5.0, "{}"),
      // user 30: 10.0 at 00:00, 11.0 at 24:00 → quarter points
      (4L, "2024-01-01 00:00:00", 30L, "a", 10.0, "{}"),
      (5L, "2024-01-02 00:00:00", 30L, "a", 11.0, "{}")
    )
    TestSpark.writeTable(
      d,
      "events",
      rows
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
    )
    d
  }

  test("grid values: exact on observations, linear between, LOCF at the edge") {
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    val got = SparkEntry
      .queries("x110_resample_gapfill")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("grid_us"), r.getAs[Long]("value_e3")))
    val expected = Array(
      (10L, base, 10000L),
      (10L, base + 6 * H, 16000L),
      (10L, base + 12 * H, 22000L),
      (30L, base, 10000L),
      (30L, base + 6 * H, 10250L),
      (30L, base + 12 * H, 10500L),
      (30L, base + 18 * H, 10750L),
      (30L, base + 24 * H, 11000L)
    )
    assert(got === expected)
  }
}
