package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q34's sketch VALUES are engine-specific, so the gate pins exact twins
  * plus in-query accuracy booleans (hash-exact since r5). This spec keeps
  * the tighter standalone bounds check: the approximations
  * must sit within their published error bounds of the EXACT answers on
  * real data — HLL++ within its requested relative standard deviation
  * (3 sigma), KLL-style percentile within the rank-error guarantee of its
  * accuracy parameter.
  */
class SketchBoundsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within 3*rsd of exact, per group") {
    val li = graft.Graft.table(spark, "/root/testdata/sf0.01", "lineitem")
    val exact = li.groupBy("l_returnflag").agg(count_distinct(col("l_partkey")).as("d"))
    val approx = li.groupBy("l_returnflag").agg(approx_count_distinct(col("l_partkey"), 0.02).as("a"))
    val joined = exact.join(approx, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (d, a) = (r.getAs[Long]("d").toDouble, r.getAs[Long]("a").toDouble)
      val relErr = math.abs(a - d) / d
      assert(relErr <= 3 * 0.02, s"${r.getString(0)}: exact=$d approx=$a relErr=$relErr")
    }
  }

  test("percentile_approx(acc=1000) within rank error 1/1000 of the exact percentile") {
    val li = graft.Graft.table(spark, "/root/testdata/sf0.01", "lineitem")
    val approx = li
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.9), lit(1000)).as("a"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    // rank guarantee: the returned value's true rank is within n/accuracy of
    // the target rank → its true quantile position is in [0.9 ± 1/1000 ± slack]
    val bounds = ExactPercentile(
      li,
      "l_returnflag",
      col("l_extendedprice"),
      Seq("lo" -> 0.895, "hi" -> 0.905)
    ).collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    approx.foreach { case (flag, a) =>
      val (lo, hi) = bounds(flag)
      assert(a >= lo && a <= hi, s"$flag: approx p90 $a outside exact [$lo, $hi] (p89.5–p90.5)")
    }
  }
}
