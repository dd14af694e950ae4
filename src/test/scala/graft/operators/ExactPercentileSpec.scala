package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExactPercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-phase exact percentile == built-in percentile, bit for bit, on real data") {
    val li = graft.Graft.table(spark, "/root/testdata/sf0.01", "lineitem")
    val ps = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9, "p999" -> 0.999)
    val ours = ExactPercentile(li, "l_returnflag", col("l_extendedprice"), ps)
      .orderBy("l_returnflag")
      .collect()
    val builtin = li
      .groupBy("l_returnflag")
      .agg(
        ps.map { case (nm, p) => expr(s"percentile(l_extendedprice, $p)").as(nm) }.head,
        ps.tail.map { case (nm, p) => expr(s"percentile(l_extendedprice, $p)").as(nm) }: _*
      )
      .orderBy("l_returnflag")
      .collect()
    assert(ours.length === builtin.length)
    ours.zip(builtin).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      ps.indices.foreach { i =>
        // exact double equality — same interpolation arithmetic
        assert(
          java.lang.Double.doubleToLongBits(a.getDouble(i + 1)) ===
            java.lang.Double.doubleToLongBits(b.getDouble(i + 1)),
          s"${a.getString(0)} ${ps(i)._1}: ours=${a.getDouble(i + 1)} builtin=${b.getDouble(i + 1)}"
        )
      }
    }
  }

  test("edge cases: single row, duplicated values, integer positions") {
    val df = Seq(
      ("a", 5.0),
      ("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 9.0),
      ("c", 1.0), ("c", 2.0), ("c", 3.0)
    ).toDF("g", "v")
    val r = ExactPercentile(df, "g", col("v"), Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .orderBy("g")
      .collect()
      .map(row => (row.getString(0), row.getDouble(1), row.getDouble(2), row.getDouble(3)))
    assert(r(0) === (("a", 5.0, 5.0, 5.0)))
    assert(r(1) === (("b", 1.0, 1.0, 9.0))) // p50 position 1.5 inside the run of 1.0s
    assert(r(2) === (("c", 1.0, 2.0, 3.0))) // exact integer positions
  }

  test("NULL values are ignored, matching the built-in (ADVICE r02)") {
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", None), ("a", Some(5.0)),
      ("b", Some(2.0)), ("b", None)
    ).toDF("g", "v")
    val ps = Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0)
    val ours = ExactPercentile(df, "g", col("v"), ps).orderBy("g").collect()
    val builtin = df
      .groupBy("g")
      .agg(
        ps.map { case (nm, p) => expr(s"percentile(v, $p)").as(nm) }.head,
        ps.tail.map { case (nm, p) => expr(s"percentile(v, $p)").as(nm) }: _*
      )
      .orderBy("g")
      .collect()
    ours.zip(builtin).foreach { case (a, b) =>
      ps.indices.foreach(i => assert(a.getDouble(i + 1) === b.getDouble(i + 1), s"${a.getString(0)} ${ps(i)._1}"))
    }
    // with nulls counted, a-p50 would sit between a null and 1.0 instead of at 3.0
    assert(ours.find(_.getString(0) == "a").get.getDouble(2) === 3.0)
  }

  test("plan: no percentile hash-map aggregate, window sort is the heavy op") {
    val li = graft.Graft.table(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = ExactPercentile(li, "l_returnflag", col("l_quantity"), Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "built-in map-buffer percentile leaked into the plan")
    assert(plan.contains("Window") || plan.contains("RunningWindowFunction"), "expected the running-count window")
  }

  test("weighted percentiles: brute-force reference, ties, p-clamp, invariance") {
    // planted distribution with weight clumps and duplicate values
    val rows = Seq(
      ("a", 10L, 1L), ("a", 20L, 5L), ("a", 20L, 2L), ("a", 30L, 1L), ("a", 40L, 1L),
      ("b", 7L, 100L), ("b", 9L, 1L),
      ("c", 5L, 3L)
    )
    val df = rows.toDF("g", "x", "w")
    val ps = Seq("p0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p100" -> 1.0)
    def ref(g: String, p: Double): Long = {
      val xs = rows.filter(_._1 == g).groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = xs.map(_._2).sum
      val tgt = math.max(p * tot, 1.0)
      var cum = 0L
      xs.find { case (_, w) => cum += w; cum >= tgt }.get._1
    }
    def run(part: Int): Map[String, (Long, Seq[Long])] =
      ExactPercentile
        .weighted(df.repartition(part), "g", col("x"), col("w"), ps)
        .collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("w_total"), ps.map { case (nm, _) => r.getAs[Long](nm) }))
        .toMap
    val got = run(1)
    for (g <- Seq("a", "b", "c")) {
      assert(got(g)._1 === rows.filter(_._1 == g).map(_._3).sum)
      ps.zipWithIndex.foreach { case ((nm, p), i) =>
        assert(got(g)._2(i) === ref(g, p), s"group $g $nm")
      }
    }
    // heavy clump: 100-weight value 7 dominates every quartile of b
    assert(got("b")._2 === Seq(7L, 7L, 7L, 7L, 9L))
    assert(run(5) === got) // partitioning invariance
    // non-positive weights are excluded entirely
    val withZero = (rows :+ (("c", 1L, 0L))).toDF("g", "x", "w")
    assert(
      ExactPercentile.weighted(withZero, "g", col("x"), col("w"), Seq("p0" -> 0.0))
        .where(col("g") === "c").collect().head.getAs[Long]("p0") === 5L
    )
  }
}
