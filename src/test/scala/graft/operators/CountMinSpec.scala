package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x107 count-min sketch: order-independent counters (partitioning cannot
  * change the sketch), hash parity with the declarative md5Window15
  * convention, and the overestimate law. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val depth = 4
  private val width = 64

  /** Independent reference: hex-string md5 window, like the SQL replay
    * (`conv(substr(md5(s),1,15),16,10)`), not the aggregate's byte walk. */
  private def refBucket(row: Int, item: String): Int = {
    val dig = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s"cm$row:$item".getBytes("UTF-8"))
    val hex = dig.map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  private def refSketch(items: Seq[String]): Array[Long] = {
    val buf = new Array[Long](depth * width)
    for (it <- items; i <- 0 until depth) buf(i * width + refBucket(i, it)) += 1L
    buf
  }

  private def sketchOf(items: Seq[String], parts: Int): Array[Long] =
    items
      .toDF("item")
      .repartition(parts)
      .agg(graft.functions.CountMin(col("item"), depth, width).as("cm"))
      .collect()
      .head
      .getSeq[Long](0)
      .toArray

  test("sketch matches an independent md5-window reference implementation") {
    val items = (1 to 500).map(i => s"k${i % 37}")
    assert(sketchOf(items, 4) === refSketch(items))
  }

  test("sketch is identical across partitionings (pure-sum merge)") {
    val items = (1 to 1000).map(i => s"v${i % 91}")
    val one = sketchOf(items, 1)
    assert(sketchOf(items, 7) === one)
    assert(sketchOf(items, 32) === one)
  }

  test("point estimates overestimate, and are exact for a collision-free probe") {
    val items = (1 to 300).map(i => s"p${i % 11}") // 11 distinct in 4x64 cells
    val sk = sketchOf(items, 3)
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for ((item, n) <- exact) {
      val est = (0 until depth).map(i => sk(i * width + refBucket(i, item))).min
      assert(est >= n, s"$item: est $est < exact $n")
    }
    // total counter mass is depth * N in every row
    for (i <- 0 until depth)
      assert(sk.slice(i * width, (i + 1) * width).sum === items.size.toLong)
  }

  test("nulls are skipped") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("item")
    val sk = df
      .agg(graft.functions.CountMin(col("item"), depth, width).as("cm"))
      .collect()
      .head
      .getSeq[Long](0)
    assert(sk.sum === 2L * depth)
  }
}
