package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x118 quantile sketch: exact weight conservation, sub-k exactness, the
  * worst-case rank guarantee under adversarial orders and partitionings,
  * and the state bound. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 64

  private def sketchPairs(values: Seq[Long], parts: Int): Seq[(Long, Long)] = {
    val arr = values
      .toDF("c")
      .repartition(parts)
      .agg(graft.functions.QuantileSketch(col("c"), k).as("sk"))
      .collect()(0)
      .getSeq[Long](0)
    arr.grouped(2).map(p => (p(0), p(1))).toSeq // (weight, value)
  }

  private def checkGuarantee(values: Seq[Long], parts: Int): Unit = {
    val pairs = sketchPairs(values, parts)
    val n = values.size.toLong
    assert(pairs.map(_._1).sum === n, "total weight must equal N exactly")
    val levels = 64 - java.lang.Long.numberOfLeadingZeros(pairs.map(_._1).max)
    assert(pairs.size <= k * levels, "state bound exceeded")
    val bound = 2.0 * n * levels / k
    val sortedVals = values.sorted
    for (q <- Seq(0.25, 0.5, 0.75)) {
      // estimated quantile: smallest v whose cumulative weight reaches qN
      val target = math.ceil(q * n).toLong
      var cw = 0L
      val est = pairs.sortBy(p => (p._2, p._1)).collectFirst {
        case (w, v) if { cw += w; cw >= target } => v
      }.get
      val lt = sortedVals.count(_ < est).toDouble
      val le = sortedVals.count(_ <= est).toDouble
      assert(le >= q * n - bound, s"q=$q parts=$parts: le=$le below ${q * n - bound}")
      assert(lt <= q * n + bound, s"q=$q parts=$parts: lt=$lt above ${q * n + bound}")
    }
  }

  test("below k items the sketch is the exact multiset") {
    val vals = (1L to 50L).map(v => v * 7 % 50)
    val pairs = sketchPairs(vals, 1)
    assert(pairs.forall(_._1 == 1L))
    assert(pairs.map(_._2).sorted === vals.sorted)
  }

  test("rank guarantee holds: uniform, sorted, reverse, duplicate-heavy, many partitions") {
    val uniform = (1L to 20000L).map(v => (v * 48271) % 100003)
    checkGuarantee(uniform, 1)
    checkGuarantee(uniform, 17)
    checkGuarantee((1L to 20000L), 8) // sorted adversary
    checkGuarantee((1L to 20000L).reverse, 8) // reverse-sorted adversary
    checkGuarantee(Seq.fill(15000)(42L) ++ (1L to 5000L), 32) // heavy ties
  }

  test("merge path: wide partitioning conserves weight and the bound") {
    val vals = (1L to 30000L).map(v => (v * 2654435761L) % 1000000)
    checkGuarantee(vals, 32)
  }
}
