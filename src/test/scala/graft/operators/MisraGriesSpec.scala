package graft.operators

import graft.TestSpark
import graft.functions.MisraGries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries native aggregate: the structural guarantee (true count >
  * N/k ⇒ retained) must hold under adversarial arrival orders and across
  * the mergeable path; with ≤ k distinct items the sketch is exact. */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sketchOf(items: Seq[String], k: Int, partitions: Int): Set[String] = {
    import spark.implicits._
    items.toDF("item")
      .repartition(partitions)
      .agg(MisraGries(col("item"), k).as("sk"))
      .head()
      .getAs[Seq[String]]("sk")
      .toSet
  }

  test("≤ k distinct items: the sketch retains every item exactly") {
    val items = (0 until 5).flatMap(i => Seq.fill(i + 1)(s"i$i"))
    assert(sketchOf(items, k = 8, partitions = 3) === (0 until 5).map(i => s"i$i").toSet)
  }

  test("guarantee holds under adversarial order: heavy items arrive FIRST, tail floods after") {
    // heavy 'a' (60 of 141 > N/4) arrives before 80 distinct tail items
    // try to evict it via constant decrements
    val items = Seq.fill(60)("a") ++ (0 until 80).map(j => s"z$j") ++ Seq.fill(1)("a")
    for (parts <- Seq(1, 4)) {
      val sk = sketchOf(items, k = 4, partitions = parts)
      assert(sk.contains("a"), s"parts=$parts lost the guaranteed heavy item")
      assert(sk.size <= 4)
    }
  }

  test("mergeable path: per-partition partials combine without losing guaranteed items") {
    // two heavy items (each > N/k), many partitions with interleaved tails
    val items =
      (0 until 300).map(i => if (i % 3 == 0) "hot1" else if (i % 3 == 1) "hot2" else s"t${i / 3}")
    val sk = sketchOf(items, k = 8, partitions = 16)
    assert(sk.contains("hot1") && sk.contains("hot2"))
    assert(sk.size <= 8)
  }

  test("buffer never exceeds k through heavy merge pressure") {
    val items = (0 until 2000).map(i => s"u$i") // all distinct: worst case
    assert(sketchOf(items, k = 5, partitions = 8).size <= 5)
  }
}
