package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** x108 entity resolution: structural recall of the two-pass blocking (a
  * one-deletion variant always lands in its entity's cluster), no
  * cross-entity merges, and exact cluster accounting. */
class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tempDir()
    TestSpark.writeTable(d, "customer", (1L to 60L).toDF("c_custkey"))
    d
  }

  test("every dirty variant links to its entity; no cross-entity merges") {
    val rows = SparkEntry
      .queries("x108_entity_resolution")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("size"), r.getAs[Boolean]("entity_ok")))
    assert(rows.forall(_._3), "cross-entity cluster found")
    assert(rows.map(_._2).forall(s => s == 1L || s == 2L))
    val twins = (1L to 60L).count(_ % 3 != 0) // keys that got a dirty variant
    val singles = 60 - twins
    assert(rows.count(_._2 == 2L) === twins)
    assert(rows.count(_._2 == 1L) === singles)
    // pair clusters are rooted at the canonical record (even id = 2k)
    assert(rows.filter(_._2 == 2L).forall(_._1 % 2 == 0))
    // total records accounted once
    assert(rows.map(_._2).sum === 60L + twins)
  }
}
