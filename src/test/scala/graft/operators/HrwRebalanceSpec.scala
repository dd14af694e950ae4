package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x202 rendezvous rebalance: the minimal-movement LAW (growing the shard
  * set can only move keys INTO the new shard — an argmax over a superset
  * changes iff the new candidate wins), conservation, and the mod-N
  * contrast actually being bad. */
class HrwRebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    Sampling.queries("x202_hrw_rebalance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("HRW moves keys ONLY into the new shard; survivors never reshuffle") {
    val hrw = rows.filter(_._1 == "hrw")
    assert(hrw.map(_._2).sorted === (0L to 8L), "all 9 shards populated")
    hrw.foreach { case (_, shard, n, moved) =>
      if (shard == 8L) assert(moved === n, "every key on the new shard moved there")
      else assert(moved === 0L, s"shard $shard: a surviving shard received moved keys")
    }
  }

  test("both schemes conserve the key census and mod-N moves most keys") {
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    Seq("hrw", "mod").foreach { sch =>
      assert(rows.filter(_._1 == sch).map(_._3).sum === total, s"$sch census")
    }
    val hrwMoved = rows.filter(_._1 == "hrw").map(_._4).sum
    val modMoved = rows.filter(_._1 == "mod").map(_._4).sum
    // HRW expected movement = 1/9 of keys; mod-N ≈ 8/9. Wide-margin law
    // assertions, not distribution estimates:
    assert(hrwMoved * 4 < total, s"HRW moved $hrwMoved of $total — not minimal")
    assert(modMoved * 2 > total, s"mod moved only $modMoved of $total — contrast broken")
    assert(hrwMoved * 3 < modMoved, "HRW must beat mod by a wide factor")
  }
}
