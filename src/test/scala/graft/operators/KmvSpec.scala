package graft.operators

import graft.TestSpark
import graft.functions.{Hashing, KmvSketch}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.KmvSketchAgg
import org.scalatest.funsuite.AnyFunSuite

/** The KMV distinct sketch (x49) is hash-checked end-to-end by the driver
  * gate; this spec pins the properties the gate can't see:
  *   - the aggregate retains EXACTLY the k smallest distinct hashes (vs a
  *     declaratively computed ground truth), regardless of partitioning;
  *   - buffers stay bounded (serialize size ≤ 4 + 8k) and merge respects
  *     the bound — the 100 TB state contract;
  *   - the plan aggregates via ObjectHashAggregate with a partial stage
  *     (map-side combine before the shuffle);
  *   - the estimator lands within its published error (rse ≈ 1/√(k−2),
  *     asserted at 4σ) on a corpus ~40× larger than k.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hashed(n: Int, dups: Int = 1) = {
    import spark.implicits._
    (1 to n).flatMap(i => Seq.fill(dups)(i.toLong)).toDF("v")
      .select(Hashing.md5Window15(col("v").cast("string")).as("h"))
  }

  test("retains exactly the k smallest distinct hashes, any partitioning") {
    val k = 64
    val in = hashed(5000, dups = 3) // every value appears 3x: dedup is part of the contract
    val expected = in.distinct().orderBy("h").limit(k).collect().map(_.getLong(0)).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = in
        .repartition(parts)
        .agg(KmvSketch(col("h"), k).as("sk"))
        .collect()(0)
        .getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("sketch is ascending and sized min(k, ndv)") {
    val k = 256
    val in = hashed(100) // ndv < k: sketch must hold all 100, sorted
    val got = in.agg(KmvSketch(col("h"), k)).collect()(0).getSeq[Long](0)
    assert(got.size == 100)
    assert(got == got.sorted)
  }

  test("buffer stays bounded through merge; serialize round-trips") {
    val k = 16
    val agg = KmvSketchAgg(org.apache.spark.sql.graftbridge.Bridge.expression(col("h")), k)
    val rnd = new scala.util.Random(7)
    // feed 10k values through the public merge path (singleton buffers use
    // the same bounded insert as update) and check the bound holds throughout
    val m = agg.createAggregationBuffer()
    (1 to 10000).foreach { _ =>
      val one = agg.createAggregationBuffer()
      one.add(java.lang.Long.valueOf(math.abs(rnd.nextLong()) % (1L << 60)))
      agg.merge(m, one)
      assert(m.size() <= k)
    }
    assert(m.size() == k)
    assert(agg.serialize(m).length == 4 + 8 * k)
    val rt = agg.deserialize(agg.serialize(m))
    assert(rt == m, "serialize/deserialize must round-trip the buffer")
  }

  test("plan: ObjectHashAggregate with a partial kmv_sketch stage") {
    val df = hashed(1000).groupBy(lit(1)).agg(KmvSketch(col("h"), 32))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_kmv_sketch"), plan.take(2000))
  }

  test("estimator within 4 sigma of exact NDV on a 10k-distinct corpus") {
    val k = 256
    val n = 10000
    val sk = hashed(n, dups = 2).agg(KmvSketch(col("h"), k)).collect()(0).getSeq[Long](0)
    assert(sk.size == k)
    val est = math.round((k - 1).toDouble * math.pow(2, 60) / sk.last)
    val rse = 1.0 / math.sqrt(k - 2.0)
    assert(
      math.abs(est - n).toDouble / n <= 4 * rse,
      s"est=$est exact=$n relErr=${math.abs(est - n).toDouble / n} bound=${4 * rse}"
    )
  }

  test("x112 set algebra: union/intersection estimates track a controlled overlap") {
    import spark.implicits._
    val k = 256
    def sketch(lo: Int, hi: Int): Seq[Long] =
      (lo to hi)
        .toDF("v")
        .select(Hashing.md5Window15(col("v").cast("string")).as("h"))
        .agg(KmvSketch(col("h"), k))
        .collect()(0)
        .getSeq[Long](0)
    val a = sketch(1, 10000) // A = 1..10000
    val b = sketch(5001, 15000) // B = 5001..15000 → |∪|=15000, |∩|=5000
    val u = (a ++ b).distinct.sorted.take(k)
    val aSet = a.toSet; val bSet = b.toSet
    val interK = u.count(h => aSet(h) && bSet(h))
    val estU = math.round((k - 1).toDouble * math.pow(2, 60) / u.last)
    val estI = math.round((interK.toDouble / k) * ((k - 1).toDouble * math.pow(2, 60) / u.last))
    // 4σ of the KMV RSE (≈6.3% at k=256), scaled to each truth
    assert(math.abs(estU - 15000) <= 15000 * 4 / math.sqrt(k - 2.0), s"est_union=$estU")
    assert(math.abs(estI - 5000) <= 5000 * 8 / math.sqrt(k - 2.0), s"est_inter=$estI")
  }
}
