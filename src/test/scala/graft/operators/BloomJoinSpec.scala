package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x103 Bloom semi-join reduction: no false negatives (result == plain
  * join), real pruning (candidates ≪ fact), and a sane false-positive rate
  * for the 1024-bit / k=3 geometry. */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tempDir()
    // 40 suppliers, 5 in the probed nation 3; fact rows spread over all of
    // them so most of the fact side is prunable
    val sup = (0 until 40)
      .map(i => (i.toLong, f"Supplier#$i%05d", i % 8, 100.0 * i))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    TestSpark.writeTable(d, "supplier", sup)
    val li = (0 until 4000).map { i =>
      (i.toLong, (i * 7L) % 40, ((i % 5) + 1).toDouble)
    }.toDF("l_orderkey", "l_suppkey", "l_quantity")
    TestSpark.writeTable(d, "lineitem", li)
    d
  }

  test("bloom-filtered join equals the plain join and prunes the fact side") {
    val out = Warehouse.queries("x103_bloom_join")(spark, dir).collect()
    // plain join ground truth
    val plain = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .join(
        spark.read.parquet(s"$dir/supplier.parquet").where("s_nationkey = 3"),
        $"l_suppkey" === $"s_suppkey"
      )
      .groupBy("s_name")
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_items"),
        org.apache.spark.sql.functions.sum("l_quantity").cast("long").as("sum_qty")
      )
      .collect()
      .map(r => (r.getAs[String]("s_name"), r.getAs[Long]("n_items"), r.getAs[Long]("sum_qty")))
      .toSet
    val got = out.map(r => (r.getAs[String]("s_name"), r.getAs[Long]("n_items"), r.getAs[Long]("sum_qty"))).toSet
    assert(got === plain, "bloom filter dropped true matches (false negative)")
    // pruning: nations are 1/8 of suppliers → true pass ≈ 12.5% of fact;
    // the bloom must get within 2x of that, i.e. actually prune
    val nPass = out.head.getAs[Long]("n_bloom_pass")
    val nFp = out.head.getAs[Long]("n_false_pos")
    val nFact = 4000L
    assert(nPass < nFact / 4, s"bloom passed $nPass of $nFact — not pruning")
    assert(nFp >= 0L)
    // k=3, m=1024, n=15 set bits max → theoretical fp ≈ (15/1024)^3 ~ 3e-6;
    // allow a generous envelope: fp rows under 2% of the fact side
    assert(nFp <= nFact / 50, s"false-positive rows $nFp exceed 2% of fact")
  }
}
