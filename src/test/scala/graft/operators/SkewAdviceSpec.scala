package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured-skew salt advice (x270) + the salted join it feeds. Laws:
  *   - the advice formula is exact integer arithmetic over the key census
  *     (uniform → 1 / dominant → clamped max / mild → proportional);
  *   - a salts=1 advice means the PLAIN join — salting must never be
  *     applied where it can't pay;
  *   - for ANY salt factor the salted join is row-multiset-identical to
  *     the plain inner join (the q38 contract, asserted here across skew
  *     shapes rather than ridden through the gate alone).
  */
class SkewAdviceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def keyed(rows: Seq[Long]): org.apache.spark.sql.DataFrame =
    rows.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")

  test("advice: uniform key → salts 1; dominant key → clamped max; mild skew → proportional") {
    val uniform = keyed((0L until 640L).map(_ % 64))
    val (us, usalts) = Skew.advisedSalts(uniform, "k", parallelism = 32, maxSalts = 16)
    assert(us === 15625) // 10/640 rows per key
    assert(usalts === 1)

    val dominant = keyed(Seq.fill(990)(7L) ++ (0L until 10L))
    val (ds, dsalts) = Skew.advisedSalts(dominant, "k", parallelism = 32, maxSalts = 16)
    assert(ds === 991000) // 991/1000 (key 7 also hit by the 0..9 range once)
    assert(dsalts === 16)

    val mild = keyed(Seq.fill(200)(3L) ++ (0L until 800L).map(i => 100 + (i % 100)))
    val (ms, msalts) = Skew.advisedSalts(mild, "k", parallelism = 32, maxSalts = 16)
    assert(ms === 200000) // 200/1000
    assert(msalts === 7) // ceil(0.2 * 32) = 7
  }

  test("salted join is multiset-identical to the plain join across skew shapes and salt factors") {
    for {
      rows <- Seq(
        (0L until 500L).map(_ % 50), // uniform
        Seq.fill(400)(1L) ++ (0L until 100L), // dominant
        Seq.empty[Long] // empty left side
      )
      salts <- Seq(1, 3, 16)
    } {
      val left = keyed(rows)
      val right = (0L until 60L).map(k => (k, s"name$k")).toDF("k", "kname")
      val plain = left.join(right, "k").groupBy("kname").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      val salted =
        Skew.saltedJoin(left, right, "k", salts).groupBy("kname").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      assert(
        salted.orderBy("kname").collect().toSeq === plain.orderBy("kname").collect().toSeq,
        s"salts=$salts rows=${rows.size}"
      )
    }
  }

  test("the x270 advice on the gate's derived key reproduces the pinned constants") {
    val d = "/root/testdata/sf0.001"
    val li = graft.Graft
      .table(spark, d, "lineitem")
      .withColumn("skey", expr("CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_orderkey % 997 END"))
    val (share, salts) = Skew.advisedSalts(li, "skey", parallelism = 32, maxSalts = 16)
    assert(share > 600000 && share < 800000, s"the 70% stripe must dominate: share=$share")
    assert(salts === 16, "0.7 × 32 rounds past the 16 clamp")
  }
}
