package graft.operators

import graft.TestSpark
import graft.functions.HllSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HLL sketch (x120) is hash-checked end-to-end by the driver gate
  * (full register replay); this spec pins what the gate can't see:
  *   - registers match a first-principles Scala recomputation of the same
  *     md5 → (idx, rho) discipline, for ANY partitioning;
  *   - merge is pointwise max: disjoint halves merge to the whole;
  *   - state stays m BYTES through serialize (the 100 TB contract);
  *   - the plan aggregates via ObjectHashAggregate with a partial stage;
  *   - the raw estimator lands within 4σ of rse = 1.04/√m at NDV ≫ m;
  *   - the linear-counting estimator (small-range regime — libm ln(), so
  *     deliberately NOT part of the hash gate) is accurate at NDV ≪ m.
  */
class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val P = 8
  private val M = 1 << P

  private def items(n: Int, dups: Int = 1) = {
    import spark.implicits._
    (1 to n).flatMap(i => Seq.fill(dups)(s"item$i")).toDF("item")
  }

  /** first-principles register computation, mirroring the aggregate's doc */
  private def refRegisters(vals: Seq[String]): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = new Array[Long](M)
    vals.foreach { v =>
      val dig = md.digest(("hll:" + v).getBytes("UTF-8"))
      var h = 0L
      (0 until 8).foreach(b => h = (h << 8) | (dig(b) & 0xffL))
      h = h >>> 4
      val idx = (h % M).toInt
      val w = h / M
      val rho = 60 - P + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(idx)) regs(idx) = rho.toLong
    }
    regs
  }

  test("registers match the first-principles recomputation, any partitioning") {
    val vals = (1 to 3000).map(i => s"item$i")
    val expected = refRegisters(vals).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = items(3000, dups = 2)
        .repartition(parts)
        .agg(HllSketch(col("item"), P).as("r"))
        .collect()(0)
        .getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("merge is pointwise max: disjoint halves merge to the whole") {
    import spark.implicits._
    val a = (1 to 1000).map(i => s"item$i")
    val b = (1001 to 2000).map(i => s"item$i")
    def sk(v: Seq[String]): Seq[Long] =
      v.toDF("item").agg(HllSketch(col("item"), P)).collect()(0).getSeq[Long](0)
    val whole = sk(a ++ b)
    val merged = sk(a).zip(sk(b)).map { case (x, y) => math.max(x, y) }
    assert(whole == merged.toSeq)
  }

  test("state is exactly m bytes through serialize; rho stays in [1, 53]") {
    val agg = org.apache.spark.sql.graftbridge
      .HllSketchAgg(org.apache.spark.sql.graftbridge.Bridge.expression(col("item")), P)
    val buf = agg.createAggregationBuffer()
    assert(agg.serialize(buf).length == M)
    val regs = refRegisters((1 to 50000).map(i => s"item$i"))
    assert(regs.forall(r => r >= 0 && r <= 60 - P + 1))
    assert(regs.exists(_ > 0))
  }

  test("plan: ObjectHashAggregate with a partial hll_sketch stage") {
    val df = items(1000).groupBy(lit(1)).agg(HllSketch(col("item"), P))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_hll_sketch"), plan.take(2000))
  }

  test("raw estimator within 4 sigma of exact NDV on a 20k-distinct corpus") {
    val n = 20000
    val regs = items(n, dups = 2).agg(HllSketch(col("item"), P)).collect()(0).getSeq[Long](0)
    val zsum = regs.map(r => 1L << (53 - r).toInt).sum
    val est = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0 / zsum.toDouble
    val rse = 1.04 / math.sqrt(M.toDouble)
    assert(
      math.abs(est - n) / n <= 4 * rse,
      s"est=$est exact=$n relErr=${math.abs(est - n) / n} bound=${4 * rse}"
    )
  }

  test("linear counting is the accurate estimator in the small-range regime") {
    val n = 60 // NDV ≪ m: raw HLL biases high, LC is near-exact here
    val regs = items(n).agg(HllSketch(col("item"), P)).collect()(0).getSeq[Long](0)
    val v = regs.count(_ == 0L)
    assert(v > 0, "small-range corpus must leave zero registers")
    val lc = M.toDouble * math.log(M.toDouble / v)
    assert(math.abs(lc - n) / n <= 0.15, s"lc=$lc exact=$n")
    // and the regime gate the x120 query publishes would select LC here
    val zsum = regs.map(r => 1L << (53 - r).toInt).sum
    val raw = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0 / zsum.toDouble
    assert(raw <= 2.5 * M && v > 0)
  }
}
