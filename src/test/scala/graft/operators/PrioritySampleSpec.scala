package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Priority sampling (x272). The whole operator is replayed here in driver
  * BigInt arithmetic — an independent third implementation next to the
  * Spark DECIMAL(38,0) chain and the DuckDB HUGEINT oracle — and the
  * Horvitz–Thompson estimator is checked both for formula identity and for
  * landing in a sane error band on the fixture weights.
  */
class PrioritySampleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private val k = 50

  private def md5h(v: String): Long = {
    val hex = java.security.MessageDigest
      .getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
      .take(15)
    math.max(java.lang.Long.parseLong(hex, 16), 1L)
  }

  test("gate sample, τ, and estimator equal the BigInt brute-force recompute") {
    val rows = Sampling.queries("x272_priority_sample")(spark, d).collect()
    assert(rows.length === k)

    val orders = graft.Graft
      .table(spark, d, "orders")
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS w")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(orders.length > k + 1)
    val twoPow60 = BigInt(1) << 60
    val prio = orders.map { case (key, w) => (key, w, BigInt(w) * twoPow60 / BigInt(md5h(key.toString))) }
    val sorted = prio.sortBy { case (key, _, q) => (-q, key) } // q desc, key asc (BigInt safe: negate)
    val expectSample = sorted.take(k)
    val tau = sorted(k)._3
    val est = expectSample.map { case (_, w, _) => BigInt(w).max(tau) }.sum
    val exact = orders.map(o => BigInt(o._2)).sum

    val gotKeys = rows.map(_.getAs[Long]("o_orderkey")).toSeq
    assert(gotKeys === expectSample.map(_._1).toSeq, "sample membership and order must match")
    assert(rows.map(_.getAs[Long]("w")).toSeq === expectSample.map(_._2).toSeq)
    assert(rows.head.getAs[Long]("est_cents") === est.toLong)
    assert(rows.head.getAs[Long]("exact_cents") === exact.toLong)
    val absErr = (est - exact).abs * 1000000 / exact
    assert(rows.head.getAs[Long]("abs_err_e6") === absErr.toLong)
    assert(rows.head.getAs[Long]("err_sign") === (est - exact).signum.toLong)
  }

  test("the estimator lands within a sane band on the fixture weights") {
    val rows = Sampling.queries("x272_priority_sample")(spark, d).collect()
    val absErr = rows.head.getAs[Long]("abs_err_e6")
    // k=50 of ~1500 weighted rows: DLT variance puts |err| well inside 35%
    assert(absErr < 350000, s"estimator error out of band: $absErr ppm")
  }
}
