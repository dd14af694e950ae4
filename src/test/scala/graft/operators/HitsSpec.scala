package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** x167 HITS: the distributed 4-round alternating recursion must agree
  * EXACTLY with an in-memory integer replay of the same directed md5
  * draw graph, normalization rule (den = max div 1000 + 1) and
  * isolated-vertex handling — one divergent floor anywhere shifts every
  * later half-step. */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5win(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = dig.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("distributed HITS equals the in-memory integer reference") {
    val keys = graft.Graft
      .table(spark, sf, "customer")
      .select("c_custkey")
      .collect()
      .map(_.getLong(0))
    val n = keys.length.toLong
    val edges = (for {
      u <- keys
      i <- 0 until 3
      w = md5win(s"$u#e$i") % n + 1
      if w != u
    } yield (u, w)).distinct
    val outAdj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val inAdj = edges.groupBy(_._2).map { case (w, es) => w -> es.map(_._1) }
    var hub: Map[Long, Long] = keys.map(_ -> 1000L).toMap
    var auth: Map[Long, Long] = Map.empty
    for (_ <- 1 to 4) {
      val a0 = keys.map(v => v -> inAdj.getOrElse(v, Array.empty[Long]).map(hub).sum).toMap
      val ad = a0.values.max / 1000 + 1
      auth = a0.map { case (v, x) => v -> x / ad }
      val h0 = keys.map(v => v -> outAdj.getOrElse(v, Array.empty[Long]).map(auth).sum).toMap
      val hd = h0.values.max / 1000 + 1
      hub = h0.map { case (v, x) => v -> x / hd }
    }

    val rows = SparkEntry.queries("x167_hits")(spark, sf).collect()
    assert(rows.length === keys.length)
    rows.foreach { r =>
      val v = r.getAs[Long]("v")
      assert(r.getAs[Long]("hub_e3") === hub(v), s"hub($v)")
      assert(r.getAs[Long]("auth_e3") === auth(v), s"auth($v)")
    }
    // the recursion actually separates: scores are non-degenerate
    assert(rows.map(_.getAs[Long]("hub_e3")).distinct.length > 10)
    assert(rows.map(_.getAs[Long]("auth_e3")).distinct.length > 10)
  }
}
