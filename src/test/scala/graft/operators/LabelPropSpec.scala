package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** x109 label propagation: the distributed 5-round synchronous LPA must
  * agree exactly with an in-memory reference replay of the same md5 graph
  * and tie-break rule (max neighbor-label count, then min label). */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5win(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = dig.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("distributed LPA equals the in-memory reference partition") {
    val keys = graft.Graft
      .table(spark, sf, "customer")
      .select("c_custkey")
      .collect()
      .map(_.getLong(0))
    val n = keys.length.toLong
    val edges = (for {
      k <- keys
      i <- 0 until 3
      w = md5win(s"$k#e$i") % n + 1
      if w != k
    } yield (math.min(k, w), math.max(k, w))).distinct
    val adj = edges
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1)
      .map { case (v, ns) => v -> ns.map(_._2) }
    var labels: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 5) {
      labels = adj.map { case (v, ns) =>
        val counts = ns.groupBy(labels).map { case (l, vs) => l -> vs.length }
        val mx = counts.values.max
        v -> counts.collect { case (l, c) if c == mx => l }.min
      }
    }
    val refSizes = labels.values.groupBy(identity).map { case (l, vs) => l -> vs.size.toLong }

    val rows = SparkEntry.queries("x109_label_propagation")(spark, sf).collect()
    val gotSizes =
      rows.map(r => r.getAs[Long]("community") -> r.getAs[Long]("size")).toMap
    assert(gotSizes === refSizes)
    val r0 = rows.head
    assert(r0.getAs[Long]("n_communities") === refSizes.size.toLong)
    assert(r0.getAs[Long]("max_size") === refSizes.values.max)
    assert(r0.getAs[Long]("n_vertices") === labels.size.toLong)
  }
}
