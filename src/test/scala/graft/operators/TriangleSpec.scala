package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x95 degree-oriented triangle counting: the distributed pipeline must
  * agree with a from-scratch in-memory recomputation of the same md5
  * graph (independent hashing path, brute wedge/triangle walk). */
class TriangleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5Bucket(sv: String, m: Long): Long = {
    val hex = java.security.MessageDigest
      .getInstance("MD5")
      .digest(sv.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
      .take(15)
    java.lang.Long.parseLong(hex, 16) % m
  }

  test("distributed count equals the brute in-memory walk on the same md5 graph") {
    val sf = "/root/testdata/sf0.001"
    val got = Reshape.queries("x95_triangle_count")(spark, sf).head()
    val ids = graft.Graft
      .table(spark, sf, "customer")
      .select("c_custkey")
      .collect()
      .map(_.getLong(0))
    val n = ids.length.toLong
    val edges = (for {
      u <- ids; i <- 0 until 3
      w = md5Bucket(s"$u#e$i", n) + 1
      if u != w
    } yield (math.min(u, w), math.max(u, w))).toSet
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }.groupBy(identity).map { case (v, l) => v -> l.size }
    def orient(a: Long, b: Long): (Long, Long) =
      if (deg(a) < deg(b) || (deg(a) == deg(b) && a < b)) (a, b) else (b, a)
    val oriented = edges.map { case (a, b) => orient(a, b) }
    val bySrc = oriented.groupBy(_._1).map { case (k, s) => k -> s.map(_._2) }
    val wedges = oriented.toSeq.flatMap { case (x, y) => bySrc.getOrElse(y, Set.empty).map(z => (x, y, z)) }
    val triangles = wedges.count { case (x, _, z) => oriented.contains((x, z)) }
    assert(got.getAs[Long]("n_vertices") === n)
    assert(got.getAs[Long]("n_edges") === edges.size.toLong)
    assert(got.getAs[Long]("n_wedges") === wedges.size.toLong)
    assert(got.getAs[Long]("n_triangles") === triangles.toLong)
    // orientation bound: every oriented out-degree ≤ ceil(sqrt(2m)) + slack —
    // the property that keeps the wedge join hub-safe
    val maxOut = bySrc.values.map(_.size).max
    assert(maxOut <= math.ceil(math.sqrt(2.0 * edges.size)).toInt + 2, s"out-degree $maxOut")
  }
}
