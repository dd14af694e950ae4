package graft.operators

import graft.TestSpark
import graft.functions.Hashing
import org.scalatest.funsuite.AnyFunSuite

/** x178 DBSCAN vs an independent in-memory reference (quadratic pairs +
  * union-find + the min-label border rule) over the real sf0.01 fixture. */
class DbscanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // sf0.01: sf0.001's 150 customers put only 1-2 points per planted
  // blob, so no cores form; the 1500-point corpus exhibits all three roles
  private val dir = "/root/testdata/sf0.01"

  private def positions(): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val keys = spark.read
      .parquet(s"$dir/customer.parquet")
      .select("c_custkey").as[Long].collect()
    keys.map { c =>
      def coord(salt: String): Long = {
        val h = Hashing.md5BucketOf(c.toString + salt, if (c % 97 < 3) 50L else 10000L)
        if (c % 97 < 3) 2000L + (c % 4) * 2000L + h else h
      }
      c -> (coord(""), coord("#y"))
    }.toMap
  }

  test("x178 agrees with an independent in-memory DBSCAN on every point") {
    val pos = positions()
    val ids = pos.keys.toSeq.sorted
    // density-adaptive: the engine sizes eps = max(1, floor(6000/sqrt(n)))
    val eps = math.max(1L, math.floor(6000.0 / math.sqrt(pos.size.toDouble)).toLong)
    def near(a: Long, b: Long): Boolean = {
      val (xa, ya) = pos(a); val (xb, yb) = pos(b)
      math.abs(xa - xb) <= eps && math.abs(ya - yb) <= eps
    }
    val nbrs = ids.map(a => a -> ids.filter(b => b != a && near(a, b))).toMap
    val core = ids.filter(a => nbrs(a).size >= 3).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val coreLab = core.map(c => c -> find(c)).toMap
    val expected = ids.map { i =>
      if (core(i)) (i, nbrs(i).size.toLong, "core", coreLab(i))
      else {
        val coreNb = nbrs(i).filter(core)
        if (coreNb.nonEmpty) (i, nbrs(i).size.toLong, "border", coreNb.map(coreLab).min)
        else (i, nbrs(i).size.toLong, "noise", -1L)
      }
    }
    val sizes = expected.filter(_._4 >= 0).groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val got = Advanced
      .queries("x178_dbscan")(spark, dir)
      .collect()
      .map { r =>
        assert(r.getAs[Long]("eps") === eps)
        (r.getAs[Long]("id"), r.getAs[Long]("n_nbrs"), r.getAs[String]("role"),
          r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))
      }
    assert(got.length === ids.length)
    val expMap = expected.map(e => e._1 -> e).toMap
    got.foreach { case (id, n, role, cl, sz) =>
      val (_, en, erole, ecl) = expMap(id)
      assert((n, role, cl) === ((en, erole, ecl)), s"point $id")
      assert(sz === (if (ecl < 0) 0L else sizes(ecl)), s"size of $id")
    }
    // the planted regime is present: some of each role, and every blob
    // cluster's label is the minimum core id of its component
    assert(got.exists(_._3 == "core") && got.exists(_._3 == "noise"), "planted regime missing")
    val clusters = got.filter(_._4 >= 0).groupBy(_._4)
    clusters.foreach { case (cl, members) =>
      val coreIds = members.filter(_._3 == "core").map(_._1)
      assert(coreIds.nonEmpty && coreIds.min === cl, s"cluster $cl label is not its min core id")
    }
  }
}
