package graft.operators

import graft.TestSpark
import graft.functions.Hashing
import org.scalatest.funsuite.AnyFunSuite

/** x180 large-star/small-star CC: full agreement with an in-memory
  * union-find over the same formula graph, and the log-rounds contraction
  * law on a pure high-diameter path. */
class LogstarCcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("x180 labels equal an independent union-find over the formula graph (sf0.01)") {
    import spark.implicits._
    val keys = spark.read
      .parquet("/root/testdata/sf0.01/customer.parquet")
      .select("c_custkey").as[Long].collect().sorted
    val n = keys.length.toLong
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    keys.filter(_ >= 500).foreach { v =>
      (0 until 3).foreach { i =>
        val w = 500L + Hashing.md5BucketOf(s"$v#e$i", math.max(1L, n - 500))
        if (w != v) edges += ((math.min(v, w), math.max(v, w)))
      }
    }
    keys.filter(v => v < 499 && v + 1 < n).foreach(v => edges += ((v, v + 1)))
    val parent = scala.collection.mutable.Map(keys.map(k => k -> k): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expLab = keys.map(k => k -> find(k)).toMap
    val expSz = expLab.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Reshape.queries("x180_logstar_cc")(spark, "/root/testdata/sf0.01").collect()
    assert(got.length === keys.length)
    got.foreach { r =>
      val node = r.getAs[Long]("node")
      assert(r.getAs[Long]("label") === expLab(node), s"node $node")
      assert(r.getAs[Long]("comp_size") === expSz(expLab(node)), s"size of $node")
      assert(r.getAs[Boolean]("converged"), "budget must cover the gate graph")
    }
  }

  test("a 4000-vertex path contracts in O(log n) pairs (min-label would need ~2000 rounds)") {
    import spark.implicits._
    val path = (0L until 3999L).map(v => (v, v + 1)).toDF("a", "b")
    var e = path.localCheckpoint()
    var rounds = 0
    var stable = false
    while (!stable && rounds < 20) {
      val next = Reshape
        .starStep(Reshape.starStep(e, large = true), large = false)
        .localCheckpoint()
      rounds += 1
      stable = next.except(e).limit(1).count() == 0 && e.except(next).limit(1).count() == 0
      e = next
    }
    assert(stable, "did not converge within 20 pairs")
    assert(rounds <= 15, s"log-rounds law violated: $rounds pairs for a 4000-path")
    // converged state is one min-rooted star: every edge is (0, v)
    import org.apache.spark.sql.functions._
    assert(e.where(col("a") =!= 0L).count() === 0L, "star root must be the component minimum")
    assert(e.count() === 3999L)
  }
}
