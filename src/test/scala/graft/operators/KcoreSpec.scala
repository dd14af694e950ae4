package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x105 k-core: the distributed peel must reach the true fixed point (an
  * in-memory reference peel over the same md5 graph), every survivor must
  * hold induced degree ≥ k, and the convergence flag must be honest. */
class KcoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** reference peel: repeat-until-stable (not round-budgeted) */
  private def referenceCore(edges: Set[(Long, Long)], k: Int): Set[Long] = {
    var nodes = edges.flatMap(e => Seq(e._1, e._2))
    var changed = true
    while (changed) {
      val alive = edges.filter(e => nodes(e._1) && nodes(e._2))
      val deg = alive.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, xs) => v -> xs.size }
      val keep = nodes.filter(v => deg.getOrElse(v, 0) >= k)
      changed = keep != nodes
      nodes = keep
    }
    nodes
  }

  test("distributed 12-round peel reaches the reference fixed point and converges") {
    import org.apache.spark.sql.functions._
    val n = graft.Graft.table(spark, sf, "customer").count()
    val edges = graft.Graft
      .table(spark, sf, "customer")
      .select(col("c_custkey").as("v"))
      .crossJoin(spark.range(3).toDF("i"))
      .select(
        col("v").as("u"),
        (graft.functions.Hashing.md5Bucket(concat(col("v").cast("string"), lit("#e"), col("i").cast("string")), n) + 1L).as("w")
      )
      .where(col("u") =!= col("w"))
      .select(least(col("u"), col("w")).as("a"), greatest(col("u"), col("w")).as("b"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val core = referenceCore(edges, 3)
    val rows = Reshape.queries("x105_kcore")(spark, sf).collect()
    assert(rows.nonEmpty, "empty 3-core at sf0.001 — fixture too sparse for the test")
    assert(rows.forall(_.getAs[Boolean]("converged")), "12 peel rounds did not reach the fixed point")
    assert(rows.head.getAs[Long]("n_core_nodes") === core.size.toLong)
    val aliveEdges = edges.count(e => core(e._1) && core(e._2))
    assert(rows.head.getAs[Long]("n_core_edges") === aliveEdges.toLong)
    // histogram must cover exactly the core and every degree is >= 3
    assert(rows.map(r => r.getAs[Long]("n_nodes")).sum === core.size.toLong)
    assert(rows.forall(_.getAs[Long]("core_degree") >= 3L))
  }
}
