package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x165 power iteration on a planted covariance: variance concentrated
  * along one axis must be recovered as PC1, projections must rank the
  * corpus by its coordinate on that axis, and the whole trajectory must
  * be deterministic across runs (the gate hashes it, so flakiness here
  * would be a red gate, not a flaky test).
  */
class PcaPowerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(): String = {
    import spark.implicits._
    // dim 0 carries variance ~100× any other: PC1 = ±e0. Other dims get
    // small deterministic wiggle so the covariance is not rank-1.
    val rows = (0 until 40).map { k =>
      val e0 = (k - 20) * 0.05f
      val rest = (1 until 8).map(j => ((k * j) % 5 - 2) * 0.002f)
      (k.toLong, (e0 +: rest).toArray, k % 3)
    }
    val dir = java.nio.file.Files.createTempDirectory("pca_spec").toString
    rows.toDF("vec_id", "embedding", "label").write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted dominant axis is recovered; projections rank by its coordinate") {
    val dir = fixture()
    val out = Similarity.queries("x165_pca_power")(spark, dir).collect()
    assert(out.length === 40)
    // positive eigenvalue estimate and a non-degenerate eigenvector
    assert(out.head.getAs[Long]("lambda_e3") > 0L)
    assert(out.head.getAs[Long]("v_norm1") > 0L)
    // projections must be strictly monotone in the planted dim-0
    // coordinate (which increases with vec_id), up to a global sign
    val proj = out.sortBy(_.getAs[Long]("vec_id")).map(_.getAs[Long]("proj"))
    val diffs = proj.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(diffs.forall(_ > 0) || diffs.forall(_ < 0), s"non-monotone projections: ${proj.mkString(",")}")
  }

  test("the iteration is deterministic across executions") {
    val dir = fixture()
    val a = Similarity.queries("x165_pca_power")(spark, dir).collect().map(_.toString).toSeq
    val b = Similarity.queries("x165_pca_power")(spark, dir).collect().map(_.toString).toSeq
    assert(a === b)
  }
}
