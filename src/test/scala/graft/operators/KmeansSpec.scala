package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x57 k-means partitions the corpus: every vector assigned, k clusters") {
    val rows = Similarity.queries("x57_kmeans")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("cid")).toSeq.sorted === Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === 500L)
  }

  test("x57 k-means recovers four well-separated synthetic blobs exactly") {
    import spark.implicits._
    val dims = 16
    // blob centers: four orthogonal sign patterns, far apart relative to
    // the ±0.01 jitter; vec_ids 0..3 are one member of each blob, so the
    // lowest-id init starts with one seed per blob and Lloyd must converge
    // to the exact blob partition in one step
    def center(b: Int): Array[Float] = Array.tabulate(dims) { i =>
      val s = b match {
        case 0 => 1.0
        case 1 => -1.0
        case 2 => if (i % 2 == 0) 1.0 else -1.0
        case _ => if (i % 2 == 0) -1.0 else 1.0
      }
      (0.4 * s).toFloat
    }
    val vecs = (0 until 40).map { id =>
      val b = id % 4
      val jitter = Array.tabulate(dims)(i => (((id * 31 + i * 7) % 21 - 10) / 1000.0).toFloat)
      (id.toLong, center(b).zip(jitter).map { case (c, j) => c + j }, b)
    }
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(dir, "embeddings", vecs.toDF("vec_id", "embedding", "label"))
    val rows = Similarity.queries("x57_kmeans")(spark, dir).collect()
    assert(rows.length === 4)
    // init seeds are ids 0..3 = blobs 0..3, so cluster cid holds exactly
    // the 10 members of blob cid
    rows.foreach(r => assert(r.getAs[Long]("n_vecs") === 10L, s"cluster ${r.getAs[Long]("cid")}"))
  }

  test("x57 k-means is deterministic across reruns") {
    val a = Similarity.queries("x57_kmeans")(spark, sf).collect().map(_.toString).toSeq
    val b = Similarity.queries("x57_kmeans")(spark, sf).collect().map(_.toString).toSeq
    assert(a === b)
  }
}
