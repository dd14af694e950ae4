package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** x115 chunking: schedule arithmetic and the overlap invariant on a
  * hand-sized document (100 tokens, C=24, S=16). */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunk schedule, lengths, and overlap on a 100-token document") {
    val d = TestSpark.tempDir()
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    TestSpark.writeTable(d, "documents", Seq((1L, text)).toDF("doc_id", "text"))
    val rows = SparkEntry
      .queries("x115_doc_chunking")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("start_tok"), r.getAs[Long]("n_toks")))
    // n=100, C=24, S=16 → ceil(76/16)+1 = 6 chunks; last starts at 80 with 20 tokens
    assert(rows.map(_._1).toSeq === (0L until 6L))
    assert(rows.map(_._2).toSeq === Seq(0L, 16L, 32L, 48L, 64L, 80L))
    assert(rows.map(_._3).toSeq === Seq(24L, 24L, 24L, 24L, 24L, 20L))
    // every token is covered at least once; consecutive chunks overlap by 8
    assert(rows.init.zip(rows.tail).forall { case ((_, s1, n1), (_, s2, _)) => s1 + n1 - s2 == 8L })
    assert(rows.last._2 + rows.last._3 === 100L)
  }

  test("short document yields exactly one full-coverage chunk") {
    val d = TestSpark.tempDir()
    TestSpark.writeTable(d, "documents", Seq((7L, "a b c")).toDF("doc_id", "text"))
    val rows = SparkEntry.queries("x115_doc_chunking")(spark, d).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("start_tok") === 0L)
    assert(rows(0).getAs[Long]("n_toks") === 3L)
  }
}
