package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** synthetic documents table: 0/1 near-dups, 2 = exact dup of 0, 3 unrelated */
  private lazy val dir: String = {
    val d = TestSpark.tempDir()
    val base = "the quick brown fox jumps over the lazy dog again and again tonight"
    val docs = Seq(
      (0L, base, "en", "t", 10L),
      (1L, base + " tomorrow", "en", "t", 10L), // near-dup of 0
      (2L, base, "en", "t", 10L), // exact dup of 0
      (3L, "completely different words about spark query engines and shuffles", "en", "t", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    d
  }

  test("exact dedup counts duplicates") {
    val r = Dedup.queries("x01_dedup_exact")(spark, dir).head()
    assert(r.getAs[Long]("total_docs") === 4L)
    assert(r.getAs[Long]("distinct_texts") === 3L)
    assert(r.getAs[Long]("dup_docs") === 1L)
  }

  test("ngram jaccard finds near-dup and exact-dup pairs, not unrelated") {
    val pairs = Dedup
      .queries("x02_dedup_ngram_jaccard")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 2L)) && pairs.find(p => p._1 == 0 && p._2 == 2).get._3 === 1.0)
    assert(keys.contains((0L, 1L))) // near-dup above threshold
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never pairs
  }

  test("minhash LSH surfaces the same dup structure") {
    val pairs = Dedup
      .queries("x03_dedup_minhash")(spark, dir)
      .collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Double]("est_jaccard")))
      .toMap
    assert(pairs((0L, 2L)) === 1.0) // identical docs → identical signatures
    assert(pairs.contains((0L, 1L)))
    assert(pairs.getOrElse((0L, 1L), 0.0) > 0.5)
  }

  test("chargram signature dedup finds the exact dup with est 1.0") {
    val pairs = Dedup
      .queries("x14_dedup_chargram")(spark, dir)
      .collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Double]("est_jaccard")))
      .toMap
    assert(pairs((0L, 2L)) === 1.0)
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: exact dup at hamming 0") {
    val pairs = Dedup
      .queries("x04_dedup_simhash")(spark, dir)
      .collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Long]("hamming")))
      .toMap
    assert(pairs((0L, 2L)) === 0L)
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
