package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** x201 RRF fusion: hand-computable fixture where the two legs disagree
  * hard (lexical winner absent semantically and vice versa), plus internal
  * consistency of the fused scores on the real tables. */
class RrfFusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-built corpus: fusion rewards presence on BOTH lists over a single #1") {
    val dir = TestSpark.tempDir()
    import spark.implicits._
    // doc 1: lexical monster ("spark" many times), semantically opposite.
    // doc 2: moderate lexical, semantically closest to the probe.
    // doc 3: lexical only. doc 4: semantic only (no query terms).
    val docs = Seq(
      (0L, "the probe document about nothing relevant"),
      (1L, "spark spark spark spark spark table window"),
      (2L, "spark table words fill this document body out"),
      (3L, "window table padding padding padding padding"),
      (4L, "completely unrelated text with zero hits here")
    ).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source", "length(text) AS n_chars")
    TestSpark.writeTable(dir, "documents", docs)
    val eSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)
    ))
    val emb = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, Seq(1.0f, 0.0f, 0.0f), 0),
        Row(1L, Seq(-1.0f, 0.0f, 0.0f), 0), // anti-aligned with the probe
        Row(2L, Seq(0.9f, 0.1f, 0.0f), 0), // nearest
        Row(3L, Seq(0.0f, 1.0f, 0.0f), 0), // orthogonal
        Row(4L, Seq(0.5f, 0.5f, 0.0f), 0)
      ),
      eSchema
    )
    TestSpark.writeTable(dir, "embeddings", emb)
    val got = Similarity.queries("x201_rrf_fusion")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3)))
    val byId = got.map(t => t._1 -> t).toMap
    // semantic ranks among vec 1..4 vs probe vec 0 by cosine:
    // 2 (~0.994) > 4 (~0.707) > 3 (0) > 1 (-1) → sranks 1,2,3,4
    assert(byId(2L)._3 === Some(1L))
    assert(byId(4L)._3 === Some(2L))
    assert(byId(1L)._3 === Some(4L))
    // lexical: doc 1 wins tf·idf; docs 2,3 hit; docs 0,4 have no terms
    assert(byId(1L)._2 === Some(1L))
    assert(byId(4L)._2 === None)
    assert(!byId.contains(0L) || byId(0L)._2.nonEmpty, "probe excluded from the semantic leg")
    // fusion: every rrf matches the closed form from its ranks
    got.foreach { case (id, l, s0, rrf) =>
      val want = l.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        s0.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf === want, s"doc $id rrf")
    }
    // doc 2 (top-2 on one list, present on both) must outrank doc 1
    // (lexical #1 but semantic last) — the reason rank fusion exists
    assert(byId(2L)._4 > byId(1L)._4)
    // output is sorted by (rrf desc, id)
    assert(got.sortBy(t => (-t._4, t._1)).toSeq === got.toSeq)
  }

  test("real tables: ranks are 1..20 without gaps on each present leg") {
    val got = Similarity.queries("x201_rrf_fusion")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Long])))
    val lranks = got.flatMap(_._1).sorted
    val sranks = got.flatMap(_._2).sorted
    assert(sranks === (1L to 20L), "semantic shortlist must be exactly 20 deep")
    assert(lranks === (1L to lranks.length), s"lexical ranks must be gapless from 1")
  }
}
