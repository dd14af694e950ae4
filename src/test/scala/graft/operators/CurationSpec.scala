package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tempDir()
    val docs = Seq(
      (0L, "contact me at alice.smith+spam@example.co.uk or bob@test.io today", "en", "t", 1L),
      (1L, "server at 10.0.42.7 responded then 192.168.1.254 timed out", "en", "t", 1L),
      (2L, "call +1 555 123-4567 or +44 20 7946 0958 now", "en", "t", 1L),
      (3L, "a perfectly clean document with no sensitive content at all", "en", "t", 1L),
      // doc 50 is "benchmark" (50 % 50 == 0); doc 4 copies 4 of its words
      (50L, "the quick brown fox jumps over the lazy dog", "en", "t", 1L),
      (4L, "we note the quick brown fox appears here verbatim", "en", "t", 1L),
      // repetition: "buy now" 6 times out of 11 2-grams
      (5L, "buy now buy now buy now buy now buy now buy now", "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    d
  }

  test("PII redaction counts and scrubs emails, IPs, phones; clean docs untouched") {
    val r = Curation
      .queries("x17_pii_redact")(spark, dir)
      .collect()
      .map(row => row.getAs[Long]("doc_id") -> row)
      .toMap
    assert(r(0L).getAs[Long]("n_emails") === 2L)
    assert(r(1L).getAs[Long]("n_ips") === 2L)
    assert(r(2L).getAs[Long]("n_phones") === 2L)
    assert(r(3L).getAs[Long]("n_emails") + r(3L).getAs[Long]("n_ips") + r(3L).getAs[Long]("n_phones") === 0L)
    // clean doc's redacted md5 == original md5; dirty docs' differ
    import org.apache.spark.sql.functions._
    val orig = graft.Graft.table(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("m")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(3L).getAs[String]("redacted_md5") === orig(3L))
    assert(r(0L).getAs[String]("redacted_md5") !== orig(0L))
    // and the scrubbed text really contains the placeholder
    val scrubbed = graft.Graft.table(spark, dir, "documents")
      .where("doc_id = 0")
      .select(regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"))
      .head().getString(0)
    assert(scrubbed === "contact me at <EMAIL> or <EMAIL> today")
  }

  test("decontamination flags the doc sharing a benchmark 4-gram, nothing else") {
    val hits = Curation
      .queries("x18_decontaminate")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared")))
      .toMap
    assert(hits === Map(4L -> 1L)) // "the quick brown fox", exactly once
  }

  test("bloom decontamination: superset of the exact join, exact on the planted fixture") {
    // planted fixture: doc 4 shares exactly one 4-gram with benchmark doc 50
    val bloomHits = Curation
      .queries("x46_bloom_decontaminate")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bloom_hits")))
      .toMap
    assert(bloomHits === Map(4L -> 1L), "no false positives expected at this fill factor")
    // superset law on the real corpus: the bloom can only over-flag
    val sf = "/root/testdata/sf0.01"
    val exact = Curation
      .queries("x18_decontaminate")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared")))
      .toMap
    val bloom = Curation
      .queries("x46_bloom_decontaminate")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bloom_hits")))
      .toMap
    assert(exact.forall { case (id, n) => bloom.getOrElse(id, 0L) >= n },
      "bloom missed a true contamination hit")
    // plan shape: benchmark data reaches the probe only as the 1-row
    // broadcast bitset (tiny-metadata BNLJ) — never via a gram-keyed
    // shuffle join like x18's
    val plan = Curation
      .queries("x46_bloom_decontaminate")(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastNestedLoopJoin"), "bitset not broadcast as 1-row metadata")
    assert(!plan.contains("SortMergeJoin"), "bloom probe degenerated into a shuffle join")
  }

  test("repetition detector surfaces the boilerplate doc with the right ratio") {
    val rows = Curation
      .queries("x19_repetition")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("top_gram"), r.getAs[Long]("top_cnt"), r.getAs[Long]("n_grams")))
    assert(rows.map(_._1).contains(5L))
    val (_, gram, cnt, tot) = rows.find(_._1 == 5L).get
    assert(gram === "buy now" && cnt === 6L && tot === 11L)
  }

  test("compression ratio: repetitive text deflates below varied text, deterministic") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spam " * 200),
      (1L, (1 to 200).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")),
      (2L, "tiny")
    ).toDF("doc_id", "text")
    val rows = Curation
      .compressionRatio(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows(0L)._3 < rows(1L)._3, "repetitive text must compress harder than varied text")
    assert(rows(0L)._3 < 100000L, "200x-repeated token should deflate below 10%")
    assert(rows.values.forall(_._2 > 0))
    // sizable text never inflates past ~1.1x; tiny inputs may (deflate
    // stream overhead dominates) — which is itself a useful length signal
    assert(rows.filter(_._2._1 >= 100).values.forall(_._3 <= 1100000L))
    assert(rows(2L)._3 > 1000000L, "4-byte doc should inflate under stream overhead")
    // deterministic across evaluations (one Deflater per partition, reset per row)
    val again = Curation.compressionRatio(docs).collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(rows.view.mapValues(_._3).toMap === again)
  }

  test("x60 C4 rules: planted violations produce the expected verdicts with fixed precedence") {
    val rows = Curation.queries("x60_c4_filter")(spark, "unused").collect()
    assert(rows.length === 300)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    (0 until 300).foreach { i =>
      val r = byId(i.toLong)
      val expected =
        if (i % 13 == 0) "lorem_ipsum"
        else if (i % 17 == 0) "curly_brace"
        else if (i % 19 == 0) "bad_word"
        else if (i % 23 == 0) "too_few_sentences"
        else "keep"
      assert(r.getAs[String]("verdict") === expected, s"doc $i")
      // line rules: every good line survives; the planted short /
      // unterminated / javascript lines never do
      val expectedKept = if (i % 23 == 0) 2L else (3 + i % 3).toLong
      val keptFromGood = r.getAs[Long]("n_kept") - (if (i % 13 == 0) 1L else 0L) -
        (if (i % 19 == 0) 1L else 0L) // lorem + badword lines are well-formed lines
      assert(keptFromGood === expectedKept, s"doc $i kept lines")
    }
    // doc 0 hits residues 5,7,11,13,17,19 at once: page precedence says lorem_ipsum
    assert(byId(0L).getAs[String]("verdict") === "lorem_ipsum")
  }

  test("x58 url canonicalization collapses every surface variant onto its target") {
    val rows = Curation.queries("x58_url_canonicalize")(spark, "unused").collect()
    // 50 targets, target t published under t%6+1 variants with keeper t*6
    assert(rows.length === 50)
    val byKeeper = rows.map(r => r.getAs[Long]("keeper_id") -> r).toMap
    (0 until 50).foreach { t =>
      val r = byKeeper(t * 6L)
      assert(r.getAs[Long]("n_urls") === (t % 6 + 1).toLong, s"target $t group size")
      assert(r.getAs[String]("canon_host") === s"host${t % 7}.example.com", s"target $t host")
      assert(r.getAs[String]("canon_path") === s"/dir${t % 11}/page${t % 5}", s"target $t path")
      // the query-string variant is v=5, present only when t%6 == 5
      assert(r.getAs[Long]("n_with_query") === (if (t % 6 == 5) 1L else 0L), s"target $t query")
    }
  }

  test("x171: groups below k suppress into the '*' pool; exactly-k survives; mass conserves") {
    val d = TestSpark.tempDir()
    // QI = (lang, source, n_chars div 100): group A has exactly k = 5
    // members, group B has k - 1 (must suppress), group C has 6
    val rows =
      (0 until 5).map(i => (i.toLong, "x", "en", "big", 150L)) ++ // A: (en, big, 100) n=5
        (5 until 9).map(i => (i.toLong, "x", "fr", "big", 150L)) ++ // B: (fr, big, 100) n=4
        (9 until 15).map(i => (i.toLong, "x", "en", "big", 250L)) // C: (en, big, 200) n=6
    TestSpark.writeTable(d, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Curation.queries("x171_k_anonymity")(spark, d).collect()
    val byKey = out.map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r).toMap
    assert(byKey(("en", "big", "100")).getAs[Long]("n") === 5L)
    assert(byKey(("en", "big", "200")).getAs[Long]("n") === 6L)
    assert(!byKey.contains(("fr", "big", "100")), "sub-k group published")
    val pool = byKey(("*", "*", "*"))
    assert(pool.getAs[Long]("n") === 4L && pool.getAs[Long]("n_cells") === 1L)
    assert(out.map(_.getAs[Long]("n")).sum === 15L, "release must account for every document")
    assert(out.forall(_.getAs[Boolean]("k_ok")))
  }

  test("x171: a fully-releasable census still emits the (empty) suppressed pool row") {
    val d = TestSpark.tempDir()
    val rows = (0 until 7).map(i => (i.toLong, "x", "en", "big", 150L))
    TestSpark.writeTable(d, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Curation.queries("x171_k_anonymity")(spark, d).collect()
    val pool = out.filter(_.getString(0) == "*")
    assert(pool.length === 1 && pool.head.getAs[Long]("n") === 0L && pool.head.getAs[Long]("n_cells") === 0L)
  }
  test("x184 NFC: precomposed/combining/reordered/singleton variants collapse to one key") {
    val d = TestSpark.tempDir()
    val rows = Seq((0L, "plain ascii text", "en", "s", 16L))
    TestSpark.writeTable(d, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Curation.queries("x184_nfc_keys")(spark, d).collect().head
    assert(r.getAs[Boolean]("ascii_stable"), "ASCII must be NFC-stable")
    assert(r.getAs[Boolean]("nfc_match"), "canonically equivalent variants must share a key")
    // pin the JDK-level expectations the operator is built on: the two
    // variants NFC to the SAME codepoints, with the below-mark (U+0331,
    // ccc 220) reordered before the above-mark and the above-mark still
    // composing across it; U+212B is a singleton to U+00C5
    import java.text.Normalizer
    def nfc(x: String) = Normalizer.normalize(x, Normalizer.Form.NFC)
    assert(nfc("caf\u00e9") === nfc("cafe\u0301"))
    assert(nfc("A\u0308\u0331") === nfc("A\u0331\u0308"))
    assert(nfc("A\u0308\u0331") === "\u00c4\u0331") // composed across the below-mark
    assert(nfc("\u212b") === "\u00c5")
    // the raw-md5 fingerprint (the x10 view) SPLITS what NFC unifies
    assert("caf\u00e9" !== "cafe\u0301")
  }

}
