package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 corpus operators: splits/sampling/mixture (Sampling), TF-IDF and
  * vocabulary (TextAnalysis), kNN classification and int8 quantization
  * (Similarity). Semantic properties on hand-built fixtures plus scale/plan
  * discipline on the real sf tables.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private lazy val dir: String = {
    val d = TestSpark.tempDir()
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "s0", 16L),
      (1L, "alpha beta beta", "en", "s0", 15L),
      (2L, "alpha unique", "en", "s1", 12L),
      (3L, "alpha alpha alpha", "de", "s1", 17L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    // labels: vecs 0/1/2 point +x (label 7), vec 3 points +y (label 3),
    // query 0 must be classified 7 by its parallel neighbors
    val embs = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(2.0f, 0.1f), 7),
      (2L, Array(3.0f, 0.05f), 7),
      (3L, Array(0.0f, 1.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    TestSpark.writeTable(d, "embeddings", embs)
    d
  }

  test("x24 hash split: deterministic partition of the corpus, ~80/10/10") {
    val rows = Sampling
      .queries("x24_hash_split")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows.keySet === Set("train", "val", "test"))
    assert(rows.values.map(_._1).sum === 500L) // every doc in exactly one split
    assert(rows("train")._1 > rows("val")._1 && rows("train")._1 > rows("test")._1)
    // pure function of doc_id: a second evaluation is identical
    val again = Sampling.queries("x24_hash_split")(spark, sf).collect().map(_.toSeq)
    assert(again.toSeq === Sampling.queries("x24_hash_split")(spark, sf).collect().map(_.toSeq).toSeq)
  }

  test("x26 token budget: per-language cumulative cap is respected and binding") {
    val rows = Sampling
      .queries("x26_token_budget_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 <= 2500L), "cum_tokens above budget")
    val perLang = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // budget must actually bind at sf0.01 (every lang has >2500 tokens total)
    assert(perLang.values.forall(t => t > 2000L && t <= 2500L), perLang.toString)
    // scale shape: the per-document running sum must be partitioned by
    // (lang, bucket), never by lang alone — one task per language is the
    // 100 TB straggler this operator exists to avoid
    val plan = Sampling.queries("x26_token_budget_sample")(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(lang"), "missing window")
    assert(plan.contains("windowspecdefinition(lang#") || plan.contains("bkt"), plan.take(400))
    assert(plan.split("windowspecdefinition").exists(s => s.startsWith("(lang") && s.contains("bkt")),
      "per-doc running sum not bucketed by (lang, bkt)")
  }

  test("x27 domain mixture: ppm weights are proportional and sum to ~1e6") {
    val rows = Sampling.queries("x27_domain_mixture")(spark, sf).collect()
    val wsum = rows.map(_.getAs[Long]("weight_ppm")).sum
    // floor division loses < 1 ppm per domain
    assert(wsum <= 1000000L && wsum > 1000000L - rows.length, s"wsum=$wsum")
    val byTokens = rows.sortBy(-_.getAs[Long]("n_tokens")).map(_.getAs[Long]("weight_ppm"))
    assert(byTokens.toSeq === byTokens.sortBy(-(_: Long)).toSeq, "weights not monotone in token share")
  }

  test("x25 TF-IDF: corpus-rare terms outscore corpus-wide terms") {
    val rows = TextAnalysis
      .queries("x25_tfidf_keywords")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 2: "unique" (df=1) must beat "alpha" (df=4) despite equal tf
    val doc2 = rows.filter(_._1 == 2L).sortBy(_._2)
    assert(doc2.head._3 === "unique")
    assert(doc2.head._4 > doc2(1)._4)
    // doc 1: tf=2 "beta" (df=2) outscores tf=1 "alpha" (df=4)
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.head._3 === "beta")
  }

  test("x28 vocabulary: global tf/df ranks the corpus-dominant term first") {
    val rows = TextAnalysis
      .queries("x28_vocab_top_terms")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.head === (("alpha", 6L, 4L))) // 6 occurrences across all 4 docs
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-(_: Long)).toSeq)
  }

  test("x29 kNN classify: parallel cluster wins the vote") {
    val rows = Similarity
      .queries("x29_knn_classify")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q0 = rows.find(_._1 == 0L).get
    assert(q0._2 === 7L && q0._3 === 7L, "query 0 should be voted into the +x cluster")
    assert(q0._4 >= 2L)
    val q3 = rows.find(_._1 == 3L).get
    assert(q3._3 === 7L, "lone +y vector is outvoted by the +x cluster") // honest kNN failure mode
  }

  test("x30 quantization: codes bounded, max component exact, error within half-step") {
    val rows = Similarity
      .queries("x30_embedding_quantize")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === 500)
    rows.foreach { case (id, nDims, scaleE9, sumCode, maxErrE9) =>
      assert(nDims === 64L)
      assert(math.abs(sumCode) <= 127L * nDims, s"vec $id code sum out of int8 range")
      // quantization error is at most half a step = scale / 254 (+1 for the e9 rounding)
      assert(maxErrE9 <= scaleE9 / 254 + 1, s"vec $id err $maxErrE9 vs bound ${scaleE9 / 254}")
    }
  }

  test("x31 span stats: planted shared 5-gram span is attributed to both docs") {
    val d = TestSpark.tempDir()
    val docs = Seq(
      (0L, "one two three four five six", "en", "s", 27L), // grams: {12345, 23456}
      (1L, "zz one two three four five", "en", "s", 26L), // shares "one two three four five"
      (2L, "aa bb cc dd ee ff", "en", "s", 17L) // disjoint
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val rows = Dedup
      .queries("x31_span_stats")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq((0L, 2L, 1L, 500000L), (1L, 2L, 1L, 500000L), (2L, 2L, 0L, 0L)))
  }

  test("x32 keyword search: integer tf-idf retrieval returns a full ranked page") {
    val rows = TextAnalysis
      .queries("x32_keyword_search")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 10)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-(_: Long)).toSeq, "scores not descending")
    assert(rows.forall(r => r._2 > 0 && r._3 >= 1 && r._3 <= 3))
  }

  test("x36 winnowing: window-min matches brute force; shared substrings share fingerprints") {
    import org.apache.spark.sql.functions.col
    // brute-force reference on one string
    val s = "the quick brown fox jumps"
    def md5win(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
      (d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))) >>> 4
    }
    val grams = (0 to s.length - 4).map(i => md5win(s.substring(i, i + 4)))
    val expected = grams.sliding(5).map(_.min).toSet.toSeq.sorted
    val got = Seq((s, 1)).toDF("t", "i")
      .select(graft.functions.WinnowFingerprints(col("t"), 4, 5))
      .head().getSeq[Long](0)
    assert(got === expected)
    // guarantee: ≥8-char shared substring ⇒ ≥1 shared fingerprint
    val shared = "zzqjxvkw" // 8 chars, appears in both
    val a = Seq((s"aaa $shared bbb", 1)).toDF("t", "i")
      .select(graft.functions.WinnowFingerprints(col("t"), 4, 5)).head().getSeq[Long](0).toSet
    val b = Seq((s"ccc ddd $shared", 1)).toDF("t", "i")
      .select(graft.functions.WinnowFingerprints(col("t"), 4, 5)).head().getSeq[Long](0).toSet
    assert(a.intersect(b).nonEmpty, "winnowing guarantee violated")
    // below the w+n−1 threshold → empty fingerprint set
    val short = Seq(("1234567", 1)).toDF("t", "i")
      .select(graft.functions.WinnowFingerprints(col("t"), 4, 5)).head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("x38 chunking: 64-token windows with exact boundaries and content digests") {
    val d = TestSpark.tempDir()
    val words130 = (1 to 130).map(i => s"w$i")
    val docs = Seq((0L, words130.mkString(" "), "en", "s", 1L), (1L, "tiny doc", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val rows = TextAnalysis
      .queries("x38_doc_chunks")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val doc0 = rows.filter(_._1 == 0L)
    assert(doc0.map(c => (c._2, c._3)).toSeq === Seq((0L, 64L), (1L, 64L), (2L, 2L)))
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(doc0(0)._4 === md5hex(words130.take(64).mkString(" ")))
    assert(doc0(2)._4 === md5hex(words130.drop(128).mkString(" ")))
    assert(rows.filter(_._1 == 1L).map(c => (c._2, c._3)).toSeq === Seq((0L, 2L)))
  }

  test("x43 stratified sample: exact floor quotas per stratum, deterministic hash fill") {
    val rows = Sampling
      .queries("x43_stratified_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val langCounts = graft.Graft
      .table(spark, sf, "documents")
      .groupBy("lang")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val n = langCounts.values.sum
    val byLang = rows.groupBy(_._1)
    for ((lang, nG) <- langCounts) {
      val quota = nG * 200L / n
      val got = byLang.getOrElse(lang, Array.empty)
      assert(got.length.toLong === quota, s"$lang expected $quota got ${got.length}")
      assert(got.map(_._2).sorted.toSeq === (1L to quota), s"$lang ranks not 1..quota")
      assert(got.forall(t => t._4 === nG && t._5 === quota))
    }
    // pure function of (doc_id, stratum counts): second run is identical
    val again = Sampling
      .queries("x43_stratified_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq === rows.toSeq)
  }

  test("x42 bigram coherence: corpus-common transitions outscore novel ones, exact ppm") {
    val d = TestSpark.tempDir()
    // 10 identical docs "alpha beta gamma delta"; doc 10 mixes novel words.
    // Corpus prefix counts: alpha→11 (10×alpha-beta + 1×alpha-zeta),
    // beta→11, gamma→10, zeta→1. Docs 0-9: transitions 10/11, 10/11, 10/10
    // → ppm 909090, 909090, 1000000 → floor-mean 939393. Doc 10:
    // 1/11, 1/1, 1/11 → ppm 90909, 1000000, 90909 → floor-mean 393939.
    val docs = ((0 until 10).map(i => (i.toLong, "alpha beta gamma delta", "en", "s", 1L)) :+
      ((10L, "alpha zeta beta eta", "en", "s", 1L))).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val rows = TextAnalysis
      .queries("x42_bigram_coherence")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (i <- 0L until 10L) assert(rows(i) === ((3L, (909090L + 909090L + 1000000L) / 3)), s"doc $i")
    assert(rows(10L) === ((3L, (90909L + 1000000L + 90909L) / 3)))
    assert(rows(10L)._2 < rows(0L)._2, "novel transitions must lower the score")
  }

  test("x175 Kneser-Ney: hand-computed discount, continuation back-off on unseen probe cells") {
    val d = TestSpark.tempDir()
    // bigram counts: (a,b)=4 (a,c)=2 (d,c)=1 (d,d)=1 → B=4 types;
    // c1: a=6 (2 continuations), d=2 (2); ncw2: b=1, c=2, d=1.
    // p_e6 = ⌊(max(4c12−3,0)·B + 3·n1w1·ncw2)·1e6 / (4·c1·B)⌋
    val docs = ((0 until 4).map(i => (i.toLong, "a b", "en", "s", 1L)) ++
      Seq((4L, "a c", "en", "s", 1L), (5L, "a c", "en", "s", 1L),
        (6L, "d c", "en", "s", 1L), (7L, "d d", "en", "s", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val rows = TextAnalysis
      .queries("x175_kneser_ney")(spark, d)
      .collect()
      .map(r =>
        (r.getAs[Long]("probe"), r.getAs[String]("w1"), r.getAs[String]("w2")) ->
          ((r.getAs[Long]("cnt2"), r.getAs[Long]("pkn_e6"), r.getAs[Long]("pmle_e6")))
      )
      .toMap
    // top block: all 4 bigram types; probe grid: {a,d} × {b,d,c} = 6 cells
    assert(rows.size === 10)
    assert(rows((0L, "a", "b")) === ((4L, 604166L, 666666L))) // (13·4+6)e6/96
    assert(rows((0L, "a", "c")) === ((2L, 333333L, 333333L))) // (5·4+12)e6/96
    assert(rows((1L, "a", "d")) === ((0L, 62500L, 0L))) // unseen: pure continuation 6e6/96
    assert(rows((1L, "d", "b")) === ((0L, 187500L, 0L))) // unseen: 6e6/32
    assert(rows((1L, "d", "c")) === ((1L, 500000L, 500000L))) // (4+12)e6/32
    assert(rows((1L, "d", "d")) === ((1L, 312500L, 500000L))) // (4+6)e6/32
    // the KN estimate strictly beats MLE's zero on every unseen cell
    rows.collect { case ((1L, _, _), (0L, pkn, pmle)) =>
      assert(pkn > 0L && pmle === 0L, "unseen cell must carry continuation mass")
    }
  }

  test("x185 phrase search: adjacency, order-sensitivity, repeat matches, cross-doc counts") {
    val d = TestSpark.tempDir()
    val docs = Seq(
      // two "hash agg" occurrences (positions 0 and 2), "sort key" absent
      (0L, "hash agg hash agg x", "en", "s", 1L),
      // reversed order must NOT match; "table value part" spans 3 words
      (1L, "agg hash table value part key sort", "en", "s", 1L),
      // "sort key" at position 5 after filler
      (2L, "a b c d e sort key", "en", "s", 1L),
      // words present but never adjacent
      (3L, "hash x agg table x value x part", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val got = TextAnalysis
      .queries("x185_phrase_search")(spark, d)
      .collect()
      .map(r =>
        (r.getAs[String]("phrase"), r.getAs[Long]("doc_id")) ->
          ((r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"), r.getAs[Long]("n_docs"))))
      .toMap
    assert(got.size === 3)
    assert(got(("hash agg", 0L)) === ((2L, 0L, 1L)))
    assert(got(("table value part", 1L)) === ((1L, 2L, 1L)))
    assert(got(("sort key", 2L)) === ((1L, 5L, 1L)))
    // doc 3 (non-adjacent terms) and doc 1's reversed bigram match nothing
    assert(!got.keys.exists(_._2 == 3L))
    assert(!got.contains(("hash agg", 1L)))
  }

  test("x186 Zipf fit: halving census matches the exact integer replay; planted power law recovers -2") {
    val d = TestSpark.tempDir()
    // one doc whose census is exactly geometric: word w_k appears 2^(8-k)
    // times, k = 0..7 -> rank r = k+1, tf = 2^(8-k); on the quantized
    // plane y = 8-k and x = floor(log2 r): an EXACT slope is computable
    val text = (0 until 8).flatMap(k => Seq.fill(1 << (8 - k))(s"w$k")).mkString(" ")
    TestSpark.writeTable(
      d, "documents", Seq((0L, text, "en", "s", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = TextAnalysis
      .queries("x186_zipf_fit")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("test_id") -> r)
      .toMap
    val t0 = rows(0L)
    // replay: ranks 1..8, x = floor(log2 r) = (0,1,1,2,2,2,2,3), y = 8-k
    val pts = (0 until 8).map(k => ((63 - java.lang.Long.numberOfLeadingZeros(k + 1L)).toLong, (8 - k).toLong))
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxx, sxy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._1 * p._2).sum)
    val num = (n * sxy - sx * sy) * 1000000L
    val den = n * sxx - sx * sx
    val slope = (num - (((num % den) + den) % den)) / den
    assert(t0.getAs[Long]("n_fit") === 8L)
    assert(t0.getAs[Long]("slope_e6") === slope)
    // geometric decay (tf halves per RANK) is steeper on the log-log
    // plane than any Zipf law: the quantized OLS must land well below -1
    assert(slope < -2000000L, s"geometric census slope was $slope")
    // the planted inverse-uniform stream recovers exponent ~2 on the
    // real fixture (checked there because this tiny doc's stream is small)
    val real = TextAnalysis
      .queries("x186_zipf_fit")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getAs[Long]("test_id") -> r.getAs[Long]("slope_e6"))
      .toMap
    assert(real(1L) < -1700000L && real(1L) > -2300000L, s"planted Zipf slope ${real(1L)}")
    assert(real(0L) > -500000L, s"near-uniform corpus slope ${real(0L)} should be shallow")
  }

  test("x192 delta pack: block geometry (min/width/bytes) exact against hand arithmetic; roundtrip holds") {
    val d = TestSpark.tempDir()
    // 40 rows on ONE date (width 0) + 30 rows alternating two adjacent
    // dates (width 1): two regimes inside one block
    val rows = (0 until 40).map(i => (java.sql.Date.valueOf("1995-03-10"), i.toLong, 1)) ++
      (0 until 30).map(i =>
        (java.sql.Date.valueOf(if (i % 2 == 0) "1996-07-01" else "1996-07-02"), (100 + i).toLong, 1))
    TestSpark.writeTable(
      d, "lineitem",
      rows.toDF("l_shipdate", "l_orderkey", "l_linenumber"))
    val got = Sampling.queries("x192_delta_pack")(spark, d).collect()
    assert(got.length === 1) // 70 values, one block
    val r = got.head
    assert(r.getAs[Long]("n_vals") === 70L)
    assert(r.getAs[Boolean]("roundtrip_ok"))
    // sorted values: 40 x day(1995-03-10), then 15+15 of two adjacent days
    val d1 = 9199L // 1995-03-10 as epoch day
    assert(r.getAs[Long]("min_v") === d1)
    // range spans 1995-03-10 .. 1996-07-02 = 480 days -> 9 bits
    assert(r.getAs[Long]("width_bits") === 9L)
    assert(r.getAs[Long]("packed_bytes") === (70L * 9L + 7L) / 8L)
    // independent checksum: positions 1..40 at d1, then the two 1996 days
    val d2 = java.time.LocalDate.of(1996, 7, 1).toEpochDay
    val sorted = Seq.fill(40)(d1) ++ Seq.fill(15)(d2) ++ Seq.fill(15)(d2 + 1)
    val ck = sorted.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum
    assert(r.getAs[Long]("decoded_checksum") === ck)
  }

  test("x196 KN perplexity: all four scoring paths hit with hand-checked surprisal arithmetic") {
    val d = TestSpark.tempDir()
    // train (doc 0) "a b a b a": c2 = {(a,b): 2, (b,a): 2}, B = 2,
    // c1(a) = c1(b) = 2, n1w1 = 1 each, ncw2(a) = ncw2(b) = 1.
    // Eval (doc 1) "a b c" + the appended plant " qq7 qq8 qq7 the":
    // (a,b) seen; (b,c) seen ctx + unseen pair = backoff (w2 'c' also
    // unseen as continuation -> discount-only mass -> floor p = 1);
    // the four plant bigrams have unseen contexts AND w2s that are not
    // train continuations ('the' never occurs in train) -> 'unseen'.
    val docs = Seq(
      (0L, "a b a b a", "en", "s", 9L),
      (1L, "a b c", "en", "s", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val r = TextAnalysis.queries("x196_kn_perplexity")(spark, d).collect().head
    assert(r.getAs[String]("lang") === "en")
    assert(r.getAs[Long]("n_bigrams") === 6L)
    // p(a,b) = (max(8-3,0)*2 + 3*1*1)*1e6 / (4*2*2) = 13e6/16 = 812500
    // bits = len(bin(1000000 div 812500)) - 1 = len(bin(1)) - 1 = 0
    // (b,c): c seen? ncw2(c) null -> discount-only: (max(0-3,0)*2+3*1*0)/.. = 0 -> floor 1 -> bits 19
    // (c,qq7),(qq7,qq8),(qq8,qq7),(qq7,the): unseen ctx; w2 the/qq* not
    // train continuations -> 'unseen', p=1, bits 19
    assert(r.getAs[Long]("n_seen") === 1L)
    assert(r.getAs[Long]("n_backoff") === 1L) // (b,c): seen ctx, unseen pair
    assert(r.getAs[Long]("n_cont_only") === 0L)
    assert(r.getAs[Long]("n_unseen") === 4L)
    assert(r.getAs[Long]("total_bits") === 0L + 19L + 4L * 19L)
  }

  test("x48 label centroids: integer mean per (label, dim) matches hand arithmetic") {
    val rows = Similarity
      .queries("x48_label_centroids")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // fixture: label 7 = vecs (1,0),(2,0.1),(3,0.05); label 3 = (0,1)
    assert(rows((7L, 0L)) === ((3L, (1000000L + 2000000L + 3000000L) / 3)))
    assert(rows((7L, 1L)) === ((3L, (0L + 100000L + 50000L) / 3)))
    assert(rows((3L, 0L)) === ((1L, 0L)))
    assert(rows((3L, 1L)) === ((1L, 1000000L)))
    assert(rows.size === 4)
  }

  test("x53 sequence packing: offsets are a permutation prefix sum; splits exactly at cut boundaries") {
    // independent recompute: hash-order the sf docs in plain Scala, lay the
    // token stream end-to-end, and derive every offset/seq/split from first
    // principles — then require the distributed two-phase prefix sum to
    // agree row for row.
    def md5win(s: String): Long = {
      val hex = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.Graft
      .table(spark, sf, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").trim.toLowerCase.split("\\s+").length.toLong)
    val ordered = docs.sortBy { case (id, _) => (md5win(id.toString), id) }
    var cum = 0L
    val expected = ordered.map { case (id, n) =>
      val off = cum; cum += n
      id -> ((n, off, off / 512, (off + n - 1) / 512))
    }.toMap
    val got = Sampling
      .queries("x53_sequence_pack")(spark, sf)
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("offset"), r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last")))
      )
      .toMap
    assert(got === expected)
    // the packing must be gapless: total tokens == final cum, and every
    // sequence id in [0, last] is touched by at least one doc
    val touched = got.values.flatMap(v => v._3 to v._4).toSet
    assert(touched === (0L to (cum - 1) / 512).toSet)
  }

  test("x56 vocab coverage: dominant terms are in-vocab, unique terms are OOV") {
    // fixture (dir): "alpha" appears in all 4 docs (top of vocab, 50-term
    // vocab covers every fixture term except none — so plant an OOV check
    // against the sf corpus instead, where 50 < |vocab|)
    val cov = TextAnalysis
      .queries("x56_vocab_coverage")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("coverage_ppm"))
      .toMap
    assert(cov.size === 500)
    // the sf corpus has far more than 50 distinct terms, so coverage must
    // be strictly between 0 and 1 somewhere (the metric discriminates)
    assert(cov.values.exists(v => v > 0L && v < 1000000L))
    assert(cov.values.forall(v => v >= 0L && v <= 1000000L))
  }

  test("x59 temperature mixing flattens the domain distribution and respects supply") {
    val rows = Sampling.queries("x59_temperature_mix")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val totalTarget = rows.map(_.getAs[Long]("target")).sum
    // floor divisions can only lose mass: Σ targets ≤ the 300 budget
    assert(totalTarget <= 300L && totalTarget > 0L)
    rows.foreach { r =>
      val (n, w, t, sel) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("w"), r.getAs[Long]("target"), r.getAs[Long]("n_selected"))
      assert(w === math.floor(math.sqrt(n.toDouble)).toLong)
      assert(sel === math.min(t, n), s"${r.getAs[String]("source")}: selected=$sel target=$t supply=$n")
    }
    // α=0.5 flattening: the smallest domain's sampled FRACTION of its
    // supply is at least the largest domain's (upsample small, cap big)
    val smallest = rows.minBy(_.getAs[Long]("n_docs"))
    val largest = rows.maxBy(_.getAs[Long]("n_docs"))
    if (smallest.getAs[Long]("n_docs") < largest.getAs[Long]("n_docs")) {
      val fSmall = smallest.getAs[Long]("target").toDouble / smallest.getAs[Long]("n_docs")
      val fLarge = largest.getAs[Long]("target").toDouble / largest.getAs[Long]("n_docs")
      assert(fSmall >= fLarge, s"temperature failed to flatten: $fSmall < $fLarge (totalDocs=$totalDocs)")
    }
  }

  test("x62 winsorize: closed-form fences and clamped sum on a planted distribution") {
    import spark.implicits._
    val tmp = graft.TestSpark.tempDir()
    // lang 'aa': token counts 10..30 (21 docs). quantile_cont indices:
    // p05 → 0.05·20 = 1.0 → exactly the value 11; p95 → 19.0 → 29.
    val docs = (0 until 21).map { i =>
      val n = 10 + i
      (i.toLong, ("w " * n).trim, "aa", "s", n.toLong)
    }
    graft.TestSpark.writeTable(tmp, "documents", docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Sampling.queries("x62_winsorize")(spark, tmp).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") === 21L)
    assert(row.getAs[Long]("p05_e3") === 11000L)
    assert(row.getAs[Long]("p95_e3") === 29000L)
    assert(row.getAs[Long]("n_low") === 1L) // the 10-token doc
    assert(row.getAs[Long]("n_high") === 1L) // the 30-token doc
    // winsorized: 11 + (11..29 intact) + 29 = 420
    assert(row.getAs[Long]("winsorized_sum_e3") === 420000L)
  }

  test("x64 epoch upsampling: emitted mass equals the target exactly, repetitions near-uniform") {
    val rows = Sampling.queries("x64_epoch_upsample")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, t, emitted, maxRep) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("target"), r.getAs[Long]("n_emitted"), r.getAs[Long]("max_rep"))
      assert(emitted === t, s"${r.getAs[String]("source")}: emitted $emitted != target $t")
      // repetition schedule is floor(t/n) or floor(t/n)+1 — max is the ceiling
      assert(maxRep === (t + n - 1) / n, s"${r.getAs[String]("source")} max_rep")
    }
  }

  test("x87 shard shuffle: contiguous gap-free rank slices of one deterministic permutation") {
    val rows = Sampling
      .queries("x87_shard_shuffle")(spark, sf)
      .collect()
      .map(r =>
        (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[Long]("first_rank"), r.getAs[Long]("last_rank"))
      )
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    // shards are consecutive ids, full except possibly the last
    assert(rows.map(_._1).toSeq === rows.indices.map(_.toLong))
    rows.init.foreach { case (sh, n, _, _) => assert(n === 50L, s"shard $sh not full") }
    // rank intervals tile [1, total] exactly: contiguous, gap-free, no overlap
    rows.foreach { case (sh, n, lo, hi) =>
      assert(lo === sh * 50 + 1, s"shard $sh first_rank")
      assert(hi === lo + n - 1, s"shard $sh interval width")
    }
    assert(rows.last._4 === total)
    // deterministic: a second run reproduces the permutation exactly
    val again = Sampling
      .queries("x87_shard_shuffle")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("digest")))
    assert(again.toSeq === Sampling.queries("x87_shard_shuffle")(spark, sf).collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("digest"))).toSeq)
  }

  test("x92 data card: internal identities hold (mass balance, order statistics)") {
    val m = Sampling
      .queries("x92_data_card")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value"))
      .toMap
    assert(m.keySet.size === 8)
    assert(m("n_docs") > 0 && m("n_tokens_total") > 0)
    // mean·n_docs ≈ total (e3 rounding slack bounded by n_docs/2)
    assert(math.abs(m("mean_tokens_e3") * m("n_docs") - m("n_tokens_total") * 1000L) <= m("n_docs") * 500L)
    assert(m("min_tokens") * 1000 <= m("p50_tokens_e3") && m("p50_tokens_e3") <= m("max_tokens") * 1000)
    assert(m("n_langs") >= 1 && m("n_sources") >= 1)
  }

  test("plan discipline: x30 is a single scan (no exchange), x24 aggregates partially") {
    val p30 = Similarity.queries("x30_embedding_quantize")(spark, sf).queryExecution.executedPlan.toString
    // sort for the output ORDER BY is the only allowed exchange
    assert(!p30.contains("hashpartitioning"), "x30 shuffled a per-row pipeline")
    val p24 = Sampling.queries("x24_hash_split")(spark, sf).queryExecution.executedPlan.toString
    assert(p24.contains("partial"), "x24 missing map-side partial aggregation")
  }
}
