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

  test("x67 span decontamination: exact benchmark spans removed, rest kept verbatim") {
    val d = TestSpark.tempDir()
    val benchGram = "alpha bravo charlie delta echo" // the contaminating 5-gram
    val docs = Seq(
      (0L, s"benchmark question says $benchGram end", "en", "t", 10L), // 0 % 50 == 0 → benchmark set
      (1L, s"clean prefix words here $benchGram clean suffix tail words", "en", "t", 10L),
      (2L, "totally unrelated content with no benchmark overlap at all", "en", "t", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val out = Dedup
      .queries("x67_span_decontaminate")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out.keySet === Set(1L, 2L), "benchmark docs are not scored")
    // doc 1: 13 words; the 5-gram starts at pos 4 → coverage marks 4..8
    assert(out(1L).getAs[Long]("n_words") === 13L)
    assert(out(1L).getAs[Long]("n_removed") === 5L)
    val expectClean = org.apache.commons.codec.digest.DigestUtils
      .md5Hex("clean prefix words here clean suffix tail words")
    assert(out(1L).getAs[String]("clean_md5") === expectClean)
    // doc 2: untouched, clean_md5 = digest of the full normalized text
    assert(out(2L).getAs[Long]("n_removed") === 0L)
    assert(
      out(2L).getAs[String]("clean_md5") ===
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex("totally unrelated content with no benchmark overlap at all")
    )
  }

  test("x69 incremental dedup: exact_dup > near_dup > unique verdicts against the corpus") {
    val d = TestSpark.tempDir()
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val reorder = (1 to 60).reverse.map(i => s"tok$i").mkString(" ") // bag-equal → simhash hamming 0
    val docs = Seq(
      (0L, base, "en", "t", 1L), // 0 % 3 == 0 → corpus
      (1L, base, "en", "t", 1L), // shard: exact clone of corpus doc
      (2L, reorder, "en", "t", 1L), // shard: near-dup (reorder, different md5)
      (4L, (1 to 60).map(i => s"zzz$i").mkString(" "), "en", "t", 1L) // shard: unique
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val out = Dedup
      .queries("x69_incremental_dedup")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("verdict"), r.getAs[Long]("min_hamming")))
      .toMap
    assert(out.keySet === Set(1L, 2L, 4L), "only shard docs are scored")
    assert(out(1L)._1 === "exact_dup")
    assert(out(2L) === (("near_dup", 0L))) // order-invariant signature: hamming 0, not exact
    assert(out(4L) === (("unique", -1L)))
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

  test("hot-shingle df cap bounds the inverted-index join and keeps true pairs") {
    // 120 docs all sharing one stop-phrase 3-gram ("as noted above") — an
    // uncapped self-join would produce 120·119/2 = 7140 rows for that key
    // alone; with df > DfCap the shingle is dropped pre-join. Two planted
    // near-dups must still pair via their informative shingles.
    val d = TestSpark.tempDir()
    val stop = "as noted above"
    val filler = (0 until 116).map(k => (100L + k, s"$stop doc$k word${k}a word${k}b word${k}c word${k}d", "en", "t", 1L))
    val docs = (Seq(
      (0L, s"$stop the quick brown fox jumps over the lazy dog tonight", "en", "t", 1L),
      (1L, s"$stop the quick brown fox jumps over the lazy dog tomorrow", "en", "t", 1L),
      (2L, s"$stop an unrelated treatise on distributed query planning", "en", "t", 1L),
      (3L, s"$stop an unrelated treatise on distributed query planning", "en", "t", 1L)
    ) ++ filler).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    assert(docs.count() === 120)
    val pairs = Dedup
      .queries("x02_dedup_ngram_jaccard")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    assert(pairs.contains((0L, 1L))) // near-dups survive the cap
    assert(pairs.contains((2L, 3L))) // exact dups survive the cap
    // the hot shingle alone may never pair documents: filler docs share ONLY
    // stop-phrase shingles with each other → no filler-filler pairs at all
    assert(!pairs.exists { case (a, b) => a >= 100L && b >= 100L })
    // and the join itself stayed bounded: count the post-cap candidate rows
    // (every surviving shingle key contributes ≤ DfCap² rows, and the hot
    // key contributes none)
    val sh = docs
      .select($"doc_id", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "transform(sequence(0, size(split(lower(trim(text)), '\\\\s+')) - 3), " +
            "i -> concat_ws(' ', slice(split(lower(trim(text)), '\\\\s+'), i + 1, 3)))")).as("sh"))
      .distinct()
    val dfCounts = sh.groupBy("sh").count()
    val hotDf = dfCounts.orderBy($"count".desc).head().getLong(1)
    assert(hotDf > Dedup.DfCap) // the fixture really does contain a hot key
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

  test("resolution-first pipeline: exact clones collapse before near-dup, sizes carried") {
    // near-dup = token REORDER: simhash is bag-of-tokens (order-invariant,
    // hamming 0) while the exact md5 differs — a true near-dup, not a clone
    val d = TestSpark.tempDir()
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).reverse.map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "t", 1L),
      (1L, near, "en", "t", 1L), // near-dup of 0
      (2L, base, "en", "t", 1L), // exact clone of 0 → must collapse
      (3L, (1 to 60).map(i => s"zzz$i").mkString(" "), "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val rows = Dedup
      .queries("x20_dedup_pipeline")(spark, d)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming"),
          r.getAs[Long]("size_a"), r.getAs[Long]("size_b"))
      )
    // doc 2 (exact clone of 0) must be collapsed into survivor 0 — it can
    // never appear as a pair member; the 0↔1 near-dup survives with doc 0
    // carrying its clone-group size of 2
    assert(!rows.exists(r => r._1 == 2L || r._2 == 2L))
    val nd = rows.find(r => r._1 == 0L && r._2 == 1L)
    assert(nd.nonEmpty, s"expected (0,1) near-dup pair in ${rows.toSeq}")
    assert(nd.get._4 === 2L && nd.get._5 === 1L)
  }

  test("char_gram_hashes == declarative shingle pipeline on real data, and codegen'd") {
    import org.apache.spark.sql.functions._
    val docs = graft.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val t = docs
      .select($"doc_id", regexp_replace(lower(trim($"text")), "\\s+", " ").as("t"))
      .where(length($"t") >= 4)
    val native = t.select($"doc_id", explode(graft.functions.CharGramHashes($"t", 4)).as("h"))
    val decl = t
      .select($"doc_id", explode(expr("transform(sequence(1, length(t) - 3), i -> substr(t, i, 4))")).as("sh"))
      .distinct()
      .select($"doc_id", conv(substring(md5($"sh"), 1, 15), 16, 10).cast("long").as("h"))
    assert(native.exceptAll(decl).count() === 0 && decl.exceptAll(native).count() === 0)
    val agg = native.groupBy("doc_id").agg(min("h").as("m"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("char_gram_hashes")))
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

  test("connected components: transitive chains collapse, needs >1 propagation round") {
    import spark.implicits._
    // path 1-2-3-4-5 (diameter 4 → several label-propagation rounds),
    // separate pair 10-11, separate triangle 20-21-22
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("doc_a", "doc_b")
    val cc = Dedup
      .connectedComponents(pairs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert((1L to 5L).forall(cc(_) === 1L), "chain must collapse to min label 1")
    assert(cc(10L) === 10L && cc(11L) === 10L)
    assert(Seq(20L, 21L, 22L).forall(cc(_) === 20L))
    assert(cc.size === 10)
  }

  test("connected components: checkpoint blocks from earlier rounds are released") {
    import spark.implicits._
    // a diameter-15 path forces many propagation rounds; storage must stay
    // O(1) in rounds (only the live round's checkpoint + edges may remain)
    val before = spark.sparkContext.getPersistentRDDs.size
    val path = (1L until 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(path).collect()
    assert(cc.length === 16 && cc.forall(_.getAs[Long]("cluster_id") === 1L))
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2, s"leaked checkpoint blocks: $before -> $after persistent RDDs")
  }

  test("x40 resolution: one survivor per near-dup family plus all unclustered docs") {
    // docs 0/1/2 form one component (0~1 near-dup, 0~2 exact) → survivor 0;
    // doc 3 never pairs → survives untouched. 2 'en' survivors total.
    val rows = Dedup
      .queries("x40_dedup_resolve")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(rows === Map("en" -> 2L))
  }

  test("connected components property: random graphs match reference union-find") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val edgeGen = Gen.listOfN(
      25,
      for { a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L) if a != b } yield (math.min(a, b), math.max(a, b))
    )
    (1 to 5).foreach { seed =>
      val edges = edgeGen.pureApply(Gen.Parameters.default, Seed(seed.toLong)).distinct
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
      edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
      val got = Dedup
        .connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
        .toMap
      assert(got === expected, s"seed $seed, edges $edges")
    }
  }

  test("x54 containment catches a fully-quoted subset that Jaccard misses") {
    val d = TestSpark.tempDir()
    val quote = "the storm gathered over the eastern ridge tonight" // 8 words → 6 shingles
    val filler = (1 to 30).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (0L, quote, "en", "t", 1L), // fully contained in doc 1
      (1L, s"$quote $filler", "en", "t", 1L),
      (2L, "entirely unrelated content about parquet row groups and codecs", "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    val cont = Dedup
      .queries("x54_containment")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> ((r.getAs[Long]("cont_a_ppm"), r.getAs[Long]("cont_b_ppm"))))
      .toMap
    // doc 0's 6 shingles all occur in doc 1 (and "tonight filler1" bridging
    // grams belong to doc 1 only) → containment(a) = 1e6 exactly
    assert(cont((0L, 1L))._1 === 1000000L)
    assert(cont((0L, 1L))._2 < 800000L)
    assert(!cont.contains((0L, 2L)) && !cont.contains((1L, 2L)))
    // the same pair is BELOW x02's jaccard threshold — asymmetry is the point
    val jac = Dedup.queries("x02_dedup_ngram_jaccard")(spark, d).collect()
    assert(!jac.exists(r => r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 1L))
  }

  test("x52 span dedup drops exactly the cross-document duplicated spans") {
    val d = TestSpark.tempDir()
    val shared = "the big dog runs very fast" // 6 words → 2 dup gram starts per doc
    val docs = Seq(
      (0L, s"alpha beta $shared gamma delta", "en", "t", 1L), // covered positions 2-7
      (1L, s"$shared zeta eta theta", "en", "t", 1L), // covered positions 0-5
      (2L, "completely unique words that never repeat anywhere else at all", "en", "t", 1L),
      (3L, "tiny doc here", "en", "t", 1L) // < 5 words: no grams at all
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Dedup
      .queries("x52_span_dedup")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_words"), r.getAs[Long]("n_dropped"), r.getAs[String]("survivors_md5"))))
      .toMap
    assert(got(0L) === ((10L, 6L, md5hex("alpha beta gamma delta"))))
    assert(got(1L) === ((9L, 6L, md5hex("zeta eta theta"))))
    assert(got(2L) === ((10L, 0L, md5hex("completely unique words that never repeat anywhere else at all"))))
    assert(got(3L) === ((3L, 0L, md5hex("tiny doc here"))))
  }
}
