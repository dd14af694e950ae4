package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.{col, lower, size, split, trim}
import org.scalatest.funsuite.AnyFunSuite

class SimilarityTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tempDir()
    // vec 1 ∥ vec 0 (cos=1), vec 2 ⟂ vec 0, vec 3 anti-parallel
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    TestSpark.writeTable(d, "embeddings", embs)
    val docs = Seq(
      (0L, "the cat and the hat", "en", "t", 19L),
      (1L, "der hund und die katze ist da", "de", "t", 29L),
      (2L, "xyzzy plugh", "zz", "t", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    TestSpark.writeTable(d, "documents", docs)
    d
  }

  test("brute-force cosine ranks parallel > angled > orthogonal > anti") {
    val rows = Similarity
      .queries("x05_sim_cosine_topk")(spark, dir)
      .where("qid = 0")
      .collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("nid"), r.getAs[Long]("cos_e6")))
    assert(rows.map(_._2).toSeq === Seq(1L, 4L, 2L, 3L))
    assert(rows.head._3 === 1000000L)
    assert(rows(2)._3 === 0L)
    assert(rows(3)._3 === -1000000L)
  }

  test("band signatures use components beyond index 255 (ADVICE r02: no silent dim cap)") {
    // only component 290 is nonzero: under the old 256-dim truncation every
    // projection would be 0 → all band buckets 0 for both vectors
    val big = Seq(
      (0L, Array.tabulate(384)(i => if (i == 290) 1.0f else 0.0f), 0),
      (1L, Array.tabulate(384)(i => if (i == 290) -1.0f else 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val sigs = big
      .select(graft.functions.BandSigs($"embedding", 32, 4).as("sigs"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Long]]("sigs"))
    assert(sigs.forall(_.length === 8))
    // opposite vectors flip every projection sign → complementary buckets,
    // and at least one bucket per vector must be nonzero
    assert(sigs.exists(_.exists(_ != 0L)), "all buckets zero — tail components ignored")
    assert(sigs(0).zip(sigs(1)).forall { case (a, b) => (a & b) == 0L }, "opposite vectors share set bits")
  }

  test("LSH ANN returns plausible neighbors (parallel vectors same bucket)") {
    val rows = Similarity
      .queries("x06_sim_ann_lsh")(spark, dir)
      .where("qid = 0")
      .collect()
      .map(r => r.getAs[Long]("nid"))
    // identical-direction vector must collide with its twin in every band
    assert(rows.contains(1L))
  }

  test("x12/x16 near-dup: LSH sound + pruned plans + measured recall floor") {
    val emb = graft.Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val lsh = Similarity.nearDupLsh(spark, emb, 0.4)
    val exact = Similarity.nearDupExact(spark, emb, 0.4)
    // neither face may fall back to an all-pairs physical join
    for (df <- Seq(lsh, exact)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in plan")
      assert(!plan.contains("CartesianProduct"), "cartesian product in plan")
    }
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (l, e) = (pairs(lsh), pairs(exact))
    assert(l.subsetOf(e)) // exact in-bucket verification → precision 1
    val recall = l.size.toDouble / e.size
    // τ=0.4 (per-plane agreement ≈0.63) is far below LSH's effective regime:
    // theory predicts ~50% recall with 4 bands × 4 rows. Assert the measured
    // floor honestly instead of pretending banding is lossless here; the
    // planted-pair test below shows recall 1 in the τ≥0.9 regime the
    // operator actually targets.
    assert(recall >= 0.4, s"recall $recall of ${e.size} exact pairs")
  }

  test("planted near-dups at τ=0.9: LSH = exact, recall 1 in the effective regime") {
    val dims = 64
    // seeded gaussians: deterministic (Java LCG spec) and actually random —
    // base↔base cosines stay ~N(0, 1/64), far from the 0.9 threshold
    def base(k: Int) = {
      val rng = new java.util.Random(k * 7919L + 17)
      Array.fill(dims)(rng.nextGaussian().toFloat)
    }
    def noisy(k: Int) = {
      val rng = new java.util.Random(k * 104729L + 31)
      base(k).map(v => v + 0.02f * rng.nextGaussian().toFloat)
    }
    val rows = (0 until 30).map(k => (k.toLong, base(k), 0)) ++
      (0 until 30).map(k => (100L + k, noisy(k), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = pairs(Similarity.nearDupLsh(spark, emb, 0.9))
    val e = pairs(Similarity.nearDupExact(spark, emb, 0.9))
    assert((0 until 30).forall(k => e.contains((k.toLong, 100L + k)))) // ground truth sanity
    assert(l === e)
  }

  test("ANN recall@5 floors vs brute force: LSH ≥ 0.6, IVF ≥ 0.8") {
    val d = "/root/testdata/sf0.001"
    def nbrs(name: String): Set[(Long, Long)] = Similarity
      .queries(name)(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .toSet
    val exact = nbrs("x05_sim_cosine_topk")
    val lshRecall = (nbrs("x06_sim_ann_lsh") & exact).size.toDouble / exact.size
    // x13's gate shape emits exact twins + accuracy booleans; the raw IVF
    // neighbor list comes from the searcher directly
    val idx = Similarity.ivfEnsureIndex(spark, d, nlist = 8, iters = 3)
    val ivfPairs = Similarity
      .ivfSearchIndex(spark, graft.Graft.table(spark, d, "embeddings"), idx, k = 5, nQueries = 10, nprobe = 4)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .toSet
    val ivfRecall = (ivfPairs & exact).size.toDouble / exact.size
    assert(lshRecall >= 0.6, s"LSH recall@5 $lshRecall")
    assert(ivfRecall >= 0.8, s"IVF recall@5 $ivfRecall")
    // x74: the search-only path against the persisted float32 gate artifact
    // must hold the same floor (it probes the same lists; only the probe
    // ranking arithmetic differs — float32 vs double centroid cosine)
    val gateRecall = (nbrs("x74_ivf_search") & exact).size.toDouble / exact.size
    assert(gateRecall >= 0.8, s"persisted-index search recall@5 $gateRecall")
  }

  test("x66 perplexity buckets: ntile balance, score monotonicity, surprisal identities") {
    val d = "/root/testdata/sf0.001"
    val rows = TextAnalysis.queries("x66_perplexity_bucket")(spark, d).collect()
    assert(rows.nonEmpty)
    // ntile(3) per lang: bucket sizes differ by at most 1
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_.getAs[String]("bucket")).view.mapValues(_.size).toMap
      assert(sizes.keySet === Set("head", "middle", "tail"), s"$lang: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang: unbalanced $sizes")
      // CCNet ordering: every head score ≤ every middle score ≤ every tail score
      def mx(b: String) = rs.filter(_.getAs[String]("bucket") == b).map(_.getAs[Long]("mean_bits_e3")).max
      def mn(b: String) = rs.filter(_.getAs[String]("bucket") == b).map(_.getAs[Long]("mean_bits_e3")).min
      assert(mx("head") <= mn("middle") && mx("middle") <= mn("tail"), s"$lang: tercile order broken")
    }
    // surprisal identities: scores non-negative, n_bigrams = n_tokens - 1
    val nTok = graft.Graft
      .table(spark, d, "documents")
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nt"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("mean_bits_e3") >= 0L)
      assert(r.getAs[Long]("n_bigrams") === nTok(r.getAs[Long]("doc_id")) - 1)
    }
  }

  test("token counting and quality score") {
    val t = TextAnalysis.queries("x07_text_tokens")(spark, dir).collect()
    assert(t.map(r => r.getAs[Long]("n_tokens")).toSeq === Seq(5L, 7L, 2L))
    val q = TextAnalysis.queries("x08_text_quality")(spark, dir).where("doc_id = 0").head()
    assert(q.getAs[Double]("stop_ratio") === 0.6) // the, and, the
    assert(q.getAs[Double]("avg_word_len") === 3.0)
  }

  test("langid: self-trained trigram profiles classify each language's docs to itself") {
    // with profiles trained from the labeled corpus, every language —
    // including the junk 'zz' — owns its own trigram mass; the 'und'
    // fallback is for sub-trigram docs (LangidSpec covers it, along with
    // the shared-marker separation the old word-marker argmax could not do)
    val preds = TextAnalysis
      .queries("x09_text_langid")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")))
      .toMap
    assert(preds("en") === "en")
    assert(preds("de") === "de")
    assert(preds("zz") === "zz")
  }

  test("fingerprints: same token multiset → same sorted fp, different rolling hash") {
    val d2 = TestSpark.tempDir()
    TestSpark.writeTable(
      d2,
      "documents",
      Seq(
        (0L, "alpha beta gamma", "en", "t", 1L),
        (1L, "gamma beta alpha", "en", "t", 1L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
    )
    val fp = TextAnalysis.queries("x10_text_fingerprint")(spark, d2).collect()
    assert(fp(0).getAs[String]("fp_sorted") === fp(1).getAs[String]("fp_sorted"))
    assert(fp(0).getAs[String]("fp_norm") !== fp(1).getAs[String]("fp_norm"))
    assert(fp(0).getAs[Long]("rolling_hash") !== fp(1).getAs[Long]("rolling_hash"))
  }

  test("native codegen'd cosine == declarative formulation on real data, bit for bit") {
    import org.apache.spark.sql.functions._
    val emb = graft.Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(20000)
    val diffs = pairs
      .withColumn("native", graft.functions.CosineSimF32(col("ea"), col("eb")))
      .withColumn("decl", Similarity.cosineDeclarative(col("ea"), col("eb")))
      .where(col("native") =!= col("decl"))
      .count()
    assert(diffs === 0L)
    // and the native expression must be codegen-compatible (no fallback):
    // execute an agg over it, then inspect the FINAL adaptive plan
    val df = a.join(b, col("ia") < col("ib"))
      .select(sum(graft.functions.CosineSimF32(col("ea"), col("eb"))).as("s"))
    df.collect()
    // "*(n)" prefixes mark WholeStageCodegen stages in the simple plan string;
    // the cosine_f32 aggregate must sit inside one (no interpreted fallback)
    val planLines = df.queryExecution.executedPlan.toString.linesIterator
    assert(planLines.exists(l => l.contains("*(") && l.contains("cosine_f32")))
  }

  test("every native expression is callable from SQL via GraftExtensions registration") {
    val ext = new graft.plans.GraftExtensions()
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql("SELECT cosine_f32(array(cast(1.0 as float)), array(cast(2.0 as float))) AS c").head()
    assert(r.getDouble(0) === 1.0)
    assert(ext != null && graft.plans.GraftExtensions.all.size === 9)
    assert(spark.sql("SELECT winnow_fingerprints('abcdefgh', 4, 5)").head().getSeq[Long](0).length === 1)
    // each SQL call must agree with its Column-API twin
    assert(
      spark.sql("SELECT rolling_hash('abc', 1000000007)").head().getLong(0) ===
        Seq(("abc", 1)).toDF("text", "i").select(graft.functions.RollingHash($"text")).head().getLong(0)
    )
    val viaSql = spark.sql("SELECT token_gram_hashes('a b c d', 3)").head().getSeq[Long](0)
    val viaCol = Seq(("a b c d", 1)).toDF("text", "i")
      .select(graft.functions.TokenGramHashes($"text", 3)).head().getSeq[Long](0)
    assert(viaSql === viaCol && viaSql.length === 2)
    assert(spark.sql("SELECT char_gram_hashes('abcd', 4)").head().getSeq[Long](0).length === 1)
    // the non-distinct sibling keeps duplicates in positional order: 'aaaa'
    // has three identical 2-grams, and its distinct set collapses to one
    val allG = spark.sql("SELECT char_gram_all_hashes('aaaa', 2)").head().getSeq[Long](0)
    assert(allG.length === 3 && allG.distinct.length === 1)
    assert(
      allG === Seq(("aaaa", 1)).toDF("text", "i")
        .select(graft.functions.CharGramAllHashes($"text", 2)).head().getSeq[Long](0)
    )
    assert(
      spark.sql("SELECT char_gram_hashes('aaaa', 2)").head().getSeq[Long](0) === allG.distinct.sorted
    )
    assert(spark.sql("SELECT simhash_sig('hello world')").head().getSeq[Long](0).length === 2)
    assert(
      spark.sql("SELECT band_sigs(array(cast(0.5 as float), cast(-0.25 as float)), 32, 4)")
        .head().getSeq[Long](0).length === 8
    )
  }

  test("multimodal: payload plumbing and stubbed decode schema") {
    val decoded = Multimodal.decodeAll(Multimodal.withPayload(graft.Graft.table(spark, dir, "documents")))
    val rows = decoded.collect()
    assert(rows.length === 3)
    assert(decoded.schema.fieldNames.toSeq === Seq("doc_id", "n_bytes", "format", "width", "height", "n_frames"))
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getAs[Long]("n_bytes") === 19L)
    assert(r0.getAs[String]("format") === "fake/raw")
  }

  test("multimodal: resize + frame-sample plumbing explodes frames with declared schema") {
    val media = Multimodal.transformMedia(
      Multimodal.withPayload(graft.Graft.table(spark, dir, "documents")),
      w = 64, h = 64, everyK = 2
    )
    assert(media.schema.fieldNames.toSeq === Seq("doc_id", "frame_idx", "frame_bytes", "resized_bytes"))
    val byDoc = media.collect().groupBy(_.getLong(0))
    // doc 0: 19 bytes → 2 blocks of 16 → every 2nd → 1 frame
    assert(byDoc(0L).length === 1)
    assert(byDoc(0L).head.getAs[Long]("frame_bytes") === 16L)
    // deterministic: rerun produces identical rows
    val again = Multimodal.transformMedia(
      Multimodal.withPayload(graft.Graft.table(spark, dir, "documents")), 64, 64, 2)
    assert(again.collect().map(_.toString).sorted.toSeq === media.collect().map(_.toString).sorted.toSeq)
  }
}
