package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental IVF+PQ (x274) — x269's laws extended to the code stores:
  *   - INGEST IS APPEND-ONLY: encoding a delta batch touches neither the
  *     base code files nor the frozen codebooks (path set + mtimes);
  *   - FROZEN-CODEBOOK COMPOSITION: base ∪ delta ADC search equals a
  *     one-segment encode of ALL vectors against the SAME codebooks —
  *     the segment split is invisible to the ranking;
  *   - PRUNING SURVIVES SEGMENTATION: non-probed cid code directories of
  *     every segment can rot without affecting a search.
  */
class IncPqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def emb = graft.Graft.table(spark, d, "embeddings")

  /** base-only artifact: centroids + base lists (x269) + codebooks + base codes */
  private def buildBase(): String = {
    val dir = TestSpark.tempDir() + "/incpq"
    val base = emb.where(col("vec_id") % 10 < 8)
    Similarity
      .kmeansCentroids(spark, base, nlist = 8, iters = 3)
      .select(col("cid").cast("long").as("cid"), transform(col("cvec"), x => x.cast("float")).as("cvec"))
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/centroids")
    Similarity.incIvfWriteSegmentForTest(spark, dir, base, dir)
    java.nio.file.Files.write(
      new java.io.File(s"$dir/emb_src").toPath,
      s"$d/embeddings.parquet".getBytes("UTF-8")
    )
    Similarity.pqTrainBaseForTest(spark, dir)
    Similarity.incPqEncodeSegment(spark, dir, "")
    dir
  }

  private def ingest(dir: String, batch: Int, stripe: Int): Unit = {
    Similarity.incIvfIngest(spark, dir, batch, emb.where(col("vec_id") % 10 === stripe))
    Similarity.incPqEncodeSegment(spark, dir, s"delta_$batch")
  }

  private def fileState(dir: String, sub: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$dir/$sub"))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified())
      .toMap
  }

  private def ranking(dir: String, nQueries: Int = 10, nprobe: Int = 4): Seq[(Long, Long, Long, Long)] =
    Similarity
      .incPqSearch(spark, dir, emb, k = 5, nQueries = nQueries, nprobe = nprobe, shortlist = 40)
      .select("qid", "rk", "nid", "adc")
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("ingest is append-only for codes AND codebooks; segments compose to the full frozen encode") {
    val dir = buildBase()
    val baseCodes = fileState(dir, "pq_codes")
    val cbFiles = fileState(dir, "pq_codebooks")
    assert(baseCodes.nonEmpty && cbFiles.nonEmpty)
    ingest(dir, 1, 8)
    ingest(dir, 2, 9)
    assert(fileState(dir, "pq_codes") === baseCodes, "ingest must not touch base codes")
    assert(fileState(dir, "pq_codebooks") === cbFiles, "ingest must not retrain codebooks")
    // ground truth: one segment holding EVERY vector, same frozen
    // centroids + codebooks
    val full = TestSpark.tempDir() + "/incpq_full"
    for (sub <- Seq("centroids", "pq_codebooks"))
      org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(s"$dir/$sub"), new java.io.File(s"$full/$sub"))
    java.nio.file.Files.copy(
      new java.io.File(s"$dir/emb_src").toPath,
      new java.io.File(s"$full/emb_src").toPath
    )
    Similarity.incIvfWriteSegmentForTest(spark, full, emb, full)
    Similarity.incPqEncodeSegment(spark, full, "")
    assert(ranking(dir) === ranking(full), "base ∪ deltas must equal the one-segment frozen encode")
  }

  test("compaction folds lists AND codes together — never an orphaned code store") {
    val dir = buildBase()
    ingest(dir, 1, 8)
    ingest(dir, 2, 9)
    val before = ranking(dir)
    Similarity.incIvfCompact(spark, dir)
    assert(Similarity.incIvfSegments(dir) === Seq(""), "deltas must be gone")
    assert(ranking(dir) === before, "compaction must not change the ADC ranking")
    // coverage invariant: the folded code store spans exactly the folded lists
    val lists = spark.read.parquet(s"$dir/lists").select("vec_id")
    val codes = spark.read.parquet(s"$dir/pq_codes").select("vec_id")
    assert(lists.exceptAll(codes).count() === 0 && codes.exceptAll(lists).count() === 0)
    Similarity.incIvfCompact(spark, dir) // idempotent
    assert(ranking(dir) === before)
  }

  test("cid pruning survives segmentation on the code stores") {
    val dir = buildBase()
    ingest(dir, 1, 8)
    ingest(dir, 2, 9)
    val before = ranking(dir, nQueries = 2, nprobe = 2)
    assert(before.nonEmpty)
    val centF = spark.read.parquet(s"$dir/centroids")
    val q = emb.orderBy("vec_id").limit(2).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("qid").orderBy(col("ccos").desc, col("cid"))
    val probedCids = q
      .crossJoin(broadcast(centF))
      .withColumn("ccos", graft.functions.CosineSimF32(col("qe"), col("cvec")))
      .withColumn("crk", row_number().over(wc))
      .where(col("crk") <= 2)
      .select("cid")
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSet
    var trashed = 0
    for (seg <- Similarity.incIvfSegments(dir)) {
      val root = if (seg.isEmpty) s"$dir/pq_codes" else s"$dir/$seg/pq_codes"
      for (sub <- Option(new java.io.File(root).listFiles()).map(_.toSeq).getOrElse(Seq.empty))
        if (sub.isDirectory && sub.getName.startsWith("cid_p=")) {
          val cid = sub.getName.stripPrefix("cid_p=").toLong
          if (!probedCids.contains(cid)) {
            sub.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
              java.nio.file.Files.write(f.toPath, Array.fill[Byte](64)(0x5a))
            }
            trashed += 1
          }
        }
    }
    assert(trashed > 0, "fixture must leave at least one non-probed cid code dir to corrupt")
    assert(ranking(dir, nQueries = 2, nprobe = 2) === before, "pruned ADC must never open non-probed dirs")
  }
}
