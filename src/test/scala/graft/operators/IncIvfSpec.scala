package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental IVF index maintenance (x269) — x266's laws on the vector
  * index:
  *   - INGEST IS APPEND-ONLY: after two ingest batches every base list
  *     file is byte-identical in place (path set + mtimes) and only the
  *     frozen nlist-row centroid table was read;
  *   - SEGMENTS COMPOSE EXACTLY: base ∪ deltas search equals a
  *     one-segment assignment of ALL vectors against the SAME frozen
  *     centroids (assignment ties are cid-deterministic, so the split is
  *     invisible);
  *   - COMPACTION FOLDS, NEVER RE-EMBEDS: after compact the deltas are
  *     gone, the ranking is unchanged (modulo seg provenance collapsing
  *     to 0), and the fold read only vec_id/cid pairs;
  *   - PRUNING SURVIVES SEGMENTATION: non-probed cid directories of EVERY
  *     segment can be corrupted on disk without affecting a search, while
  *     an unpruned full read dies on the same corruption.
  */
class IncIvfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def emb = graft.Graft.table(spark, d, "embeddings")

  /** fresh artifact: centroids on the base stripe + base segment */
  private def buildBase(): String = {
    val dir = TestSpark.tempDir() + "/incivf"
    val base = emb.where(col("vec_id") % 10 < 8)
    Similarity
      .kmeansCentroids(spark, base, nlist = 8, iters = 3)
      .select(col("cid").cast("long").as("cid"), transform(col("cvec"), x => x.cast("float")).as("cvec"))
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/centroids")
    Similarity.incIvfWriteSegmentForTest(spark, dir, base, dir)
    dir
  }

  private def ingestBoth(dir: String): Unit = {
    Similarity.incIvfIngest(spark, dir, 1, emb.where(col("vec_id") % 10 === 8))
    Similarity.incIvfIngest(spark, dir, 2, emb.where(col("vec_id") % 10 === 9))
  }

  private def fileState(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$root/lists"))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified())
      .toMap
  }

  private def search(dir: String, nQueries: Int = 10, nprobe: Int = 4) =
    Similarity.incIvfSearch(spark, dir, emb, k = 5, nQueries = nQueries, nprobe = nprobe)

  private def ranking(dir: String, nQueries: Int = 10, nprobe: Int = 4): Seq[(Long, Long, Long, Long)] =
    search(dir, nQueries, nprobe)
      .select("qid", "rk", "nid", "cos_e6")
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("ingest is append-only and segments compose to the one-segment full assignment") {
    val dir = buildBase()
    val before = fileState(dir)
    assert(before.nonEmpty)
    ingestBoth(dir)
    assert(fileState(dir) === before, "ingest must not touch the base segment")
    assert(Similarity.incIvfSegments(dir).size === 3)
    // ground truth: ONE segment holding every vector, same frozen centroids
    val full = TestSpark.tempDir() + "/incivf_full"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$dir/centroids"),
      new java.io.File(s"$full/centroids")
    )
    Similarity.incIvfWriteSegmentForTest(spark, full, emb, full)
    assert(ranking(dir) === ranking(full), "base ∪ deltas must equal the one-segment assignment")
    // delta provenance is visible: at least one top-5 neighbor came from a delta
    val segs = search(dir).select("seg").collect().map(_.getLong(0)).toSet
    assert(segs.contains(1L) || segs.contains(2L), s"delta vectors never surfaced: segs=$segs")
  }

  test("compaction folds segments, keeps the ranking, and is idempotent") {
    val dir = buildBase()
    ingestBoth(dir)
    val before = ranking(dir)
    Similarity.incIvfCompact(spark, dir)
    assert(Similarity.incIvfSegments(dir) === Seq(""), "deltas must be gone")
    assert(ranking(dir) === before, "compaction must not change the ranking")
    assert(search(dir).select("seg").distinct().collect().map(_.getLong(0)).toSeq === Seq(0L))
    Similarity.incIvfCompact(spark, dir) // single segment: no-op
    assert(ranking(dir) === before)
  }

  test("cid pruning survives segmentation: non-probed directories can rot; a full read dies") {
    val dir = buildBase()
    ingestBoth(dir)
    // a narrow probe (2 queries × 2 probes ≤ 4 of 8 cids) leaves dirs to rot
    val before = ranking(dir, nQueries = 2, nprobe = 2)
    assert(before.nonEmpty)
    // recompute the probed set the same way the search does
    val centF = spark.read.parquet(s"$dir/centroids")
    val q = emb
      .orderBy("vec_id")
      .limit(2)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
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
    // trash every non-probed cid dir in EVERY segment
    var trashed = 0
    for (seg <- Similarity.incIvfSegments(dir)) {
      val root = if (seg.isEmpty) s"$dir/lists" else s"$dir/$seg/lists"
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
    assert(trashed > 0, "fixture must have at least one non-probed cid dir to corrupt")
    assert(ranking(dir, nQueries = 2, nprobe = 2) === before, "pruned search must never open non-probed directories")
    // the unpruned twin reads everything and dies on the rot
    intercept[Exception] {
      Similarity.incIvfSegments(dir).foreach { seg =>
        val root = if (seg.isEmpty) s"$dir/lists" else s"$dir/$seg/lists"
        spark.read.parquet(root).count()
      }
    }
  }
}
