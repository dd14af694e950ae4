package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental inverted-index maintenance (x266). The load-bearing laws:
  *   - INGEST IS APPEND-ONLY: after two ingest batches, every base
  *     posting file is byte-identical in place (same path set, same
  *     mtimes) — the batch never touches existing segments;
  *   - SEGMENTS COMPOSE EXACTLY: base ∪ deltas lookup equals a
  *     from-scratch index over all documents, row for row;
  *   - COMPACTION FOLDS, NEVER RE-TOKENIZES: after compact the deltas are
  *     gone, lookups are unchanged, and the fold read only the index;
  *   - PRUNING SURVIVES SEGMENTATION: non-query buckets of EVERY segment
  *     can be corrupted on disk without affecting a lookup.
  */
class IncIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private val qterms = Seq("table", "spark", "window")

  private def docs = graft.Graft.table(spark, d, "documents")

  private def buildSplit(): String = {
    val dir = TestSpark.tempDir() + "/incidx"
    TextAnalysis.incIdxWriteSegmentForTest(spark, dir, docs.where(col("doc_id") % 10 < 8))
    dir
  }

  private def fileState(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
      else Seq(f)
    walk(new java.io.File(s"$dir/postings"))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified())
      .toMap
  }

  private def lookup(dir: String) =
    TextAnalysis
      .incIdxLookup(spark, dir, qterms)
      .orderBy(col("score").desc, col("doc_id"))
      .collect()
      .toSeq

  test("ingest is append-only: base posting files never move, lookups equal the full rebuild") {
    val dir = buildSplit()
    val before = fileState(dir)
    assert(before.nonEmpty)
    TextAnalysis.incIdxIngest(spark, dir, 1, docs.where(col("doc_id") % 10 === 8))
    TextAnalysis.incIdxIngest(spark, dir, 2, docs.where(col("doc_id") % 10 === 9))
    assert(fileState(dir) === before, "ingest must not touch the base segment")
    assert(TextAnalysis.incIdxSegments(dir).size === 3)
    // full rebuild over ALL documents = the ground truth
    val full = TestSpark.tempDir() + "/incidx_full"
    TextAnalysis.incIdxWriteSegmentForTest(spark, full, docs)
    assert(lookup(dir) === lookup(full), "segments must compose to the full-rebuild ranking")
  }

  test("compaction folds deltas into one base without changing lookups") {
    val dir = buildSplit()
    TextAnalysis.incIdxIngest(spark, dir, 1, docs.where(col("doc_id") % 10 === 8))
    TextAnalysis.incIdxIngest(spark, dir, 2, docs.where(col("doc_id") % 10 === 9))
    val before = lookup(dir)
    TextAnalysis.incIdxCompact(spark, dir)
    assert(TextAnalysis.incIdxSegments(dir) === Seq(""), "compaction must consume every delta")
    assert(lookup(dir) === before, "folding is ranking-invariant")
    // idempotent: nothing left to fold
    TextAnalysis.incIdxCompact(spark, dir)
    assert(lookup(dir) === before)
  }

  test("bucket pruning survives segmentation: corrupting non-query buckets is invisible") {
    val dir = buildSplit()
    TextAnalysis.incIdxIngest(spark, dir, 1, docs.where(col("doc_id") % 10 === 8))
    TextAnalysis.incIdxIngest(spark, dir, 2, docs.where(col("doc_id") % 10 === 9))
    val before = lookup(dir)
    val qbuckets = qterms.map(t => graft.functions.Hashing.md5BucketOf(t, 64L)).toSet
    def trash(f: java.io.File): Unit =
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](32)(0x5a))
    var trashed = 0
    for (seg <- Seq("", "delta_1", "delta_2")) {
      val root = new java.io.File(if (seg.isEmpty) s"$dir/postings" else s"$dir/$seg/postings")
      for {
        bd <- Option(root.listFiles()).getOrElse(Array.empty)
        if bd.getName.startsWith("bucket=") && !qbuckets.contains(bd.getName.stripPrefix("bucket=").toLong)
        f <- Option(bd.listFiles()).getOrElse(Array.empty)
        if f.getName.endsWith(".parquet")
      } { trash(f); trashed += 1 }
    }
    assert(trashed > 10, "corruption is real and broad")
    assert(lookup(dir) === before, "pruned buckets are never opened, in any segment")
  }
}
