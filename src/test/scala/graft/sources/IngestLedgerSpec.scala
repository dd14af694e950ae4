package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class IngestLedgerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkInput(root: String, id: Long, n: Int): (Long, String) = {
    import spark.implicits._
    val p = s"$root/in/file_$id"
    (0 until n).map(j => (id * 100 + j, id + j.toLong)).toDF("doc_id", "cents")
      .coalesce(1).write.mode("overwrite").parquet(p)
    id -> p
  }

  test("offer semantics: accept-once, counted re-offers, zero data movement on duplicates") {
    val root = java.nio.file.Files.createTempDirectory("ingest_spec").toString
    val f0 = mkInput(root, 0L, 3)
    val f1 = mkInput(root, 1L, 4)
    val f2 = mkInput(root, 2L, 5)
    assert(IngestLedger.offer(spark, root, 1, Seq(f0, f1)) === 2)
    assert(IngestLedger.offer(spark, root, 2, Seq(f1, f2)) === 1) // f1 skipped
    assert(IngestLedger.offer(spark, root, 3, Seq(f0, f1, f2)) === 0) // all skipped
    val led = IngestLedger
      .ledger(spark, root)
      .collect()
      .map(r => r.getAs[Long]("file_id") -> (r.getAs[Int]("round_ingested"), r.getAs[Long]("n_offered")))
      .toMap
    assert(led === Map(0L -> ((1, 2L)), 1L -> ((1, 3L)), 2L -> ((2, 2L))))
    // content landed exactly once per file
    val counts = IngestLedger
      .corpus(spark, root)
      .groupBy("file")
      .count()
      .collect()
      .map(r => r.getAs[Int]("file").toLong -> r.getAs[Long]("count"))
      .toMap
    assert(counts === Map(0L -> 3L, 1L -> 4L, 2L -> 5L))
  }

  test("crash window: corpus dir written but ledger row missing → re-offer overwrites, no duplication") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ingest_crash").toString
    val f5 = mkInput(root, 5L, 6)
    // simulate the crash: data copied, ledger never committed
    spark.read.parquet(f5._2).write.mode("overwrite").parquet(s"$root/corpus/file=5")
    assert(IngestLedger.ledger(spark, root).count() === 0)
    assert(IngestLedger.offer(spark, root, 1, Seq(f5)) === 1) // re-offer accepts
    assert(IngestLedger.corpus(spark, root).count() === 6) // overwritten, not doubled
    assert(
      IngestLedger.ledger(spark, root).select("n_docs").head().getLong(0) === 6L
    )
  }

  test("content update: same id with new bytes re-ingests; duplicate batch ids collapse") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ingest_upd").toString
    val f7 = mkInput(root, 7L, 3)
    // doubled manifest entry counts once
    assert(IngestLedger.offer(spark, root, 1, Seq(f7, f7)) === 1)
    assert(IngestLedger.ledger(spark, root).count() === 1)
    // identical content re-offer: skipped, history kept
    assert(IngestLedger.offer(spark, root, 2, Seq(f7)) === 0)
    // rewrite the input with different content (and row count)
    (0 until 5).map(j => (700L + j, 99L + j)).toDF("doc_id", "cents")
      .coalesce(1).write.mode("overwrite").parquet(f7._2)
    assert(IngestLedger.offer(spark, root, 3, Seq(f7)) === 1) // fp mismatch -> re-accept
    val r = IngestLedger.ledger(spark, root).head()
    assert(r.getAs[Int]("round_ingested") === 3)
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_offered") === 3L) // history survives the update
    assert(IngestLedger.corpus(spark, root).count() === 5L) // overwritten, not appended
  }

  test("ledger swap recovery: only the .old copy present still reads as the ledger") {
    val root = java.nio.file.Files.createTempDirectory("ingest_rec").toString
    val f1 = mkInput(root, 1L, 2)
    assert(IngestLedger.offer(spark, root, 1, Seq(f1)) === 1)
    // simulate a crash between demote and promote: live ledger became .old
    val live = new java.io.File(s"$root/ledger")
    val old = new java.io.File(s"$root/ledger.old")
    assert(live.renameTo(old))
    assert(IngestLedger.ledger(spark, root).count() === 1) // recovered
    // and the next offer self-heals into a fresh live ledger
    val f2 = mkInput(root, 2L, 2)
    assert(IngestLedger.offer(spark, root, 2, Seq(f2)) === 1)
    assert(new java.io.File(s"$root/ledger").exists())
    assert(IngestLedger.ledger(spark, root).count() === 2)
  }

  test("fixture ground truth: rounds, offers and content match the x90 formulas") {
    IngestFixture.ensure(spark)
    val led = IngestLedger
      .ledger(spark, IngestFixture.dir)
      .collect()
      .map(r => (r.getAs[Long]("file_id"), r.getAs[Int]("round_ingested"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_offered")))
      .sortBy(_._1)
    assert(led.length === 8)
    for ((id, round, nDocs, nOffered) <- led) {
      assert(round === (if (id <= 4) 1 else 2), s"file $id round")
      assert(nDocs === IngestFixture.nDocsOf(id).toLong, s"file $id docs")
      assert(nOffered === (if (id <= 1) 1L else if (id <= 4) 3L else 2L), s"file $id offers")
    }
  }
}
