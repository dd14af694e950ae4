package graft.sources

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scratch parquet reader as a real DataSource V2 (r10). Laws:
  * builtin-reader parity on driver-generated fixtures (flat, string,
  * timestamp, list<float> shapes), physical column pruning visible in the
  * executed plan, filter pushdown reported on the scan, and row-group
  * stats pruning on the engine's own multi-row-group files. */
class GraftParquetSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def batchScan(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("parity with the builtin reader: documents (int64 + strings)") {
    val mine = spark.read.format("graft-parquet").load(s"$sf/documents.parquet")
    val ref = spark.read.parquet(s"$sf/documents.parquet")
    assert(mine.schema === ref.schema)
    assert(sortedRows(mine) === sortedRows(ref))
  }

  test("parity with the builtin reader: events (timestamp NTZ) and embeddings (list<float>)") {
    val mineE = spark.read.format("graft-parquet").load(s"$sf/events.parquet")
    val refE = spark.read.parquet(s"$sf/events.parquet")
    assert(mineE.schema === refE.schema)
    assert(sortedRows(mineE) === sortedRows(refE))
    val mineV = spark.read.format("graft-parquet").load(s"$sf/embeddings.parquet")
    val refV = spark.read.parquet(s"$sf/embeddings.parquet")
    assert(mineV.schema === refV.schema)
    assert(sortedRows(mineV) === sortedRows(refV))
  }

  test("column pruning reaches the scan; filter pushdown is reported") {
    val df = spark.read
      .format("graft-parquet")
      .load(s"$sf/documents.parquet")
      .where(col("doc_id") >= 10L && col("doc_id") <= 500L)
      .select("doc_id", "n_chars")
    val scan = batchScan(df).scan.asInstanceOf[GraftParquetScan]
    assert(scan.readSchema().fieldNames.toSet === Set("doc_id", "n_chars"))
    assert(scan.description().contains("doc_id"))
    assert(scan.description().contains("bounds="))
    // and the result is still exact
    val ref = spark.read
      .parquet(s"$sf/documents.parquet")
      .where(col("doc_id") >= 10L && col("doc_id") <= 500L)
      .select("doc_id", "n_chars")
    assert(sortedRows(df) === sortedRows(ref))
  }

  test("row-group stats skip rows outside the pushed range on own multi-group files") {
    val dir = TestSpark.tempDir()
    val rows: Seq[Array[Any]] = (0L until 4000L).map(k => Array[Any](k, s"v$k".getBytes("UTF-8")))
    val bytes = ParquetWrite.write(
      Seq(
        ParquetWrite.ColSpec("k", ParquetWrite.TInt64, optional = false),
        ParquetWrite.ColSpec("s", ParquetWrite.TBytes, optional = false)
      ),
      rows,
      codec = 0,
      statistics = true,
      rowGroupRows = 500
    )
    val f = new java.io.File(dir, "t.parquet")
    java.nio.file.Files.write(f.toPath, bytes)
    val df = spark.read
      .format("graft-parquet")
      .load(f.toString)
      .where(col("k") >= 1000L && col("k") < 1500L)
    assert(df.count() === 500L)
    assert(
      df.agg(sum("k")).collect().head.getLong(0) === (1000L until 1500L).sum)
    // 8 row groups planned; the scan carries the bound that skips 7 of them
    val scan = batchScan(df).scan.asInstanceOf[GraftParquetScan]
    assert(scan.description().contains("(k,(1000,1499))"))
  }

  test("write path round-trips through the builtin reader; overwrite truncates") {
    val dir = TestSpark.tempDir() + "/dsv2w"
    import spark.implicits._
    val src = (0L until 3000L)
      .map(i => (i, s"t${i % 5}", if (i % 7 == 0) null else java.lang.Long.valueOf(i * 3), i % 2 == 0, i * 0.25))
      .toDF("k", "tag", "cents", "flag", "price")
    src.repartition(3).write.format("graft-parquet").mode("overwrite").save(dir)
    val back = spark.read.parquet(dir)
    assert(sortedRows(back) === sortedRows(src))
    // and through the scratch reader's own DSv2 scan
    assert(sortedRows(spark.read.format("graft-parquet").load(dir)) === sortedRows(src))
    // overwrite replaces, never appends
    val src2 = src.where(col("k") < 100L)
    src2.repartition(2).write.format("graft-parquet").mode("overwrite").save(dir)
    assert(spark.read.parquet(dir).count() === 100L)
  }

  test("write path rejects unsupported column types at build, not mid-task") {
    val dir = TestSpark.tempDir() + "/dsv2w_bad"
    import spark.implicits._
    val bad = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("k", "ts")
    val e = intercept[Exception] {
      bad.write.format("graft-parquet").mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("unsupported column type") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported column type")))
  }

  test("count(*)-style empty projection still counts rows") {
    val n = spark.read.format("graft-parquet").load(s"$sf/documents.parquet").count()
    val ref = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(n === ref)
  }
}
