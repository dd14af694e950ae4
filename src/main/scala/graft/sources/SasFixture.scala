package graft.sources

import org.apache.spark.sql.SparkSession

/** Deterministic SAS7BDAT fixture + parquet twin for the S3 scan gate.
  *
  * The reference checkout ships no `.sas7bdat` binary (MISSING_LARGE_BLOBS),
  * so the gate fixture is generated: the same logical rows written once
  * through [[Sas7bdatWriter]] and once as parquet. The oracle reads the
  * parquet twin in DuckDB; the query reads the SAS binary through
  * [[Sas7bdat.read]] — a hash match proves the binary decode end-to-end.
  * Content is a pure function of the row index → identical bytes every run.
  */
object SasFixture {
  val dir = "/root/repo/spark-warehouse/graft_sas"
  val sasPath = s"$dir/fixture.sas7bdat"
  val twinPath = s"$dir/twin"

  val cols = Seq(
    Sas7bdatWriter.WCol("id", isNum = true, 8),
    Sas7bdatWriter.WCol("value", isNum = true, 8),
    Sas7bdatWriter.WCol("category", isNum = false, 8),
    Sas7bdatWriter.WCol("comment", isNum = false, 24)
  )

  /** 3000 rows ≈ 18 data pages at the 8 KiB page size → the distributed
    * page-range read actually fans out. Nulls on both column kinds. */
  def rows: Seq[Seq[Any]] = (0 until 3000).map { i =>
    Seq(
      java.lang.Double.valueOf(i.toDouble),
      if (i % 11 == 0) null else java.lang.Double.valueOf(((i * 2654435761L) % 100000L) / 100.0),
      "cat" + (i % 7),
      // .trim: SAS blank-pads char cells, so trailing spaces are not
      // representable — a fixture value ending in ' ' would round-trip
      // trimmed and (correctly) mismatch the parquet twin
      if (i % 13 == 0) null else s"row $i of the graft sas fixture".take(24).trim
    )
  }

  def ensure(spark: SparkSession): Unit = synchronized {
    val d = new java.io.File(dir)
    if (!new java.io.File(sasPath).exists() || !new java.io.File(twinPath).exists()) {
      d.mkdirs()
      Sas7bdatWriter.write(sasPath, cols, rows)
      import spark.implicits._
      rows
        .map(r => (r(0).asInstanceOf[java.lang.Double], r(1).asInstanceOf[java.lang.Double], r(2).asInstanceOf[String], r(3).asInstanceOf[String]))
        .toDF("id", "value", "category", "comment")
        .coalesce(1)
        .write.mode("overwrite").parquet(twinPath)
    }
  }
}
