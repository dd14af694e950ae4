package graft.sources

import org.apache.spark.sql.SparkSession

/** Metadata-only COUNT(*) from parquet footers (x116) — the query path
  * every warehouse serves without touching data pages: each parquet footer
  * already carries exact per-row-group row counts, so a full-table count
  * is a FILE-LIST problem, not a scan problem. At 100 TB that is the
  * difference between reading ~10^5 footers (a few KiB each) and streaming
  * the table.
  *
  * Scale shape: the file list comes from the driver (file-count-sized, the
  * same metadata every table format's planning step reads); footer reads
  * distribute over the executors via `mapPartitions` on the list — no row
  * of table data moves. This is the same stats source the x73 manifest
  * pass aggregates, consumed directly instead of re-derived by scanning.
  */
object FooterStats {

  /** Exact row count of a parquet directory (or single file) from footers
    * only. */
  def rowCount(s: SparkSession, path: String): Long = {
    import s.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p)
          .map(_.getPath)
          .filter(q => q.getName.endsWith(".parquet") && !q.getName.startsWith("_"))
          .map(_.toString)
          .toSeq
      else Seq(path)
    if (files.isEmpty) return 0L
    files
      .toDS()
      .repartition(math.min(files.size, s.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.size() match {
            case 0 => 0L
            case _ =>
              var n = 0L
              val bs = r.getFooter.getBlocks
              var i = 0
              while (i < bs.size()) { n += bs.get(i).getRowCount; i += 1 }
              n
          } finally r.close()
        }
      }
      .reduce(_ + _)
  }
}
