package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Month-partitioned lineitem (x131) — the layout that makes DYNAMIC
  * PARTITION PRUNING a plan feature rather than a hope: the fact is laid
  * out by `ship_month` (the standard time-partitioned warehouse shape),
  * and a join against a FILTERED month dimension must prune the fact's
  * partition directories at RUNTIME from the dim's build-side values —
  * Spark inserts a `dynamicpruning` subquery into the scan's
  * PartitionFilters (asserted in DppSpec), so a 100 TB table joined to
  * "the 12 months of 1997" reads 12 directories, not 80.
  *
  * Scale shape: the write is a one-pass projection (dynamic-partition
  * sort per task only); ~one partition dir per month keeps directory
  * listings metadata-sized at any SF. Keyed per source dir and
  * fingerprint-guarded (the x74/x106 artifact discipline).
  */
object MonthStore {

  val root = "/root/repo/spark-warehouse/graft_bymonth"

  def dirFor(d: String): String = s"$root/${new java.io.File(d).getName}"

  def ensure(s: SparkSession, d: String): Unit = synchronized {
    val key = Fingerprint.of(s, s"$d/lineitem.parquet", "month1")
    val dir = dirFor(d)
    val marker = new java.io.File(s"$dir/src_key")
    if (marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == key) return
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    graft.Graft
      .table(s, d, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_quantity"),
        col("l_extendedprice"),
        col("l_discount"),
        col("l_shipdate"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month")
      )
      .write
      .mode("overwrite")
      .partitionBy("ship_month")
      .parquet(s"$dir/data")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/src_key"), key.getBytes("UTF-8"))
  }

  def read(s: SparkSession, d: String): DataFrame = {
    ensure(s, d)
    s.read.parquet(s"${dirFor(d)}/data")
  }
}
