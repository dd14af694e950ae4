package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table catalog for the graft engine.
  *
  * Design notes (100 TB discipline, SURVEY.md §7.4):
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *     and dynamic join-strategy switching replace hand-tuned partition counts
  *     when the same plans run on a 1000-executor cluster.
  *   - `spark.sql.shuffle.partitions` defaults to the local core count here;
  *     on a real cluster it is a deploy-time knob (AQE coalesces down anyway).
  *   - No `inferSchema` anywhere: schema inference is a full extra scan at
  *     100 TB. Parquet carries its schema; CSV readers take explicit
  *     `StructType`s (see [[graft.etl.Ingest]]).
  */
object Graft {
  def session(appName: String = "graft", cores: String = defaultCores): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Read one of the driver-generated testdata tables (TESTDATA.md):
    * region nation customer supplier part orders lineitem events documents
    * embeddings. Parquet scan → vectorized reader, pushdown + pruning free.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its TIMESTAMP(NANOS) column (unreadable as a Spark
    * timestamp) surfaced as a proper microsecond TIMESTAMP_NTZ — the same
    * truncation DuckDB applies casting timestamp_ns → timestamp. Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` on the session. */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
}
