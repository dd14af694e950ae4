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

  /** `events` with `ts` normalized to a microsecond TIMESTAMP_NTZ whatever
    * physical type the generator wrote it as. Seen in the wild across
    * driver rounds: TIMESTAMP(NANOS) read as a nano long (needs
    * `spark.sql.legacy.parquet.nanosAsLong=true`, then the same micros
    * truncation DuckDB applies casting timestamp_ns → timestamp),
    * TIMESTAMP(MICROS) read natively as TIMESTAMP_NTZ (pass-through), and
    * the tz-adjusted variant (cast; session tz is pinned UTC so the cast
    * is deterministic). Schema-adaptive so every downstream query and its
    * DuckDB oracle (`epoch_ns(ts)` / `ts::TIMESTAMP` — valid on any of
    * these) see one stable shape. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case org.apache.spark.sql.types.TimestampNTZType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
}
