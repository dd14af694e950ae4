package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for the whole forked test JVM (never stopped —
  * the fork exits after the run). */
object TestSpark {
  lazy val spark: SparkSession = Graft.session("graft-test", "4")

  /** Write small fixture tables as parquet so `(spark, dir) => DataFrame`
    * queries can run against synthetic inputs. */
  def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-test").toString

  def writeTable(dir: String, name: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
}
