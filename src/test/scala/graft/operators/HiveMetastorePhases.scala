package graft.operators

import org.apache.spark.sql.SparkSession

/** Child-JVM phases for the S7 metastore-persistence proof (driven by
  * [[HiveCatalogSpec]], which launches each phase as its own process):
  * catalog state written through `enableHiveSupport()` + an embedded-derby
  * metastore must be readable BY NAME from a later, separate JVM — the
  * restart contract the reference's notebook session (cell 5,
  * `enableHiveSupport()`) relies on and that the in-memory catalog behind
  * q37 deliberately does not provide. Embedded derby allows one JVM at a
  * time, which is exactly why this is a two-process test and not two
  * sessions in one JVM.
  */
object HiveMetastorePhases {
  def main(args: Array[String]): Unit = {
    val Array(phase, dir) = args
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName(s"graft-hive-$phase")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$dir/warehouse")
      .config("javax.jdo.option.ConnectionURL", s"jdbc:derby:;databaseName=$dir/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .enableHiveSupport()
      .getOrCreate()
    try {
      import spark.implicits._
      phase match {
        case "create" =>
          (1 to 100)
            .map(i => (i.toLong, s"name$i"))
            .toDF("id", "name")
            .write
            .mode("overwrite")
            .saveAsTable("graft_persisted_dim")
          println("GRAFT_PHASE_CREATE_OK")
        case "read" =>
          // by NAME through the catalog — no path is passed anywhere
          val sum = spark.table("graft_persisted_dim").agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
          val n = spark.catalog.listTables().count()
          println(s"GRAFT_PHASE_READ_SUM=$sum TABLES=$n")
      }
    } finally spark.stop()
  }
}
