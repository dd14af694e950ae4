package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed-table fixtures for the shuffle-free co-located join (x121).
  *
  * Bucketing is THE 100 TB join discipline the brief names explicitly:
  * pay the shuffle once at ingest (`bucketBy` on the join key), and every
  * later equi-join or aggregation on that key is exchange-free — the
  * planner proves both sides' output partitioning matches and plans a
  * sort-merge join with ZERO ShuffleExchange, reading co-located buckets
  * pairwise. On a 1000-executor cluster that turns the nightly
  * fact-to-fact join from the dominant network cost into a local merge;
  * bucket-pruning additionally turns point lookups on the bucket key into
  * 1-of-N file reads (`SelectedBucketsCount` in the scan).
  *
  * Fixture shape: `orders` bucketed+sorted by `o_orderkey` and `lineitem`
  * by `l_orderkey`, both `Buckets` buckets, one file per bucket (the
  * pre-write `repartition` matches task grain to bucket grain, so the
  * merge join needs no per-file sort either). Tables are managed-catalog
  * entries (the S7/q37 surface) named per source dir — the in-memory
  * catalog forgets entries across JVMs while their warehouse dirs persist,
  * so ensure() drops both the entry and any orphaned location before
  * rewriting, exactly like q37.
  *
  * SMB-discipline assertions (zero exchanges vs the shuffled plain-parquet
  * twin, bucket pruning) live in SmbJoinSpec; the driver gate pins the
  * bucketed round trip's CONTENT (join result hash vs the parquet
  * original, the x106 ORC pattern).
  */
object BucketedTables {

  val Buckets = 8

  private val created = scala.collection.mutable.Set[String]()

  /** (ordersTable, lineitemTable) for the given source dir, creating the
    * bucketed managed tables on first use per session. */
  def ensure(s: SparkSession, d: String): (String, String) = synchronized {
    val tag = new java.io.File(d).getName.replace(".", "_")
    val ot = s"graft_bkt_orders_$tag"
    val lt = s"graft_bkt_lineitem_$tag"
    val key = s"$ot|$lt"
    if (!created(key) || !s.catalog.tableExists(ot) || !s.catalog.tableExists(lt)) {
      def reset(tbl: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"), tbl)
        loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      }
      reset(ot)
      reset(lt)
      graft.Graft
        .table(s, d, "orders")
        .repartition(Buckets, col("o_orderkey"))
        .write
        .mode("overwrite")
        .bucketBy(Buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ot)
      graft.Graft
        .table(s, d, "lineitem")
        .repartition(Buckets, col("l_orderkey"))
        .write
        .mode("overwrite")
        .bucketBy(Buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(lt)
      created += key
    }
    (ot, lt)
  }
}
