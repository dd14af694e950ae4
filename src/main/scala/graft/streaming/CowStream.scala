package graft.streaming

import graft.sources.CowTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MERGE INTO the copy-on-write table — the transactional sink
  * [[EventStreams.upsertSink]]'s comment asks for ("an object store would
  * need a manifest or transactional table format"): each microbatch
  * commits one snapshot version of a [[CowTable]]-format table, so the
  * table is never half-written (readers see the last published manifest),
  * history is queryable per batch (time travel across microbatches), and
  * a crash between data write and manifest publish leaves the previous
  * snapshot intact — manifest publication IS the commit point.
  *
  * Exactly-once without a staging swap: the target version is derived
  * from the BATCH ID (`startVersion + batchId + 1`), not from "latest
  * version on disk", so a replayed batch after a crash rewrites the SAME
  * version from the SAME predecessor manifest — deterministic, idempotent.
  * In-batch keep-latest follows the upsertSink convention: max `seq` per
  * key wins, and the ordering is TOTAL — seq ties break on the value
  * itself — so even malformed duplicate (k, seq) inputs resolve the same
  * way on every replay, keeping rewrite-same-version honest.
  *
  * Scale shape per batch: one dim-sized manifest read, a rewrite of only
  * the buckets the batch's keys touch, carried files move by reference —
  * a trickle of streaming upserts against a 100 TB table costs the
  * touched buckets, not the table.
  */
object CowStream {

  /** Start the streaming merge. `changes` must carry `(k, cents, seq)`;
    * deletes ride along as `cents IS NULL` rows (the CDC tombstone
    * convention), applied after upserts like [[CowTable.merge]]. */
  def mergeSink(
      changes: DataFrame,
      checkpoint: String,
      root: String,
      startVersion: Int
  ): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("k")
          .orderBy(col("seq").desc, col("cents").desc_nulls_first)
        val latest = batch
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("k", "cents")
          .localCheckpoint() // two plan refs below; never recompute a batch
        val upserts = latest.where(col("cents").isNotNull)
        val deletes = latest.where(col("cents").isNull).select("k")
        val toVersion = startVersion + batchId.toInt + 1
        CowTable.merge(
          s,
          fromVersion = toVersion - 1,
          toVersion = toVersion,
          changes = upserts,
          deletes = deletes,
          root = root
        )
        ()
      }
      .start()

  /** Bootstrap an empty table (version 0: an empty manifest) so the first
    * microbatch has a predecessor to merge against. */
  def init(s: org.apache.spark.sql.SparkSession, root: String): Unit = {
    import s.implicits._
    new java.io.File(root).mkdirs()
    CowTable.writeManifestRows(s, 0, Seq.empty, root)
  }
}
