package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE over a snapshot-versioned parquet table — the
  * table-format WRITE path built from first principles, completing the
  * from-scratch lakehouse triptych: x47/x73 built the stats/skipping READ
  * path, x78 the OPTIMIZE/compaction pass, and this is MERGE INTO with
  * snapshot isolation (the Iceberg/Delta core idea re-derived from the
  * public literature: immutable data files + a versioned manifest that
  * lists them; writers never mutate, they rewrite touched files and
  * publish a new manifest that carries untouched files BY REFERENCE).
  *
  * The 100 TB shape, concretely:
  *   - the table is bucketed by key range (`bucket = k div BucketWidth`), one
  *     directory of immutable parquet per bucket, and the manifest is one
  *     row per bucket (path, min/max key, rows) — file-count-sized
  *     control metadata, the same class as the x73 manifest;
  *   - MERGE prunes with the manifest FIRST: only buckets whose key range
  *     intersects the change keys are read or rewritten. A localized
  *     update against a 10⁶-file table touches a handful of files;
  *     everything else moves to the new snapshot as a manifest row, zero
  *     bytes copied;
  *   - matched keys update, unmatched keys insert (new buckets appended);
  *     the rewrite is per-bucket and embarrassingly parallel — no join
  *     against the full table, no global barrier;
  *   - old snapshots stay readable forever (time travel) because nothing
  *     is overwritten: x82 reads snapshot v1 AFTER the v2 merge and must
  *     reproduce the original table hash-exactly — the gate-level proof
  *     of immutability.
  *
  * Like every fixture artifact, the build is fingerprint-guarded
  * ([[Compaction.ensure]] pattern): steady-state calls are a marker-file
  * read and the gate measures the read/merge result, not the build.
  */
object CowTable {

  /** key-range bucket width (stand-in for a production file's key span) */
  val BucketWidth: Long = 1024L

  val dir = "/root/repo/spark-warehouse/graft_cow"

  /** updated keys: every 97th order key, but only in every 5th bucket —
    * localized updates keep the carried/rewritten split meaningful at any
    * scale factor (scattered updates would touch every bucket). Both the
    * predicate and the cents bump are mirrored in the oracle. */
  val UpdateFilter = s"k % 97 = 0 AND (k div ${BucketWidth}L) % 5 = 0"
  val UpdateBump = 1000L

  /** inserted keys: 50 rows in a key range far above the base table */
  val InsertBase = 10000000L
  val InsertCount = 50

  /** v3 three-clause merge: upsert stripe and delete stripe live in
    * disjoint bucket classes (mod 7), so a key can never be both */
  val Upsert3Filter = s"k % 103 = 0 AND (k div ${BucketWidth}L) % 7 = 3"
  val Delete3Filter = s"k % 101 = 0 AND (k div ${BucketWidth}L) % 7 = 1"

  private def manifestPath(version: Int, root: String) = s"$root/manifest_v$version"

  /** (bucket, path, min_key, max_key, n_rows) for one snapshot — a
    * file-count-sized driver read, the table-format planning unit. */
  def manifest(s: SparkSession, version: Int, root: String = dir): DataFrame =
    s.read.parquet(manifestPath(version, root))

  /** Read one snapshot: union exactly the data directories its manifest
    * lists (carried entries point into older versions' directories — the
    * by-reference half of copy-on-write). Emits `(k, cents)`. */
  def read(s: SparkSession, version: Int, root: String = dir): DataFrame = {
    val paths = manifest(s, version, root).select("path").collect().map(_.getString(0)).sorted
    s.read.parquet(paths.toIndexedSeq: _*)
  }

  /** Build snapshot v1 from `orders` and snapshot v2 = MERGE(updates ∪
    * inserts) into it, fingerprint-guarded on the source files. */
  def ensure(s: SparkSession, d: String): Unit = synchronized {
    val key = Fingerprint.of(
      s,
      s"$d/orders.parquet",
      s"$BucketWidth|$UpdateFilter|$UpdateBump|$InsertBase|$InsertCount|$Upsert3Filter|$Delete3Filter"
    )
    val marker = new java.io.File(s"$dir/src_key")
    if (marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == key) return
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dirFs = dirPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (dirFs.exists(dirPath)) dirFs.delete(dirPath, true)

    // ---- snapshot v1: bucket the base table, one immutable dir per bucket
    val base = graft.Graft
      .table(s, d, "orders")
      .select(
        col("o_orderkey").as("k"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")
      )
      .withColumn("bucket", expr(s"k div ${BucketWidth}L"))
    base.write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/v1")
    writeManifestRows(s, 1, statsOf(s, s"$dir/v1"))

    // ---- MERGE into v2: updates (matched) + inserts (not matched)
    val updates = base
      .where(expr(UpdateFilter))
      .select(col("k"), (col("cents") + lit(UpdateBump)).as("cents"))
    val inserts = s
      .range(InsertCount.toLong)
      .select(
        (col("id") + lit(InsertBase)).as("k"),
        (lit(100000L) + col("id") * 7L).as("cents")
      )
    merge(s, fromVersion = 1, toVersion = 2, changes = updates.unionByName(inserts))

    // ---- MERGE into v3: the full three-clause shape — upserts with an
    // absolute value formula (no dependence on v2 state, so the oracle
    // stays closed-form) plus a DELETE clause over a different bucket
    // stripe; both predicates mirrored in the x83/x84 oracles
    val upserts3 = base
      .where(expr(Upsert3Filter))
      .select(col("k"), expr("50000L + k % 1000").as("cents"))
    val deletes3 = base.where(expr(Delete3Filter)).select("k")
    merge(s, fromVersion = 2, toVersion = 3, changes = upserts3, deletes = deletes3)

    java.nio.file.Files.write(marker.toPath, key.getBytes("UTF-8"))
  }

  /** The COW MERGE, all three clauses: manifest-prune to the touched
    * buckets, rewrite only those (matched keys take the change value,
    * unmatched change keys insert, `deletes` keys drop), append
    * wholly-new buckets, carry every untouched file into the new manifest
    * by reference — its stats copied verbatim, since the file is
    * immutable. A bucket whose every row is deleted vanishes from the new
    * manifest. `changes` is keep-latest keyed `(k, cents)`; `deletes` is
    * a `(k)` frame (deletes of absent keys and of buckets the snapshot
    * does not contain are no-ops, so they never force a rewrite). */
  def merge(
      s: SparkSession,
      fromVersion: Int,
      toVersion: Int,
      changes: DataFrame,
      deletes: DataFrame = null,
      root: String = dir
  ): Unit = {
    val ch = changes.withColumn("bucket", expr(s"k div ${BucketWidth}L"))
    val del = Option(deletes).map(_.withColumn("bucket", expr(s"k div ${BucketWidth}L")))
    val man = manifest(s, fromVersion, root).collect()
    val manBuckets = man.map(_.getAs[Long]("bucket")).toSet
    // change-side bucket lists: one row per touched bucket (dim-sized).
    // Delete buckets only count when the snapshot actually has them.
    val chBuckets = ch.select("bucket").distinct().collect().map(_.getLong(0)).toSet
    val delBuckets = del
      .map(_.select("bucket").distinct().collect().map(_.getLong(0)).toSet.intersect(manBuckets))
      .getOrElse(Set.empty[Long])
    val allTouched = chBuckets ++ delBuckets
    val touched = man.filter(r => allTouched.contains(r.getAs[Long]("bucket")))
    val carried = man.filter(r => !allTouched.contains(r.getAs[Long]("bucket")))
    val newBuckets = chBuckets -- manBuckets
    // rewrite pass: ONLY the touched buckets' files are read — the
    // manifest prune is what makes a small MERGE cheap on a huge table
    val outRoot = s"$root/v$toVersion"
    if (touched.nonEmpty) {
      val touchedPaths = touched.map(_.getAs[String]("path")).sorted
      val touchedSet = touched.map(_.getAs[Long]("bucket")).toSet
      val cur = s.read
        .parquet(touchedPaths.toIndexedSeq: _*)
        .withColumn("bucket", expr(s"k div ${BucketWidth}L"))
      val upd = ch.where(col("bucket").isin(touchedSet.toSeq.map(Long.box): _*))
      // keep-latest upsert via FULL outer join: matched keys replace,
      // unmatched current rows stay, and change keys with no current row
      // INSERT into the bucket they key-range into — a left join from the
      // current side would silently drop inserts that land inside an
      // existing bucket's range (review-found). Deletes drop last, via
      // anti join, so a key both upserted and deleted ends deleted.
      val upserted = cur
        .join(upd.select(col("k").as("uk"), col("cents").as("ucents")), col("k") === col("uk"), "full")
        .select(
          coalesce(col("k"), col("uk")).as("k"),
          coalesce(col("ucents"), col("cents")).as("cents")
        )
      del
        .fold(upserted)(dl => upserted.join(dl.select("k"), Seq("k"), "left_anti"))
        .withColumn("bucket", expr(s"k div ${BucketWidth}L"))
        .write
        .mode("overwrite")
        .partitionBy("bucket")
        .parquet(outRoot)
    }
    if (newBuckets.nonEmpty) {
      val fresh = ch.where(col("bucket").isin(newBuckets.toSeq.map(Long.box): _*))
      // delete-wins applies to NEW buckets too: a key both inserted and
      // deleted in one merge must not survive just because its bucket had
      // no prior file (review-found)
      del
        .fold(fresh)(dl => fresh.join(dl.select("k"), Seq("k"), "left_anti"))
        .write
        .mode(if (touched.nonEmpty) "append" else "overwrite")
        .partitionBy("bucket")
        .parquet(outRoot)
    }
    // new manifest: rewritten + inserted entries get fresh stats from ONE
    // scan of the new files; carried entries keep path AND stats verbatim
    // (an all-carried merge — empty changes — writes no data dir at all)
    val freshRows =
      if (touched.isEmpty && newBuckets.isEmpty) Seq.empty else statsOf(s, outRoot)
    val carriedRows = carried.map { r =>
      (r.getAs[Long]("bucket"), r.getAs[String]("path"), r.getAs[Long]("min_key"),
        r.getAs[Long]("max_key"), r.getAs[Long]("n_rows"))
    }
    writeManifestRows(s, toVersion, freshRows ++ carriedRows, root)
  }

  /** Row-level change-data-capture between two snapshots, reading ONLY
    * the buckets whose manifest entries differ (path inequality = the
    * bucket was rewritten between the versions; a bucket present on one
    * side only was created or dropped whole). Carried buckets share their
    * physical files, so they can't differ and are never read — diff cost
    * is proportional to changed files, not table size. Emits
    * `(k, change_type I|U|D, old_cents, new_cents)` with -1 standing in
    * for "no value" (sentinel keeps the gate free of nullable columns);
    * same-value rewrites are not changes and are excluded. */
  def snapshotDiff(s: SparkSession, fromVersion: Int, toVersion: Int, root: String = dir): DataFrame = {
    val mOld =
      manifest(s, fromVersion, root).collect().map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
    val mNew =
      manifest(s, toVersion, root).collect().map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
    val changedOld = mOld.filter { case (b, p) => mNew.get(b) != Some(p) }.values.toSeq.sorted
    val changedNew = mNew.filter { case (b, p) => mOld.get(b) != Some(p) }.values.toSeq.sorted
    def readSide(paths: Seq[String], kc: String, cc: String): DataFrame =
      if (paths.isEmpty)
        s.range(0).select(col("id").as(kc), col("id").as(cc))
      else s.read.parquet(paths: _*).select(col("k").as(kc), col("cents").as(cc))
    readSide(changedOld, "ko", "co")
      .join(readSide(changedNew, "kn", "cn"), col("ko") === col("kn"), "full")
      .where(col("ko").isNull || col("kn").isNull || col("co") =!= col("cn"))
      .select(
        coalesce(col("ko"), col("kn")).as("k"),
        when(col("ko").isNull, lit("I")).when(col("kn").isNull, lit("D")).otherwise(lit("U")).as("change_type"),
        coalesce(col("co"), lit(-1L)).as("old_cents"),
        coalesce(col("cn"), lit(-1L)).as("new_cents")
      )
  }

  /** Vacuum PLANNING over retained snapshots: every physical bucket
    * directory under the table root vs the paths the retained manifests
    * reference — the difference is garbage no retained snapshot can
    * reach, eligible for deletion once older snapshots expire. Planning
    * only (the x45-before-x78 split): executing it breaks time travel to
    * expired versions by design, so the gate never runs the delete —
    * CowTableSpec does, on the fixture, and rebuilds after. Driver-side
    * listing: file-count-sized metadata, the table-format shape. */
  def vacuumPlan(s: SparkSession, retain: Seq[Int], root: String = dir): (Seq[String], Seq[String]) = {
    val referenced = retain
      .flatMap(v => manifest(s, v, root).select("path").collect().map(_.getString(0)))
      .toSet
    val all = new java.io.File(root)
      .listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(_.listFiles())
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getAbsolutePath)
      .toSeq
    val orphans = all.filterNot(referenced.contains)
    (orphans.sorted, all.sorted)
  }

  /** per-bucket (bucket, path, min_key, max_key, n_rows) from ONE scan of
    * a snapshot root (basePath keeps the partition column; its inferred
    * type varies, hence the cast). An all-deletes rewrite can leave the
    * root with no bucket dirs at all → empty stats BY LISTING, never by
    * swallowing exceptions — a real read failure must fail the merge, not
    * silently publish a manifest missing every rewritten bucket. */
  private def statsOf(s: SparkSession, root: String): Seq[(Long, String, Long, Long, Long)] = {
    val children = Option(new java.io.File(root).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    if (!children.exists(f => f.isDirectory && f.getName.startsWith("bucket="))) Seq.empty
    else statsOfUnsafe(s, root)
  }

  private def statsOfUnsafe(s: SparkSession, root: String): Seq[(Long, String, Long, Long, Long)] =
    s.read
      .option("basePath", root)
      .parquet(root)
      .withColumn("bucket", col("bucket").cast("long"))
      .groupBy("bucket")
      .agg(min("k").as("mn"), max("k").as("mx"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("bucket"), s"$root/bucket=${r.getAs[Long]("bucket")}",
        r.getAs[Long]("mn"), r.getAs[Long]("mx"), r.getAs[Long]("n")))
      .toSeq

  private def writeManifestRows(s: SparkSession, version: Int, rows: Seq[(Long, String, Long, Long, Long)], root: String = dir): Unit = {
    import s.implicits._
    rows.sortBy(_._1)
      .toDF("bucket", "path", "min_key", "max_key", "n_rows")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(manifestPath(version, root))
  }
}
