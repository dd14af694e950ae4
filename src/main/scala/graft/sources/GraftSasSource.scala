package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The SAS7BDAT reader as a registered DataSource V2 —
  * `spark.read.format("graft-sas7bdat")` — the EXACT shape the reference
  * consumes its I94 data through (`Capstone Project Template.ipynb`
  * cell 5: `spark.read.format("com.github.saurfang.sas.spark")`). A user
  * of the reference swaps the format string and keeps their code.
  *
  * Engine contracts:
  *   - SPLITTABLE: pages are fixed-size blocks after the header, so
  *     partitions are page RANGES (one per task slot) and each reader
  *     seeks + reads only its own pages — [[Sas7bdat.read]]'s
  *     distribution, surfaced through the connector API.
  *   - COLUMN PRUNING: SAS rows are row-major, so pruning cannot skip
  *     bytes on disk — but only the REQUIRED columns' cells are decoded
  *     and converted (numCell/strCell per retained column), which is
  *     where the CPU goes on wide tables. The honest limit is stated
  *     here rather than implied away.
  *   - Metadata is parsed ONCE on the driver (header + meta pages); the
  *     serialized [[Sas7bdat.SasMeta]] ships to executors.
  */
class GraftSasSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sas7bdat"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "graft-sas7bdat requires a single path option")
    Sas7bdat.sparkSchema(GraftSasSource.metaOf(path))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftSasTable(properties.get("path"), schema)
}

object GraftSasSource {
  private[sources] def metaOf(path: String): Sas7bdat.SasMeta = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    Sas7bdat.parseMeta(Sas7bdat.hadoopReadAt(p, conf))
  }
}

class GraftSasTable(path: String, tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft-sas7bdat:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSasScanBuilder(path, tableSchema)
}

class GraftSasScanBuilder(path: String, full: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(full.fields.sortBy(_.name).take(1).toIndexedSeq)

  override def build(): Scan = new GraftSasScan(path, required)
}

/** One planned partition: the page range [fromPage, untilPage). */
case class GraftSasPartition(fromPage: Long, untilPage: Long) extends InputPartition

class GraftSasScan(path: String, required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-sas7bdat $path cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val meta = GraftSasSource.metaOf(path)
    val slots = SparkSession.active.sparkContext.defaultParallelism.toLong
    val nParts = math.max(1L, math.min(meta.pageCount, slots))
    val per = (meta.pageCount + nParts - 1) / nParts
    (0L until meta.pageCount by per)
      .map(from => GraftSasPartition(from, math.min(from + per, meta.pageCount)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val meta = GraftSasSource.metaOf(path)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new GraftSasReaderFactory(path, meta, required, conf)
  }
}

class GraftSasReaderFactory(
    path: String,
    meta: Sas7bdat.SasMeta,
    required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftSasPartition]
    new GraftSasPartitionReader(path, meta, required, conf, p.fromPage, p.untilPage)
  }
}

class GraftSasPartitionReader(
    path: String,
    meta: Sas7bdat.SasMeta,
    required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration,
    fromPage: Long,
    untilPage: Long
) extends PartitionReader[InternalRow] {

  // decode order follows the FILE's column order; project to `required`
  private val colIdx: Array[Int] = required.fields.map { f =>
    val i = meta.cols.indexWhere(_.name == f.name)
    require(i >= 0, s"no SAS column ${f.name}")
    i
  }

  private val hp = new org.apache.hadoop.fs.Path(path)
  private lazy val in = hp.getFileSystem(conf.value).open(hp)
  private val buf = new Array[Byte](meta.pageSize)
  private var page = fromPage
  private var rows: Iterator[Array[Any]] = Iterator.empty

  override def next(): Boolean = {
    while (!rows.hasNext && page < untilPage) {
      in.readFully(meta.headerSize + page * meta.pageSize, buf)
      rows = Sas7bdat.pageRows(meta, buf, colIdx) // only required cells decode
      page += 1
    }
    rows.hasNext
  }

  override def get(): InternalRow = {
    val cells = rows.next()
    val out = new Array[Any](cells.length)
    var i = 0
    while (i < cells.length) {
      out(i) = cells(i) match {
        case null                => null
        case d: java.lang.Double => d.doubleValue()
        case s: String           => UTF8String.fromString(s)
        case other               => throw new IllegalArgumentException(s"unexpected SAS cell $other")
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = in.close()
}
