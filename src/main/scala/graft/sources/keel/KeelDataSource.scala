package graft.sources.keel

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.io.Source
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.KeelSource
import graft.sources.KeelSource.{Attr, NominalAttr, RealAttr}

/** DataSource V2 provider for the KEEL format: `spark.read.format("keel")
  * .load(path)` (registered as `keel` via `DataSourceRegister` +
  * META-INF/services). Where `KeelSource.read` is the convenience
  * loader that emits the engine's (id, v, label) triple through
  * Catalyst projections, this is the full catalog-integration surface:
  * one typed column PER ATTRIBUTE (reals header-normalized to DOUBLE,
  * nominals position-encoded to INT — same semantics, FIXTURES.md §B),
  * with
  *
  *  - schema inference from the header (`TableProvider.inferSchema`),
  *  - COLUMN PRUNING pushed into the reader
  *    (`SupportsPushDownRequiredColumns` — unprojected attributes are
  *    never parsed; KeelV2Spec asserts the scan's readSchema),
  *  - one input partition per file, so a directory of KEEL files scans
  *    in parallel (each file re-parses its own few-line header — the
  *    files are self-describing; schema homogeneity is the caller's
  *    contract, as with CSV).
  *
  * KEEL corpora are small-data (the reference's input format, not the
  * 100-TB path — that is parquet); the DSv2 value here is making the
  * legacy format a first-class, pruning-aware table.
  */
class KeelDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "keel"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("keel source requires a path"))
    KeelV2.toStructType(KeelV2.headerOf(path,
      SparkSession.active.sparkContext.hadoopConfiguration))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeelTable(properties.get("path"), schema)
}

private[keel] object KeelV2 {
  def headerOf(path: String, conf: Configuration): KeelSource.Schema = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory) {
        val files = dataFiles(path, conf)
        require(files.nonEmpty, s"keel source: no data files under $path")
        files.head
      } else p
    val in = fs.open(file)
    try {
      val lines = Source.fromInputStream(in).getLines()
        .takeWhile(!_.trim.equalsIgnoreCase("@data"))
        .filter(_.trim.startsWith("@")).toSeq
      KeelSource.parseHeader(lines)
    } finally in.close()
  }

  def dataFiles(path: String, conf: Configuration): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(p)
    else fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      .sortBy(_.toString)
  }

  def toStructType(s: KeelSource.Schema): StructType = {
    val b = new StructType()
    s.attrs.foldLeft(b) { (acc, a) =>
      a.kind match {
        case RealAttr(_, _) => acc.add(a.name, DoubleType, nullable = true)
        case NominalAttr(_) => acc.add(a.name, IntegerType, nullable = true)
      }
    }
  }
}

private[keel] class KeelTable(path: String, tblSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"keel:$path"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeelScanBuilder(path, tblSchema)
}

private[keel] class KeelScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KeelScan(path, required)
}

private[keel] case class KeelFilePartition(file: String) extends InputPartition

private[keel] class KeelScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    KeelV2.dataFiles(path, SparkSession.active.sparkContext.hadoopConfiguration)
      .map(f => KeelFilePartition(f.toString)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new KeelReaderFactory(required.fieldNames)
}

private[keel] class KeelReaderFactory(required: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KeelPartitionReader(partition.asInstanceOf[KeelFilePartition].file, required)
}

/** Parses one KEEL file: header for attribute kinds/ranges, then each
  * data line to an InternalRow of ONLY the required columns (pruning =
  * unrequested attributes are never converted).
  */
private[keel] class KeelPartitionReader(file: String, required: Array[String])
    extends PartitionReader[InternalRow] {
  // default Hadoop conf: local/HDFS paths resolve; object-store creds
  // travelling via session conf would need a SerializableConfiguration
  // hop — out of scope for this legacy small-data format
  private val conf = new Configuration()
  private val schema = KeelV2.headerOf(file, conf)
  private val attrIdx = schema.attrs.map(_.name).zipWithIndex.toMap
  // (csv position, attr) per required output column
  private val cols: Array[(Int, Attr)] =
    required.map { n =>
      val a = schema.attrs(attrIdx(n))
      (attrIdx(n), a)
    }
  private val in = {
    val p = new Path(file)
    p.getFileSystem(conf).open(p)
  }
  private val lines = Source.fromInputStream(in).getLines()
    .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("@") && !l.startsWith("%"))
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      val parts = lines.next().split(",", -1)
      val vals = new ArrayBuffer[Any](cols.length)
      cols.foreach { case (i, attr) =>
        // the schema advertises nullable=true, and the reader honors it:
        // KEEL missing values ('?' or empty), short rows, unparseable
        // reals, and out-of-vocabulary nominals all emit NULL instead of
        // killing the task (or, worse, silently encoding -1)
        val raw = if (i < parts.length) parts(i).trim else "?"
        if (raw == "?" || raw.isEmpty) vals += null
        else attr.kind match {
          case RealAttr(lo, hi) =>
            raw.toDoubleOption match {
              case Some(x) if hi > lo => vals += (x - lo) / (hi - lo)
              case Some(x) => vals += x
              case None => vals += null
            }
          case NominalAttr(vs) =>
            val idx = vs.indexOf(raw)
            vals += (if (idx >= 0) idx else null)
        }
      }
      current = new GenericInternalRow(vals.toArray)
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
