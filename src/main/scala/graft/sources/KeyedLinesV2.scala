package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STORAGE-PARTITIONED JOIN source — the modern DataSource V2 mechanism
  * (Iceberg's bucket-join path) for ZERO-SHUFFLE fact⋈fact joins at the
  * connector layer, completing the co-location story `k_bucketed_join`
  * tells with catalog bucketing: the source's layout is already grouped
  * by `bucket(n, k)` (one directory per bucket, written once at ingest),
  * and the scan REPORTS that layout to Catalyst via
  * [[SupportsReportPartitioning]] — `KeyGroupedPartitioning(bucket(n, k))`
  * with every [[InputPartition]] carrying its bucket id through
  * [[HasPartitionKey]]. Under `spark.sql.sources.v2.bucketing.enabled`,
  * two scans reporting the SAME bucket transform join with NO Exchange
  * on either side: partition i of the left joins partition i of the
  * right, which at 100 TB deletes the two largest shuffles a fact⋈fact
  * join would otherwise pay.
  *
  * The payload format is deliberately minimal (`k,v` text lines —
  * wire-format parsing is [[FilingIndexV2]]'s story); what this
  * connector demonstrates is the PARTITIONING metadata contract. */
class KeyedLinesV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedLinesV2.schemaFor(options.get("prefix"))
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new KeyedLinesV2.KeyedTable(
      properties.get("path"), properties.get("prefix"),
      Option(properties.get("buckets")).map(_.toInt).getOrElse(8))
}

object KeyedLinesV2 {

  /** Column names are prefixed per table so a self-join's two sides stay
    * distinguishable in SQL (`o_k` vs `c_k`). */
  def schemaFor(prefix: String): StructType = {
    val p = Option(prefix).getOrElse("")
    StructType(Seq(
      StructField(p + "k", LongType, nullable = false),
      StructField(p + "v", DoubleType, nullable = false)))
  }

  private[sources] class KeyedTable(path: String, prefix: String, buckets: Int)
      extends Table with SupportsRead {
    require(path != null, "keyed-lines source requires a path")
    override def name(): String = s"graft_keyed_lines($path)"
    override def schema(): StructType = schemaFor(prefix)
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new KeyedScan(path, prefix, buckets)
  }

  private[sources] case class KeyedScan(path: String, prefix: String, buckets: Int)
      extends Scan with Batch with SupportsReportPartitioning {
    private val keyName = Option(prefix).getOrElse("") + "k"
    override def readSchema(): StructType = schemaFor(prefix)
    override def toBatch: Batch = this
    override def description(): String = s"graft_keyed_lines($path, bucket($buckets, $keyName))"

    /** The contract that makes SPJ fire: the layout IS
      * bucket(buckets, k), one input partition per bucket, each
      * announcing its bucket id. */
    override def outputPartitioning(): Partitioning =
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(buckets, keyName)), buckets)

    override def planInputPartitions(): Array[InputPartition] =
      (0 until buckets).map(i => BucketPartition(s"$path/bucket=$i", i): InputPartition).toArray

    override def createReaderFactory(): PartitionReaderFactory =
      KeyedReaderFactory(new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
  }

  private[sources] case class BucketPartition(dir: String, bucket: Int)
      extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow = InternalRow(bucket)
  }

  private[sources] case class KeyedReaderFactory(
      conf: org.apache.spark.util.SerializableConfiguration)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new KeyedReader(partition.asInstanceOf[BucketPartition].dir, conf.value)
  }

  private[sources] class KeyedReader(
      dir: String, hadoopConf: org.apache.hadoop.conf.Configuration)
      extends PartitionReader[InternalRow] {
    private val files: Iterator[Path] = {
      val p = new Path(dir)
      val fs = p.getFileSystem(hadoopConf)
      if (!fs.exists(p)) Iterator.empty
      else fs.listStatus(p).iterator
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
        .map(_.getPath)
    }
    private var reader: java.io.BufferedReader = _
    private var current: InternalRow = _

    @annotation.tailrec
    private def nextLine(): String = {
      if (reader == null) {
        if (!files.hasNext) return null
        val p = files.next()
        reader = new java.io.BufferedReader(new java.io.InputStreamReader(
          p.getFileSystem(hadoopConf).open(p), "UTF-8"))
      }
      val line = reader.readLine()
      if (line != null) line
      else { reader.close(); reader = null; nextLine() }
    }

    override def next(): Boolean = {
      val line = nextLine()
      if (line == null) false
      else {
        val c = line.indexOf(',')
        current = InternalRow(line.substring(0, c).toLong, line.substring(c + 1).toDouble)
        true
      }
    }

    override def get(): InternalRow = current
    override def close(): Unit = if (reader != null) reader.close()
  }
}
