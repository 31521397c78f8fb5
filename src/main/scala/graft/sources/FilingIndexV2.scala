package graft.sources

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a DataSource V2 connector — the extension point SURVEY.md §2 maps
  * the reference's HTTP JSON source onto for the online case
  * (ETFQuarterlyHoldingsExtractor.py:30-39). This offline form serves the
  * staged EDGAR-shaped submissions JSON (one fund document per line,
  * parallel arrays under `filings.recent`) as ALREADY-EXPLODED filing
  * rows: the zip + null-fill that the relational path does with
  * `arrays_zip`+`explode` happens inside the source, the way a real
  * connector hides a wire format.
  *
  * Spark integration, not just a reader:
  *   - one InputPartition per staged file → reads scale out with the
  *     stage's file count (an HTTP variant would partition the CIK list
  *     the same way and fetch in `PartitionReader.next`);
  *   - `SupportsPushDownRequiredColumns`: the reader materializes ONLY
  *     requested columns — a `select(cik)` never builds row strings;
  *   - `SupportsPushDownFilters`: `form_type = <literal>` evaluates inside
  *     the source during the explode (the reference's F1 filter), so
  *     non-NPORT rows never leave the scan — the plan shows the pushed
  *     filter and plans no re-check.
  * FilingIndexV2Spec asserts output-equality with the arrays_zip path and
  * both pushdowns on the planned scan.
  */
class FilingIndexV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FilingIndexV2.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new FilingIndexV2.IndexTable(properties.get("path"))
}

object FilingIndexV2 {

  val Schema: StructType = StructType(Seq(
    StructField("cik", LongType),
    StructField("accession_number", StringType),
    StructField("filing_date", StringType),
    StructField("form_type", StringType),
    StructField("primary_document", StringType)))

  private[sources] class IndexTable(path: String) extends Table with SupportsRead {
    require(path != null, "graft filing-index source requires a path")
    override def name(): String = s"graft_filing_index($path)"
    override def schema(): StructType = Schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new IndexScanBuilder(path)
  }

  private[sources] class IndexScanBuilder(path: String)
      extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
    private var required: StructType = Schema
    private var pushed: Array[Filter] = Array.empty

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (accepted, rest) = filters.partition {
        case EqualTo("form_type", _: String) => true
        case _ => false
      }
      pushed = accepted
      rest // accepted filters are FULLY evaluated here; nothing to re-check
    }

    override def pushedFilters(): Array[Filter] = pushed

    override def build(): Scan = IndexScan(path, required, pushed.collect {
      case EqualTo(_, v: String) => v
    })
  }

  /** `formEq`: the pushed form_type equality literals (all must match). */
  private[sources] case class IndexScan(
      path: String, required: StructType, formEq: Array[String])
      extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft_filing_index pushed=[${formEq.mkString(",")}] cols=[${required.fieldNames.mkString(",")}]"

    override def planInputPartitions(): Array[InputPartition] = {
      val p = new Path(path)
      val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .sortBy(_.getPath.getName)
        .map(s => IndexPartition(s.getPath.toString): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      // Snapshot the session's Hadoop configuration DRIVER-SIDE and ship it
      // with the factory: the reader must see the same filesystem settings
      // (S3A credentials, defaultFS, …) that planInputPartitions listed
      // with, or the connector only works against the local FS.
      IndexReaderFactory(required.fieldNames, formEq,
        new org.apache.spark.util.SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
  }

  private[sources] case class IndexPartition(file: String) extends InputPartition

  private[sources] case class IndexReaderFactory(
      cols: Array[String], formEq: Array[String],
      conf: org.apache.spark.util.SerializableConfiguration)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new IndexReader(partition.asInstanceOf[IndexPartition].file, cols, formEq, conf.value)
  }

  /** Streams one staged file line-by-line; each fund document expands to
    * its zipped filing rows (max array length, null-fill — the arrays_zip
    * contract), filtered by any pushed form_type equality BEFORE a row is
    * built, projecting only the required columns. The stream opens lazily
    * on the first `next()` call — task construction stays cheap and a
    * partition that is planned but never read opens no file handle. */
  private[sources] class IndexReader(
      file: String, cols: Array[String], formEq: Array[String],
      hadoopConf: org.apache.hadoop.conf.Configuration)
      extends PartitionReader[InternalRow] {
    private val mapper = new ObjectMapper
    private var opened = false
    private lazy val in = {
      val p = new Path(file)
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getFileSystem(hadoopConf).open(p), "UTF-8"))
      // only after the open SUCCEEDED — if it threw, close() must stay a
      // no-op rather than re-force this lazy val, re-attempt the failed
      // open, and mask the original task failure with its own exception
      opened = true
      r
    }
    private var rows: Iterator[InternalRow] = Iterator.empty
    private var current: InternalRow = _

    private def str(n: JsonNode, i: Int): UTF8String =
      if (n == null || i >= n.size() || n.get(i).isNull) null
      else UTF8String.fromString(n.get(i).asText())

    private def expand(line: String): Iterator[InternalRow] = {
      val root = mapper.readTree(line)
      val cik = root.get("cik").asLong()
      val recent = root.at("/filings/recent")
      val acc = recent.get("accessionNumber")
      val fd = recent.get("filingDate")
      val form = recent.get("form")
      val pdoc = recent.get("primaryDocument")
      val n = Seq(acc, fd, form, pdoc).map(a => if (a == null) 0 else a.size()).max
      (0 until n).iterator.flatMap { i =>
        val f = str(form, i)
        if (formEq.nonEmpty && !formEq.forall(v => f != null && f.toString == v)) None
        else Some(InternalRow.fromSeq(cols.toSeq.map {
          case "cik" => cik
          case "accession_number" => str(acc, i)
          case "filing_date" => str(fd, i)
          case "form_type" => f
          case "primary_document" => str(pdoc, i)
        }))
      }
    }

    override def next(): Boolean = {
      while (!rows.hasNext) {
        val line = in.readLine()
        if (line == null) return false
        if (line.nonEmpty) rows = expand(line)
      }
      current = rows.next()
      true
    }

    override def get(): InternalRow = current
    override def close(): Unit = if (opened) in.close()
  }
}
