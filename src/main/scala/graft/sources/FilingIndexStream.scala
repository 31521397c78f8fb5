package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The STREAMING READ leg of the connector family — with this, every
  * DataSource V2 surface the engine uses is custom-implemented: batch
  * read ([[FilingIndexV2]]), batch + streaming write ([[FixedWidthV2]]),
  * and now a [[MicroBatchStream]] source over an APPEND-ONLY directory of
  * staged filing-index files (the offline shape of "new submissions keep
  * arriving"; the reference polls the same feed over HTTP).
  *
  * Offsets are the ingested-file COUNT over the lexicographic file
  * order: the directory contract is append-only with names that sort
  * after everything already present (what log-structured feeds provide),
  * so an offset range [a, b) denotes files a until b of the sorted
  * listing — deterministic, replayable, and cheap to compare. Each
  * micro-batch plans one partition per newly-arrived file and reuses the
  * batch connector's line reader, so a record is ingested EXACTLY ONCE
  * per offset range; the checkpointed offset makes that exactly-once
  * across restarts (FilingIndexStreamSpec stops mid-feed and resumes
  * from the checkpoint). `commit` is a no-op — files are retained, the
  * offset alone is the cursor.
  *
  * ADMISSION CONTROL: the stream implements [[SupportsAdmissionControl]]
  * with a `maxFilesPerTrigger` option — without it, a 1,000-file backlog
  * (a real feed after any downtime) lands in ONE giant micro-batch whose
  * state/commit granularity is unbounded. With the limit, the engine
  * paces the backlog into bounded batches: `latestOffset(start, limit)`
  * advances the file-count cursor by at most the limit per trigger, and
  * the exactly-once story is unchanged because the offset semantics are
  * identical — only the stride differs. */
class FilingIndexStream extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FilingIndexV2.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table = {
    val maxFiles = Option(properties.get("maxFilesPerTrigger")).map { v =>
      val n = v.toInt
      require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
      n
    }
    new FilingIndexStream.StreamTable(properties.get("path"), maxFiles)
  }
}

object FilingIndexStream {

  private[sources] case class FileCountOffset(n: Int) extends Offset {
    override def json(): String = n.toString
  }

  private[sources] class StreamTable(path: String, maxFilesPerTrigger: Option[Int])
      extends Table with SupportsRead {
    require(path != null, "graft filing-index stream requires a path")
    override def name(): String = s"graft_filing_index_stream($path)"
    override def schema(): StructType = FilingIndexV2.Schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new StreamScan(path, maxFilesPerTrigger)
  }

  private[sources] class StreamScan(path: String, maxFilesPerTrigger: Option[Int]) extends Scan {
    override def readSchema(): StructType = FilingIndexV2.Schema
    override def description(): String = s"graft_filing_index_stream($path)"
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new IndexMicroBatchStream(path, maxFilesPerTrigger)
  }

  private[sources] class IndexMicroBatchStream(
      path: String, maxFilesPerTrigger: Option[Int] = None)
      extends MicroBatchStream with SupportsAdmissionControl
      with SupportsTriggerAvailableNow {
    // Trigger.AvailableNow BACKFILL: the engine announces it up front,
    // the source pins the CURRENT end of the feed, and the paced drain
    // stops there — "process everything that exists now in bounded
    // batches, then terminate", the standard backfill/catch-up shape.
    // Files arriving after the pin are left for the next run (the
    // checkpointed offset carries over — exactly-once is unchanged).
    @volatile private var availableNowCap: Option[Int] = None

    override def prepareForTriggerAvailableNow(): Unit =
      availableNowCap = Some(listSorted().length)

    private def listSorted(): Array[String] = {
      val p = new Path(path)
      val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Array.empty
      else fs.listStatus(p)
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
        .map(_.getPath.toString)
        .sorted
    }

    override def initialOffset(): Offset = FileCountOffset(0)

    // with SupportsAdmissionControl the engine calls the 2-arg variant;
    // the legacy form must never be consulted
    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "latestOffset(start, limit) is the admission-controlled entry point")

    override def getDefaultReadLimit: ReadLimit =
      maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

    /** Advance the cursor by at most the per-trigger file budget — a
      * backlog of N files drains in ⌈N/limit⌉ bounded micro-batches. */
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val a = start.asInstanceOf[FileCountOffset].n
      val total = availableNowCap.getOrElse(listSorted().length)
      limit match {
        case mf: ReadMaxFiles => FileCountOffset(math.min(total, a + mf.maxFiles()))
        case _                => FileCountOffset(total)
      }
    }

    override def reportLatestOffset(): Offset = FileCountOffset(listSorted().length)

    override def deserializeOffset(json: String): Offset = FileCountOffset(json.toInt)

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val a = start.asInstanceOf[FileCountOffset].n
      val b = end.asInstanceOf[FileCountOffset].n
      val files = listSorted()
      require(files.length >= b,
        s"offset $b beyond the directory's ${files.length} files — append-only contract broken")
      files.slice(a, b).map(f => FilingIndexV2.IndexPartition(f): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      FilingIndexV2.IndexReaderFactory(
        FilingIndexV2.Schema.fieldNames, Array.empty, formNotNull = false, None,
        Long.MinValue, Long.MaxValue, None,
        new org.apache.spark.util.SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))

    override def commit(end: Offset): Unit = () // files retained; the offset is the cursor
    override def stop(): Unit = ()
  }
}
