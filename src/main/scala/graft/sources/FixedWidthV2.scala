package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 story (the read half is
  * [[FilingIndexV2]]): a fixed-width-record SINK implementing Spark's
  * two-phase commit protocol for real — the contract that makes a
  * distributed write atomic on a 1000-executor cluster where any task can
  * fail or be speculatively duplicated.
  *
  *   - each task's [[FwWriter]] streams 48-byte records to a
  *     TASK-PRIVATE temp file (`_temporary/part-<partition>-<task>.fw` —
  *     attempt-unique, so speculative duplicates never collide) and
  *     `commit()` returns a [[FwCommitMessage]] carrying the temp path +
  *     row/byte counts — NOTHING is visible to readers yet;
  *   - the driver's [[FwBatchWrite.commit]] runs once with every task's
  *     message: it renames exactly the committed attempts' files into
  *     place (an aborted or losing attempt's file is never renamed) and
  *     publishes `_MANIFEST` LAST — readers that gate on the manifest see
  *     the whole write or none of it;
  *   - `abort()` deletes the temp dir, leaving prior data untouched.
  *
  * The record layout is the mainframe interchange shape of
  * `k_fixedwidth_roundtrip` (key 12 ∣ status 4 ∣ %016.2f price ∣
  * priority 16), so the read-back parse is plain substring/cast column
  * arithmetic and the round trip is oracle-checkable against the
  * original table. */
class FixedWidthV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidthV2.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new FixedWidthV2.FwTable(properties.get("path"))
}

object FixedWidthV2 {

  val Schema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType, nullable = false),
    StructField("o_orderstatus", StringType, nullable = false),
    StructField("o_totalprice", DoubleType, nullable = false),
    StructField("o_orderpriority", StringType, nullable = false)))

  val RecordLen = 48

  private def rpad(s: String, n: Int): String = {
    require(s.length <= n, s"field '$s' exceeds its fixed width $n")
    s + " " * (n - s.length)
  }

  private[sources] def render(key: Long, status: String, price: Double, prio: String): String =
    rpad(key.toString, 12) + rpad(status, 4) +
      String.format(java.util.Locale.ROOT, "%016.2f", Double.box(price)) +
      rpad(prio, 16)

  private[sources] class FwTable(path: String) extends Table with SupportsWrite {
    require(path != null, "graft fixed-width sink requires a path")
    override def name(): String = s"graft_fixedwidth($path)"
    override def schema(): StructType = Schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.STREAMING_WRITE)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new FwWriteBuilder(path, info)
  }

  private[sources] class FwWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
    private var truncateFirst = false
    override def truncate(): WriteBuilder = { truncateFirst = true; this }
    override def build(): Write = {
      require(info.schema().fieldNames.sameElements(Schema.fieldNames),
        s"fixed-width sink requires columns ${Schema.fieldNames.mkString(", ")}, " +
          s"got ${info.schema().fieldNames.mkString(", ")}")
      val doTruncate = truncateFirst
      new Write {
        override def toBatch: BatchWrite = new FwBatchWrite(path, doTruncate)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new FwStreamingWrite(path)
      }
    }
  }

  /** Message a committed task sends the driver: its attempt-private file
    * plus audit counts. Must be Serializable — it crosses the wire. */
  case class FwCommitMessage(partitionId: Int, tmpPath: String, rows: Long, bytes: Long)
    extends WriterCommitMessage

  private[sources] class FwBatchWrite(path: String, truncateFirst: Boolean) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new FwWriterFactory(path,
        new org.apache.spark.util.SerializableConfiguration(
          SparkSession.active.sessionState.newHadoopConf()))

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(path).getFileSystem(
        SparkSession.active.sessionState.newHadoopConf())
      val dir = new Path(path)
      fs.mkdirs(dir)
      if (truncateFirst) {
        Option(fs.globStatus(new Path(dir, "part-*.fw")))
          .getOrElse(Array.empty).foreach(st => fs.delete(st.getPath, false))
        fs.delete(new Path(dir, "_MANIFEST"), false): Unit
      }
      val msgs = messages.map(_.asInstanceOf[FwCommitMessage]).sortBy(_.partitionId)
      msgs.foreach { m =>
        val dest = new Path(dir, f"part-${m.partitionId}%05d.fw")
        require(fs.rename(new Path(m.tmpPath), dest),
          s"job commit failed renaming ${m.tmpPath} -> $dest")
      }
      // manifest LAST, via temp + atomic rename: its presence means the
      // whole write is in place
      val tmpManifest = new Path(dir, "_MANIFEST.inprogress")
      val out = fs.create(tmpManifest, true)
      try {
        msgs.foreach(m => out.write(
          f"part-${m.partitionId}%05d.fw ${m.rows} ${m.bytes}\n".getBytes("UTF-8")))
        out.write(s"TOTAL ${msgs.map(_.rows).sum} ${msgs.map(_.bytes).sum}\n".getBytes("UTF-8"))
      } finally out.close()
      require(fs.rename(tmpManifest, new Path(dir, "_MANIFEST")), "manifest publish failed")
      fs.delete(new Path(dir, "_temporary"), true): Unit
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(path).getFileSystem(
        SparkSession.active.sessionState.newHadoopConf())
      fs.delete(new Path(path, "_temporary"), true): Unit
    }
  }

  /** The STREAMING half of the sink: the same task-temp → driver-rename
    * protocol, but per EPOCH, and the epoch commit is IDEMPOTENT — a
    * replayed micro-batch (the crash-between-commit-and-checkpoint case
    * every streaming sink must survive) finds its epoch manifest already
    * published and reduces to temp cleanup, never duplicating data. This
    * is the exactly-once discipline `e_idempotent_sink` demonstrates via
    * foreachBatch, implemented at the connector layer where Spark invokes
    * it with the epoch id. */
  private[sources] class FwStreamingWrite(path: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
      new FwStreamingWriterFactory(path,
        new org.apache.spark.util.SerializableConfiguration(
          SparkSession.active.sessionState.newHadoopConf()))

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(path).getFileSystem(
        SparkSession.active.sessionState.newHadoopConf())
      val dir = new Path(path)
      fs.mkdirs(dir)
      val manifestPath = new Path(dir, f"_MANIFEST-$epochId%06d")
      val msgs = messages.map(_.asInstanceOf[FwCommitMessage]).sortBy(_.partitionId)
      if (fs.exists(manifestPath)) {
        // epoch replay after a crash between commit and checkpoint:
        // already published — drop the duplicate attempt's files
        msgs.foreach(m => fs.delete(new Path(m.tmpPath), false): Unit)
        return
      }
      msgs.foreach { m =>
        val dest = new Path(dir, f"part-$epochId%06d-${m.partitionId}%05d.fw")
        require(fs.rename(new Path(m.tmpPath), dest),
          s"epoch $epochId commit failed renaming ${m.tmpPath} -> $dest")
      }
      val tmpManifest = new Path(dir, f"_MANIFEST-$epochId%06d.inprogress")
      val out = fs.create(tmpManifest, true)
      try {
        msgs.foreach(m => out.write(
          f"part-$epochId%06d-${m.partitionId}%05d.fw ${m.rows} ${m.bytes}\n".getBytes("UTF-8")))
        out.write(s"TOTAL ${msgs.map(_.rows).sum} ${msgs.map(_.bytes).sum}\n".getBytes("UTF-8"))
      } finally out.close()
      require(fs.rename(tmpManifest, manifestPath), s"epoch $epochId manifest publish failed")
    }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(path).getFileSystem(
        SparkSession.active.sessionState.newHadoopConf())
      messages.collect { case m: FwCommitMessage =>
        fs.delete(new Path(m.tmpPath), false)
      }: Unit
    }
  }

  private[sources] class FwStreamingWriterFactory(
      path: String, conf: org.apache.spark.util.SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
    override def createWriter(
        partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
      new FwWriter(path, partitionId, taskId, conf.value, epochTag = f"$epochId%06d-")
  }

  private[sources] class FwWriterFactory(
      path: String, conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new FwWriter(path, partitionId, taskId, conf.value)
  }

  private[sources] class FwWriter(
      dir: String, partitionId: Int, taskId: Long,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      epochTag: String = "")
    extends DataWriter[InternalRow] {
    private val tmp = new Path(s"$dir/_temporary/part-$epochTag$partitionId-$taskId.fw")
    private var opened = false
    private lazy val out = {
      val fs = tmp.getFileSystem(hadoopConf)
      val o = fs.create(tmp, true)
      opened = true
      o
    }
    private var rows = 0L
    private var bytes = 0L

    override def write(r: InternalRow): Unit = {
      val line = render(r.getLong(0), r.getUTF8String(1).toString,
        r.getDouble(2), r.getUTF8String(3).toString) + "\n"
      val b = line.getBytes("UTF-8")
      out.write(b)
      rows += 1
      bytes += b.length
    }

    override def commit(): WriterCommitMessage = {
      out.close() // forces creation for an empty partition: its (0-row)
      // file still participates in the commit, keeping file count == tasks
      FwCommitMessage(partitionId, tmp.toString, rows, bytes)
    }

    override def abort(): Unit = {
      if (opened) out.close()
      tmp.getFileSystem(hadoopConf).delete(tmp, false): Unit
    }

    override def close(): Unit = ()
  }
}
