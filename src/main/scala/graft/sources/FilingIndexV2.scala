package graft.sources

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
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

  /** Test/REQUIRE hooks: how often a runtime (DPP) filter reached the
    * scan, and the partition count of the most recent plan. */
  val runtimeFilterHits = new java.util.concurrent.atomic.AtomicInteger(0)
  val lastPlannedPartitions = new java.util.concurrent.atomic.AtomicInteger(-1)

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
      new IndexScanBuilder(path, options.getBoolean("columnar", false))
  }

  private[sources] class IndexScanBuilder(path: String, columnar: Boolean = false)
      extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
      with SupportsPushDownAggregates
      with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
    private var required: StructType = Schema
    private var pushed: Array[Filter] = Array.empty
    private var aggGrouped: Option[Boolean] = None
    private var topN: Option[Int] = None

    /** TOP-N pushed into the source ([[SupportsPushDownTopN]]): an
      * `ORDER BY cik, accession_number LIMIT n` keeps only a bounded
      * heap of n rows PER FILE during the line scan instead of
      * materializing every row for a global sort. PARTIAL pushdown
      * (`isPartiallyPushed = true`): each partition returns its own
      * top-n and Spark's final TakeOrdered merges — correct for any
      * partition count. Only the (cik asc, accession_number asc) order
      * is accepted: it is a TOTAL order over filings, so a bounded
      * per-partition heap provably contains the global top-n (a
      * non-total pushed order could drop a boundary-tied row the global
      * answer needed). */
    override def pushTopN(
        orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
        limit: Int): Boolean = {
      import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
      def isAsc(o: org.apache.spark.sql.connector.expressions.SortOrder, col: String) =
        o.direction == SortDirection.ASCENDING && (o.expression match {
          case n: NamedReference => n.fieldNames.sameElements(Array(col))
          case _ => false
        })
      val ok = aggGrouped.isEmpty && orders.length == 2 &&
        isAsc(orders(0), "cik") && isAsc(orders(1), "accession_number") &&
        required.fieldNames.contains("cik") &&
        required.fieldNames.contains("accession_number")
      if (ok) topN = Some(limit)
      ok
    }

    override def isPartiallyPushed: Boolean = true

    override def pruneColumns(requiredSchema: StructType): Unit =
      // in aggregate mode the read schema is the agg output, fixed below
      if (aggGrouped.isEmpty) required = requiredSchema

    /** COUNT pushed into the source: the connector tallies during its
      * line scan and never builds a row — the aggregate-pushdown
      * contract (`SupportsPushDownAggregates`) that turns
      * `SELECT form_type, count(*)` into per-partition partial counts
      * computed at the wire format. PARTIAL pushdown (complete = false):
      * each input partition returns its own counts and Spark's final
      * aggregate merges them — the only correct answer with > 1
      * partition. Supported shapes: a single COUNT(*), grouped by
      * nothing or by form_type; anything else falls back to row scan. */
    override def supportCompletePushDown(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false

    override def pushAggregation(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
      val countOnly = agg.aggregateExpressions.length == 1 &&
        agg.aggregateExpressions()(0)
          .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
      val gb = agg.groupByExpressions
      val groupOk = gb.isEmpty || (gb.length == 1 && (gb(0) match {
        case n: org.apache.spark.sql.connector.expressions.NamedReference =>
          n.fieldNames.sameElements(Array("form_type"))
        case _ => false
      }))
      if (countOnly && groupOk) { aggGrouped = Some(gb.nonEmpty); true } else false
    }

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (accepted, rest) = filters.partition {
        case EqualTo("form_type", _: String) => true
        // the null guard the optimizer pairs with the equality: accept
        // it too, or the residual Filter node sits between Aggregate
        // and scan and structurally blocks aggregate pushdown
        case IsNotNull("form_type") => true
        // cik predicates prune whole FILES against the stage's _CIKSTATS
        // sidecar (the stage is cik-range-partitioned) and are re-checked
        // per document during the line scan — stats are ranges, not rows
        case EqualTo("cik", _: Long) => true
        case GreaterThan("cik", _: Long) => true
        case GreaterThanOrEqual("cik", _: Long) => true
        case LessThan("cik", _: Long) => true
        case LessThanOrEqual("cik", _: Long) => true
        case In("cik", vs) => vs.forall(_.isInstanceOf[Long])
        case IsNotNull("cik") => true // cik is never null in the format
        case _ => false
      }
      pushed = accepted
      rest // accepted filters are FULLY evaluated here; nothing to re-check
    }

    override def pushedFilters(): Array[Filter] = pushed

    override def build(): Scan = {
      val schema = aggGrouped match {
        case Some(true) => StructType(Seq(
          StructField("form_type", StringType), StructField("count", LongType)))
        case Some(false) => StructType(Seq(StructField("count", LongType)))
        case None => required
      }
      var lo = Long.MinValue
      var hi = Long.MaxValue
      var inSet: Option[Set[Long]] = None
      pushed.foreach {
        case EqualTo("cik", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
        case GreaterThan("cik", v: Long) => lo = math.max(lo, v + 1)
        case GreaterThanOrEqual("cik", v: Long) => lo = math.max(lo, v)
        case LessThan("cik", v: Long) => hi = math.min(hi, v - 1)
        case LessThanOrEqual("cik", v: Long) => hi = math.min(hi, v)
        case In("cik", vs) =>
          val s = vs.collect { case l: Long => l }.toSet
          inSet = Some(inSet.map(_.intersect(s)).getOrElse(s))
        case _ =>
      }
      IndexScan(path, schema, pushed.collect { case EqualTo("form_type", v: String) => v },
        pushed.exists { case IsNotNull("form_type") => true; case _ => false },
        aggGrouped, lo, hi, inSet, columnar, topN)
    }
  }

  /** `formEq`: the pushed form_type equality literals (all must match);
    * `aggGrouped`: Some(grouped?) when a COUNT was pushed down;
    * `cikLo`/`cikHi`/`cikIn`: the conjunction of pushed cik predicates —
    * used twice, as a FILE pruner against the stage's `_CIKSTATS`
    * sidecar and as the exact per-document re-check in the readers. */
  private[sources] case class IndexScan(
      path: String, required: StructType, formEq: Array[String],
      formNotNull: Boolean = false, aggGrouped: Option[Boolean] = None,
      cikLo: Long = Long.MinValue, cikHi: Long = Long.MaxValue,
      cikIn: Option[Set[Long]] = None, columnar: Boolean = false,
      topN: Option[Int] = None)
      extends Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    // RUNTIME (DPP-style) filtering: a selective dim join hands the scan
    // its join-key value set AT EXECUTION TIME, and the scan re-plans
    // against the stats sidecar — file pruning driven by data no static
    // predicate could know. Purely an optimization: rows from kept files
    // that miss the set still fail the join itself, so readers need no
    // re-check. The var is plan-instance-local (case-class equality
    // ignores it); the companion hooks exist for REQUIRE/spec assertions.
    @volatile private var runtimeIn: Option[Set[Long]] = None

    override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("cik"))

    override def filter(
        predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
      val sets = predicates.flatMap { p =>
        if (p.name() == "IN") {
          val ch = p.children()
          val onCik = ch.headOption.exists {
            case n: org.apache.spark.sql.connector.expressions.NamedReference =>
              n.fieldNames.sameElements(Array("cik"))
            case _ => false
          }
          if (onCik) {
            val vals = ch.drop(1).collect {
              case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
                l.value() match {
                  case x: java.lang.Long => x.longValue()
                  case x: java.lang.Integer => x.longValue().toLong
                }
            }.toSet
            Some(vals)
          } else None
        } else None
      }
      if (sets.nonEmpty) {
        runtimeIn = Some(sets.reduce(_ intersect _))
        FilingIndexV2.runtimeFilterHits.incrementAndGet(): Unit
      }
    }

    private def cikPushed: Boolean =
      cikLo != Long.MinValue || cikHi != Long.MaxValue ||
        cikIn.isDefined || runtimeIn.isDefined
    override def description(): String =
      s"graft_filing_index pushed=[${formEq.mkString(",")}] cols=[${required.fieldNames.mkString(",")}]" +
        s" agg_pushed=${aggGrouped.map(g => if (g) "count_by_form" else "count").getOrElse("none")}" +
        (if (cikPushed) s" cik_pushed=[$cikLo..$cikHi${cikIn.map(s => s" in:${s.size}").getOrElse("")}]"
         else "")

    override def planInputPartitions(): Array[InputPartition] = {
      val p = new Path(path)
      val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration)
      val files = fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .sortBy(_.getPath.getName)
      // stats-sidecar file pruning: a file whose [min,max] cik range
      // cannot intersect the pushed predicate never opens. Files missing
      // from the sidecar (or no sidecar at all) are kept — pruning is an
      // optimization, never a correctness dependency.
      val stats: Map[String, (Long, Long)] = {
        val sp = new Path(p, "_CIKSTATS")
        if (cikPushed && fs.exists(sp)) {
          val in = fs.open(sp)
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .flatMap { line =>
              line.split(" ") match {
                case Array(f, lo, hi) => Some(f -> (lo.toLong, hi.toLong))
                case _ => None
              }
            }.toMap
          finally in.close()
        } else Map.empty
      }
      def mayMatch(name: String): Boolean = stats.get(name) match {
        case Some((lo, hi)) =>
          lo <= cikHi && hi >= cikLo &&
            cikIn.forall(_.exists(v => v >= lo && v <= hi)) &&
            runtimeIn.forall(_.exists(v => v >= lo && v <= hi))
        case None => true
      }
      val planned = files.filter(s => mayMatch(s.getPath.getName))
        .map(s => IndexPartition(s.getPath.toString): InputPartition)
      FilingIndexV2.lastPlannedPartitions.set(planned.length)
      planned
    }

    override def createReaderFactory(): PartitionReaderFactory =
      // Snapshot the session's Hadoop configuration DRIVER-SIDE and ship it
      // with the factory: the reader must see the same filesystem settings
      // (S3A credentials, defaultFS, …) that planInputPartitions listed
      // with, or the connector only works against the local FS.
      IndexReaderFactory(required.fieldNames, formEq, formNotNull, aggGrouped,
        cikLo, cikHi, cikIn,
        new org.apache.spark.util.SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration),
        columnar, topN)
  }

  private[sources] case class IndexPartition(file: String) extends InputPartition

  /** Exact per-document check of the pushed cik conjunction — the
    * row-level half of the pushed predicate (stats pruning is the
    * file-level half). */
  private[sources] case class CikPredicate(
      lo: Long, hi: Long, in: Option[Set[Long]]) {
    def ok(cik: Long): Boolean =
      cik >= lo && cik <= hi && in.forall(_.contains(cik))
  }

  private[sources] case class IndexReaderFactory(
      cols: Array[String], formEq: Array[String], formNotNull: Boolean,
      aggGrouped: Option[Boolean],
      cikLo: Long, cikHi: Long, cikIn: Option[Set[Long]],
      conf: org.apache.spark.util.SerializableConfiguration,
      columnar: Boolean = false, topN: Option[Int] = None)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val file = partition.asInstanceOf[IndexPartition].file
      val cik = CikPredicate(cikLo, cikHi, cikIn)
      aggGrouped match {
        case Some(grouped) =>
          new IndexAggReader(file, formEq, formNotNull, grouped, cik, conf.value)
        case None =>
          val rows = new IndexReader(file, cols, formEq, formNotNull, cik, conf.value)
          topN.fold(rows: PartitionReader[InternalRow])(n =>
            new TopNReader(rows, n, cols))
      }
    }

    // VECTORIZED read path: the engine consumes ColumnarBatches straight
    // from the connector (Parquet's vectorized reader discipline at the
    // wire-format layer) — Tungsten operators read column vectors without
    // a per-row materialization until the plan's ColumnarToRow boundary.
    // Aggregate pushdown keeps the row path (its output is one tally row
    // per file — nothing to vectorize).
    override def supportColumnarReads(partition: InputPartition): Boolean =
      columnar && aggGrouped.isEmpty
    override def createColumnarReader(
        partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
      require(supportColumnarReads(partition), "columnar read not enabled for this scan")
      val file = partition.asInstanceOf[IndexPartition].file
      new IndexColumnarReader(file, cols,
        new IndexReader(file, cols, formEq, formNotNull,
          CikPredicate(cikLo, cikHi, cikIn), conf.value))
    }
  }

  /** Columnar adapter over the row reader: fills fixed-capacity on-heap
    * column vectors (the Tungsten in-memory layout) in batches of
    * [[ColumnarCap]] rows. The expansion/filter logic stays in ONE place
    * (the row reader); what changes is the hand-off to the engine —
    * batch-at-a-time vectors instead of row-at-a-time InternalRows. */
  private val ColumnarCap = 1024

  private[sources] class IndexColumnarReader(
      file: String, cols: Array[String],
      rows: PartitionReader[InternalRow])
      extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    private val types = cols.map(n => Schema(Schema.fieldIndex(n)).dataType)
    private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _

    override def next(): Boolean = {
      if (batch != null) { batch.close(); batch = null }
      val vectors = types.map(t => new OnHeapColumnVector(ColumnarCap, t))
      var n = 0
      while (n < ColumnarCap && rows.next()) {
        val row = rows.get()
        var c = 0
        while (c < cols.length) {
          types(c) match {
            case LongType => vectors(c).putLong(n, row.getLong(c))
            case _ =>
              if (row.isNullAt(c)) vectors(c).putNull(n)
              else {
                val bytes = row.getUTF8String(c).getBytes
                vectors(c).putByteArray(n, bytes): Unit
              }
          }
          c += 1
        }
        n += 1
      }
      if (n == 0) { vectors.foreach(_.close()); false }
      else {
        batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
          vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector], n)
        true
      }
    }

    override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch

    override def close(): Unit = {
      if (batch != null) batch.close()
      rows.close()
    }
  }

  /** COUNT-pushdown reader: tallies filings per form (or in total)
    * straight off the parsed arrays — no InternalRow per filing is ever
    * constructed; the partition's whole answer is its handful of
    * partial-count rows. */
  private[sources] class IndexAggReader(
      file: String, formEq: Array[String], formNotNull: Boolean, grouped: Boolean,
      cik: CikPredicate,
      hadoopConf: org.apache.hadoop.conf.Configuration)
      extends PartitionReader[InternalRow] {
    private val mapper = new ObjectMapper
    private var rows: Iterator[InternalRow] = _
    private var current: InternalRow = _

    private def tally(): Iterator[InternalRow] = {
      val p = new Path(file)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getFileSystem(hadoopConf).open(p), "UTF-8"))
      try {
        // keyed by Option — a sentinel String would be compared by VALUE
        // here but by REFERENCE on output, silently merging a real form
        // that happens to equal the sentinel into the null group
        val counts = scala.collection.mutable.LinkedHashMap.empty[Option[String], Long]
        var line = in.readLine()
        while (line != null) {
          val root = if (line.nonEmpty) mapper.readTree(line) else null
          if (root != null && cik.ok(root.get("cik").asLong())) {
            val recent = root.at("/filings/recent")
            val arrays = Seq("accessionNumber", "filingDate", "form", "primaryDocument")
              .map(recent.get)
            val form = arrays(2)
            val n = arrays.map(a => if (a == null) 0 else a.size()).max
            var i = 0
            while (i < n) {
              val f = if (form == null || i >= form.size() || form.get(i).isNull) null
                else form.get(i).asText()
              if ((!formNotNull || f != null) &&
                  (formEq.isEmpty || formEq.forall(v => f != null && f == v))) {
                val key = Option(f)
                counts.update(key, counts.getOrElse(key, 0L) + 1L)
              }
              i += 1
            }
          }
          line = in.readLine()
        }
        if (grouped)
          counts.iterator.map { case (f, c) =>
            InternalRow(f.map(UTF8String.fromString).orNull, c)
          }.toIndexedSeq.iterator
        else Iterator(InternalRow(counts.valuesIterator.sum))
      } finally in.close()
    }

    override def next(): Boolean = {
      if (rows == null) rows = tally()
      if (!rows.hasNext) return false
      current = rows.next()
      true
    }
    override def get(): InternalRow = current
    override def close(): Unit = ()
  }

  /** Streams one staged file line-by-line; each fund document expands to
    * its zipped filing rows (max array length, null-fill — the arrays_zip
    * contract), filtered by any pushed form_type equality BEFORE a row is
    * built, projecting only the required columns. The stream opens lazily
    * on the first `next()` call — task construction stays cheap and a
    * partition that is planned but never read opens no file handle. */
  private[sources] class IndexReader(
      file: String, cols: Array[String], formEq: Array[String], formNotNull: Boolean,
      cikPred: CikPredicate,
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
      if (!cikPred.ok(cik)) return Iterator.empty
      val recent = root.at("/filings/recent")
      val acc = recent.get("accessionNumber")
      val fd = recent.get("filingDate")
      val form = recent.get("form")
      val pdoc = recent.get("primaryDocument")
      val n = Seq(acc, fd, form, pdoc).map(a => if (a == null) 0 else a.size()).max
      (0 until n).iterator.flatMap { i =>
        val f = str(form, i)
        if ((formNotNull && f == null) ||
            (formEq.nonEmpty && !formEq.forall(v => f != null && f.toString == v))) None
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

  /** Bounded-heap per-partition TOP-N over the row reader: holds at most
    * n rows ordered by (cik asc, accession_number asc) — the pushed
    * order the builder accepted — so a file of millions of filings
    * contributes n rows of memory and network, not a full sort spill.
    * Rows are copied into the heap (defensive — the inner reader builds
    * fresh rows, but the contract doesn't promise it) and replayed in
    * heap-sorted order. */
  private[sources] class TopNReader(
      inner: PartitionReader[InternalRow], n: Int, cols: Array[String])
      extends PartitionReader[InternalRow] {
    private val cikAt = cols.indexOf("cik")
    private val accAt = cols.indexOf("accession_number")
    private val ord = Ordering.by[InternalRow, (Long, String)] { r =>
      (r.getLong(cikAt),
        Option(r.getUTF8String(accAt)).map(_.toString).getOrElse(""))
    }
    // max-heap of the n smallest: evict the largest when over budget
    private lazy val sorted: Iterator[InternalRow] = {
      val heap = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
      while (inner.next()) {
        heap.enqueue(inner.get().copy())
        if (heap.size > n) { heap.dequeue(): Unit }
      }
      heap.dequeueAll.reverse.iterator
    }
    private var current: InternalRow = _
    override def next(): Boolean =
      if (sorted.hasNext) { current = sorted.next(); true } else false
    override def get(): InternalRow = current
    override def close(): Unit = inner.close()
  }
}
