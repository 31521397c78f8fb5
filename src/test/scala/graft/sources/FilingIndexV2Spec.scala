package graft.sources

import graft.TestSpark
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 connector's contracts: output equality with the arrays_zip
  * path, column pruning reaching the reader, and the form_type filter
  * evaluated inside the source. */
class FilingIndexV2Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def v2(cols: String*) = {
    val dir = FilingIndex.ensureStaged(s, sf)
    val df = s.read.format(classOf[FilingIndexV2].getName).load(dir)
    if (cols.isEmpty) df else df.select(cols.map(col): _*)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FilingIndexV2.IndexScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.collect { case sc: FilingIndexV2.IndexScan => sc }
      .getOrElse(fail(s"no FilingIndexV2 scan in:\n${df.queryExecution.executedPlan}"))

  test("V2 source rows == arrays_zip+explode rows, null-fill included") {
    val a = FilingIndex.filingIndex(s, sf)
      .orderBy("cik", "accession_number").collect().toSeq
    val b = FilingIndex.filingIndexV2(s, sf)
      .orderBy("cik", "accession_number").collect().toSeq
    assert(a == b)
    // the deliberately-short primaryDocument array null-fills
    assert(FilingIndex.filingIndexV2(s, sf)
      .filter(col("primary_document").isNull).count() > 0)
  }

  test("column pruning reaches the reader: a 2-column select reads a 2-column schema") {
    val df = v2("cik", "form_type")
    assert(scanOf(df).readSchema().fieldNames.toSet == Set("cik", "form_type"))
  }

  test("form_type equality is pushed into the source and not re-checked") {
    val df = v2().filter(col("form_type") === "NPORT-P")
    val scan = scanOf(df)
    assert(scan.formEq.toSeq == Seq("NPORT-P"), s"filter not pushed: ${scan.description()}")
    // fully handled by the source: no FilterExec re-evaluating form_type
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter (form_type"),
      s"pushed filter re-checked above the scan:\n$plan")
    // and the pushed scan returns exactly the NPORT-P subset
    assert(df.count() == v2().collect().count(_.getString(3) == "NPORT-P"))
  }

  test("COUNT pushes into the source, composes with the pushed filter, and matches row scan") {
    // grouped count: the query path REQUIREs the pushdown marker itself
    val grouped = FilingIndex.filingIndexV2Agg(s, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = v2().groupBy("form_type")
      .agg(count(lit(1)).as("n")) // same data through the row-scan path
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped == expected, s"pushed counts $grouped != row-scan counts $expected")
    // filter + global count: both pushdowns in one scan
    val filteredCount = v2().filter(col("form_type") === "NPORT-P").agg(count(lit(1)))
    val n = filteredCount.collect().head.getLong(0)
    val plan = filteredCount.queryExecution.executedPlan.toString
    assert(plan.contains("agg_pushed=count") && plan.contains("NPORT-P"),
      s"filter+count did not both push; plan:\n$plan")
    assert(n == grouped("NPORT-P"))
  }

  test("reads parallelize: one input partition per staged file") {
    val dir = FilingIndex.ensureStaged(s, sf)
    val files = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    val parts = scanOf(v2()).planInputPartitions().length
    assert(parts == files, s"$parts partitions for $files staged files")
  }

  test("pushed cik predicates prune files via the stats sidecar, results unchanged") {
    val dir = FilingIndex.ensureStaged(s, sf)
    val files = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    val all = v2().orderBy("cik", "accession_number").collect().toSeq
    val ciks = all.map(_.getLong(0)).distinct.sorted
    val cut = ciks(ciks.length / 4)
    val pruned = v2().filter(col("cik") <= cut)
    val parts = scanOf(pruned).planInputPartitions().length
    assert(parts < files, s"cik <= $cut pruned nothing: $parts of $files files planned")
    // pruning is stats-level; the per-document re-check keeps it exact
    val got = pruned.orderBy("cik", "accession_number").collect().toSeq
    assert(got == all.filter(_.getLong(0) <= cut), "pruned scan changed the answer")
    // a point lookup prunes at least as hard as the range
    val point = v2().filter(col("cik") === ciks.head)
    assert(scanOf(point).planInputPartitions().length <= parts)
  }

  test("topN pushdown: total-order push only, heap path row-identical to full sort") {
    val dir = FilingIndex.ensureStaged(s, TestSpark.sf)
    def base = s.read.format(classOf[FilingIndexV2].getName).load(dir)
      .select("cik", "accession_number", "form_type")
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.collectFirst { case sc: FilingIndexV2.IndexScan => sc }
    // the accepted shape pushes; a non-total order (form_type) must NOT
    val pushed = base.orderBy("cik", "accession_number").limit(10)
    assert(scanOf(pushed).exists(_.topN.contains(10)), "total-order topN not pushed")
    val unpushable = base.orderBy("form_type").limit(10)
    assert(scanOf(unpushable).forall(_.topN.isEmpty),
      "a non-total order was pushed — boundary ties could drop rows")
    // heap path ≡ full sort on the same data
    val viaHeap = pushed.collect().map(_.toSeq).toSeq
    val full = base.collect().map(_.toSeq)
      .sortBy(r => (r(0).asInstanceOf[Long], String.valueOf(r(1)))).take(10).toSeq
    assert(viaHeap == full, "pushed topN diverged from the full sort")
  }

  test("catalog plugin: named SQL access equals the programmatic read; DDL refused") {
    val dir = FilingIndex.ensureStaged(s, TestSpark.sf)
    val cat = "graftspec_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.path", dir)
    val viaSql = s.sql(s"SELECT cik, accession_number, form_type FROM $cat.filing_index")
      .collect().map(_.toSeq).sortBy(_.toString)
    val direct = s.read.format(classOf[FilingIndexV2].getName).load(dir)
      .select("cik", "accession_number", "form_type")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaSql.length == direct.length &&
      viaSql.zip(direct).forall { case (a, b) => a == b },
      "catalog table diverged from the direct read")
    // catalog surface: listing, existence, read-only DDL
    val ct = new GraftCatalog
    ct.initialize("t", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", dir)))
    assert(ct.listTables(Array.empty).map(_.name).toSeq == Seq("filing_index"))
    assert(ct.tableExists(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "filing_index")))
    intercept[Exception](ct.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "nope")))
    intercept[UnsupportedOperationException](ct.dropTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "filing_index")))
  }

  test("columnar scan: vectorized batches, row-identical to the row path") {
    val dir = FilingIndex.ensureStaged(s, TestSpark.sf)
    def read(columnar: Boolean) = {
      val r = s.read.format(classOf[FilingIndexV2].getName)
      (if (columnar) r.option("columnar", "true") else r).load(dir)
    }
    def scans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
    // the option flips the scan's planning mode
    assert(scans(read(true)).exists(_.supportsColumnar), "columnar scan not planned")
    assert(!scans(read(false)).exists(_.supportsColumnar), "row path planned columnar")
    // hand-off is physical only: identical rows, nulls and all
    val a = read(true).collect().map(_.toSeq).sortBy(_.toString)
    val b = read(false).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y },
      "columnar and row reads diverged")
    // projection still prunes through the columnar path
    val pruned = read(true).select("cik", "form_type")
    assert(pruned.collect().length == a.length)
  }

  test("runtime (DPP) filtering: answers equal the DPP-disabled run") {
    val withDpp = FilingIndex.filingIndexV2Dpp(s, sf).collect().toSeq
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try {
      // without DPP the REQUIREs inside the operator would rightly fail —
      // recompute the same aggregate through the plain join instead
      import org.apache.spark.sql.functions._
      val dir = FilingIndex.ensureStaged(s, sf)
      val maxCk = graft.Tables.customer(s, sf)
        .agg(max(col("c_custkey"))).head().getLong(0)
      val dim = graft.Tables.customer(s, sf)
        .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") >= maxCk * 3 / 4)
        .select(col("c_custkey"))
      val plain = s.read.format(classOf[FilingIndexV2].getName).load(dir)
        .join(dim, col("cik") === col("c_custkey"))
        .groupBy(col("form_type"))
        .agg(count(lit(1)).as("n_filings"), countDistinct(col("cik")).as("n_funds"))
        .orderBy("form_type").collect().toSeq
      assert(withDpp == plain, "runtime pruning changed the answer")
    } finally s.conf.set(key, prev)
  }
}
