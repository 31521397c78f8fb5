package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 CATALOG PLUGIN — the last connector surface next to
  * batch read/write and streaming read/write: the engine's tables
  * addressed BY NAME from pure SQL (`SELECT … FROM <cat>.filing_index`),
  * the way a BI tool or a notebook user reaches a table without ever
  * importing the library. Registered through the standard
  * `spark.sql.catalog.<name> = graft.sources.GraftCatalog` conf with a
  * `.path` option pointing at the staged feed directory; `loadTable`
  * hands back the SAME `FilingIndexV2.IndexTable` the programmatic path
  * uses, so every capability — source-side explode, column pruning,
  * filter + aggregate pushdown, stats-sidecar pruning, runtime DPP,
  * the columnar read option — rides through the catalog unchanged.
  *
  * Read-only by design: DDL mutations throw (the feed directory is an
  * ingest artifact, not a managed table — writes go through the
  * FixedWidthV2 write connector's own two-phase commit). */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catName: String = _
  private var path: String = _
  private var spjPath: String = _
  private var ttPath: String = _
  private var spjBuckets: Int = 8

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    path = options.get("path")
    spjPath = options.get("spj_path")
    ttPath = options.get("tt_path")
    spjBuckets = Option(options.get("spj_buckets")).map(_.toInt).getOrElse(8)
    require(path != null || spjPath != null || ttPath != null,
      s"catalog $name requires spark.sql.catalog.$name.path, .spj_path or .tt_path")
  }

  override def name(): String = catName

  private def tables: Map[String, () => Table] = {
    val base = Option(path).map(p =>
      "filing_index" -> (() => new FilingIndexV2.IndexTable(p): Table)).toMap
    val spj = Option(spjPath).map(p => Map(
      "orders_spj" -> (() =>
        new KeyedLinesV2.KeyedTable(s"$p/orders", "o_", spjBuckets): Table),
      "customer_spj" -> (() =>
        new KeyedLinesV2.KeyedTable(s"$p/customer", "c_", spjBuckets): Table)))
      .getOrElse(Map.empty)
    // a plain (un-travelled) read resolves the LATEST manifest at load
    // time — snapshot-pinned from there on (the scan carries the version)
    val tt = Option(ttPath).map(p => "orders_tt" -> (() =>
      new VersionedLinesV2.TtTable(p, VersionedLinesV2.latestVersion(p)): Table)).toMap
    base ++ spj ++ tt
  }

  /** SQL `VERSION AS OF n` lands here (Spark's native time-travel
    * resolution calls the version-taking overload): the table comes
    * back pinned to that manifest, and a nonexistent version fails at
    * the manifest — never by silently reading another snapshot. */
  override def loadTable(ident: Identifier, version: String): Table =
    if (ident.namespace.isEmpty && ident.name == "orders_tt" && ttPath != null) {
      val v = try version.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"orders_tt versions are integers, got '$version'")
      }
      new VersionedLinesV2.TtTable(ttPath, v)
    } else throw new NoSuchTableException(ident)

  /** SQL `TIMESTAMP AS OF t` (micros since epoch, UTC session): resolves
    * to the latest version committed at-or-before t via the table's
    * recorded commit timestamps; tables without a timestamp record keep
    * failing loudly toward VERSION AS OF. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    if (ident.namespace.isEmpty && ident.name == "orders_tt" && ttPath != null)
      new VersionedLinesV2.TtTable(ttPath,
        VersionedLinesV2.resolveTimestamp(ttPath, timestamp))
    else throw new NoSuchTableException(ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    tables.keys.toArray.sorted.map(n => Identifier.of(Array.empty, n))
  }

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace.isEmpty) tables.get(ident.name)
      .map(_.apply()).getOrElse(throw new NoSuchTableException(ident))
    else throw new NoSuchTableException(ident)

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && tables.contains(ident.name)

  // ---- FunctionCatalog: the piece that makes STORAGE-PARTITIONED JOINS
  // resolvable. A scan reporting KeyGroupedPartitioning(bucket(n, k))
  // hands Catalyst a TRANSFORM; the planner can only reason about it (and
  // prove two sides co-partitioned) if the table's catalog serves the
  // function's semantics — exactly how Iceberg's bucket joins resolve.
  // graft's bucket is the staging rule itself: bucket(n, k) = k mod n. ----

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    Array(Identifier.of(Array.empty, "bucket"))
  }

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.isEmpty && ident.name == "bucket") GraftCatalog.BucketUnbound
    else throw new NoSuchFunctionException(ident)

  override def functionExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && ident.name == "bucket"

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(s"$catName is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(s"$catName is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(s"$catName is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(s"$catName is read-only")
}

object GraftCatalog {

  /** `bucket(numBuckets, key)` — the staging rule (`k mod n`, nonnegative
    * keys) as a catalog-served V2 function: `canonicalName` is the
    * equality the planner uses to prove two scans' partitionings
    * compatible, so both SPJ sides resolving here is what licenses the
    * exchange-free join. */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String = "graft bucket(n, key) = key mod n"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
        inputType(0).dataType == IntegerType && inputType(1).dataType == LongType,
        s"bucket expects (int numBuckets, bigint key), got ${inputType.simpleString}")
      BucketBound
    }
  }

  object BucketBound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      java.lang.Math.floorMod(input.getLong(1), input.getInt(0).toLong).toInt
  }
}
