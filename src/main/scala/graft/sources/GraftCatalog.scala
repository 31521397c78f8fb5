package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
class GraftCatalog extends TableCatalog {
  private var catName: String = _
  private var path: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    path = options.get("path")
    require(path != null, s"catalog $name requires spark.sql.catalog.$name.path")
  }

  override def name(): String = catName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    Array(Identifier.of(Array.empty, "filing_index"))
  }

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace.isEmpty && ident.name == "filing_index")
      new FilingIndexV2.IndexTable(path)
    else throw new NoSuchTableException(ident)

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && ident.name == "filing_index"

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
