package graft.sources

import graft.Tables
import graft.extract.{Holding, NportRender}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One holding's field strings, pre-rendered declaratively (k = source
  * order key, kept for deterministic in-document ordering). */
final case class HoldingFields(
    k: Long,
    issuer: Option[String],
    shares: Option[String],
    value_usd: Option[String],
    pct_net_assets: Option[String])

/** One synthetic filing: doc per customer key, holdings = that customer's
  * orders. `reporting_date=None` models the X1 fail→skip-filing path. */
final case class Filing(
    doc_id: Long,
    reporting_date: Option[String],
    holdings: Seq[HoldingFields])

/** Synthetic NPORT-P filing corpus derived deterministically from the
  * driver's `orders` table (TESTDATA.md) — the offline stand-in for the
  * reference's S2 HTTP document source (ETFQuarterlyHoldingsExtractor.py
  * :58-63; live fetch is out of scope, SURVEY.md §7.3).
  *
  * Because every cell string is a pure function of base-table rows, the
  * whole render→parse extraction pipeline is oracle-checkable: DuckDB
  * recomputes the expected holdings directly from `orders` with the same
  * format expressions, no HTML involved. Field strings are computed in the
  * DataFrame (codegen'd `format_number`/`format_string`), so the Scala side
  * only assembles XHTML; the expressions are mirrored 1:1 in the oracle SQL
  * (`format('{:,}')`/`printf`).
  *
  * The CASE/modulus nulls exercise the kernel's guard semantics on real
  * data: ~1/7 holdings lack an issuer row, ~1/5 a Balance row, etc., and
  * customers with key % 50 == 0 file without a reporting date.
  */
object FilingDocs {

  /** Declarative filing construction: one shuffle (groupBy custkey). At
    * cluster scale this is the same plan over a partitioned orders table;
    * sort_array gives deterministic in-document holding order. */
  def filings(s: SparkSession, d: String): Dataset[Filing] = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val k = col("o_orderkey")
    o.select(
        col("o_custkey"),
        k.as("k"),
        when(k % 7 === 0, lit(null: String))
          .otherwise(concat(lit("Issuer "), col("o_orderpriority"), lit(" #"), k.cast("string")))
          .as("issuer"),
        when(k % 5 === 0, lit(null: String))
          .otherwise(format_number(k * 17 + 3, 0))
          .as("shares"),
        when(k % 11 === 0, lit(null: String))
          .otherwise(concat(format_number(k * 1000 + col("o_custkey"), 0), lit("."),
            format_string("%02d", k % 100)))
          .as("value_usd"),
        when(k % 13 === 0, lit(null: String))
          .otherwise(format_string("%d.%02d", expr("(o_orderkey % 10000) div 100"), k % 100))
          .as("pct_net_assets"))
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(struct(
        col("k"), col("issuer"), col("shares"), col("value_usd"), col("pct_net_assets"))))
        .as("holdings"))
      .select(
        col("o_custkey").as("doc_id"),
        when(col("o_custkey") % 50 === 0, lit(null: String))
          .otherwise(date_format(
            date_add(to_date(lit("2020-01-31")), (col("o_custkey") % 360).cast("int")),
            "yyyy-MM-dd"))
          .as("reporting_date"),
        col("holdings"))
      .as[Filing]
  }

  def toHolding(h: HoldingFields): Holding =
    Holding(h.issuer, h.shares, h.value_usd, h.pct_net_assets)

  /** Rendered XHTML corpus: (doc_id, document). The render runs
    * executor-side inside `map` — no driver loop (the I1 inversion). */
  def docs(s: SparkSession, d: String): Dataset[(Long, String)] = {
    import s.implicits._
    filings(s, d).map(f =>
      (f.doc_id, NportRender.render(f.reporting_date, f.holdings.map(toHolding))))
  }

  /** DuckDB SQL fragment computing the same per-holding field strings the
    * rendered corpus carries — shared by every x_* oracle. */
  val oracleFields: String =
    """CAST(DATE '2020-01-31' + CAST(o_custkey % 360 AS INT) AS VARCHAR) AS reporting_date,
      |CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |     ELSE 'Issuer ' || o_orderpriority || ' #' || CAST(o_orderkey AS VARCHAR) END AS issuer,
      |CASE WHEN o_orderkey % 5 = 0 THEN NULL
      |     ELSE format('{:,}', o_orderkey * 17 + 3) END AS shares,
      |CASE WHEN o_orderkey % 11 = 0 THEN NULL
      |     ELSE format('{:,}', o_orderkey * 1000 + o_custkey) || '.' || printf('%02d', o_orderkey % 100) END AS value_usd,
      |CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |     ELSE printf('%d.%02d', (o_orderkey % 10000) // 100, o_orderkey % 100) END AS pct_net_assets""".stripMargin
}
