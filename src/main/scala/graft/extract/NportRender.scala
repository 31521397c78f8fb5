package graft.extract

/** Renders holdings back into the NPORT-P XHTML shape the kernel parses —
  * the inverse of [[NportKernel]]. Used for golden/property-test fixtures
  * (render → extract must round-trip) and to stage synthetic filing
  * documents from the driver's testdata tables so the extraction pipeline
  * is end-to-end oracle-checkable (the doc content is a deterministic
  * function of base-table rows, so DuckDB can recompute the expected output
  * without parsing HTML).
  *
  * Shape mirrors what the reference navigates
  * (ETFQuarterlyHoldingsExtractor.py:68-127): <h1> section headings,
  * <h4> item headings, label/value <td> sibling pairs.
  */
object NportRender {

  def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Locale-free thousands grouping ("1234567" → "1,234,567") so rendered
    * numbers match DuckDB's `format('{:,}', n)` exactly. */
  def groupDigits(n: Long): String = {
    val neg = n < 0
    val digits = math.abs(n).toString
    val grouped = digits.reverse.grouped(3).mkString(",").reverse
    if (neg) "-" + grouped else grouped
  }

  private def row(label: String, value: String): String =
    s"<tr><td>${escape(label)}</td><td>${escape(value)}</td></tr>"

  /** One filing document. `reportingDate=None` renders a Part A section
    * whose A.3 table lacks the date row (the X1 fail→skip path).
    * Per-holding `renderC2Heading=false` omits the "Item C.2" heading
    * entirely (the reference's :111 crash case). */
  def render(
      reportingDate: Option[String],
      holdings: Seq[Holding],
      renderC2Heading: Holding => Boolean = _ => true): String = {
    val sb = new StringBuilder
    sb ++= "<html><body>\n"
    sb ++= "<h1>NPORT-P: Part A: General Information</h1>\n"
    sb ++= "<h4>Item A.3. Reporting period</h4>\n<table>\n"
    sb ++= row("a. Date of fiscal year-end", "2099-12-31")
    reportingDate.foreach(d => sb ++= row("b. Date as of which information is reported", d))
    sb ++= "\n</table>\n"
    for (h <- holdings) {
      sb ++= "<h1>NPORT-P: Part C: Schedule of Portfolio Investments</h1>\n"
      sb ++= "<h4>Item C.1. Identification of investment</h4>\n<table>\n"
      h.issuer.foreach(v => sb ++= row("a. Name of issuer (if any)", v))
      sb ++= row("b. LEI (if any)", "N/A")
      sb ++= "\n</table>\n"
      if (renderC2Heading(h)) {
        sb ++= "<h4>Item C.2. Amount of each investment</h4>\n<table>\n"
        h.shares.foreach(v => sb ++= row("Balance", v))
        h.value_usd.foreach(v => sb ++= row("Report values in U.S. dollars", v))
        h.pct_net_assets.foreach(v => sb ++= row("Percentage value compared to net assets of the Fund", v))
        sb ++= "\n</table>\n"
      }
    }
    sb ++= "</body></html>\n"
    sb.toString
  }
}
