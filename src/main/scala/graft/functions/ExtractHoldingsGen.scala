package graft.functions

import graft.extract.NportKernel
import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The NPORT extraction kernel (X2, ETFQuarterlyHoldingsExtractor.py:84-131)
  * as a Catalyst `Generator` — the explode-family form of the 1-doc→N-rows
  * operator (SURVEY.md §4's optional polish next to the `Dataset.flatMap`
  * form in operators.Extraction).
  *
  * Why a Generator and not just flatMap: the flatMap form forces the
  * pipeline through a `Dataset[T]` encoder boundary — object
  * serialization in, object serialization out — which breaks column-level
  * reasoning (pruning, pushdown) around the extraction stage. A Generator
  * stays inside the relational plan: upstream remains a columnar scan,
  * downstream projections resolve against `elementSchema`, and Catalyst
  * plans it as a `GenerateExec` over the document column with every other
  * column pruned as usual. Same kernel, same rows (ExtractionPipelineSpec
  * and the x_extract_holdings_gen oracle pin bit-identical output); only
  * the plan shape differs.
  *
  * CodegenFallback is deliberate: the per-row work is an XHTML parse —
  * microseconds to milliseconds — so per-row dispatch overhead is
  * negligible (the MinHashSignature/SrpBandKeys rationale, even more so).
  */
case class ExtractHoldingsGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("reporting_date", StringType, nullable = false),
    StructField("issuer", StringType, nullable = true),
    StructField("shares", StringType, nullable = true),
    StructField("value_usd", StringType, nullable = true),
    StructField("pct_net_assets", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string document column, got ${t.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val doc = child.eval(input)
    // null document ⇒ no rows: the same F2 null-guard semantics as the
    // flatMap form (a fetch-failed filing contributes nothing, ref :150)
    if (doc == null) Nil
    else NportKernel.extractRows(doc.toString).map { h =>
      InternalRow(
        UTF8String.fromString(h.reporting_date),
        h.issuer.map(UTF8String.fromString).orNull,
        h.shares.map(UTF8String.fromString).orNull,
        h.value_usd.map(UTF8String.fromString).orNull,
        h.pct_net_assets.map(UTF8String.fromString).orNull)
    }
  }

  override def prettyName: String = "extract_holdings"

  override protected def withNewChildInternal(newChild: Expression): ExtractHoldingsGen =
    copy(child = newChild)
}

object ExtractHoldingsGen {
  def apply(doc: Column): Column =
    GraftInterop.column(new ExtractHoldingsGen(GraftInterop.expression(doc)))
}
