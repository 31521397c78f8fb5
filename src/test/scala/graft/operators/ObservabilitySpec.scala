package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Single-pass QC metrics: the observed e2e pipeline must (a) report
  * survivor counts that match an independent recomputation, and (b)
  * produce the identical packed output as the unobserved form — observe
  * is a free rider on the training pass, never a semantic change. */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private lazy val sf = TestSpark.sf

  test("the stage ledger funnels monotonically and matches a recount") {
    val rows = Pipeline.pipelineLedger(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq ==
      Seq("1_length_gate", "2_lang_gate", "3_exact_dedup"))
    rows.foreach { case (st, in, out, dropped) =>
      assert(out <= in && dropped == in - out, s"$st: $in -> $out, dropped $dropped")
    }
    // stages chain: each stage's rows_in is the previous stage's rows_out
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._3, s"${b._1} rows_in != ${a._1} rows_out")
    }
    val recount = graft.Tables.documents(s, sf)
      .filter(length(col("text")) >= 100 && col("lang").isin("analytics", "storage"))
      .select(md5(col("text").cast("binary"))).distinct().count()
    assert(rows.last._3 == recount, "final stage diverges from the recount")
  }

  test("observed pipeline reports exact survivor metrics without changing output") {
    val (out, obs) = Pipeline.e2ePackObserved(s, sf)
    val observedRows = out.collect().toSeq
    val m = obs.get
    // independent recomputation of the survivor set via the same public
    // operators (the spec's own join chain, not the pipeline's)
    val bucket = conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
      .cast("bigint") % 100
    val survivors = graft.Tables.documents(s, sf)
      .filter(bucket < 98).select(col("doc_id"), col("text"))
      .join(TextAnalysis.quality(s, sf)
        .filter(col("quality_score") >= 0.6).select("doc_id"), "doc_id")
      .join(Dedup.neardupPairs(s, sf).select(col("b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .join(TextAnalysis.decontaminate(s, sf).select("doc_id"), Seq("doc_id"), "left_anti")
    val expected = survivors
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
      .collect().head
    assert(m("n_survivors") == expected.getLong(0))
    assert(m("survivor_chars") == expected.getLong(1))
    assert(expected.getLong(0) > 0)
    // byte-identical output with and without observation
    assert(observedRows == Pipeline.e2ePack(s, sf).collect().toSeq)
  }
}
