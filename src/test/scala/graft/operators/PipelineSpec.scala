package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shape checks for the composed e2e pass (exactness vs the six-stage
  * DuckDB recomputation is the Verify gate's job). */
class PipelineSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("every stage rejects something and the composition is consistent") {
    val out = Pipeline.e2ePack(s, sf).cache()
    try {
      val n = graft.Tables.documents(s, sf).count()
      val kept = out.count()
      assert(kept > 0 && kept < n, s"pipeline kept $kept of $n — no filtering happened")
      // packed spans are sane: positive tokens, ordered chunk interval
      assert(out.filter(col("n_tokens") <= 0).count() == 0)
      assert(out.filter(col("chunk_last") < col("chunk_first")).count() == 0)
      // one span per surviving doc
      assert(out.select("doc_id").distinct().count() == kept)
      // survivors are a subset of the train split (content-hash bucket < 98)
      val bucket = conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
        .cast("bigint") % 100
      val heldOut = graft.Tables.documents(s, sf).filter(bucket >= 98).select("doc_id")
      assert(out.join(heldOut, "doc_id").count() == 0,
        "held-out docs leaked into the training pack")
    } finally { out.unpersist(); () }
  }
}
