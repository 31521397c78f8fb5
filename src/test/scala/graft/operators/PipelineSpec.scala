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

  // The corpus-proportional dup reject set must come from the STAGED pair
  // table and carry NO broadcast hint (a forced broadcast of a set that
  // grows with the corpus OOMs at scale); the bounded `contaminated` set
  // keeps its hint. Asserted on the LAZY survivor frame / corpusFilter
  // plan, before any checkpoint hides the joins.

  private def hints(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }

  private def hintScansPath(
      h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint, dir: String): Boolean =
    h.child.collectLeaves().exists {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.contains(dir))
          case _ => false
        }
      case _ => false
    }

  test("e2e survivor frame: dup anti-join unhinted and staged, contamination hint kept") {
    val sur = Pipeline.survivorFrame(s, sf)
    val hs = hints(sur)
    // hints remain on the BOUNDED sets only (contaminated + decontaminate's
    // internal held-out gram set) — not on the corpus-proportional dup set,
    // whether staged (a pairs-dir scan) or inline (a MinHash recompute)
    assert(hs.nonEmpty, "the bounded contamination set lost its broadcast hint")
    val pairsDir = Dedup.pairsStageDir(sf)
    assert(!hs.exists(hintScansPath(_, pairsDir)),
      "a broadcast hint sits on the staged dup set")
    assert(!hs.exists(_.toString.contains("minhash_signature")),
      "a broadcast hint sits on an inline-recomputed dup set")
    assert(sur.inputFiles.exists(_.contains(pairsDir)),
      s"dup reject set is not read from the staged pair table: ${sur.inputFiles.mkString(", ")}")
  }

  test("corpusFilter: no broadcast hint anywhere, dup set staged") {
    val cf = TextAnalysis.corpusFilter(s, sf)
    assert(hints(cf).isEmpty, "corpusFilter still forces a broadcast")
    assert(cf.inputFiles.exists(_.contains(Dedup.pairsStageDir(sf))),
      "corpusFilter does not read the staged pair table")
  }
}
