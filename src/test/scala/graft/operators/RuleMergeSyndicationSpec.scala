package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-9 additions the DuckDB oracle can't see:
  * the Gopher rule gates must DISCRIMINATE (both populations non-empty,
  * `keep` is exactly the conjunction), the CDC merge must conserve rows
  * (base − deletes + inserts, digests moved only by updates), and the
  * syndication matrix must conserve the staged pair table it consumes. */
class RuleMergeSyndicationSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("gopher rules: every gate discriminates and keep is the conjunction") {
    val r = TextAnalysis.gopherRules(s, sf).cache()
    try {
      for (flag <- Seq("r_len", "r_word_len", "r_stop", "r_dup", "r_top")) {
        assert(r.filter(col(flag) === 1).count() > 0, s"$flag passes nobody")
        assert(r.filter(col(flag) === 0).count() > 0,
          s"$flag kills nobody — threshold does not discriminate on the fixture")
      }
      val conj = r.filter(col("keep") =!=
        (col("r_len") * col("r_word_len") * col("r_stop") * col("r_dup") * col("r_top")))
      assert(conj.count() == 0, "keep is not the conjunction of the five gates")
      // ratio columns must agree with the integer gate decisions
      val badTop = r.filter((col("top_share") <= 0.2).cast("int") =!= col("r_top"))
        .filter(col("top_share") =!= 0.2) // boundary belongs to the integer form
      assert(badTop.count() == 0, "r_top disagrees with top_share away from the boundary")
    } finally { r.unpersist(): Unit }
  }

  test("merge upsert conserves rows and moves only updated digests") {
    val base = graft.Tables.documents(s, sf)
      .select(col("doc_id"), col("text"),
        (conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
          .cast("bigint") % 17).as("k"))
      .cache()
    try {
      val m = Formats.mergeUpsert(s, sf).cache()
      try {
        val nBase = base.count()
        val nDel = base.filter(col("k") === 0).count()
        val nIns = base.filter(col("k") === 2).count()
        assert(nDel > 0 && nIns > 0, "fixture exercises neither delete nor insert")
        assert(m.count() == nBase - nDel + nIns, "merge did not conserve rows")
        assert(m.filter(col("action") === "insert")
          .filter(col("doc_id") <= 1000000L).count() == 0,
          "insert landed inside the base id space")
        // deleted keys are gone; kept keys carry the ORIGINAL digest
        val deleted = base.filter(col("k") === 0).select("doc_id")
        assert(m.join(deleted, "doc_id").count() == 0, "a deleted key survived")
        val origDigest = base.select(col("doc_id"),
          md5(col("text").cast("binary")).as("orig"))
        val kept = m.filter(col("action") === "keep").join(origDigest, "doc_id")
        assert(kept.filter(col("digest") =!= col("orig")).count() == 0,
          "a kept row's digest changed")
        val upd = m.filter(col("action") === "update").join(origDigest, "doc_id")
        assert(upd.count() > 0 &&
          upd.filter(col("digest") === col("orig")).count() == 0,
          "updates must change the digest")
      } finally { m.unpersist(): Unit }
    } finally { base.unpersist(): Unit }
  }

  test("cross-source matrix conserves the staged pair table") {
    val pairs = Dedup.stagedNeardupPairs(s, sf)
    val matrix = Dedup.crossSource(s, sf)
    val total = matrix.agg(sum(col("n_pairs"))).head.getLong(0)
    assert(total == pairs.count(), "matrix lost or double-counted a pair")
    assert(matrix.filter(col("is_cross_source") =!=
      (col("src_lo") =!= col("src_hi")).cast("int")).count() == 0)
  }
}
