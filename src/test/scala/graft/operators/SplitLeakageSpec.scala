package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The leakage-safe split contract: no near-dup pair straddles splits
  * under the cluster-keyed assignment, while the naive doc-keyed
  * assignment provably leaks pairs across splits on this very corpus —
  * the trap the operator exists to close. */
class SplitLeakageSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def pairs: Seq[(Long, Long)] =
    Dedup.neardupPairs(s, sf).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("cluster-keyed split never separates a near-dup pair") {
    val split = Dedup.splitLeakage(s, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val ps = pairs
    assert(ps.nonEmpty, "fixture must contain near-dup pairs")
    ps.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles ${split(a)}/${split(b)}")
    }
    assert(split.values.toSet.size >= 2, "fixture must populate several splits")
  }

  test("the naive doc-keyed split leaks pairs across splits") {
    val naive = graft.Tables.documents(s, sf)
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("gsplit_"), col("doc_id").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("bigint") % 100).as("bucket"))
      .select(col("doc_id"),
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val leaked = pairs.count { case (a, b) => naive(a) != naive(b) }
    assert(leaked > 0,
      "the doc-keyed split must leak on this corpus — otherwise the demo is vacuous")
  }
}
