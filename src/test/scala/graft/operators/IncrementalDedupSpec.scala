package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-ingest contract: delta flags agree with the FULL
  * near-dup pair pipeline restricted to delta membership, and the delta
  * path never generates base-vs-base candidate pairs. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private lazy val sf = TestSpark.sf

  test("delta flags agree with the full pipeline's pairs") {
    val out = Dedup.incrementalDedup(s, sf).cache()
    val isDelta = (id: org.apache.spark.sql.Column) => pmod(id, lit(10L)) === lit(7L)
    // from the FULL pair set (a < b, est >= 0.5): a delta doc is a dup iff
    // it has ANY lower-id witness, or any (necessarily higher-id) base one
    val nd = Dedup.neardupPairs(s, sf).select("a", "b").cache()
    val viaLower = nd.filter(isDelta(col("b"))).select(col("b").as("doc_id"))
    val viaHigherBase = nd.filter(isDelta(col("a")) && !isDelta(col("b")))
      .select(col("a").as("doc_id"))
    val expected = viaLower.union(viaHigherBase).distinct()
      .collect().map(_.getLong(0)).toSet
    val flagged = out.filter(col("is_dup") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == expected)
    // and the output covers exactly the delta slice
    val deltaCount = graft.Tables.documents(s, sf).filter(isDelta(col("doc_id"))).count()
    assert(out.count() == deltaCount)
    out.unpersist(); nd.unpersist(): Unit
  }
}
