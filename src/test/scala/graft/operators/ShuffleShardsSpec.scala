package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The epoch-shuffle contract: every document lands in exactly one
  * shard, shards stay balanced, and the order checksum is stable across
  * reruns — the reproducibility a resumable training run depends on. */
class ShuffleShardsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("total coverage, balance, and rerun stability") {
    val a = TextAnalysis.shuffleShards(s, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = TextAnalysis.shuffleShards(s, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq, "epoch shuffle must be rerun-stable")
    val total = graft.Tables.documents(s, sf).count()
    assert(a.map(_._2).sum == total, "every document lands in exactly one shard")
    assert(a.length == 16 || total < 16, s"expected 16 shards, got ${a.length}")
    val (mx, mn) = (a.map(_._2).max, a.map(_._2).min)
    assert(mx <= 3 * mn + 8, s"shards unbalanced: min $mn max $mx")
    // position is load-bearing in the checksum: shards with >1 doc can't
    // all checksum to a position-free sum
    val posFree = graft.Tables.documents(s, sf)
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("epoch1_"), col("doc_id").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("bigint") % 16).cast("int").as("shard"))
      .groupBy("shard").agg(sum(col("doc_id") + 1).as("pf"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a.exists { case (sh, n, _, ck) => n > 1 && ck != posFree(sh) },
      "order checksum must depend on within-shard position")
  }
}
