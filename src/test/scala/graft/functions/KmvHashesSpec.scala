package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the KMV typed imperative aggregate the oracle equality
  * can't discriminate alone: exact degradation below k, estimate accuracy
  * above k, and stability under partitioning (the merge path must produce
  * the same sketch as a single-partition fold). */
class KmvHashesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def kmv(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy(col("event_type"))
    .agg(expr(s"kmv_hashes(cast(user_id as string), $k)").as("hs"))

  test("below k the sketch IS the exact distinct set") {
    // sf0.001 has ~15 users, far under k=32: every group keeps every hash
    val out = kmv(Tables.events(s, sf), 32)
      .select(col("event_type"), size(col("hs")).as("n")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val exact = Tables.events(s, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(out == exact, "under-full sketch must hold exactly the distinct hashes")
  }

  test("estimate is within 3/sqrt(k) of the exact count once k is exceeded") {
    // force the estimating regime with a small k against ~15 distinct
    val k = 8
    val est = kmv(Tables.events(s, sf), k)
      .select(col("event_type"),
        (lit((k - 1).toDouble * 4294967296.0)
          / element_at(col("hs"), size(col("hs"))).cast("double")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(s, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    exact.foreach { case (t, n) =>
      assert(n > k, s"fixture must exceed k for $t")
      val rel = math.abs(est(t) - n) / n
      assert(rel < 3.0 / math.sqrt(k.toDouble),
        s"$t: estimate ${est(t)} vs exact $n (rel $rel)")
    }
  }

  test("merge path: 32-partition sketch equals the single-partition sketch") {
    val ev = Tables.events(s, sf)
    val wide = kmv(ev.repartition(32, col("event_id")), 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val narrow = kmv(ev.coalesce(1), 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(wide == narrow, "sketch must be partitioning-invariant")
  }
}
