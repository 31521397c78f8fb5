package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-view contract: applying the change-feed delta to the
  * materialized v1 aggregate lands on EXACTLY the aggregate a full
  * recompute of v2 produces, and a key whose rows all disappear drops
  * from the view rather than lingering at zero. */
class MvRefreshSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("delta refresh equals the full recompute of the v2 state") {
    val got = Formats.mvRefresh(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val full = graft.Tables.orders(s, sf)
      .select(col("o_orderstatus"),
        ((col("o_totalprice").cast("decimal(28,4)") * 100).cast("long")
          + when(col("o_orderkey") % 3 === 1, 500L).otherwise(0L)).as("cents"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("total_cents"))
      .orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == full, "incremental refresh diverged from full recompute")
    assert(got.nonEmpty)
  }

  test("a key with net-zero rows drops from the refreshed view") {
    import s.implicits._
    val mv1 = Seq(("GONE", 2L, 700L), ("KEPT", 3L, 900L))
      .toDF("o_orderstatus", "n_rows", "total_cents")
    val deltas = Seq(
      ("GONE", 300L, -1L), ("GONE", 400L, -1L), // both rows deleted
      ("KEPT", 100L, -1L), ("KEPT", 50L, 1L),   // one rewritten
      ("NEW", 10L, 1L))                          // fresh key
      .toDF("o_orderstatus", "cents", "w")
    val out = Formats.applyMvDelta(mv1, deltas).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("KEPT", 3L, 850L), ("NEW", 1L, 10L)),
      s"got $out — GONE must drop, NEW must appear, KEPT must adjust")
  }
}
