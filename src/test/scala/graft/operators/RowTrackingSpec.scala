package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-identity contract: the classifier pairs every row across the
  * full rewrite, and the update class lands on exactly the corrected
  * slice with the exact money delta. */
class RowTrackingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("lineage classes match the slice rule with exact deltas") {
    val got = Formats.rowTracking(s, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val orders = graft.Tables.orders(s, sf)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(28,4)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (upd, unch) = orders.partition(_._1 % 3 == 1)
    assert(got("unchanged") ==
      ((unch.length.toLong, unch.map(_._2).sum, unch.map(_._2).sum)))
    assert(got("updated") ==
      ((upd.length.toLong, upd.map(_._2).sum, upd.map(_._2).sum + 500L * upd.length)))
    assert(got.keySet == Set("unchanged", "updated"))
  }
}
