package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multi-table atomicity contract: the consistent reader (one txn
  * record resolves every table) passes the functional invariant, and a
  * TORN reader — fact through txn 2, summary through txn 1, exactly
  * what independent per-table commits expose — trips it. */
class MultiTableTxnSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("consistent snapshots pass; the torn resolution trips the invariant") {
    val (base, df) = Formats.multiTableTxnBuild(s, sf)
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.length == 2 && rows(0)._2 < rows(1)._2,
      s"txn 2 must see the appended fact rows: $rows")
    // the torn read: fact v2 joined against summary v1
    val (fact, summary) = Formats.readTxnSnapshot(s, base, 2, tornSummaryTxn = Some(1))
    val torn = fact.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("f_rows"), sum(col("cents")).as("f_cents"))
      .join(summary, Seq("o_orderstatus"), "full_outer")
      .filter(col("f_rows").isNull || col("s_rows").isNull ||
        col("f_rows") =!= col("s_rows") || col("f_cents") =!= col("s_cents"))
      .count()
    assert(torn > 0, "the torn resolution must violate the invariant — " +
      "otherwise the txn record is not load-bearing")
  }
}
