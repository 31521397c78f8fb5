package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based reorder contract: the DP reorderer must move the selective
  * customer⋈nation join to the innermost position (the operator REQUIREs
  * it, so a plain pass certifies stats-driven planning ran), the scoped
  * CBO confs must not leak, and the answer must equal the same chain
  * executed in written order without CBO. */
class CboSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("reorder fires, confs restore, answer matches the no-CBO chain") {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => s.conf.getOption(k))
    val got = Cbo.cboReorder(s, sf).collect().map(_.toSeq)
    assert(keys.map(k => s.conf.getOption(k)) == before, "scoped CBO confs leaked")
    assert(got.nonEmpty)

    import org.apache.spark.sql.functions._
    val plain = graft.Tables.lineitem(s, sf)
      .join(graft.Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(s, sf), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3")
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_lines"),
        graft.QueryDsl.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .collect().map(_.toSeq)
    assert(got.toSeq == plain.toSeq, "join order must never change the answer")
  }
}
