package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join contract: the injected `might_contain`
  * filter must be present in the executed plan (the operator REQUIREs
  * it, so a plain pass certifies injection), must REDUCE the rows
  * flowing into the fact side's exchange (executed metrics — the whole
  * point is killing non-matching fact rows before the shuffle), and
  * must not change the answer vs a plain recompute. */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    (p +: kids.flatMap(flatten)) ++ p.subqueries.flatMap(flatten)
  }

  test("bloom filter injects, prunes fact rows pre-shuffle, and preserves the answer") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val confBefore = keys.map(k => s.conf.getOption(k))
    val result = Layout.bloomJoin(s, sf).collect().map(_.toSeq)
    assert(keys.map(k => s.conf.getOption(k)) == confBefore, "scoped confs leaked")

    val plain = graft.Tables.lineitem(s, sf)
      .select(col("l_orderkey"), col("l_returnflag"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(graft.Tables.orders(s, sf)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"), graft.QueryDsl.dsum(col("rev")).as("revenue"))
      .orderBy("l_returnflag")
      .collect().map(_.toSeq)
    assert(result.toSeq == plain.toSeq, "bloom pruning must never change the answer")

    // re-run the raw join under the scoped confs to inspect metrics
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val urgent = graft.Tables.orders(s, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = graft.Tables.lineitem(s, sf)
        .select(col("l_orderkey"), col("l_returnflag"))
      val j = li.hint("merge").join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      j.collect()
      val totalLines = graft.Tables.lineitem(s, sf).count()
      val bloomFilters = flatten(j.queryExecution.executedPlan)
        .collect { case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") => f }
      assert(bloomFilters.nonEmpty, "no might_contain FilterExec in executed plan")
      val out = bloomFilters.map(_.metrics("numOutputRows").value).min
      assert(out < totalLines,
        s"bloom filter passed all $totalLines fact rows — no pre-shuffle pruning")
    } finally {
      s.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      s.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
