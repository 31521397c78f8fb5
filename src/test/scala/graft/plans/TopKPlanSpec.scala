package graft.plans

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k operator must (a) match the window formulation's
  * results exactly and (b) plan as partial heap → key exchange → final
  * heap, never a full per-partition sort. */
class TopKPlanSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    p +: kids.flatMap(flatten)
  }

  test("bounded-heap top-k equals the window formulation") {
    val o = Tables.orders(s, sf).select("o_custkey", "o_orderkey", "o_totalprice")
    val custom = TopK.perKey(o,
        Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().toSeq
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().toSeq
    assert(custom == windowed)
  }

  test("plans as partial+final heap operators around one key exchange, no sort") {
    val df = TopK.perKey(
      Tables.orders(s, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    val heapNodes = all.collect { case t: TopKPerKeyExec => t }
    assert(heapNodes.map(_.partial).sorted == Seq(false, true))
    assert(all.collect { case e: ShuffleExchangeExec => e }.nonEmpty)
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      "bounded-heap top-k must not sort")
  }

  test("r_topk_global gate query drives the AllTuples heap path: no sort or window below it") {
    val df = graft.operators.Relational.topKGlobal(s, sf)
    assert(df.collect().length == 25)
    val all = flatten(df.queryExecution.executedPlan)
    val heapNodes = all.collect { case t: TopKPerKeyExec => t }
    assert(heapNodes.map(_.partial).sorted == Seq(false, true),
      "expected partial+final heap pair")
    assert(heapNodes.forall(_.keys.isEmpty), "global form must carry empty keys")
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "window formulation must be rewritten away")
    // the presentation orderBy on 25 survivors may sort ABOVE the heap;
    // the data path INTO the heap must be sort-free (no global input sort)
    heapNodes.foreach { h =>
      assert(!flatten(h.child).exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
        "input to the global heap is being sorted")
    }
  }

  test("k larger than group size returns whole groups") {
    val tiny = Tables.orders(s, sf).filter(col("o_custkey") < 3)
      .select("o_custkey", "o_orderkey")
    val n = tiny.count()
    assert(TopK.perKey(tiny, Seq(col("o_custkey")),
      Seq(col("o_orderkey").asc), 1000000).count() == n)
  }
}
