package graft.plans

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rewrite must fire exactly when the rank column is dropped, leave
  * rank-exposing plans alone, and never change results. */
class RewriteWindowTopKSpec extends AnyFunSuite {
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

  private def windowTopK(keepRank: Boolean): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val ranked = Tables.orders(s, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    if (keepRank) ranked.select("o_custkey", "rn", "o_orderkey", "o_totalprice")
    else ranked.select("o_custkey", "o_orderkey", "o_totalprice")
  }

  test("rank-dropping window top-k rewrites to the bounded-heap operator") {
    val df = windowTopK(keepRank = false)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[TopKPerKeyExec]), "rewrite should fire")
    assert(!nodes.exists(_.isInstanceOf[WindowExec]), "window should be gone")
  }

  test("rank-keeping window top-k is left untouched") {
    val df = windowTopK(keepRank = true)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[WindowExec]), "window must remain")
    assert(!nodes.exists(_.isInstanceOf[TopKPerKeyExec]))
  }

  // Regression: `row_number().over(Window.orderBy(...))` with NO partition
  // spec used to produce TopKPerKeyNode(Nil, ...) whose
  // ClusteredDistribution(Nil) throws at planning in Spark 4. Empty keys
  // now mean global top-k (AllTuples final heap).
  private def globalTopK: DataFrame = {
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("o_orderkey", "o_totalprice")
  }

  test("no-partition window top-k rewrites to a global bounded heap") {
    val df = globalTopK
    assert(df.collect().length == 5)
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[TopKPerKeyExec]), "rewrite should fire")
    assert(!nodes.exists(_.isInstanceOf[WindowExec]), "window should be gone")
  }

  test("global bounded heap matches orderBy+limit") {
    val viaRule = globalTopK
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).collect().toSeq
    val viaSort = Tables.orders(s, sf)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5).collect().toSeq
    assert(viaRule == viaSort)
  }

  test("rewritten plan returns exactly the window formulation's rows") {
    val viaRule = windowTopK(keepRank = false)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().toSeq
    val viaWindow = windowTopK(keepRank = true).drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().toSeq
    assert(viaRule == viaWindow)
  }
}
