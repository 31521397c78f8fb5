package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning contract: the staged fact scan must carry a
  * runtime pruning filter on the partition column (the busy-day set is
  * data-dependent — no static filter can express it) and must leave the
  * quiet days' partitions unread in the EXECUTED scan metrics. */
class DppSpec extends AnyFunSuite {
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

  test("fact scan prunes dynamically: DPP filter present, quiet-day dirs unread") {
    val df = Layout.dppPrune(s, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture must contain busier-than-average days")
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    val factScan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("layout_")))
    assert(factScan.isDefined, s"expected the staged layout scan:\n${df.queryExecution.executedPlan}")
    val pf = factScan.get.partitionFilters.mkString(";").toLowerCase
    assert(pf.contains("dynamicpruning"),
      s"fact partition filters must be dynamic, got: $pf")
    val opened = factScan.get.metrics("numFiles").value
    val dayDirs = new java.io.File(Layout.layoutDir(sf)).listFiles()
      .count(_.getName.startsWith("event_date="))
    val busyDays = rows.length
    assert(opened < dayDirs,
      s"DPP must skip quiet days: opened $opened files of $dayDirs day dirs")
    assert(opened >= busyDays, "every busy day's file must be read")
  }
}
