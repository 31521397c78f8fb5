package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** The staged-layout scan-efficiency contract: the whole point of the
  * date-partitioned staging is that a date-range query OPENS ONLY the
  * surviving partitions — asserted on the EXECUTED scan's metrics, since
  * `Dataset.inputFiles` reports the relation before pruning. */
class LayoutSpec extends AnyFunSuite {
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

  test("date filter prunes partitions: the scan reads 3 of 30 staged days") {
    val df = Layout.layoutPrune(s, sf)
    df.collect() // force execution so scan metrics are real
    val scan = flatten(df.queryExecution.executedPlan)
      .collectFirst { case f: FileSourceScanExec => f }
    assert(scan.isDefined, s"expected a FileSourceScanExec in:\n${df.queryExecution.executedPlan}")
    // the date predicate must be a partition filter (pruned BEFORE the
    // scan), not a data filter evaluated per row
    assert(scan.get.partitionFilters.nonEmpty,
      s"date predicate missing from partitionFilters:\n${scan.get}")
    val numFiles = scan.get.metrics("numFiles").value
    assert(numFiles == 3, s"pruned scan should open 3 day-files, opened $numFiles")
    // and the staging really has all 30 days on disk
    val dayDirs = new java.io.File(Layout.layoutDir(sf)).listFiles()
      .count(_.getName.startsWith("event_date="))
    assert(dayDirs == 30, s"expected 30 staged day-directories, saw $dayDirs")
  }

  test("layout staging is build-once (marker): repeat ensure is a no-op") {
    Layout.ensureLayout(s, sf)
    val builds = Layout.buildCount.get()
    Layout.ensureLayout(s, sf)
    assert(Layout.buildCount.get() == builds)
  }
}
