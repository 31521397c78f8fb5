package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.scalatest.funsuite.AnyFunSuite

/** The scale claims in the operator Scaladocs, asserted against the
  * EXECUTED plans: "one shuffle on the key" must mean exactly one hash
  * exchange (the trailing oracle-determinism orderBy adds a range
  * exchange, which is a gate artifact, not operator cost). */
class PlanPropertiesSpec extends AnyFunSuite {
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

  private def hashExchanges(df: DataFrame): Seq[ShuffleExchangeExec] = {
    df.collect() // force AQE finalization
    flatten(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
  }

  test("sessionize is a single user_id shuffle (windows + agg reuse it)") {
    val ex = hashExchanges(Events.sessionize(s, sf))
    assert(ex.size == 1, s"expected 1 hash exchange, got ${ex.size}:\n${ex.mkString("\n")}")
  }

  test("session funnel is a single user_id shuffle (session windows + agg reuse it)") {
    val ex = hashExchanges(Events.sessionFunnel(s, sf))
    assert(ex.size == 1, s"expected 1 hash exchange, got ${ex.size}:\n${ex.mkString("\n")}")
  }

  test("two-table as-of join is a single key shuffle (union is shuffle-free)") {
    val ex = hashExchanges(Events.asofTwoTable(s, sf))
    assert(ex.size == 1, s"expected 1 hash exchange, got ${ex.size}:\n${ex.mkString("\n")}")
  }

  test("predicates push to the parquet scan and the scan prunes columns") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = Relational.aggPricing(s, sf)
    df.collect()
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.metadata("PushedFilters").contains("l_shipdate"),
      s"shipdate filter not pushed: ${scan.metadata("PushedFilters")}")
    // lineitem has 11 columns; the query touches 6 (5 projected + the
    // filter column) — the scan must not read the rest
    assert(scan.output.size <= 6,
      s"scan reads ${scan.output.size} columns: ${scan.output.map(_.name)}")
  }

  test("partitioned sources prune partitions on the partition key") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.Tables
    import org.apache.spark.sql.functions.{col, lit}
    val dir = graft.TempPaths.scratch(s, "part_prune")
    Tables.orders(s, sf)
      .withColumn("bucket", col("o_orderkey") % 5)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val df = s.read.parquet(dir).filter(col("bucket") === lit(3))
    df.collect()
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.metadata("PartitionFilters").contains("bucket"),
      s"no partition filter: ${scan.metadata("PartitionFilters")}")
    assert(scan.relation.location.inputFiles.length >= 5) // all partitions exist
    assert(scan.selectedPartitions.partitionCount == 1, // but only one is read
      s"read ${scan.selectedPartitions.partitionCount} partitions, wanted 1")
  }

  test("corpus filter anti-joins the dup set as a broadcast") {
    val df = TextAnalysis.corpusFilter(s, sf)
    df.collect()
    val anti = flatten(df.queryExecution.executedPlan).collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftAnti => j
    }
    assert(anti.nonEmpty, "quality-gate anti-join must broadcast the dup set")
  }
}
