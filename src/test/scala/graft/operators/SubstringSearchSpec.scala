package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The inverted-index search contract: the trigram postings are built
  * once per fixture, candidate docs are a strict SUPERSET of the true
  * matches (conjunctive trigram containment is necessary but not
  * sufficient) yet far smaller than the corpus, and the verified result
  * equals the brute-force LIKE scan. */
class SubstringSearchSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("index path equals the brute-force contains scan, and builds once") {
    val first = TextAnalysis.substringSearch(s, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val builds = TextAnalysis.postingsBuildCount.get()
    val second = TextAnalysis.substringSearch(s, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(TextAnalysis.postingsBuildCount.get() == builds,
      "second search must reuse the staged postings")
    assert(first == second)
    val brute = Tables.documents(s, sf)
      .filter(instr(col("text"), TextAnalysis.SearchNeedle) > 0)
      .select(col("doc_id"), instr(col("text"), TextAnalysis.SearchNeedle).as("p"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(first == brute, "index path diverges from the full scan")
    assert(first.nonEmpty, "needle must match on the fixture")
  }

  test("candidates over-approximate matches but prune the corpus") {
    val candidates = TextAnalysis.searchCandidates(s, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val matches = Tables.documents(s, sf)
      .filter(instr(col("text"), TextAnalysis.SearchNeedle) > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(matches.subsetOf(candidates),
      "every true match must be an index candidate (completeness)")
    val total = Tables.documents(s, sf).count()
    assert(candidates.size < total,
      s"index must prune: ${candidates.size} candidates of $total docs")
  }

  test("needle lookup prunes postings partitions at the directory level") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    val df = TextAnalysis.searchCandidates(s, sf)
    df.collect() // force AQE finalization; metrics are for the executed scan
    val scan = flatten(df.queryExecution.executedPlan)
      .collectFirst { case f: FileSourceScanExec => f }
    assert(scan.isDefined, s"expected a postings scan:\n${df.queryExecution.executedPlan}")
    val opened = scan.get.metrics("numFiles").value
    val dir = new java.io.File(TextAnalysis.postingsStageDir(sf) + "/postings")
    val onDisk = dir.listFiles().count(_.getName.startsWith("a0="))
    // "slow scan" touches 6 distinct first bytes; the corpus populates far
    // more a0 partitions than that, so the executed scan must skip dirs
    assert(opened < onDisk,
      s"partition pruning must skip postings dirs: opened $opened of $onDisk partitions")
  }
}
