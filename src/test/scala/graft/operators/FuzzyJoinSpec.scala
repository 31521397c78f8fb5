package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two contracts of the deletion-neighborhood fuzzy join that
  * the value oracle alone can't discriminate: COMPLETENESS (the blocked
  * candidate set finds every pair the O(n²) all-pairs scan finds — the
  * pigeonhole argument, checked empirically against a test-only cross
  * join) and SHAPE (the production plan is an equi-join on the variant,
  * never a nested loop, and candidates stay far below n²). */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("fuzzy join equals the brute-force all-pairs levenshtein join") {
    val out = Relational.fuzzyJoin(s, sf)
      .select("key1", "key2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val names = Tables.supplier(s, sf)
      .select(col("s_suppkey").as("key"), col("s_name").as("name"))
    // test-only brute force: the quadratic plan production avoids
    val brute = names.as("a").crossJoin(names.as("b"))
      .filter(col("a.key") < col("b.key"))
      .select(col("a.key").as("key1"), col("b.key").as("key2"),
        levenshtein(col("a.name"), col("b.name")).as("dist"))
      .filter(col("dist") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == brute, "blocked join must find exactly the all-pairs matches")
    assert(out.nonEmpty)
  }

  test("candidates are blocked, deduped, and planned as an equi-join") {
    // dedup contract: runs of equal characters yield the same deletion
    // variant many times; the output must still be one row per pair
    val pairs = Relational.fuzzyJoin(s, sf).select("key1", "key2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.toSet.size, "duplicate pairs in fuzzy-join output")

    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    val q = Relational.fuzzyJoin(s, sf)
    q.collect() // force AQE finalization
    val nonEqui = flatten(q.queryExecution.executedPlan).collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(nonEqui.isEmpty,
      s"fuzzy join must block on the variant, never nested-loop:\n${q.queryExecution.executedPlan}")
  }

  test("blocking prunes the pair space once names are not all near-identical") {
    // sf0.001's 10 sequential supplier names are ALL within distance 1 of
    // each other (they differ only in the last digit) — no blocking can
    // prune a clique. At sf0.01 (100 names, two varying digit positions)
    // the deletion-neighborhood blocks must reject most of the n(n-1)/2
    // pair space before the levenshtein verify ever runs.
    val big = "/root/testdata/sf0.01"
    val n = Tables.supplier(s, big).count()
    val verified = Relational.fuzzyJoin(s, big).count()
    assert(verified > 0)
    assert(verified * 2 < n * (n - 1) / 2,
      s"verified=$verified should be well under all-pairs=${n * (n - 1) / 2}")
  }
}
