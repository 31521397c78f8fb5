package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the sketch aggregates (no oracle possible — the
  * outputs are engine-specific) and the no-shuffle plan property of the
  * bucketed join. */
class SketchesAndBucketingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("approx_count_distinct within 5% of exact; query flags all green") {
    Sketches.approxDistinctRaw(s, sf).collect().foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"flag=${r.getString(0)} approx=$approx exact=$exact")
    }
    val flagged = Sketches.approxDistinct(s, sf).collect()
    assert(flagged.nonEmpty && flagged.forall(_.getInt(2) == 1),
      "HLL bound flag tripped")
  }

  test("approx percentiles within 5% of exact; rank-bound flags all green") {
    val rows = Sketches.approxQuantilesRaw(s, sf).collect()
    assert(rows.length % 3 == 0 && rows.nonEmpty) // one row per (priority, pct)
    rows.foreach { r =>
      val (a, e) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(a - e) / e < 0.05,
        s"prio=${r.getString(0)} pct=${r.getDouble(1)} approx=$a exact=$e")
    }
    val flagged = Sketches.approxQuantiles(s, sf).collect()
    assert(flagged.length == rows.length && flagged.forall(_.getInt(3) == 1),
      "percentile rank-bound flag tripped")
  }

  test("bucketed join plans as SortMergeJoin with zero join-side shuffles") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // TreeNode.collect stops at AQE/query-stage boundaries (children=Nil);
    // expand through them explicitly
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    val df = Bucketing.bucketedJoin(s, sf)
    df.collect() // force planning + AQE finalization on a real run
    val all = flatten(df.queryExecution.executedPlan)
    val smjs = all.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected SortMergeJoin in:\n${df.queryExecution.executedPlan}")
    val shufflesUnderJoin = flatten(smjs.head).collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle either side:\n${smjs.head}")
  }

  test("sketch-planned join: estimates bracket reality and the decision flips") {
    // the query itself REQUIREs the executed plans (broadcast for the
    // narrow regime, shuffle for the wide one) — a wrong decision throws
    // before any row lands; here we pin the estimate quality the rule
    // depends on
    val rows = Sketches.sketchPlannedJoin(s, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toMap2
    val (narrowStrat, narrowEst, narrowExact) = rows("narrow_filter")
    val (wideStrat, wideEst, wideExact) = rows("wide_filter")
    assert(narrowStrat == "broadcast" && wideStrat == "shuffle",
      s"decision did not flip: narrow=$narrowStrat wide=$wideStrat")
    // a ~1% filter must estimate well under the 10% rule's threshold and
    // a ~99% filter well over it — with honest slack for k=128 sampling
    assert(narrowEst <= narrowExact * 4 + 40,
      s"narrow estimate $narrowEst wildly above exact $narrowExact")
    assert(wideEst * 2 >= wideExact,
      s"wide estimate $wideEst less than half of exact $wideExact")
  }

  private implicit class Map2[A](rows: Array[(String, A, Long, Long)]) {
    def toMap2: Map[String, (A, Long, Long)] =
      rows.map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
  }

  test("storage-partitioned join: answers equal the plain join; confs restored") {
    import org.apache.spark.sql.functions._
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => s.conf.getOption(k))
    // the operator REQUIREs zero exchanges under the join — a plain
    // pass certifies the SPJ fired
    val got = Bucketing.spjJoin(s, sf).collect().map(_.toSeq)
    assert(keys.map(k => s.conf.getOption(k)) == before, "scoped confs leaked")
    val plain = graft.Tables.orders(s, sf)
      .join(graft.Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)), graft.QueryDsl.dsum(col("o_totalprice")),
        graft.QueryDsl.dsum(col("c_acctbal")))
      .collect().map(_.toSeq)
    assert(got.toSeq == plain.toSeq, "SPJ diverged from the plain join")
  }

  test("kmv set ops: estimates bracket exact answers; sample algebra consistent") {
    val r = Sketches.kmvSetOps(s, sf).collect().head
    def l(n: String) = r.getLong(r.fieldIndex(n))
    // sampled-set algebra: union ⊇ inter + a-only (the rest is b-only)
    assert(l("n_union") >= l("n_inter") + l("n_aonly"))
    assert(l("n_inter") <= math.min(l("n_union"), Sketches.SoKForSpec))
    // accuracy: the within-2x verdicts hold, and union is much tighter
    assert(r.getInt(r.fieldIndex("union_within_2x")) == 1)
    assert(r.getInt(r.fieldIndex("inter_within_2x")) == 1)
    assert(math.abs(l("est_union") - l("exact_union")) * 2 <= l("exact_union"),
      s"union est ${l("est_union")} vs exact ${l("exact_union")} off by >50%")
    // jaccard estimate near the exact ratio (both in milli)
    val exactJ = l("exact_inter") * 1000 / l("exact_union")
    assert(math.abs(l("jaccard_milli") - exactJ) <= 150,
      s"jaccard est ${l("jaccard_milli")} vs exact $exactJ")
  }

  test("sample agg: deterministic sample, estimates inside the audit bounds") {
    val r1 = Sketches.sampleAgg(s, sf).collect().map(_.toSeq)
    val r2 = Sketches.sampleAgg(s, sf).collect().map(_.toSeq)
    assert(r1.toSeq == r2.toSeq, "md5 sampling must be run-invariant")
    r1.foreach { row =>
      val (exact, est) = (row(1).asInstanceOf[Long], row(3).asInstanceOf[Long])
      assert(est > 0, "the 5% sample missed a whole group")
      assert(math.abs(est - exact) * 5 <= exact,
        s"estimate $est vs exact $exact off by >20% at sf")
    }
  }

  test("portable bloom join: no false negatives, real reduction, FP accounting") {
    import org.apache.spark.sql.functions._
    val r = Sketches.portableBloomJoin(s, sf).collect().head
    val (nFact, nPass, nJoin, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // no false negatives: the bloom-filtered join finds every true match
    val plainMatches = graft.Tables.orders(s, sf)
      .join(graft.Tables.customer(s, sf).filter(col("c_custkey") % 50 === 0),
        col("o_custkey") === col("c_custkey"))
      .count()
    assert(nJoin == plainMatches,
      s"bloom dropped true matches: joined $nJoin of $plainMatches")
    // the filter must actually reduce the fact side (the operator
    // REQUIREs < 1/4; hold the same line here)
    assert(nPass * 4 < nFact, s"no reduction: $nPass of $nFact passed")
    // false positives are exactly the passed-but-unmatched rows
    assert(nFp == nPass - nJoin && nFp >= 0, s"FP accounting broken: $nFp")
  }
}
