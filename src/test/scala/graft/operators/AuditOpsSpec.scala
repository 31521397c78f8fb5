package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the pipeline-audit operators: heartbeat
  * missing-window detection and the join-key skew diagnostic. */
class AuditOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("missing windows: endpoints never missing; missing + observed = full span") {
    val missing = Events.missingWindows(s, sf)
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSeq
    val observed = Tables.events(s, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSeq
    val obsByUser = observed.groupBy(_._1)
    assert(missing.nonEmpty, "fixture must contain blackout days")
    missing.foreach { case (u, day) =>
      val days = obsByUser(u).map(_._2)
      assert(day.isAfter(days.min) && day.isBefore(days.max),
        s"user $u: missing day $day outside or at the observed bounds")
      assert(!days.contains(day), s"user $u: observed day $day reported missing")
    }
    // exact cover: span length == observed + missing for every user
    val missByUser = missing.groupBy(_._1).view.mapValues(_.size).toMap
    obsByUser.foreach { case (u, rows) =>
      val days = rows.map(_._2)
      val span = java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max) + 1
      assert(span == days.size + missByUser.getOrElse(u, 0),
        s"user $u: span $span != observed ${days.size} + missing ${missByUser.getOrElse(u, 0)}")
    }
  }

  test("curriculum ranking is a permutation: ranks 1..n, each exactly once") {
    val ranks = TextAnalysis.curriculum(s, sf).collect().map(_.getLong(0))
    val n = Tables.documents(s, sf).count()
    assert(ranks.length == n)
    assert(ranks.toSet == (1L to n).toSet, "two-phase ranking must emit a dense permutation")
  }

  test("bitemporal: snapshots conserve orders; only the correction moves mass") {
    val rows = Dedup.stagedNeardupPairs(s, sf).sparkSession // session handle
    val got = Relational.bitemporal(s, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val t1 = got.collect { case (("t1_before_correction", seg), n) => seg -> n }
    val t2 = got.collect { case (("t2_after_correction", seg), n) => seg -> n }
    // each snapshot sees every order exactly once — the time axes never
    // duplicate or lose facts
    assert(t1.values.sum == t2.values.sum, "snapshots disagree on total orders")
    // the correction exists only in the t2 view, and t1 has no trace
    assert(!t1.keySet.contains("CORRECTED") && t2.keySet.contains("CORRECTED"))
    // uncorrected segments only SHRINK from t1 to t2 (mass moves to
    // CORRECTED, never appears from nowhere)
    t2.filter(_._1 != "CORRECTED").foreach { case (seg, n) =>
      assert(n <= t1(seg), s"segment $seg grew across the correction")
    }
  }

  test("ROUGE pairs cover every staged pair; metrics bounded; F1 between P and R") {
    val pairs = Dedup.stagedNeardupPairs(s, sf).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Dedup.rougePairs(s, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
    assert(rows.map(_._1).toSet == pairs, "pair coverage differs")
    rows.foreach { case ((a, b), (nc, nr, ov, p, rr, f1)) =>
      assert(ov <= math.min(nc, nr), s"($a,$b): clipped overlap exceeds a side")
      assert(p <= 1000 && rr <= 1000 && f1 <= 1000, s"($a,$b): metric above 1000 milli")
      // F1 is the harmonic mean: min(P,R) − 1 ≤ F1 ≤ max(P,R) (integer floors)
      assert(f1 >= math.min(p, rr) - 1 && f1 <= math.max(p, rr) + 1,
        s"($a,$b): F1 $f1 outside [min,max] of P=$p R=$rr")
      // near-dup pairs genuinely share contiguous bigrams
      assert(ov > 0, s"($a,$b): a staged near-dup pair with zero bigram overlap")
    }
  }

  test("jaccard calibration covers every staged pair; exact is in [0,1]; error in [-1,1]") {
    val rows = Dedup.jaccardCalibration(s, sf).collect()
    val staged = Dedup.stagedNeardupPairs(s, sf).count()
    assert(rows.length == staged, "every staged pair must be calibrated")
    rows.foreach { r =>
      val exact = r.getDouble(6); val err = r.getDouble(7)
      assert(exact >= 0.0 && exact <= 1.0)
      assert(err >= -1.0 && err <= 1.0)
      assert(r.getLong(5) <= math.min(r.getLong(3), r.getLong(4)),
        "intersection cannot exceed either set size")
    }
  }

  test("skew stats: descending top-k, exact totals, factor centered on the mean") {
    val rows = Skew.skewStats(s, sf).collect()
    assert(rows.length == 10)
    val cnts = rows.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sorted.reverse), "top-k must be count-descending")
    val total = rows.head.getLong(2)
    val nKeys = rows.head.getLong(3)
    val trueTotal = Tables.events(s, sf).count()
    val trueKeys = Tables.events(s, sf).select("user_id").distinct().count()
    assert(total == trueTotal && nKeys == trueKeys)
    rows.foreach { r =>
      assert(r.getDouble(5) == r.getLong(1).toDouble * nKeys / total)
      assert(r.getDouble(5) >= 1.0 - 1e-9 || cnts.head > cnts.last,
        "heaviest keys of a skewed column sit at or above the mean weight")
    }
  }
}
