package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the CALENDAR semantics of the rate-anomaly trailing window. The
  * sf fixtures observe every calendar day, so `e_rate_anomaly`'s oracle
  * gate cannot tell a RANGE(day_num) frame from a ROWS frame — these
  * synthetic gapped calendars can: a ROWS(-7,-1) frame reaches back over
  * the gap to whatever rows exist; the calendar RANGE frame sees only the
  * prior 7 real days. */
class RateAnomalySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def daily(rows: (String, Long)*) = {
    import s.implicits._
    rows.toSeq.toDF("d", "n")
      .select(col("d").cast("date").as("day"), lit("click").as("event_type"), col("n"))
  }

  test("a spike after a long quiet gap has NO baseline (a ROWS frame would invent one)") {
    // 3 observed days, 6-day gap, then a spike: the trailing calendar week
    // of the spike day holds ONE observed day -> d_trail < 3 -> no row.
    // ROWS(-7,-1) would reach back across the gap to all 3 days and emit
    // the spike with a fabricated 3-day baseline.
    val out = Events.rateAnomalyOf(daily(
      "2024-01-01" -> 10L, "2024-01-02" -> 10L, "2024-01-03" -> 10L,
      "2024-01-10" -> 25L))
    assert(out.count() == 0,
      s"gap-day spike got a baseline from beyond its calendar week:\n${out.collect().mkString("\n")}")
  }

  test("a spike after a short gap is compared against exactly the prior 7 calendar days") {
    // 7 observed days, 3-day gap, spike on day 11: its calendar week
    // [day 4, day 10] holds observed days 4-7 only -> d_trail = 4,
    // n_trail = 40. ROWS(-7,-1) would report (70, 7) instead.
    val out = Events.rateAnomalyOf(daily(
      "2024-01-01" -> 10L, "2024-01-02" -> 10L, "2024-01-03" -> 10L,
      "2024-01-04" -> 10L, "2024-01-05" -> 10L, "2024-01-06" -> 10L,
      "2024-01-07" -> 10L,
      "2024-01-11" -> 30L))
    val spike = out.filter(col("day") === lit("2024-01-11").cast("date")).collect()
    assert(spike.length == 1, "spike day missing from the gate output")
    val r = spike.head
    assert(r.getAs[Long]("n") == 30L)
    assert(r.getAs[Long]("n_trail") == 40L,
      s"n_trail=${r.getAs[Long]("n_trail")} — the frame is not the prior 7 CALENDAR days")
    assert(r.getAs[Long]("d_trail") == 4L,
      s"d_trail=${r.getAs[Long]("d_trail")} — the frame is not the prior 7 CALENDAR days")
    assert(r.getAs[Int]("is_spike") == 1, "30 vs a 10/day week must flag")
  }

  test("MAD gate matches a driver-side robust-z recompute and discriminates") {
    val sf = TestSpark.sf
    val out = Events.madAnomaly(s, sf).collect()
    assert(out.exists(_.getAs[Int]("is_anomaly") == 1), "no anomaly flagged — gate can't discriminate")
    assert(out.exists(_.getAs[Int]("is_anomaly") == 0), "everything flagged")
    // brute-force per-type median/MAD over the same daily counts
    def medianOf(xs: Seq[Double]): Double = {
      val v = xs.sorted
      if (v.size % 2 == 1) v(v.size / 2) else (v(v.size / 2 - 1) + v(v.size / 2)) / 2.0
    }
    val byType = out.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rows) =>
      val ns = rows.map(_.getAs[Long]("n").toDouble).toSeq
      val med = medianOf(ns)
      val mad = medianOf(ns.map(n => math.abs(n - med)))
      rows.foreach { r =>
        assert(r.getAs[Double]("med") == med && r.getAs[Double]("mad") == mad,
          s"median/MAD drifted from the exact recompute for ${r}")
        val expect = if (math.abs(r.getAs[Long]("n") - med) > 3 * mad) 1 else 0
        assert(r.getAs[Int]("is_anomaly") == expect, s"flag wrong for $r")
      }
    }
  }
}
