package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CUSUM contract on synthetic series the fixture cannot exercise: a
  * SUSTAINED level shift accumulates to an alarm while a single day of
  * the same elevated magnitude does not — the discrimination that
  * separates CUSUM from the spike gates — plus the exact integer
  * recursion hand-stepped against the 7-day in-control baseline. */
class CusumSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def series(rows: Seq[(String, String, Long)]) = {
    import s.implicits._
    Events.cusumOf(s,
      rows.toDF("d", "event_type", "n").select(to_date(col("d")).as("day"),
        col("event_type"), col("n")))
      .collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getInt(4)))
  }

  private def quiet(tp: String, days: Int, n: Long): Seq[(String, String, Long)] =
    (1 to days).map(i => (f"2024-01-$i%02d", tp, n))

  test("integer recursion matches a hand-stepped reference") {
    // 7-day baseline all 4s → μ1000 = 4000, k = 1000, drift/day = n·1000 − 5000
    val got = series(quiet("a", 7, 4L) ++ Seq(("2024-01-08", "a", 10L)))
    // quiet days: max(0, 4000−5000) = 0 each; day 8: 10000−5000 = 5000
    assert(got.map(_._3).toSeq == Seq.fill(7)(0L) :+ 5000L, got.mkString(", "))
    // h = 8000 — one elevated day stays under it
    assert(got.map(_._4).toSeq == Seq.fill(8)(0))
  }

  test("a sustained shift alarms; one day of the same magnitude does not") {
    // level 4 for the baseline week, then a sustained step to 10
    val shifted = series(quiet("a", 7, 4L) ++ Seq(
      ("2024-01-08", "a", 10L), ("2024-01-09", "a", 10L), ("2024-01-10", "a", 10L)))
    // s: 5000, 10000 (> h=8000 → alarm), 15000
    assert(shifted.drop(8).forall(_._4 == 1),
      s"sustained shift must alarm from day 9: $shifted")
    // one day at 10, back to quiet: accumulates once, then decays — never alarms
    val oneDay = series(quiet("b", 7, 4L) ++ Seq(
      ("2024-01-08", "b", 10L), ("2024-01-09", "b", 4L), ("2024-01-10", "b", 4L)))
    assert(oneDay.forall(_._4 == 0),
      s"a single elevated day must not trip the level-shift alarm: $oneDay")
  }
}
