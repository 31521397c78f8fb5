package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Smoothing contract on a synthetic series the gap-free fixture cannot
  * exercise: a feed outage (missing days) must DECAY the level through
  * grid zeros rather than freeze it, and the recovery burst must spike
  * against the decayed baseline. Plus the exact integer recursion checked
  * against a hand-stepped reference. */
class EwmaSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def series(rows: Seq[(String, String, Long)]) = {
    import s.implicits._
    Events.ewmaOf(s,
      rows.toDF("d", "event_type", "n").select(to_date(col("d")).as("day"),
        col("event_type"), col("n")))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getInt(4)))
  }

  test("integer recursion matches a hand-stepped reference") {
    val got = series(Seq(
      ("2024-01-01", "a", 8L), ("2024-01-02", "a", 4L), ("2024-01-03", "a", 6L)))
    // s0=8000; s1=(3*8000+4000)/4=7000; s2=(3*7000+6000)/4=6750
    assert(got.map(_._4).toSeq == Seq(8000L, 7000L, 6750L), got.mkString(", "))
    assert(got.map(_._5).toSeq == Seq(0, 0, 0))
  }

  test("an outage decays the level through zeros; the recovery burst spikes") {
    val got = series(Seq(
      ("2024-01-01", "a", 16L),
      // days 2-4 missing: the dense grid inserts zeros
      ("2024-01-05", "a", 20L)))
    val byDay = got.map(r => r._2 -> (r._3, r._4, r._5)).toMap
    assert(got.length == 5, "grid not dense")
    // 16000 -> 12000 -> 9000 -> 6750 over the outage
    assert(byDay("2024-01-02") == ((0L, 12000L, 0)))
    assert(byDay("2024-01-04") == ((0L, 6750L, 0)))
    // recovery: 20·1000 > 2·6750 -> spike against the DECAYED baseline
    val (n5, s5, spike5) = byDay("2024-01-05")
    assert(n5 == 20L && spike5 == 1, s"recovery did not spike: $got")
    assert(s5 == (3 * 6750L + 20000L) / 4)
  }

  test("types smooth independently on the shared calendar") {
    val got = series(Seq(
      ("2024-01-01", "a", 4L), ("2024-01-02", "a", 4L),
      ("2024-01-02", "b", 8L)))
    val a = got.filter(_._1 == "a").map(_._4).toSeq
    val b = got.filter(_._1 == "b").map(_._4).toSeq
    assert(a == Seq(4000L, 4000L))
    // b's day 1 is a grid zero: s0=0, s1=(0+8000)/4=2000
    assert(b == Seq(0L, 2000L))
  }
}
