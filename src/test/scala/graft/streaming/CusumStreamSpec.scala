package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-twin contract with the batch boundary INSIDE the
  * baseline window: the ListState buffer must carry partially-filled
  * baselines across micro-batches and drain retroactively, landing on
  * the batch recursion's exact rows. */
class CusumStreamSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("baseline buffered across the batch boundary drains to the batch answer") {
    val d0 = java.time.LocalDate.parse("2024-01-01")
    // 10 days: quiet 7-day baseline then a sustained shift; split at day 4
    // → the baseline window spans both micro-batches
    val ns = Seq(4L, 4L, 4L, 4L, 4L, 4L, 4L, 10L, 10L, 10L)
    val rows = ns.zipWithIndex.map { case (n, i) =>
      ("a", i, java.sql.Date.valueOf(d0.plusDays(i.toLong)), n)
    }
    val got = Streams.cusumReplayOf(s, rows, "cusum_spec_sink", 4)
      .collect().map(r =>
        (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getInt(4)))
    import s.implicits._
    val expected = graft.operators.Events.cusumOf(s,
      rows.map(r => (r._3.toString, r._1, r._4)).toDF("d", "event_type", "n")
        .select(to_date(col("d")).as("day"), col("event_type"), col("n")))
      .collect().map(r =>
        (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq == expected.toSeq,
      s"stream ${got.mkString(",")} vs batch ${expected.mkString(",")}")
    assert(got.exists(_._5 == 1), "the sustained shift must alarm")
  }
}
