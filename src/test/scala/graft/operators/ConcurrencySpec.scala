package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase distributed prefix sum must equal the naive global
  * running sum, while keeping the corpus-sized delta stream out of any
  * unpartitioned window (only the O(buckets) offsets table may use one). */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("two-phase prefix sum equals the naive single-window sweep") {
    val got = Events.concurrency(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val us = unix_micros(col("ts"))
    val ev = Tables.events(s, sf)
    val hold = 1800L * 1000000L
    val pts = ev.select(us.as("us"), lit(1L).as("delta"))
      .unionAll(ev.select((us + hold).as("us"), lit(-1L).as("delta")))
    val naive = pts
      .withColumn("conc", sum(col("delta")).over(
        Window.orderBy(col("us"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(expr("(us div 3600000000) * 3600000000").as("hour_us"))
      .agg(max(col("conc")).as("max_conc"))
      .orderBy("hour_us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == naive)
    assert(got.map(_._2).max > 1, "fixture must exhibit real concurrency")
  }

  test("per-hour totals conserve: concurrency returns to zero after the last event") {
    val rows = Events.concurrency(s, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    // the final hour's max is >= 0 and the sweep ends balanced: total +1s == total -1s
    val n = Tables.events(s, sf).count()
    assert(rows.nonEmpty && n > 0)
    // every +1 has a matching -1 30 minutes later, so the global delta sum is 0;
    // the last bucket's running max can never be negative
    assert(rows.last._2 >= 0)
  }

  test("interval overlap equals a brute-force interval-intersection join") {
    val HourUs = 3600000000L
    val sess = Events.sessionize(s, TestSpark.sf)
      .select("user_id", "start_us", "end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val outages = Tables.events(s, TestSpark.sf)
      .filter(col("event_type") === "error")
      .select(expr(s"unix_micros(ts) div ${HourUs}L").as("hour"))
      .groupBy("hour").count()
      .orderBy(col("count").desc, col("hour")).limit(8)
      .collect().map(_.getLong(0))
      .map(h => (h * HourUs, (h + 1) * HourUs))
    val expected = sess.flatMap { case (u, st, en) =>
      val ols = outages.collect {
        case (os, oe) if st < oe && os <= en =>
          math.min(en + 1, oe) - math.max(st, os)
      }
      if (ols.isEmpty) None else Some((u, st) -> ((ols.length.toLong, ols.sum)))
    }.toMap
    val got = Events.intervalOverlap(s, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, s"overlap join diverged: ${got.size} vs ${expected.size} rows")
    assert(got.nonEmpty, "fixture produced no session-outage overlaps")
    // an overlap can never exceed the outage hour or the session length
    got.foreach { case ((u, st), (n, ol)) =>
      assert(ol <= n * HourUs, s"user $u session $st: overlap $ol > $n outage hours")
    }
  }
}
