package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel's batch-equivalence contract and its two
  * order-sensitive edges: the same-microsecond purchase/click tie, and
  * session numbering across a MID-STREAM watermark timeout. */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def tsUs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private type Row4 = (Long, Long, Timestamp, String)

  /** Replays batches through funnelStream and returns the sink rows. */
  private def run(
      batches: Seq[Seq[Row4]],
      tombstoneTtlUs: Option[Long] = None): Seq[(Long, Long, Long, Long, Int)] = {
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Row4]
    val q = Streams.funnelStream(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type").as[Streams.FunnelEv],
        tombstoneTtlUs)
      .toDF()
      .writeStream.format("memory").queryName("funnel_spec_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    s.table("funnel_spec_out")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq.sorted
  }

  private val Day: Long = 86400L * 1000000L

  test("same-microsecond purchase/click tie converts, strictly-earlier purchase does not") {
    // user 1: purchase and the session's first click at the SAME us — the
    // batch form counts it converted (purchase us >= MIN(click us));
    // user 2: purchase strictly before the first click — not converted
    val base = 10L * Day
    val rows = Seq[Row4](
      (1L, 100L, tsUs(base), "purchase"),
      (1L, 101L, tsUs(base), "click"),
      (2L, 200L, tsUs(base), "purchase"),
      (2L, 201L, tsUs(base + 1L), "click"),
      // sentinel to flush both open sessions
      (-1L, -1L, tsUs(base + 30L * Day), "noop"))
    val out = run(Seq(rows)).filter(_._1 >= 0)
    assert(out == Seq(
      (1L, 1L, 1L, 1L, 1),
      (2L, 1L, 1L, 1L, 0)))
  }

  test("session numbering survives a mid-stream timeout flush") {
    val base = 10L * Day
    val gap = graft.operators.Events.SessionGapUs
    val b1 = Seq[Row4]((5L, 1L, tsUs(base), "click"))
    // another user far in the future: watermark jumps past user 5's
    // session-gap boundary, so session 1 flushes via TIMEOUT mid-stream
    val b2 = Seq[Row4]((6L, 2L, tsUs(base + 5L * Day), "view"))
    // user 5 returns (in global event-time order): must be session 2
    val b3 = Seq[Row4]((5L, 3L, tsUs(base + 6L * Day), "purchase"))
    val b4 = Seq[Row4]((-1L, -1L, tsUs(base + 40L * Day), "noop"))
    val out = run(Seq(b1, b2, b3, b4)).filter(t => t._1 == 5L)
    assert(out == Seq(
      (5L, 1L, 1L, 0L, 0), // flushed by the mid-stream timeout
      (5L, 2L, 0L, 1L, 0)), // numbering continued past the tombstone
      s"got $out")
    assert(base + 5L * Day - 3600L * 1000000L > base + gap,
      "precondition: b2 must push the watermark past user 5's gap boundary")
  }

  test("tombstone survives many micro-batches: a late-returning user keeps numbering") {
    // Regression for the second-timeout-firing bug: the user's return
    // arrives SEVERAL micro-batches (and several watermark advances)
    // after the timeout flush. If the tombstone were removed at a later
    // timeout firing, the return would see null state and restart at
    // session 1, duplicating (user_id, session_id) = (7, 1).
    val base = 10L * Day
    val b1 = Seq[Row4]((7L, 1L, tsUs(base), "click"))
    // three successive watermark advances with NO user-7 traffic — each
    // one re-fires any armed timeout; the tombstone must outlive them all
    val b2 = Seq[Row4]((8L, 2L, tsUs(base + 5L * Day), "view"))
    val b3 = Seq[Row4]((8L, 3L, tsUs(base + 10L * Day), "view"))
    val b4 = Seq[Row4]((8L, 4L, tsUs(base + 15L * Day), "view"))
    // user 7 finally returns: must be session 2, not a fresh session 1
    val b5 = Seq[Row4]((7L, 5L, tsUs(base + 20L * Day), "purchase"))
    val b6 = Seq[Row4]((-1L, -1L, tsUs(base + 60L * Day), "noop"))
    val out = run(Seq(b1, b2, b3, b4, b5, b6)).filter(_._1 == 7L)
    assert(out == Seq(
      (7L, 1L, 1L, 0L, 0),
      (7L, 2L, 0L, 1L, 0)),
      s"got $out")
  }

  test("opt-in tombstone TTL evicts idle users; the default never does") {
    // user 9's session flushes by timeout, then stays idle while the
    // watermark advances far past lastUs + ttl (2 days). With the TTL the
    // tombstone EVICTS, so the eventual return restarts at session 1 —
    // the documented renumbering trade for bounded state; with the
    // default permanent tombstone the same replay resumes at session 2.
    val base = 10L * Day
    val ttl = 2L * Day
    val batches = Seq(
      Seq[Row4]((9L, 1L, tsUs(base), "click")),
      // watermark pushes past the gap boundary (flush) and then past
      // lastUs + ttl (eviction point), with no user-9 traffic
      Seq[Row4]((8L, 2L, tsUs(base + 5L * Day), "view")),
      Seq[Row4]((8L, 3L, tsUs(base + 10L * Day), "view")),
      // user 9 returns long after the eviction horizon
      Seq[Row4]((9L, 4L, tsUs(base + 20L * Day), "purchase")),
      Seq[Row4]((-1L, -1L, tsUs(base + 60L * Day), "noop")))
    // run() returns tuple-sorted rows; both sessions carry id 1 after
    // eviction, so the purchase session (0 clicks) sorts first
    val withTtl = run(batches, Some(ttl)).filter(_._1 == 9L)
    assert(withTtl == Seq(
      (9L, 1L, 0L, 1L, 0), // the RETURN restarted at 1: state was evicted
      (9L, 1L, 1L, 0L, 0)),
      s"got $withTtl")
    val without = run(batches).filter(_._1 == 9L)
    assert(without == Seq(
      (9L, 1L, 1L, 0L, 0),
      (9L, 2L, 0L, 1L, 0)), // permanent tombstone: numbering continues
      s"got $without")
  }

  test("streamed funnel equals the batch funnel row-for-row on real events") {
    val sf = TestSpark.sf
    val streamed = Streams.funnelStreamReplay(s, sf)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Events.sessionFunnel(s, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
