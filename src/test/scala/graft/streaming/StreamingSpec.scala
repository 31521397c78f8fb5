package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming specs driven through MemoryStream — watermark
  * session closure and stateful streaming dedup. */
class StreamingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("session_window closes sessions past the watermark") {
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Streams.sessionAgg(df).writeStream
      .format("memory").queryName("sessions_out").outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart (one session), then a 2-day jump
      // to push the watermark far past the session end
      in.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      in.addData((1L, ts(60 * 48), 9.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT user_id, n_events, sum_value FROM sessions_out").collect()
      assert(rows.length == 1) // first session closed; the late one still open
      assert(rows.head.getLong(1) == 2 && rows.head.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("batch and stream sessionization agree row-for-row on real events") {
    import org.apache.spark.sql.functions._
    val sf = graft.TestSpark.sf
    val streamed = Streams.sessionizeStream(s, sf)
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
      .collect().toSeq
    val gapUs = 1800L * 1000000L
    val batch = graft.operators.Events.sessionize(s, sf)
      .select(col("user_id"), col("start_us"),
        (col("end_us") + gapUs).as("end_us"), // session_window end = last event + gap
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_us")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming replay queries are idempotent within a session (memory sink resets)") {
    // Bench runs each replay twice (warmup + timed) in one session; an
    // accumulating sink would silently double the timed run's data
    val sf = graft.TestSpark.sf
    val n1 = Streams.sessionizeStream(s, sf).count()
    val n2 = Streams.sessionizeStream(s, sf).count()
    assert(n1 > 0 && n1 == n2, s"replay not idempotent: $n1 then $n2")
  }

  test("streaming dedup emits first occurrence only, across batches") {
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.dedupStream(in.toDS(),
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout).writeStream
      .format("memory").queryName("dedup_out").outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "a"), (2L, "b"), (1L, "dup-in-batch"))
      q.processAllAvailable()
      in.addData((2L, "dup-across-batch"), (3L, "c"))
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(rows.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }
}
