package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** CHECKPOINT RESTART — the exactly-once claim under the failure it
  * exists for: a STATEFUL windowed aggregation is stopped cold between
  * micro-batches and a NEW query resumes from the same checkpoint. The
  * restarted query must recover its open-window state (events from
  * before the stop combine with events after it in the same windows),
  * emit every window exactly once across both query incarnations, and
  * land on the batch GROUP BY answer row-for-row. */
class StreamRestartSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("stateful windowed agg survives stop + restart from checkpoint, exactly once") {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = graft.Tables.events(s, sf)
      .select(col("event_type"), col("ts"), col("value"))
      .as[(String, java.sql.Timestamp, Double)]
      .collect().sortBy(_._2.getTime)
    val maxMs = rows.iterator.map(_._2.getTime).max
    val base = java.nio.file.Files.createTempDirectory("restart").toString
    val in = MemoryStream[(String, java.sql.Timestamp, Double)]
    def start() = Streams.windowAgg(in.toDF().toDF("event_type", "ts", "value"))
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode(OutputMode.Append).start()

    // chunk 1 ends MID-WINDOW (split at an odd timestamp), so open-window
    // state MUST survive the restart for the totals to come out right
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val q1 = start()
    try { in.addData(b1.toIndexedSeq); q1.processAllAvailable() } finally q1.stop()

    val q2 = start()
    try {
      in.addData(b2.toIndexedSeq)
      q2.processAllAvailable()
      in.addData(("sentinel", new java.sql.Timestamp(maxMs + 10L * 24 * 3600 * 1000), 0.0))
      q2.processAllAvailable()
      q2.processAllAvailable() // fence: no-data flush batch committed
    } finally q2.stop()

    val streamed = s.read.parquet(s"$base/out")
      .filter(col("event_type") =!= "sentinel")
      .select(unix_micros(col("window_start")).as("ws_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    // exactly once: no window emitted by both incarnations
    assert(streamed.map(t => (t._1, t._2)).distinct.size == streamed.size,
      "a window was emitted twice across the restart")
    val batch = graft.Tables.events(s, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.QueryDsl.dsum(col("value")).as("sv"))
      .select(unix_micros(col("w.start")), col("event_type"), col("n"), col("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(streamed == batch,
      s"restarted stream diverges from batch: ${streamed.size} vs ${batch.size} rows")
  }
}
