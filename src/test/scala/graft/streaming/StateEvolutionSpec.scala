package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** State-schema evolution on restart: a transformWithState query stopped
  * at its checkpoint and restarted with an EVOLVED state class (added
  * nullable field) must resume exactly-once — no reprocessing, no state
  * loss — under the Avro state encoding. Proof of no-state-loss: the
  * final verdicts match the GLOBAL windowed recompute, which diverges if
  * any user's open (window, count) bucket failed to cross the restart;
  * proof of evolved decode: v1 rows observed with the added field empty. */
class StateEvolutionSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private lazy val sf = TestSpark.sf

  test("evolved restart resumes exactly-once with v1 state intact") {
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("state_evo").toString
    val arrivals = s"$root/arrivals"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(arrivals))
    val rows = graft.Tables.events(s, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)]
      .collect()
      .sortBy(r => (r._3, r._2))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    def arrive(batch: Array[(Long, Long, Long)]): Unit =
      batch.toSeq.toDF("user_id", "event_id", "us")
        .coalesce(1).write.mode("append").parquet(arrivals)

    val scoped = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.encodingFormat" -> "avro")
    val prev = scoped.map { case (k, _) => k -> s.conf.getOption(k) }
    scoped.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      def runOnce(proc: org.apache.spark.sql.streaming.StatefulProcessor[
          Long, Streams.RlEv, Streams.RlOut]): Unit = {
        val q = s.readStream
          .schema("user_id LONG, event_id LONG, us LONG")
          .parquet(arrivals)
          .as[(Long, Long, Long)]
          .map { case (u, e, us) => Streams.RlEv(u, e, us) }
          .groupByKey(_.user_id)
          .transformWithState(proc,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      arrive(b1)
      runOnce(new Streams.RateLimitProcessor())
      val afterB1 = s.read.parquet(out).count()
      assert(afterB1 == b1.length.toLong, s"batch 1: $afterB1 of ${b1.length} rows")
      arrive(b2)
      Streams.evolvedStateReads.set(0)
      runOnce(new Streams.RateLimitProcessorV2()) // evolved state class
      val result = s.read.parquet(out)
      // no reprocessing: every event exactly once
      assert(result.count() == rows.length.toLong, "restart lost or duplicated rows")
      assert(result.groupBy(col("event_id")).count()
        .filter(col("count") > 1).count() == 0, "restart re-emitted batch-1 rows")
      // the evolved schema really decoded v1 state (not a cold start)
      assert(Streams.evolvedStateReads.get() > 0,
        "v2 never observed a v1 state row — state was lost or never read")
      // no state loss: verdicts equal the GLOBAL recompute; any user
      // whose open window bucket died at the restart over-admits here
      val expected = rows.toSeq.toDF("user_id", "event_id", "us")
        .withColumn("w", col("us") - col("us") % (60L * 1000000L))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("w"))
            .orderBy(col("us"), col("event_id"))))
        .select(col("event_id"), (col("rn") <= 5).cast("int").as("admitted"))
      val diverged = result.select(col("event_id"), col("admitted"))
        .join(expected.withColumnRenamed("admitted", "want"), "event_id")
        .filter(col("admitted") =!= col("want")).count()
      assert(diverged == 0, s"$diverged verdicts diverged from the global recompute")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
