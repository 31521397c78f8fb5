package graft

/** Dev-only replay-phase timer: `runMain graft.ReplayBench <sfDir>` — runs
  * ONLY the streaming replays the way Bench's replay phase does (isolated
  * session clones, fixed pool) and prints per-replay wall times plus the
  * phase wall-clock. Knobs via env: SPARK_GRAFT_REPLAY_POOL (width),
  * SPARK_GRAFT_REPLAY_ORDER=sorted|lpt (submission order). For chasing the
  * replay_total bar without paying for the whole board. Not part of the
  * engine surface. */
object ReplayBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "graft-replaybench")
    val names = streaming.Streams.queries.keySet.toSeq
    val order = sys.env.getOrElse("SPARK_GRAFT_REPLAY_ORDER", "lpt") match {
      case "sorted" => names.sorted
      case _        => names.sortBy(n => (-streaming.Streams.replayWeight(n), n))
    }
    val poolWidth = sys.env.get("SPARK_GRAFT_REPLAY_POOL")
      .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ >= 1)
      .getOrElse(math.max(1, math.min(math.max(2, cpus.toInt / 2), names.size)))
    println(s"[replaybench] pool=$poolWidth order=${order.take(6).mkString(",")},...")
    val out = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(poolWidth)
    val w0 = System.nanoTime()
    streaming.Streams.replayWarmup(spark)
    println(f"[replaybench] warmup ${(System.nanoTime() - w0) / 1e9}%.2f s (untimed)")
    val t0 = System.nanoTime()
    order.foreach { name =>
      pool.execute(() => {
        try {
          val sess = spark.newSession()
          val q0 = System.nanoTime()
          SparkEntry.queries(name)(sess, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - q0) / 1e9
          out.put(name, dt)
          println(f"[replaybench] $name%-28s ${dt}%6.2f s  (at ${(System.nanoTime() - t0) / 1e9}%6.2f)")
        } catch { case e: Throwable =>
          System.err.println(s"[replaybench] $name failed: ${e.getMessage}")
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(30, java.util.concurrent.TimeUnit.MINUTES): Unit
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[replaybench] replay_total ${wall}%.2f s over ${out.size} replays")
    spark.stop()
  }
}
