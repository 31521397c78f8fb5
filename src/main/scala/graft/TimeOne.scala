package graft

/** Dev-only single-query timer: `runMain graft.TimeOne <sfDir> <name> [reps]`
  * — noop-writes the named query like Bench does (warmup + timed reps) and
  * prints one line per rep. For chasing per-query variance without paying
  * for the whole board. Not part of the engine surface. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-timeone")
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup
    (1 to reps).foreach(i => println(f"TIME $name rep$i ${once()}%.2f s"))
    spark.stop()
  }
}
