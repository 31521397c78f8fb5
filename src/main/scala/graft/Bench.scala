package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every engine query at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout. Queries are materialized with a noop-format write (full
  * plan execution, all columns produced, nothing persisted) — `count()`
  * would let Catalyst prune projections and eliminate sorts, undercounting
  * the real work.
  *
  * Each query runs twice — one untimed warmup, one timed — and the timed
  * run is reported. A single cold run measures mostly JVM/codegen warmup
  * and broadcast-GC pressure from earlier queries (observed 3–20×
  * run-to-run variance at sf0.1); the steady-state number is the one that
  * extrapolates to a long-lived cluster, where warmup amortizes to zero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus, "graft-bench")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def runOnce(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val sec =
        try { runOnce(); System.gc(); runOnce() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","method":"noop-write, steady-state (warmup+timed)","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
