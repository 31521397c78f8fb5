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
  *
  * A second scale point (SPARK_GRAFT_SF_DIR2, default sf0.01) rides along
  * in the same JSON line as `sf2`/`queries_sf2`, so per-query scaling
  * slopes are visible: a query whose time grows faster than the 10× input
  * delta between the two points has a scale problem the single-point
  * number hides.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfDir2 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR2", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus, "graft-bench")

    def benchAll(dir: String): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        def runOnce(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
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

    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")

    val primary = benchAll(sfDir)
    val secondary =
      if (sfDir2.nonEmpty && sfDir2 != sfDir && new java.io.File(sfDir2).isDirectory)
        Some(benchAll(sfDir2))
      else None

    val total = primary.map(_._2).sum
    val extra = secondary.map { rs =>
      s""","sf2":"$sfDir2","total_sf2":${rs.map(_._2).sum},"queries_sf2":${toJson(rs)}"""
    }.getOrElse("")
    println(s"""{"metric":"total","value":$total,"unit":"sec","method":"noop-write, steady-state (warmup+timed)","queries":${toJson(primary)},"sf":"$sfDir"$extra}""")
    spark.stop()
  }
}
