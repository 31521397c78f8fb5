package graft

/** Dev-only targeted correctness dump: like [[Verify]] but only for the
  * comma-separated query names in args(2), so a new operator can round
  * through tools/check.py in seconds instead of re-running all queries.
  * Not part of the engine surface; the driver runs [[Verify]]. */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(',').map(_.trim).filter(_.nonEmpty).toSet
    val unknown = wanted.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      "graft-verify-subset")
    new java.io.File(outDir).mkdirs()
    wanted.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view.filterKeys(wanted)
      .map { case (k, v) => s"  ${q(k)}: ${q(v)}" }
      .mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8")): Unit
    spark.stop()
  }
}
