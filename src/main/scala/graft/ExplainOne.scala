package graft

/** Dev-only plan dump: `runMain graft.ExplainOne <sfDir> <name>` — prints
  * the named query's formatted plan after execution (so AQE final plans
  * and runtime metrics-bearing nodes are visible). Not part of the engine
  * surface. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect(): Unit
    println("==== FORMATTED ====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("==== EXECUTED ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
