package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (JVM-wide; sbt
  * forks one test JVM, so suites reuse it instead of paying ~10 s each). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("4", "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
