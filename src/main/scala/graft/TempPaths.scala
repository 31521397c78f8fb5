package graft

import java.io.File

import org.apache.spark.sql.SparkSession

/** Per-application scratch directories under /tmp, deleted at JVM exit —
  * unique per app (concurrent sessions must not clobber each other
  * between an eager write and a lazy read-back) without leaking one data
  * copy per run. */
object TempPaths {
  def scratch(s: SparkSession, name: String): String = {
    val path = s"/tmp/graft_${name}_${s.sparkContext.applicationId}"
    val dir = new File(path)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    path
  }

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
