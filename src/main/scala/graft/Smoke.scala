package graft

/** Entry smoke check — drives [[SparkEntry.entry]] exactly like the
  * driver's t1 gate (rows > 0 on sf0.001) and prints ENTRY_ROWS. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4", "graft-smoke")
    val rows = SparkEntry.entry(spark).collect() // one execution, not show+count
    rows.take(5).foreach(r => println(r.mkString(" | ")))
    println(s"ENTRY_ROWS=${rows.length}")
    spark.stop()
  }
}
