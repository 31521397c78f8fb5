// temp smoke main — drives SparkEntry.entry like the driver's t1 check
package graft
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4", "graft-smoke")
    val df = SparkEntry.entry(spark)
    df.show(5, false)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
