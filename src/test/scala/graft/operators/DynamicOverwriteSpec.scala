package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The discriminating case behind k_dynamic_overwrite's REQUIREs: the
  * SAME restate under STATIC overwrite mode truncates every other
  * partition — the failure mode dynamic mode exists to avert. */
class DynamicOverwriteSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("static overwrite truncates; dynamic restates in place") {
    import s.implicits._
    val path = graft.TempPaths.scratch(s, "dynovw_spec") + "/table"
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("C", 4L))
      .toDF("st", "v")
    rows.write.mode("overwrite").partitionBy("st").parquet(path)
    assert(s.read.parquet(path).select("st").distinct().count() == 3)
    // static (the session default): restating A drops B and C
    rows.filter(col("st") === "A").withColumn("v", col("v") + 10)
      .write.mode("overwrite").partitionBy("st").parquet(path)
    assert(s.read.parquet(path).select("st").distinct().count() == 1,
      "static overwrite must have truncated the other partitions")
    // the operator's dynamic path keeps all partitions (REQUIREd in-query)
    val out = Formats.queries("k_dynamic_overwrite")(s, sf).collect()
    assert(out.length >= 2, "multiple partitions must survive the restate")
  }
}
