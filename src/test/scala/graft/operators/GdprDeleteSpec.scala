package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Erasure-pass contract: bounded write amplification (only the subject's
  * bucket is rewritten — enforced by the operator's own REQUIRE, verified
  * here from the emitted audit), complete erasure in v2, and v1 still
  * auditable with the subject present (snapshot isolation). */
class GdprDeleteSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("v2 has zero subject rows, v1 keeps them; row delta == subject rows") {
    val rows = Formats.gdprDelete(s, sf).collect().sortBy(_.getInt(0))
    val (v1, v2) = (rows(0), rows(1))
    val subjectRows = v1.getAs[Long]("n_subject_rows")
    assert(subjectRows > 0, "fixture must contain the subject")
    assert(v2.getAs[Long]("n_subject_rows") == 0L, "erasure incomplete")
    assert(v1.getAs[Long]("n_rows") - v2.getAs[Long]("n_rows") == subjectRows,
      "rows beyond the subject's were lost or kept")
    assert(v1.getAs[Int]("n_files_rewritten") == 0)
    assert(v2.getAs[Int]("n_files_rewritten") == 1,
      "write amplification exceeded one bucket")
  }

  test("non-subject value mass is preserved exactly") {
    import org.apache.spark.sql.functions._
    val rows = Formats.gdprDelete(s, sf).collect().sortBy(_.getInt(0))
    val target = graft.Tables.events(s, sf).agg(min(col("user_id"))).head().getLong(0)
    val expected = graft.Tables.events(s, sf)
      .filter(col("user_id") =!= target)
      .agg(graft.QueryDsl.dsum(col("value"))).head().getDouble(0)
    assert(rows(1).getAs[Double]("sum_value") == expected,
      "v2 value mass != events minus the subject")
  }
}
