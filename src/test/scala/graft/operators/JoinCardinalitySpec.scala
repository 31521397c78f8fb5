package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-based join-size estimation contract: the estimate lands within
  * the emitted 2× verdict on the fixture, the exact baseline matches an
  * independent join count, and the integer scale-up degrades to EXACT
  * when the sketches hold their whole key sets. */
class JoinCardinalitySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("estimate is within 2x of the exact join size (verdict = 1)") {
    val r = Sketches.joinCardinality(s, sf).collect().head
    val est = r.getAs[Long]("est_rows")
    val exact = r.getAs[Long]("exact_rows")
    info(s"est=$est exact=$exact sampled=${r.getAs[Long]("n_common_sampled")}")
    assert(r.getAs[Int]("within_2x") == 1)
    assert(est > 0 && exact > 0)
  }

  test("exact baseline equals an independent join count") {
    import org.apache.spark.sql.functions.col
    val expected = graft.Tables.orders(s, sf)
      .join(graft.Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
      .count()
    val r = Sketches.joinCardinality(s, sf).collect().head
    assert(r.getAs[Long]("exact_rows") == expected)
  }

  test("theta = 2^32 would make the estimate exact (degradation identity)") {
    // when both sketches are unfull, theta is 2^32 and sum*2^32 div 2^32
    // == sum: verify the arithmetic identity the operator relies on
    val r = Sketches.joinCardinality(s, sf).collect().head
    val sp = r.getAs[Long]("sum_products")
    val theta = r.getAs[Long]("theta")
    val est = r.getAs[Long]("est_rows")
    assert(est == sp * 4294967296L / theta, "integer scale-up mismatch")
    if (theta == 4294967296L) assert(est == r.getAs[Long]("exact_rows"))
  }
}
