package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the declarative bitmap-OR aggregate: exact bit placement,
  * partitioning invariance (commutative/idempotent OR), null skipping,
  * out-of-range masking, and the map-side-combine plan shape that makes
  * it shuffle O(bits), not O(rows). */
class BitmapAggSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def words(positions: Seq[java.lang.Long], parts: Int): Seq[Long] = {
    import s.implicits._
    positions.toDF("p").repartition(parts)
      .agg(expr("bitmap_agg(p, 128)").as("bw"))
      .head().getSeq[Long](0)
  }

  test("exact bit placement across word boundaries") {
    val got = words(Seq[java.lang.Long](0L, 1L, 63L, 64L, 127L), 3)
    assert(got == Seq((1L | 2L | (1L << 63)), (1L | (1L << 63))))
  }

  test("partitioning-invariant and idempotent (duplicate positions are free)") {
    val ps = Seq[java.lang.Long](5L, 70L, 5L, 70L, 99L, 5L)
    assert(words(ps, 1) == words(ps, 8))
    assert(words(ps, 4) == words(ps.distinct, 2))
  }

  test("nulls are skipped; out-of-range positions mask modulo nbits") {
    assert(words(Seq[java.lang.Long](null, 3L, null), 2) == Seq(8L, 0L))
    // 128 + 3 masks to 3 (pmod), matching pmod-derived caller inputs
    assert(words(Seq[java.lang.Long](131L), 1) == Seq(8L, 0L))
  }

  test("aggregation is map-side combined (partial_bitmap_agg in the plan)") {
    import s.implicits._
    val df = Seq(1L, 2L, 3L).toDF("p").repartition(4)
      .agg(expr("bitmap_agg(p, 128)"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_bitmap_agg"),
      s"no map-side partial aggregation:\n$plan")
  }

  test("empty input evaluates to the zero bitmap") {
    import s.implicits._
    val got = Seq.empty[Long].toDF("p")
      .agg(expr("bitmap_agg(p, 128)").as("bw")).head().getSeq[Long](0)
    assert(got == Seq(0L, 0L))
  }
}
